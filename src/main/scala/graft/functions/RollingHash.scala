package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (SURVEY §2 "Text analysis"):
  * polynomial rolling hash over character k-grams (base 257 mod 1e9+7),
  * then the rightmost-minimum of each w-window (standard winnowing), output
  * as a sorted distinct array<long>.
  *
  * Guarantee: any shared substring of length ≥ k + w - 1 between two
  * documents yields at least one shared fingerprint — the property near-dup
  * containment checks rely on. Map-side only; O(len) per row.
  */
case class RollingFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def prettyName: String = "rolling_fingerprint"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val Base = 257L
  private val Mod = 1000000007L

  override def nullSafeEval(v: Any): Any = {
    // hash over Unicode CODE POINTS (not UTF-16 units) — the unit the SQL
    // oracle's ord(substr)/length() also use, so the replay holds on any
    // corpus, not only the ASCII/BMP range
    val cps = v.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cps.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    // k-gram rolling hashes
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow = (pow * Base) % Mod; i += 1 }
    val m = n - k + 1
    val hs = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < k) { h = (h * Base + cps(i)) % Mod; i += 1 }
    hs(0) = h
    i = 1
    while (i < m) {
      h = ((h - (cps(i - 1).toLong * pow) % Mod + Mod * Base) % Mod * Base + cps(i + k - 1)) % Mod
      hs(i) = h
      i += 1
    }
    // winnowing: rightmost min of each window of w consecutive hashes
    val sel = scala.collection.mutable.SortedSet.empty[Long]
    if (m <= w) {
      var minIdx = 0
      i = 1
      while (i < m) { if (hs(i) <= hs(minIdx)) minIdx = i; i += 1 }
      sel += hs(minIdx)
    } else {
      var start = 0
      while (start + w <= m) {
        var minIdx = start
        i = start + 1
        while (i < start + w) { if (hs(i) <= hs(minIdx)) minIdx = i; i += 1 }
        sel += hs(minIdx)
        start += 1
      }
    }
    new GenericArrayData(sel.toArray)
  }

  // ---- whole-stage codegen -------------------------------------------------
  // Winnowing fingerprints every document in the decontamination and
  // fingerprint queries — CodegenFallback's row-materialize + interpreted
  // eval per call is the wrong cost model for that volume. The generated
  // method below is a statement-for-statement Java translation of
  // nullSafeEval (same code-point decode, same modular arithmetic order,
  // java.util.TreeSet<Long> replays SortedSet[Long]'s natural-order distinct
  // ascending output) — bit-identical, asserted by ShingleCodegenSpec.
  // k/w are plan constants, embedded as literals.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val gad = "org.apache.spark.sql.catalyst.util.GenericArrayData"
      val fn = ctx.freshName("rollingFingerprint")
      val funcName = ctx.addNewFunction(fn,
        s"""
           |private ArrayData $fn(UTF8String str) {
           |  int[] cps = str.toString().codePoints().toArray();
           |  int n = cps.length;
           |  if (n < $k) return new $gad(new long[0]);
           |  long pow = 1L;
           |  for (int i = 0; i < $k - 1; i++) pow = (pow * ${Base}L) % ${Mod}L;
           |  int m = n - $k + 1;
           |  long[] hs = new long[m];
           |  long h = 0L;
           |  for (int i = 0; i < $k; i++) h = (h * ${Base}L + cps[i]) % ${Mod}L;
           |  hs[0] = h;
           |  for (int i = 1; i < m; i++) {
           |    h = ((h - (((long) cps[i - 1]) * pow) % ${Mod}L + ${Mod}L * ${Base}L)
           |          % ${Mod}L * ${Base}L + cps[i + $k - 1]) % ${Mod}L;
           |    hs[i] = h;
           |  }
           |  java.util.TreeSet sel = new java.util.TreeSet();
           |  if (m <= $w) {
           |    int minIdx = 0;
           |    for (int i = 1; i < m; i++) { if (hs[i] <= hs[minIdx]) minIdx = i; }
           |    sel.add(Long.valueOf(hs[minIdx]));
           |  } else {
           |    for (int start = 0; start + $w <= m; start++) {
           |      int minIdx = start;
           |      for (int i = start + 1; i < start + $w; i++) {
           |        if (hs[i] <= hs[minIdx]) minIdx = i;
           |      }
           |      sel.add(Long.valueOf(hs[minIdx]));
           |    }
           |  }
           |  long[] out = new long[sel.size()];
           |  int oi = 0;
           |  for (java.util.Iterator it = sel.iterator(); it.hasNext(); ) {
           |    out[oi++] = ((Long) it.next()).longValue();
           |  }
           |  return new $gad(out);
           |}
         """.stripMargin)
      s"${ev.value} = $funcName($c);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object RollingFingerprint {
  def apply(text: Column, k: Int = 8, w: Int = 4): Column =
    Shim.column(RollingFingerprint(Shim.expression(text), k, w))
}
