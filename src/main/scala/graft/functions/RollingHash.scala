package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
    extends UnaryExpression with CodegenFallback {

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

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object RollingFingerprint {
  def apply(text: Column, k: Int = 8, w: Int = 4): Column =
    Shim.column(RollingFingerprint(Shim.expression(text), k, w))
}
