package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial (Horner, base 31) hash of a string's Unicode CODE POINTS
  * into a bucket: `(fold cp: acc -> (acc*31 + cp) % hashMod) % buckets`.
  *
  * This is the DSIR feature-bucketing hash (SamplingQueries /
  * Graft.dsirWeights). It is semantically IDENTICAL to the SQL
  * higher-order-function form
  * `aggregate(sequence(1, length(f)), 0L, (acc, i) -> (acc*31 +
  * ascii(substring(f, i, 1))) % hashMod) % buckets` — Spark's
  * substring/length count code points and ascii() returns the leading
  * code point, exactly like the DuckDB oracle's `ord(f[i])` replay — but
  * evaluated as a single whole-stage-codegen loop over the decoded code
  * points instead of length(f) chained substring allocations, which made
  * the HOF form the dominant cost of the DSIR scan.
  *
  * hashMod/buckets are plan constants embedded as literals; map-side,
  * O(len) per row, no state.
  */
case class HornerBucket(child: Expression, hashMod: Long, buckets: Int)
    extends UnaryExpression {

  override def prettyName: String = "horner_bucket"
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val it = v.asInstanceOf[UTF8String].toString.codePoints().iterator()
    var acc = 0L
    while (it.hasNext) acc = (acc * 31L + it.nextInt()) % hashMod
    acc % buckets
  }

  // statement-for-statement Java twin of nullSafeEval (same code-point
  // decode, same modular arithmetic order) — bit-identical, asserted by
  // HornerBucketSpec against the SQL HOF form
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val fn = ctx.freshName("hornerBucket")
      val funcName = ctx.addNewFunction(fn,
        s"""
           |private long $fn(UTF8String str) {
           |  java.util.PrimitiveIterator.OfInt it = str.toString().codePoints().iterator();
           |  long acc = 0L;
           |  while (it.hasNext()) acc = (acc * 31L + it.nextInt()) % ${hashMod}L;
           |  return acc % ${buckets}L;
           |}
         """.stripMargin)
      s"${ev.value} = $funcName($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): HornerBucket =
    copy(child = newChild)
}

object HornerBucket {
  def apply(col: Column, hashMod: Long, buckets: Int): Column =
    Shim.column(HornerBucket(Shim.expression(col), hashMod, buckets))
}
