package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column API over Spark's internal Bloom-filter expressions (the engine
  * uses them for runtime join filters; they are not in the public
  * FunctionRegistry). A Bloom summary of a key set is the canonical
  * "have we seen this content before" sketch for incremental ingestion:
  * one mergeable partial-agg pass builds it, and probing is a map-side
  * predicate over the broadcast bits — no false negatives, bounded false
  * positives.
  */
object SketchOps {
  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    Shim.column(e)
  private def e(col: Column) = Shim.expression(col)

  /** Aggregate a LONG key column into a serialized Bloom filter (binary).
    * `expectedItems` sizes the hash count; `numBits` the bit array. */
  def bloom_filter_agg(keys: Column, expectedItems: Long, numBits: Long): Column =
    c(BloomFilterAggregate(e(keys),
        e(org.apache.spark.sql.functions.lit(expectedItems)),
        e(org.apache.spark.sql.functions.lit(numBits)), 0, 0)
      .toAggregateExpression())

  /** Membership probe of a LONG key against a serialized Bloom filter. */
  def might_contain(bloom: Column, key: Column): Column =
    c(BloomFilterMightContain(e(bloom), e(key)))
}
