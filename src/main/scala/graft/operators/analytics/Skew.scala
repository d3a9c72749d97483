package graft.operators.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §6). AQE's skew-join handles sorted
  * shuffle joins at runtime; these cover the cases it can't — broadcast-
  * ineligible dimension joins against a hot key, and exact distincts over
  * a key whose group would otherwise land on one reducer.
  */
object Skew {

  /** Salted equi-join: the large (skewed) side gets a deterministic salt
    * in [0, saltFactor); the small side is replicated once per salt value,
    * so a hot key's rows spread over saltFactor reducers instead of one.
    * Semantically identical to `large.join(small, keys)` for 1:N joins
    * (small side unique per key). */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val salted = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*), lit(saltFactor.toLong)))
    val smallExp = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(i => lit(i.toLong)): _*)))
    salted.join(smallExp, keys :+ "__salt").drop("__salt")
  }

  /** Exact distinct count per key without a single-reducer hot group:
    * spread the shuffle over (key, value) first, then count per key with
    * map-side partial aggregation. Equivalent to
    * `groupBy(key).agg(countDistinct(value))`, but the first shuffle is
    * keyed by (key, value), so a hot key's distinct values parallelize. */
  def skewAwareDistinctCount(df: DataFrame, key: String, value: String): DataFrame =
    df.select(col(key), col(value)).distinct()
      .groupBy(col(key)).agg(count(lit(1)).as(s"n_distinct_$value"))
}
