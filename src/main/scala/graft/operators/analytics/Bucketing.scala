package graft.operators.analytics

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table utilities — the co-located join path for repeated joins
  * on the same key at 100 TB (SURVEY §6 "Partitioning & shuffle").
  *
  * Writing both sides bucketed by the join key (same bucket count) lets
  * every subsequent equi-join on that key plan as a zipped per-bucket
  * SortMergeJoin with NO shuffle Exchange on either side — the shuffle is
  * paid once at write time, not per query. BucketingSpec asserts the
  * exchange-free plan.
  */
object Bucketing {

  /** Persist `df` as a bucketed managed table (overwrites). */
  def saveBucketed(df: DataFrame, table: String, bucketCol: String,
                   buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table) // managed: lives in spark.sql.warehouse.dir

  /** Join two same-bucketing tables on their bucket key. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
