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

  /** Persist `df` as a bucketed managed table (overwrites). Drops any
    * prior table AND its warehouse directory first: a location left by a
    * previous JVM is invisible to this session's fresh catalog, and
    * saveAsTable refuses to claim it (LOCATION_ALREADY_EXISTS). */
  def saveBucketed(df: DataFrame, table: String, bucketCol: String,
                   buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new java.io.File(
      java.net.URI.create(spark.conf.get("spark.sql.warehouse.dir")).getPath,
      table.toLowerCase)
    if (loc.exists) graft.Fs.deleteRecursively(loc.toPath)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table) // managed: lives in spark.sql.warehouse.dir
  }

  /** Join two same-bucketing tables on their bucket key. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
