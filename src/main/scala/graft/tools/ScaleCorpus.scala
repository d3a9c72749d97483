package graft.tools

import graft.GraftSession
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic corpus scale-up for stress passes: replicates a source
  * scale-factor directory `factor`× with key-shifted copies so every FK
  * relationship (orders→customer, lineitem→orders/part/supplier) still
  * joins, while fixed dimension tables (region, nation) stay single-copy
  * — the TPC-H scaling rule. Non-key payload (text, embeddings, ts,
  * props) is replicated verbatim: the stress corpus deliberately contains
  * exact duplicate groups of size `factor`, which is both realistic for a
  * crawled corpus and the worst case for the dedup/pair-join family.
  *
  * Usage: runMain graft.tools.ScaleCorpus <srcDir> <dstDir> [factor=10]
  *
  * Output layout matches /root/testdata/sf*: one `<table>.parquet` FILE
  * per table (written via a single-partition stage dir, then the part
  * file is renamed into place) so both Spark and the DuckDB oracle read
  * it with the same path expression. Files this size stay splittable for
  * Spark via parquet row groups.
  */
object ScaleCorpus {
  /** Key stride between replicas. Must exceed every source key — ASSERTED
    * per table in [[scaled]] before any shift: re-running ScaleCorpus on
    * an already-scaled directory (keys up to factor×Stride) would
    * otherwise collide replica keys into duplicate PKs and broken FK
    * joins with no error (r9 advice). Note the shifted `vec_id`s are
    * intentionally sparse: operators that assume dense 0..n-1 ids
    * (KnnGraph's ring seeding `(i+s) % n`) degrade gracefully — dangling
    * seed edges drop in the embedding-fetch join and the descent rounds
    * recover quality — but a scaled corpus starts the build from a
    * thinner seed graph than a dense-id corpus of the same size. */
  val Stride = 10000000L

  /** int64 key columns to shift per replica, by table. */
  val KeyCols: Map[String, Seq[String]] = Map(
    "region" -> Nil,
    "nation" -> Nil,
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  def scaled(df: DataFrame, keys: Seq[String], factor: Int): DataFrame =
    if (keys.isEmpty) df
    else {
      val maxes = df.agg(keys.map(k => max(col(k)).as(k)).head,
        keys.map(k => max(col(k)).as(k)).tail: _*).head()
      keys.foreach { k =>
        // an empty table has a NULL max — nothing to collide with
        if (!maxes.isNullAt(maxes.fieldIndex(k))) {
          val m = maxes.getAs[Number](k).longValue()
          require(m < Stride,
            s"key $k has max $m >= stride $Stride — source already scaled? " +
              "Scaling it again would collide replica keys into duplicate PKs")
        }
      }
      (0 until factor).map { r =>
        keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(r * Stride)))
      }.reduce(_ unionAll _)
    }

  def writeOne(spark: SparkSession, df: DataFrame, dst: String, table: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dst).getFileSystem(conf)
    val stage = new Path(dst, s".stage_$table")
    df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = fs.globStatus(new Path(stage, "part-*.parquet"))(0).getPath
    val target = new Path(dst, s"$table.parquet")
    fs.delete(target, false)
    fs.rename(part, target)
    fs.delete(stage, true)
  }

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), periodicGC = "2min")
    spark.sparkContext.setLogLevel("WARN")
    val fs = new Path(dst).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(dst))
    for ((table, keys) <- KeyCols.toSeq.sortBy(_._1)) {
      val df = spark.read.parquet(s"$src/$table.parquet")
      val out = scaled(df, keys, factor)
      writeOne(spark, out, dst, table)
      println(s"[scale] $table: ${out.count()} rows -> $dst/$table.parquet")
    }
    spark.stop()
  }
}
