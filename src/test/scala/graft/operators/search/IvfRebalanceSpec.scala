package graft.operators.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Artifact-level laws of [[IvfIndex.rebalance]] — the reindex-on-drift
  * operator q_ivf_rebalance drills. */
class IvfRebalanceSpec extends SparkSpec {

  private def queries =
    graft.Tables.embeddings(spark, SfDir).filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding"))

  private def serve(path: String): Set[(Long, Int, Long, Double)] =
    IvfIndex.probeBatch(spark, path, queries, "vec_id", "embedding", k = 10)
      .select(col("qid").cast("long"), col("rk").cast("int"),
        col("vec_id").cast("long"), col("cos_sim"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet

  test("probe-equality law: a rebalanced index serves exactly what a fresh build with the retrained quantizer serves") {
    val idx = java.nio.file.Files.createTempDirectory("graft_rebal_law").toString
    IvfIndex.build(spark, SfDir, idx)
    val ncs = IvfIndex.rebalance(spark, idx)
    val fresh = java.nio.file.Files.createTempDirectory("graft_rebal_fresh").toString
    IvfIndex.buildFrom(spark, graft.Tables.embeddings(spark, SfDir), fresh, ncs)
    assert(serve(idx) === serve(fresh),
      "rebalanced probeBatch diverged from a fresh build on the retrained centroids")
  }

  test("the retrain actually moves the quantizer: centroids change and some rows migrate") {
    val (pre, post) = IvfRebalance.prePost(spark, SfDir)
    val moved = pre
      .join(post.select(col("vec_id"), col("cell").as("cell_after")), Seq("vec_id"))
      .filter(col("cell") =!= col("cell_after")).count()
    assert(moved > 0, "one Lloyd step moved zero rows — the retrain is a no-op")
    // row conservation: rebalance relocates, never drops or duplicates
    assert(pre.count() === post.count())
    assert(post.select("vec_id").distinct().count() === post.count())
  }

  test("skew bar above the current max load factor is a no-op: persisted centroids returned, layout untouched") {
    val idx = java.nio.file.Files.createTempDirectory("graft_rebal_noop").toString
    IvfIndex.build(spark, SfDir, idx)
    val before = IvfIndex.readCentroids(spark, idx)
    val out = IvfIndex.rebalance(spark, idx, skewBar = 1e9)
    assert(out === before, "a under-bar rebalance replaced the centroids")
    assert(!new java.io.File(s"$idx/data_rebalancing").exists())
    assert(!new java.io.File(s"$idx/data_rebal_old").exists())
  }

  test("a second rebalance converges: re-running on the rebalanced index keeps a consistent, servable pair") {
    val idx = java.nio.file.Files.createTempDirectory("graft_rebal_retry").toString
    IvfIndex.build(spark, SfDir, idx)
    IvfIndex.rebalance(spark, idx)
    // the crash-retry contract: another full run (as after a crash
    // between the data swap and the centroid overwrite) must land on a
    // self-consistent (data, centroids) pair — every row's stored cell
    // is the argmin cell under the live centroids
    val ncs2 = IvfIndex.rebalance(spark, idx)
    val reassigned = spark.read.parquet(s"$idx/data")
      .withColumn("expect",
        graft.functions.NearestCentroid(
          graft.functions.VectorOps.vec_normalize(col("embedding")), ncs2)
          .getField("centroid_id"))
      .filter(col("cell") =!= col("expect")).count()
    assert(reassigned === 0, "a stored cell disagrees with the live quantizer")
  }
}
