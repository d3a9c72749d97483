package graft.operators.clustering

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DbscanSpec extends SparkSpec {
  import spark.implicits._

  /** Two tight blobs + two isolated noise points in 2-D. */
  private lazy val blobs = {
    val b1 = (0 until 10).map(i => (i.toLong, Array(0.0 + i * 0.01, 0.0)))
    val b2 = (0 until 10).map(i => (100L + i, Array(5.0 + i * 0.01, 5.0)))
    val noise = Seq((500L, Array(20.0, 20.0)), (501L, Array(-20.0, 3.0)))
    (b1 ++ b2 ++ noise).toDF("id", "vec")
  }

  test("dbscan separates planted blobs and flags noise") {
    val r = Dbscan.run(blobs, "id", "vec", eps = 0.5, minPts = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val c1 = (0 until 10).map(i => r(i.toLong)).toSet
    val c2 = (0 until 10).map(i => r(100L + i)).toSet
    assert(c1.size == 1 && c2.size == 1, "each blob must be one cluster")
    assert(c1 != c2, "blobs must be distinct clusters")
    assert(c1.head == 0L && c2.head == 100L, "cluster id = min member id")
    assert(r(500L) == -1L && r(501L) == -1L, "isolated points are noise")
  }

  test("border points join a neighboring core's cluster") {
    // a chain: 3 core-capable points + 1 border at the end
    val chain = Seq(
      (0L, Array(0.0, 0.0)), (1L, Array(0.1, 0.0)), (2L, Array(0.2, 0.0)),
      (3L, Array(0.65, 0.0)) // within eps of 2 only → border
    ).toDF("id", "vec")
    val r = Dbscan.run(chain, "id", "vec", eps = 0.5, minPts = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getBoolean(2)))
    val byId = r.map(t => t._1 -> t).toMap
    assert(!byId(3L)._3 && byId(3L)._2 == 0L, s"border point should join cluster 0: ${r.toSeq}")
  }

  test("dbscan on embeddings returns a partition of all points") {
    val out = DbscanQueries.qDbscan(spark, SfDir)
    val n = out.agg(sum("n")).head().getLong(0)
    assert(n == graft.Tables.embeddings(spark, SfDir).count())
  }

  test("epsPairs is exact: equals brute-force pairs, plan has no nested-loop join") {
    val pts = graft.Tables.embeddings(spark, SfDir)
      .select(col("vec_id"), col("embedding")).limit(300).cache()
    val eps = 1.26
    val blocked = Dbscan.epsPairs(pts, "vec_id", "embedding", eps, salt = 8)
    assert(!blocked.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"),
      "pair stage must be an equi-join, not a nested-loop join")
    val a = pts.select(col("vec_id").as("i"), col("embedding").as("va"))
    val b = pts.select(col("vec_id").as("j"), col("embedding").as("vb"))
    val brute = a.join(b, col("i") =!= col("j"))
      .filter(graft.functions.VectorOps.euclidean_dist(col("va"), col("vb")) <= eps)
      .select("i", "j")
    val got = blocked.select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = brute.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"blocked pairs diverge: extra=${(got -- want).take(5)} missing=${(want -- got).take(5)}")
  }

  test("eps sweep: each row partitions n, looser eps never shrinks clusters' reach") {
    // blob spacing is 0.01: eps below it isolates everything
    val r = Dbscan.sweep(blobs, "id", "vec", epsList = Seq(0.005, 0.5, 100.0),
      minPts = 3).orderBy("eps").collect()
    assert(r.length == 3)
    val n = blobs.count()
    r.foreach { row =>
      val total = row.getAs[Long]("n_core") + row.getAs[Long]("n_border") +
        row.getAs[Long]("n_noise")
      assert(total == n, s"partition broken at eps=${row.getAs[Double]("eps")}")
    }
    // eps=0.05: nothing reaches minPts → all noise; eps=100: one giant cluster
    assert(r.head.getAs[Long]("n_noise") == n)
    assert(r.last.getAs[Long]("n_clusters") == 1 && r.last.getAs[Long]("n_noise") == 0)
    // at the matched run parameters the sweep row equals a standalone run
    // on every count — clusters, cores, borders, noise (the incremental
    // threshold-cut path vs the direct label pipeline)
    val single = Dbscan.run(blobs, "id", "vec", eps = 0.5, minPts = 3).cache()
    assert(r(1).getAs[Long]("n_noise") ==
      single.filter(col("cluster") === -1).count())
    assert(r(1).getAs[Long]("n_core") ==
      single.filter(col("is_core")).count())
    assert(r(1).getAs[Long]("n_border") ==
      single.filter(!col("is_core") && col("cluster") >= 0).count())
    assert(r(1).getAs[Long]("n_clusters") ==
      single.filter(col("cluster") >= 0).select("cluster").distinct().count())
  }
}
