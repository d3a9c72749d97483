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

  /** Brute-force point-level DBSCAN (sklearn semantics, min-core-id
    * cluster labels) — the independent reference the contraction path is
    * proved against. */
  private def bruteDbscan(pts: Seq[(Long, Array[Double])], eps: Double,
                          minPts: Int): Map[Long, (Long, Boolean)] = {
    def d(a: Array[Double], b: Array[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val nbrs = pts.map { case (i, v) =>
      i -> pts.filter { case (j, w) => j != i && d(v, w) <= eps }.map(_._1)
    }.toMap
    val core = pts.collect {
      case (i, _) if nbrs(i).size + 1 >= minPts => i }.toSet
    var label = Map.empty[Long, Long]
    for (c <- core.toSeq.sorted if !label.contains(c)) {
      var comp = Set(c); var frontier = Set(c)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(x => nbrs(x).filter(core)).diff(comp)
        comp ++= frontier
      }
      val lbl = comp.min
      comp.foreach(x => label += x -> lbl)
    }
    pts.map { case (i, _) =>
      if (core(i)) i -> (label(i), true)
      else {
        val coreNb = nbrs(i).filter(core)
        i -> (if (coreNb.nonEmpty) (coreNb.map(label).min, false)
              else (-1L, false))
      }
    }.toMap
  }

  /** Exercises every contraction case: a group core purely from its own
    * copies (m ≥ minPts), a group core only WITH its copies' weight, a
    * singleton border adopting a duplicated core's cluster, a duplicated
    * pair below minPts with no neighbors (noise), a singleton noise
    * point, and two duplicated groups that are core only via each other. */
  private lazy val dupPts: Seq[(Long, Array[Double])] =
    (0L to 4L).map(i => (i, Array(0.0, 0.0))) ++
      Seq(10L, 11L).map(i => (i, Array(0.3, 0.0))) ++
      Seq((20L, Array(0.7, 0.0))) ++
      Seq(30L, 31L).map(i => (i, Array(10.0, 10.0))) ++
      Seq((40L, Array(20.0, 20.0))) ++
      Seq(50L, 51L).map(i => (i, Array(5.0, 5.0))) ++
      Seq(60L, 61L).map(i => (i, Array(5.3, 5.0)))

  test("duplicate contraction preserves exact labels vs a brute-force reference") {
    val df = dupPts.toDF("id", "vec")
    val want = bruteDbscan(dupPts, eps = 0.5, minPts = 4)
    val got = Dbscan.run(df, "id", "vec", eps = 0.5, minPts = 4,
        contract = Some(true))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // ...and the un-forced gate (size pre-gate rejects a toy frame) must
    // produce the same rows through the point-level path
    val ungated = Dbscan.run(df, "id", "vec", eps = 0.5, minPts = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(ungated == want, "point-level path diverges from brute force")
    assert(got == want,
      s"contracted labels diverge: ${got.toSeq.sortBy(_._1).diff(want.toSeq.sortBy(_._1))}")
    // sanity on the planted structure itself: the 5-copy group is core on
    // its own copies, the singleton at 0.7 is a border, the 2-copy group
    // at (10,10) is noise despite its duplicate
    assert(want(0L) == (0L, true) && want(20L)._2 == false &&
      want(20L)._1 == 0L && want(30L) == (-1L, false))
  }

  test("duplicate contraction: sweep rows equal brute-force per-eps aggregates") {
    val df = dupPts.toDF("id", "vec")
    val epsArms = Seq(0.2, 0.5, 1.0)
    val got = Dbscan.sweep(df, "id", "vec", epsArms, minPts = 4,
        contract = Some(true))
      .orderBy("eps").collect()
    epsArms.sorted.zip(got).foreach { case (eps, row) =>
      val ref = bruteDbscan(dupPts, eps, minPts = 4)
      val nClusters = ref.values.collect { case (cl, _) if cl >= 0 => cl }.toSet.size
      val nCore = ref.values.count(_._2)
      val nBorder = ref.values.count { case (cl, c) => !c && cl >= 0 }
      val nNoise = ref.values.count(_._1 == -1L)
      assert((row.getAs[Long]("n_clusters"), row.getAs[Long]("n_core"),
        row.getAs[Long]("n_border"), row.getAs[Long]("n_noise")) ==
        (nClusters.toLong, nCore.toLong, nBorder.toLong, nNoise.toLong),
        s"sweep arm eps=$eps diverges from brute force: $row vs " +
          s"($nClusters, $nCore, $nBorder, $nNoise)")
    }
  }

  test("contraction gate: size pre-gate rejects toy frames without a probe job") {
    // both frames are far below MinProbeBytes — the gate must say no
    // before ever running the duplicate-ratio probe
    assert(!Dbscan.shouldContract(dupPts.toDF("id", "vec"), "vec"),
      "a toy frame must not pass the size pre-gate")
    assert(!Dbscan.shouldContract(blobs, "vec"),
      "all-unique blobs must keep the point-level plan")
  }

  test("contractDups: rep is the group-min id, multiplicities sum to n") {
    val df = dupPts.toDF("id", "vec")
    val m = Dbscan.contractDups(df, "id", "vec")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(m.length == dupPts.size)
    assert(m.filter(_._1 < 5L).forall(t => t._2 == 0L && t._3 == 5L))
    assert(m.find(_._1 == 40L).get._2 == 40L)
    val groups = m.map(t => (t._2, t._3)).distinct
    assert(groups.map(_._2).sum == dupPts.size,
      "group multiplicities must partition the points")
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
