package graft.operators.analytics

import graft.SparkSpec
import graft.operators.sampling.SamplingQueries.prio
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkSpec {

  private lazy val distinctRows = KmvSketch.qKmvDistinct(spark, SfDir).collect()
  private lazy val quantRow = KmvSketch.qKmvQuantiles(spark, SfDir).head()

  test("KMV estimates land within the sketch's error envelope on every group") {
    assert(distinctRows.nonEmpty)
    distinctRows.foreach { r =>
      val est = r.getAs[Double]("est_distinct")
      val exact = r.getAs[Long]("exact_distinct").toDouble
      // σ ≈ exact/√(K−2) ≈ 12.7%; allow 4σ — a violated bound means the
      // hash is non-uniform or the order statistic is wrong, not luck.
      // Scope: holds for in-domain corpora (ids < SplitMod = 2^31−1,
      // true of every testdata key); the folded-domain law below pins
      // what happens beyond it
      assert(math.abs(est - exact) <= 4.0 * exact / math.sqrt(KmvSketch.K - 2.0),
        s"${r.getAs[String]("grp")}: est $est vs exact $exact")
    }
  }

  test("folded-domain precondition: ids beyond SplitMod estimate the residue-class count") {
    // the r13 advice scenario pinned as a law: prio folds v and
    // v + SplitMod into the SAME hash, so on a domain spanning the
    // modulus the estimator tracks the distinct-HASH count — half of
    // exact_distinct here — a documented bias OUTSIDE the 1/√K
    // envelope, not sampling error (see kmvDistinctFrom's precondition)
    import spark.implicits._
    import graft.operators.sampling.SamplingQueries.SplitMod
    val base = (1L to 500L)
    val vals = (base.map(v => ("folded", v)) ++
      base.map(v => ("folded", v + SplitMod))).toDF("grp", "v")
    val r = KmvSketch.kmvDistinctFrom(vals).collect()
      .filter(_.getAs[String]("grp") == "folded").head
    assert(r.getAs[Long]("exact_distinct") === 1000L)
    val est = r.getAs[Double]("est_distinct")
    // estimates the 500 residue classes, within THEIR 4σ envelope —
    // and therefore far below exact_distinct's
    assert(math.abs(est - 500.0) <= 4.0 * 500.0 / math.sqrt(KmvSketch.K - 2.0),
      s"folded-domain estimate $est should track the 500 residue classes")
    assert(est < 800.0, s"folded-domain estimate $est should undercount exact 1000")
  }

  test("a partial sketch (fewer than K distinct) reports the exact count") {
    // every test-corpus group holds > K distinct values, so this law
    // needs CONSTRUCTED groups: one far below K, one far above
    import spark.implicits._
    val vals = ((1L to 10L).map(v => ("small", v)) ++
      (1L to 500L).map(v => ("big", v + 1000000L))).toDF("grp", "v")
    val rows = KmvSketch.kmvDistinctFrom(vals).collect()
      .map(r => r.getAs[String]("grp") -> r).toMap
    val small = rows("small")
    assert(small.getAs[Long]("n_sketch") === 10L)
    assert(small.getAs[Double]("est_distinct") === 10.0,
      "partial sketch must report the exact count, not the estimator")
    val big = rows("big")
    assert(big.getAs[Long]("n_sketch") === KmvSketch.K.toLong)
    assert(big.getAs[Double]("est_distinct") !== big.getAs[Long]("exact_distinct").toDouble)
  }

  test("mergeability: the union-of-sketches cut equals the sketch built directly from all values") {
    // KMV's merge theorem: every member of the global bottom-K is in
    // its own group's bottom-K, so merging per-group sketches loses
    // nothing — the law that makes the sketch a distributed aggregate
    val vals = graft.Tables.orders(spark, SfDir)
      .select(col("o_orderpriority").as("grp"), col("o_custkey").as("v"))
      .distinct()
    val hd = vals.select(col("grp"), prio(col("v")).as("h")).distinct()
    val perGroup = graft.plans.TopKPerGroup(hd, Seq("grp"), Seq("h"), KmvSketch.K)
      .select(col("h")).distinct()
    val mergedCut = graft.plans.TopKPerGroup(
      perGroup.withColumn("g", lit(1)), Seq("g"), Seq("h"), KmvSketch.K)
      .select(col("h")).collect().map(_.getLong(0)).toSet
    val direct = graft.plans.TopKPerGroup(
      hd.select(col("h")).distinct().withColumn("g", lit(1)),
      Seq("g"), Seq("h"), KmvSketch.K)
      .select(col("h")).collect().map(_.getLong(0)).toSet
    assert(mergedCut === direct, "merged sketch diverged from the direct build")
  }

  test("hash-sample quantiles track the exact quantiles") {
    val n = quantRow.getAs[Long]("n_rows")
    assert(quantRow.getAs[Long]("n_sample") === math.min(n, KmvSketch.S.toLong))
    for (p <- Seq("p50", "p90", "p99")) {
      val s = quantRow.getAs[Long](s"sample_${p}_micro").toDouble
      val e = quantRow.getAs[Long](s"exact_${p}_micro").toDouble
      assert(math.abs(s - e) <= 0.15 * e, s"$p: sample $s vs exact $e")
    }
  }

  test("the sample is deterministic: re-running yields identical rows") {
    val again = KmvSketch.qKmvQuantiles(spark, SfDir).head()
    assert(again === quantRow)
  }
}
