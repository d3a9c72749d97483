package graft.operators.search

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class FilteredAnnSpec extends SparkSpec {

  private lazy val indexPath = {
    val p = java.nio.file.Files.createTempDirectory("graft_fann").toString
    IvfIndex.build(spark, SfDir, p)
    p
  }
  private lazy val q: IndexedSeq[Double] = graft.Tables.headEmbeddingDouble(
    graft.Tables.embeddings(spark, SfDir).filter(col("vec_id") === 0))
  private lazy val qCol = array(q.map(v => lit(v)): _*)
  private def allCells: DataFrame =
    spark.read.parquet(s"$indexPath/data").filter(col("vec_id") > 0)

  private def ids(df: DataFrame): Seq[Long] =
    df.select("vec_id").collect().map(_.getLong(0)).toSeq

  test("pre-filter over ALL cells equals exact brute-force filtered top-k") {
    val pred = col("label") === 3
    val pre = FilteredAnn.preFilterTopK(allCells, pred, qCol, 10)
    val exact = graft.Tables.embeddings(spark, SfDir)
      .filter(col("vec_id") > 0 && pred)
      .select(col("vec_id"), round(
        graft.functions.VectorOps.cosine_sim(col("embedding"), qCol), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id")).limit(10)
    assert(ids(pre) === ids(exact))
  }

  test("post-filter with over-fetch = corpus size equals pre-filter") {
    val pred = col("label") === 3
    val n = allCells.count()
    val post = FilteredAnn.postFilterTopK(allCells, pred, qCol, 10, n)
    val pre = FilteredAnn.preFilterTopK(allCells, pred, qCol, 10)
    assert(ids(post) === ids(pre))
  }

  test("adaptive over-fetch: exact integer contract") {
    import FilteredAnn.adaptiveOverfetch
    // zero matches degrades to k
    assert(adaptiveOverfetch(10, 1000, 0) === 10L)
    // full selectivity needs exactly k
    assert(adaptiveOverfetch(10, 1000, 1000) === 10L)
    // 10% selectivity → 10×k
    assert(adaptiveOverfetch(10, 1000, 100) === 100L)
    // ceil-div, not floor: 999/100 → 10×k
    assert(adaptiveOverfetch(10, 999, 100) === 100L)
    // capped at the probe-set size
    assert(adaptiveOverfetch(10, 50, 1) === 50L)
    // monotone non-increasing in nMatch
    val fs = (1L to 200L).map(m => adaptiveOverfetch(10, 200, m))
    assert(fs.zip(fs.tail).forall { case (a, b) => a >= b })
  }

  test("overfetchLimit: Int-safe boundary — caps instead of wrapping negative") {
    import FilteredAnn.{adaptiveOverfetch, overfetchLimit}
    assert(overfetchLimit(40L) === 40)
    assert(overfetchLimit(Int.MaxValue.toLong) === Int.MaxValue)
    // a 10^11-row probe set with one match: the raw .toInt silently
    // truncates to an arbitrary (here ~100x too small, possibly negative)
    // limit; the cap saturates instead
    val huge = adaptiveOverfetch(10, 100000000000L, 1L)
    assert(huge > Int.MaxValue.toLong && huge.toInt.toLong != huge)
    assert(overfetchLimit(huge) === Int.MaxValue)
    // and at that selectivity the crossover long since picked `pre`
    assert(FilteredAnn.chooseStrategy(100000000000L, 1L) === "pre")
  }

  test("crossover heuristic flips at 5% selectivity, integer-exact") {
    import FilteredAnn.chooseStrategy
    assert(chooseStrategy(1000, 49) === "pre")
    assert(chooseStrategy(1000, 50) === "post") // 50·20 == 1000, not <
    assert(chooseStrategy(1000, 51) === "post")
  }

  test("the pre arm's scan carries BOTH the partition filter and the pushed predicate") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val cells = IvfIndex.rankCells(IvfIndex.readCentroids(spark, indexPath), q).take(2)
    val data = spark.read.parquet(s"$indexPath/data")
      .filter(col("cell").isin(cells: _*) && col("vec_id") > 0)
    val pre = FilteredAnn.preFilterTopK(data, col("label") === 3, qCol, 10)
    val scans = pre.queryExecution.executedPlan.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    val meta = scans.map(_.metadata).head
    assert(meta("PartitionFilters").contains("cell"),
      s"no cell partition filter: $meta")
    assert(meta("PushedFilters").contains("EqualTo(label,3)"),
      s"label predicate not pushed into the scan: $meta")
  }

  test("both strategies surface only predicate-matching rows, ranked") {
    val out = FilteredAnn.qAnnFiltered(spark, SfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Int]("label") == 3))
    // within each strategy, rk is 1..n and cos_sim non-increasing
    out.groupBy(_.getAs[String]("strategy")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rk"))
      assert(sorted.map(_.getAs[Int]("rk")).toSeq === (1 to rows.length))
      val sims = sorted.map(_.getAs[Double]("cos_sim")).toSeq
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
    // post is a fixed-over-fetch subset of pre's result set
    val byStrat = out.groupBy(_.getAs[String]("strategy"))
    val preIds = byStrat("pre").map(_.getAs[Long]("vec_id")).toSet
    assert(byStrat("post").map(_.getAs[Long]("vec_id")).forall(preIds.contains))
  }

  test("recall drill: post with adaptive over-fetch never trails pre by construction cap") {
    val out = FilteredAnn.qAnnFilteredRecall(spark, SfDir).collect()
    assert(out.length === 4)
    out.foreach { r =>
      val nProbed = r.getAs[Long]("n_probed")
      val of = r.getAs[Long]("overfetch")
      assert(of <= nProbed, s"over-fetch $of exceeds probe set $nProbed")
      val recall = r.getAs[Double]("recall")
      assert(recall >= 0.0 && recall <= 1.0)
      assert(Set("pre", "post").contains(r.getAs[String]("chosen")))
    }
    // when the adaptive over-fetch saturates to n_probed, post == pre recall
    out.groupBy(_.getAs[String]("pred")).foreach { case (_, rows) =>
      val byStrat = rows.map(r => r.getAs[String]("strategy") -> r).toMap
      if (byStrat("post").getAs[Long]("overfetch") ==
          byStrat("post").getAs[Long]("n_probed"))
        assert(byStrat("post").getAs[Double]("recall") ===
          byStrat("pre").getAs[Double]("recall"))
    }
  }
}
