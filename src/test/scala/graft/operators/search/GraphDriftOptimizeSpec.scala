package graft.operators.search

import graft.SparkSpec

/** Laws of the closed drift → optimize loop (q_graph_drift_optimize). */
class GraphDriftOptimizeSpec extends SparkSpec {

  private lazy val out = GraphDriftOptimize.qGraphDriftOptimize(spark, SfDir)
    .head()

  test("quiet case: zero growth stays under the bar; the boundary does not fire (strict >)") {
    // the gate loopState uses — a maintenance loop that fires on an
    // un-grown artifact would optimize in a steady state forever
    val (s0, f0) = GraphDriftOptimize.decide(0, 12345)
    assert(s0 === 0.0 && !f0, "zero growth fired the optimize loop")
    // share == bar exactly: strict comparison in BOTH engines, so the
    // boundary corpus reports the untouched artifact identically
    val (sB, fB) = GraphDriftOptimize.decide(1, 10)
    assert(sB === GraphDriftOptimize.ShareBar && !fB,
      s"share == bar fired the loop (share $sB)")
    assert(GraphDriftOptimize.decide(2, 10)._2, "2x-bar growth did not fire")
  }

  test("the planted append lifecycle fires the monitor and the optimize pass actually ran") {
    val (share, fired, gB, gA) = GraphDriftOptimize.loopState(spark, SfDir)
    assert(share > GraphDriftOptimize.ShareBar,
      s"planted 1/${GraphIndex.AppendMod} growth share $share under the bar")
    assert(fired, "loop did not fire on planted growth")
    // when fired the after-frame is the OPTIMIZED artifact, not the
    // appended one (the branch law; when not fired they are the same
    // reference by construction)
    assert(gA ne gB, "fired loop returned the untouched artifact")
  }

  test("the optimize pass recovers health: recall does not fall, report row is consistent") {
    assert(out.getAs[Boolean]("fired"))
    assert(out.getAs[Double]("app_share") > out.getAs[Double]("share_bar"))
    // GraphOptimize's monotone law through the loop: an exact top-K
    // member in a list can never be evicted by a descent round
    assert(out.getAs[Double]("recall_after") >= out.getAs[Double]("recall_before"),
      s"optimize lowered recall: ${out.getAs[Double]("recall_before")} -> " +
        s"${out.getAs[Double]("recall_after")}")
    assert(out.getAs[Long]("n_edges_before") > 0L)
    assert(out.getAs[Long]("n_edges_after") > 0L)
    assert(out.getAs[Double]("recip_before") > 0.0)
    assert(out.getAs[Double]("recip_after") > 0.0)
  }

  test("the after stats equal q_graph_optimize's optimized phase (shared artifact, no second pass)") {
    val opt = GraphOptimize.qGraphOptimize(spark, SfDir).collect()
      .find(_.getAs[String]("phase") == "optimized").get
    assert(out.getAs[Long]("n_edges_after") === opt.getAs[Long]("n_edges"))
    assert(out.getAs[Double]("recall_after") === opt.getAs[Double]("recall"))
    assert(out.getAs[Double]("recip_after") === opt.getAs[Double]("recip_share"))
  }
}
