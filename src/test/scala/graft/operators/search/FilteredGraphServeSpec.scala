package graft.operators.search

import graft.SparkSpec

class FilteredGraphServeSpec extends SparkSpec {

  private lazy val out = FilteredGraphServe.qGraphFiltered(spark, SfDir).collect()
  private def arm(pred: String, strat: String) =
    out.find(r => r.getAs[String]("pred") == pred &&
      r.getAs[String]("strategy") == strat).get

  test("six arms, ranked recall in [0,1], widths within bounds, scored work positive") {
    assert(out.length === 6)
    out.foreach { r =>
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("beam_w") >= FilteredGraphServe.K)
      assert(r.getAs[Long]("n_match") > 0)
      assert(r.getAs[Long]("n_scored") > 0L)
    }
  }

  test("the adaptive width follows selectivity: narrower predicate -> wider post beam") {
    assert(arm("narrow", "post").getAs[Long]("beam_w") >
      arm("wide", "post").getAs[Long]("beam_w"))
  }

  test("crossover picks pre below 5% selectivity, post above") {
    assert(arm("narrow", "pre").getAs[String]("chosen") === "pre")
    assert(arm("wide", "pre").getAs[String]("chosen") === "post")
  }

  test("post-filter with adaptive over-fetch reaches serve-grade recall on both predicates") {
    // deg-20 graph + √n entries + adaptive width: 0.9024 / 0.9592 here
    assert(arm("wide", "post").getAs[Double]("recall") >= 0.85)
    assert(arm("narrow", "post").getAs[Double]("recall") >= 0.85)
  }

  test("the wide pre arm documents the filtered-subgraph connectivity failure") {
    // beams restricted to matching nodes strand on a label stratum whose
    // members are NOT each other's nearest neighbors — the 10-NN graph
    // has few matching-matching edges, so the walk can't reach most of
    // the exact filtered top-k. This row is the evidence the crossover
    // heuristic exists for.
    assert(arm("wide", "pre").getAs[Double]("recall") <
      arm("wide", "post").getAs[Double]("recall"))
  }

  test("acorn dominates at the narrow predicate: >= post recall at strictly less scored work") {
    // the verdict-item-3 law: connectivity-preserving pre-filter keeps
    // the full graph's reach (unlike pre) without post's adaptive
    // over-fetch scan, so at narrow selectivity it matches post's recall
    // class while scoring a fraction of the pairs
    val ac = arm("narrow", "acorn")
    val po = arm("narrow", "post")
    assert(ac.getAs[Double]("recall") >= po.getAs[Double]("recall"),
      s"acorn recall ${ac.getAs[Double]("recall")} < post ${po.getAs[Double]("recall")}")
    assert(ac.getAs[Long]("n_scored") <= po.getAs[Long]("n_scored"),
      s"acorn scored ${ac.getAs[Long]("n_scored")} > post ${po.getAs[Long]("n_scored")}")
  }

  test("acorn repairs the pre arm's stranding: wide-predicate recall strictly above pre's") {
    assert(arm("wide", "acorn").getAs[Double]("recall") >
      arm("wide", "pre").getAs[Double]("recall"))
  }
}
