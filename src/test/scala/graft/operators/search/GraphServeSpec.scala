package graft.operators.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphServeSpec extends SparkSpec {

  private lazy val served = GraphServe.beamRounds(spark, SfDir)
  private lazy val out = GraphServe.qGraphServe(spark, SfDir).collect()

  test("every beam round keeps at most Beam candidates per query and NEVER the query point itself") {
    val (beams, qs) = (served.beams, served.qs)
    val nq = qs.count()
    beams.foreach { b =>
      val rows = b.collect()
      assert(!rows.exists(r => r.getLong(0) == r.getLong(1)),
        "q-self entered a beam — the scored() node<>q exclusion is broken")
      val deg = rows.groupBy(_.getLong(0)).map(_._2.length)
      assert(deg.max <= GraphServe.Beam)
      assert(deg.size <= nq)
    }
  }

  test("beam membership only improves: per-query kept-candidate min sim never decreases once beams are full") {
    val beams = served.beams
    // The Beam-th best sim per query is monotone ONLY once every query's
    // pool holds >= Beam candidates: the descent's b0 can hold fewer
    // than Beam candidates per query (layer 1 is ~√n members, fewer
    // than the beam width at small corpora), so round 0->1 can
    // legitimately ADD lower-sim neighbors that reduce the kept min
    // (r9 advice — the earlier from-round-0 assertion passed by
    // order-statistic luck). Assert from the first round where every
    // query's beam is full; pools only grow after that, so fullness
    // persists.
    val fullFrom = beams.indexWhere { b =>
      b.groupBy("q").agg(count(lit(1)).as("n"))
        .agg(min("n")).head().getLong(0) >= GraphServe.Beam
    }
    assert(fullFrom >= 0 && fullFrom <= GraphServe.Rounds,
      s"no round ever filled every beam (fullFrom=$fullFrom)")
    val worst = beams.drop(fullFrom).map(b =>
      b.groupBy("q").agg(min(col("sim")).as("w"))
        .agg(sum(col("w").cast("decimal(25,6)")).cast("double")).head().getDouble(0))
    worst.zip(worst.tail).foreach { case (a, b) =>
      assert(b >= a - 1e-9, s"summed per-query worst sim fell: $worst")
    }
  }

  test("q_graph_serve reports monotone non-decreasing recall with bounded beams") {
    assert(out.map(_.getAs[Int]("round")).toSeq === (0 to GraphServe.Rounds))
    val recalls = out.map(_.getAs[Double]("recall")).toSeq
    recalls.zip(recalls.tail).foreach { case (a, b) =>
      assert(b >= a, s"recall fell across serve rounds: $recalls")
    }
    val nEval = out.head.getAs[Long]("n_eval")
    out.foreach { r =>
      assert(r.getAs[Long]("n_beam") <= nEval * GraphServe.Beam)
      assert(r.getAs[Long]("n_eval") === nEval)
    }
  }

  test("the serve reaches HNSW-deployment-grade recall by the final round") {
    // degree-20 build + √n upper-layer entries + beam 40 grade 0.9992
    // at this scale and ≥0.92 at sf0.1 — the ≥0.9 bar is the r10
    // verdict's done-criterion for the index the thesis optimizes
    assert(out.last.getAs[Double]("recall") >= 0.9,
      s"final serve recall ${out.last.getAs[Double]("recall")} — beam search is not finding the graph's neighborhoods")
  }

  test("q_beam_sweep: recall is monotone in the beam width and agrees with the round curve at the shared width") {
    val sweep = GraphServe.qBeamSweep(spark, SfDir).collect()
    assert(sweep.map(_.getAs[Int]("beam")).toSeq === GraphServe.SweepBeams)
    val recalls = sweep.map(_.getAs[Double]("recall")).toSeq
    recalls.zip(recalls.tail).foreach { case (a, b) =>
      assert(b >= a, s"recall fell as beam widened: $recalls")
    }
    // the beam=Beam sweep row IS the round curve's final row — same
    // graph, entries, query sample, and width, two independent gradings
    val atDefault = sweep.find(_.getAs[Int]("beam") == GraphServe.Beam).get
    val lastRound = out.last
    assert(atDefault.getAs[Double]("recall") === lastRound.getAs[Double]("recall"))
    assert(atDefault.getAs[Long]("n_beam") === lastRound.getAs[Long]("n_beam"))
  }

  test("the serve is deterministic: a fresh un-memoized replay produces identical final beams") {
    val a = served.beams.last.select("q", "node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = GraphServe.buildBeams(spark, SfDir, pin = false)
      .beams.last.select("q", "node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }

  test("n_scored accounting: entry descent is counted, positive, and bounded by the descent's own budget") {
    // round 0 = the whole hierarchical entry (layer-2 brute scores +
    // L1Rounds walk rounds); each later round = that round's scored
    // candidate pairs. All measured counts, not formulas.
    val nEval = served.qs.count()
    val entry = out.head.getAs[Long]("n_scored")
    assert(entry === served.entryScored)
    assert(entry > 0L)
    // upper bound: per query, either the whole layer 1 once (the brute
    // branch below L1BruteBar) or layer 2 whole plus at most all of
    // layer 1 PER walk round (rounds re-score already-seen nodes — the
    // pool dedups, the scoring stage does not) — and layer 1 is ~√n
    val (_, n1, m2, _) = GraphServe.l1Layer(spark, SfDir)
    assert(entry <= nEval * (m2.count() + math.max(1, GraphServe.L1Rounds) * n1),
      s"entry scored $entry exceeds the layer budget")
    out.tail.foreach { r =>
      assert(r.getAs[Long]("n_scored") > 0L)
    }
  }
}
