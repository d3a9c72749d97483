package graft.operators.search

import graft.SparkSpec

class GraphSqServeSpec extends SparkSpec {

  private lazy val out = GraphSqServe.qGraphSqServe(spark, SfDir).collect()
  private def arm(name: String) = out.find(_.getAs[String]("arm") == name).get

  test("three arms on one shared eval sample, recalls in [0,1]") {
    assert(out.map(_.getAs[String]("arm")).toSeq ===
      Seq("float_beam", "sq_beam", "sq_rerank"))
    val nev = out.map(_.getAs[Long]("n_eval")).distinct
    assert(nev.length === 1 && nev.head > 0)
    out.foreach { r =>
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
    }
  }

  test("exact rerank never loses to the raw quantized ranking") {
    // the rerank re-orders the SAME candidate set with exact sims; with
    // k <= beam it can only promote true members into the top-k
    assert(arm("sq_rerank").getAs[Double]("recall") >=
      arm("sq_beam").getAs[Double]("recall"))
  }

  test("compress-then-refine recovers the float serve's recall class") {
    val f = arm("float_beam").getAs[Double]("recall")
    val rr = arm("sq_rerank").getAs[Double]("recall")
    assert(rr >= f - 0.05,
      s"sq+rerank $rr trails float serve $f — the 4x storage cut is not free here")
  }
}
