package graft.operators.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphServeStreamSpec extends SparkSpec {

  private lazy val out = GraphServeStream.qGraphServeStream(spark, SfDir)
    .collect()

  test("every sampled query is served exactly top-K rows with contiguous ranks") {
    val qs = GraphServe.qsFor(spark, SfDir).count()
    val byQ = out.groupBy(_.getAs[Long]("q"))
    assert(byQ.size === qs, s"served ${byQ.size} queries, sample has $qs")
    byQ.foreach { case (q, rows) =>
      assert(rows.length === GraphServeStream.K, s"query $q served ${rows.length} rows")
      assert(rows.map(_.getAs[Int]("rk")).sorted.toSeq === (1 to GraphServeStream.K))
    }
  }

  test("micro-batched serve is row-identical to a direct batch serve over the same artifact") {
    val direct = GraphServeStream.batchServe(spark, SfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val streamed = out.map(r => (r.getAs[Long]("q"), r.getAs[Int]("rk"),
      r.getAs[Long]("node"), r.getAs[Double]("sim"))).toSet
    assert(streamed === direct,
      "batch-boundary placement changed served rows — per-query independence broken")
  }

  test("served neighbors never include the query point and agree with the serve's beam contract") {
    assert(out.forall(r => r.getAs[Long]("q") != r.getAs[Long]("node")))
    out.foreach(r => assert(r.getAs[Double]("sim") <= 1.000001))
  }

  test("batch-boundary independence: the 1-file-per-trigger staging serves rows identical to the single-batch query path") {
    // the semantics law the multi-trigger arm exists for — the QUERY
    // path runs one micro-batch (the r11 profile isolated the extra
    // trigger's cost as pure stream machinery), this arm proves the
    // boundary placement is invisible in the sink
    val split = GraphServeStream.serveStream(spark, SfDir, onePerTrigger = true)
      .collect().map(r => (r.getAs[Long]("q"), r.getAs[Int]("rk"),
        r.getAs[Long]("node"), r.getAs[Double]("sim"))).toSet
    val single = out.map(r => (r.getAs[Long]("q"), r.getAs[Int]("rk"),
      r.getAs[Long]("node"), r.getAs[Double]("sim"))).toSet
    assert(split === single,
      "batch-boundary placement changed served rows — per-query independence broken")
  }
}
