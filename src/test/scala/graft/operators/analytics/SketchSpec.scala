package graft.operators.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {

  test("HLL distinct counts within 5% of exact") {
    val approx = AnalyticsQueries.qSketchStats(spark, SfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.Tables.lineitem(spark, SfDir)
      .groupBy("l_returnflag").agg(countDistinct("l_partkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e).toDouble / e < 0.05,
        s"$k: approx=${approx(k)} exact=$e")
    }
  }

  test("merged per-source HLL sketches estimate the global distinct within 2%") {
    val row = AnalyticsQueries.qHllMerge(spark, SfDir).head()
    val exact = row.getAs[Long]("exact_total").toDouble
    val est = row.getAs[Long]("est_total").toDouble
    // doc_ids are disjoint across sources: the union must see them all
    assert(math.abs(est - exact) / exact < 0.02, s"est=$est exact=$exact")
    // sketch-of-union == union-of-sketches (the mergeability contract)
    val whole = graft.Tables.documents(spark, SfDir)
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(doc_id))"))
      .head().getLong(0).toDouble
    assert(math.abs(est - whole) / whole < 0.02, s"merged=$est whole=$whole")
  }

  test("approximate quantiles bracket the exact median") {
    val row = AnalyticsQueries.qSketchStats(spark, SfDir).head()
    val p50 = row.getAs[Double]("p50_price")
    val p95 = row.getAs[Double]("p95_price")
    assert(p50 > 0 && p95 > p50)
  }
}
