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

  test("approximate quantiles bracket the exact median") {
    val row = AnalyticsQueries.qSketchStats(spark, SfDir).head()
    val p50 = row.getAs[Double]("p50_price")
    val p95 = row.getAs[Double]("p95_price")
    assert(p50 > 0 && p95 > p50)
  }
}
