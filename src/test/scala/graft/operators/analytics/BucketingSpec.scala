package graft.operators.analytics

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("bucketed-by-key join plans with no shuffle Exchange") {
    val orders = Tables.orders(spark, SfDir)
      .select(col("o_orderkey"), col("o_orderdate"))
    val items = Tables.lineitem(spark, SfDir)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    Bucketing.saveBucketed(orders, "b_orders", "o_orderkey", 4)
    Bucketing.saveBucketed(items, "b_items", "o_orderkey", 4)
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_items", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // and it still computes the right thing
      val n = joined.count()
      val want = items.join(orders, Seq("o_orderkey")).count()
      assert(n == want)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_items")
    }
  }
}
