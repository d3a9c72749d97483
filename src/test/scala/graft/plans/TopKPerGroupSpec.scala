package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKPerGroupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 20.0),
    ("b", 5L, 5.0), ("b", 6L, 1.0),
    ("c", 7L, 9.0)
  ).toDF("g", "id", "v")

  test("matches window row_number semantics including ties") {
    val custom = TopKPerGroup(df, Seq("g"), Seq("v", "id"), 2)
      .select("g", "id", "rk").collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy("v", "id")
    val win = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 2)
      .select("g", "id", "rk").collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(custom == win)
  }

  test("physical plan uses TopKPerGroupExec and no Sort") {
    val plan = TopKPerGroup(df, Seq("g"), Seq("v", "id"), 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan) // exec prints without the Exec suffix
    assert(!plan.toLowerCase.contains("sort ["), s"unexpected sort in:\n$plan")
  }

  test("groups smaller than k emit all rows; k bounds the rest") {
    val out = TopKPerGroup(df, Seq("g"), Seq("v", "id"), 2)
      .groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
  }

  test("survives multi-partition input") {
    val big = spark.range(0, 10000)
      .select((col("id") % 7).as("g"), col("id"), rand(42).as("v"))
      .repartition(13)
    val out = TopKPerGroup(big, Seq("g"), Seq("v", "id"), 5)
    assert(out.count() == 35)
    assert(out.groupBy("g").agg(max("rk")).collect().forall(_.getInt(1) == 5))
  }
}
