package graft.operators.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = spark.range(0, 20000)
    .select(when(col("id") % 10 === 0, lit(1L)).otherwise(col("id") % 100).as("k"),
      col("id").as("v"))

  private lazy val dim = (0L until 100L).map(k => (k, s"name_$k")).toDF("k", "name")

  test("salted join equals plain join on skewed data") {
    val plain = skewed.join(dim, Seq("k"))
      .agg(count(lit(1)), sum("v")).head()
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), saltFactor = 8)
      .agg(count(lit(1)), sum("v")).head()
    assert(plain == salted)
  }

  test("salted join spreads the hot key over salt buckets") {
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.map(col).toIndexedSeq: _*), lit(8L)))
    val buckets = salted.filter(col("k") === 1L)
      .groupBy("__salt").count().count()
    assert(buckets > 4, s"hot key only landed in $buckets salt buckets")
  }

  test("skew-aware distinct count equals countDistinct") {
    val a = Skew.skewAwareDistinctCount(skewed, "k", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = skewed.groupBy("k").agg(countDistinct("v").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}
