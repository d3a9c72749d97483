package graft.operators.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup finds planted duplicates") {
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z")).toDF("doc_id", "text")
    val groups = docs.groupBy(md5($"text").as("h"))
      .agg(count(lit(1)).as("n_copies"), min($"doc_id").as("keeper"))
    val dups = groups.filter($"n_copies" > 1).collect()
    assert(dups.length == 1 && dups(0).getAs[Long]("keeper") == 1L)
  }

  test("jaccard: identical texts → 1.0, disjoint → 0.0") {
    val sh = DedupQueries.shingles(lit("a b c d e"))
    val self = spark.range(1).select(
      size(array_intersect(sh, sh)).cast("double")
        .divide(size(array_union(sh, sh))).as("j")).as[Double].head()
    assert(approx(self, 1.0))
    val sh2 = DedupQueries.shingles(lit("p q r s t"))
    val dis = spark.range(1)
      .select(size(array_intersect(sh, sh2)).cast("double").as("j")).as[Double].head()
    assert(approx(dis, 0.0))
  }

  test("shingles of short text are empty") {
    val n = spark.range(1).select(size(DedupQueries.shingles(lit("one two")))).as[Int].head()
    assert(n == 0)
  }
}
