package graft.operators.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again tomorrow"),
    (3L, "completely unrelated text about spark catalyst expressions and shuffles here"),
    (4L, "another disjoint document mentioning parquet scans predicate pushdown and codegen")
  ).toDF("doc_id", "text")

  test("minhash finds the planted near-dup pair and nothing else") {
    val pairs = MinHashLsh.nearDupPairs(base, minJaccard = 0.5).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(pairs.head.getAs[Double]("jaccard") > 0.5)
  }

  test("mega-bucket guard drops boilerplate-flooded bands") {
    // 30 identical docs share EVERY band: with the cap below 30 the
    // boilerplate flood produces no candidate pairs; the genuine near-dup
    // pair (1,2) survives because its buckets stay small
    val flood = (100L until 130L)
      .map(i => (i, "identical boilerplate header shared by every crawled page in the batch"))
      .toDF("doc_id", "text").unionByName(base)
    val capped = MinHashLsh.nearDupPairs(flood, minJaccard = 0.5, maxBandBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L)), s"expected only the genuine pair: $capped")
    // with the cap above the flood size, the boilerplate pairs come back
    val uncapped = MinHashLsh.nearDupPairs(flood, minJaccard = 0.5, maxBandBucket = 100)
      .count()
    assert(uncapped > 400, s"uncapped flood should pair n*(n-1)/2 + 1: $uncapped")
  }

  test("dedup groups are transitive with a min-id canonical doc") {
    // 1~2 and 2~5 near-dups but 1~5 may never pair directly: one group {1,2,5}
    val chained = base.unionByName(Seq(
      (5L, "the quick brown fox jumps over the lazy dog again and again yesterday")
    ).toDF("doc_id", "text"))
    val pairs = MinHashLsh.nearDupPairs(chained, minJaccard = 0.5)
    val groups = graft.operators.clustering.ConnectedComponents
      .run(pairs, "d1", "d2")
      .groupBy(col("component")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups == Map(1L -> 3L), s"expected one group {1,2,5}: $groups")
    assert(MinHashLsh.qDedupGroups(spark, SfDir).count() >= 20)
  }

  test("word hashes run over Unicode code points (oracle ord() semantics)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // expected value = the same fold DuckDB's list_reduce/ord replay
    // computes (cross-checked externally): non-ASCII must not diverge
    val M = 2147483647L
    val expected = "café".codePoints().toArray
      .foldLeft(0L)((h, c) => (h * 127 + c) % M)
    val got = Seq(Tuple1("café")).toDF("text")
      .select(explode(graft.functions.ShingleHashes(col("text"), 1)).as("h"))
      .head().getLong(0)
    assert(got == expected, s"code-point hash mismatch: $got vs $expected")
  }

  test("minhash signature is deterministic") {
    val s1 = MinHashLsh.signatures(base).orderBy("doc_id").collect().map(_.toSeq)
    val s2 = MinHashLsh.signatures(base).orderBy("doc_id").collect().map(_.toSeq)
    assert(s1.toSeq == s2.toSeq)
  }

  test("simhash: identical docs at hamming 0, near docs close, disjoint docs blocked or far") {
    val withCopy = base.unionByName(Seq((5L, "the quick brown fox jumps over the lazy dog again and again today"))
      .toDF("doc_id", "text"))
    val pairs = SimHash.nearDupPairs(withCopy)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Int]("hamming"))).toMap
    assert(pairs.get((1L, 5L)).contains(0), s"exact copy must be hamming 0: $pairs")
    assert(!pairs.contains((3L, 4L)), "disjoint docs must not pass the hamming filter")
  }

  test("sketch aggregate equals the 64-column signature form") {
    val viaCols = MinHashLsh.signatures(base).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (1 to MinHashLsh.NumHashes).map(i => r.getLong(i)).toSeq).toMap
    val viaSketch = MinHashLsh.signatureSketches(MinHashLsh.shingleHashes(base))
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(viaCols == viaSketch)
  }

  test("simhash sketch aggregate equals the 64-column vote form") {
    val viaCols = SimHash.simhashesViaColumns(base).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaSketch = SimHash.simhashes(base).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaCols == viaSketch)
  }

  test("planted dups on real documents produce candidates") {
    assert(MinHashLsh.qDedupMinhash(spark, SfDir).count() >= 20)
    assert(SimHash.qDedupSimhash(spark, SfDir).count() >= 1)
  }
}
