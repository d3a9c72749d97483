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

  // --- exact-duplicate contraction: output-identical to the uncontracted
  // pipeline on duplicate-heavy corpora (the r11 100x probe shape) ---

  private def dupCorpus = {
    // mixed multiplicities: doc 1 x4 exact copies, doc 3 x3, the near-dup
    // pair 1~2 crossing a copy group, and untouched singletons
    val copies = Seq(
      (101L, 1L), (102L, 1L), (103L, 1L), (301L, 3L), (302L, 3L)
    ).toDF("doc_id", "src")
    base.unionByName(
      copies.join(base.withColumnRenamed("doc_id", "src"), Seq("src"))
        .select(col("doc_id"), col("text")))
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getAs[Double]("jaccard"))).toSet

  test("contracted pipeline emits the exact uncontracted pair list on a duplicated corpus") {
    val plain = pairSet(MinHashLsh.nearDupPairs(dupCorpus, minJaccard = 0.5))
    val contracted = pairSet(MinHashLsh.expandPairs(
      MinHashLsh.contractedPipeline(dupCorpus, minJaccard = 0.5)))
    assert(contracted == plain,
      s"missing=${plain -- contracted} extra=${contracted -- plain}")
    // sanity: duplication actually creates within-group 1.0 pairs
    assert(plain.exists(_._3 == 1.0), s"expected exact-copy pairs: $plain")
  }

  test("contracted components equal CC over the uncontracted pairs") {
    val plain = graft.operators.clustering.ConnectedComponents
      .run(MinHashLsh.nearDupPairs(dupCorpus, minJaccard = 0.5), "d1", "d2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val contracted = MinHashLsh.expandComponents(
      MinHashLsh.contractedPipeline(dupCorpus, minJaccard = 0.5))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(contracted == plain)
    // the copy group {1,101,102,103} must merge with near-dup 2 and 5-free
    assert(plain(102L) == 1L && plain(2L) == 1L)
  }

  test("simhash contraction emits the exact uncontracted pair list") {
    def hs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val plain = hs(SimHash.nearDupPairs(dupCorpus))
    val contracted = hs(SimHash.contractedPairs(dupCorpus))
    assert(contracted == plain,
      s"missing=${plain -- contracted} extra=${contracted -- plain}")
    // duplication creates hamming-0 within-group pairs
    assert(plain.exists(_._3 == 0), s"expected exact-copy pairs: $plain")
  }

  test("contracted band guard weighs buckets by copy multiplicity") {
    // 30 identical docs = ONE rep with w=30: the weighted guard must see
    // bucket load 30 > cap 10 and drop the flood exactly like the
    // uncontracted pipeline (which sees 30 distinct rows per bucket)
    val flood = (100L until 130L)
      .map(i => (i, "identical boilerplate header shared by every crawled page in the batch"))
      .toDF("doc_id", "text").unionByName(base)
    val capped = pairSet(MinHashLsh.expandPairs(
      MinHashLsh.contractedPipeline(flood, minJaccard = 0.5, maxBandBucket = 10)))
    assert(pairSet(MinHashLsh.nearDupPairs(flood, minJaccard = 0.5,
      maxBandBucket = 10)) == capped)
    assert(capped.map(p => (p._1, p._2)) == Set((1L, 2L)),
      s"flood must be guard-dropped in the contracted pipeline too: $capped")
    // above the flood size both pipelines re-admit the 435 exact pairs
    val uncapped = pairSet(MinHashLsh.expandPairs(
      MinHashLsh.contractedPipeline(flood, minJaccard = 0.5, maxBandBucket = 100)))
    assert(uncapped == pairSet(MinHashLsh.nearDupPairs(flood, minJaccard = 0.5,
      maxBandBucket = 100)))
    assert(uncapped.size > 400)
  }
}
