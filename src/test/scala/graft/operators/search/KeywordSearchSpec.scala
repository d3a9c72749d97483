package graft.operators.search

import graft.SparkSpec

class KeywordSearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "vector vector vector search index"),
    (2L, "vector search"),
    (3L, "spark shuffle join"),
    (4L, "unrelated words entirely different content here"),
    (5L, "a much longer document about many things with one vector mention plus padding padding padding padding padding")
  ).toDF("doc_id", "text")

  test("term-frequency and length normalization rank as BM25 should") {
    val r = KeywordSearch.bm25TopK(corpus, "doc_id", "text", Seq("vector"), 5)
      .collect().map(x => x.getLong(0) -> x.getDouble(1))
    val rank = r.map(_._1).toSeq
    // doc 1: highest tf; doc 2: same single term but shorter than doc 5
    assert(rank.take(3) == Seq(1L, 2L, 5L), s"got $rank")
    assert(r.forall(_._2 > 0))
    assert(r.length == 3, "docs without the term must not appear")
  }

  test("rarer terms get higher idf weight") {
    val docs = (Seq((10L, "rare common"), (11L, "common"), (12L, "common"))).toDF("doc_id", "text")
    val scores = KeywordSearch.bm25TopK(docs, "doc_id", "text", Seq("rare", "common"), 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(scores(10L) > scores(11L))
  }

  test("hybrid RRF: doc present in both rankings beats single-list docs") {
    val out = KeywordSearch.qHybridRrf(spark, SfDir).collect()
    assert(out.length == 10)
    val rrf = out.map(_.getDouble(1))
    assert(rrf.sliding(2).forall(p => p(0) >= p(1)))
    // max possible single-list contribution is 1/61; the top fused doc
    // must exceed it (i.e. appears in both lists)
    assert(rrf.head > 1.0 / 61 + 1e-9)
  }

  test("q_bm25 returns 10 ranked rows on the documents table") {
    val out = KeywordSearch.qBm25(spark, SfDir).collect()
    assert(out.length == 10)
    val s = out.map(_.getDouble(1))
    assert(s.sliding(2).forall(p => p(0) >= p(1)))
  }
}
