package graft.operators.text

import graft.SparkSpec

class TfIdfPiiSpec extends SparkSpec {

  test("q_tfidf: 3 ranked terms per doc, tf/df positive, score consistent") {
    val rows = TfIdfQueries.qTfidf(spark, SfDir).collect()
    assert(rows.nonEmpty && rows.length % 3 == 0)
    val n = graft.Tables.documents(spark, SfDir).count()
    rows.foreach { r =>
      val (tf, df, tfidf) = (r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(tf >= 1 && df >= 1 && df <= n)
      val expect = tf * (math.log((1.0 + n) / (df + 1.0)) + 1.0)
      assert(approx(tfidf, math.rint(expect * 1e6) / 1e6, 2e-6))
    }
    // ranks descend within a doc
    rows.grouped(3).foreach { g =>
      assert(g.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
      assert(g(0).getDouble(5) >= g(1).getDouble(5)
        && g(1).getDouble(5) >= g(2).getDouble(5))
    }
  }

  test("q_vocab_top: df never exceeds doc count and never increases down the list") {
    val rows = TfIdfQueries.qVocabTop(spark, SfDir).collect()
    assert(rows.nonEmpty)
    val n = graft.Tables.documents(spark, SfDir).count()
    rows.foreach(r => assert(r.getLong(1) >= 1 && r.getLong(1) <= n
      && r.getLong(2) >= r.getLong(1)))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(1) >= b.getLong(1))
    case _ => () }
  }

  test("q_unigram_logprob: scores positive, bounded by the rarest word, tokens conserved") {
    val rows = TfIdfQueries.qUnigramLogprob(spark, SfDir).collect()
    assert(rows.nonEmpty)
    val total = graft.Tables.documents(spark, SfDir)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.trim(
            org.apache.spark.sql.functions.lower(
              org.apache.spark.sql.functions.col("text"))), "\\s+")))
      .count()
    val maxNll = -math.log(1.0 / total) // a hapax is the rarest possible word
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      val s = r.getDouble(2)
      assert(s > 0 && s <= maxNll + 1e-6, s"score $s out of (0, $maxNll]")
    }
  }

  test("bigram model: conditional probabilities sum to 1 per head; " +
      "hand-computed score on a tiny corpus") {
    import spark.implicits._
    // corpus: "a b a b" and "a c" → bigrams: (a,b)x2, (b,a)x1, (a,c)x1
    // heads: a->3, b->1. p(b|a)=2/3, p(a|b)=1, p(c|a)=1/3
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = graft.operators.text.TfIdfQueries
      .bigramScores(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    def r6(d: Double) = java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val d1 = (r6(-math.log(2.0 / 3)) * 2 + r6(-math.log(1.0))) / 3
    val d2 = r6(-math.log(1.0 / 3))
    assert(approx(out(0).getDouble(2), r6(d1), 1e-9), s"${out(0)}")
    assert(out(0).getLong(1) == 3)
    assert(approx(out(1).getDouble(2), r6(d2), 1e-9), s"${out(1)}")
    // single-token / empty docs drop out rather than divide by zero
    val none = graft.operators.text.TfIdfQueries
      .bigramScores(Seq((9L, "solo")).toDF("doc_id", "text"), "doc_id", "text")
      .count()
    assert(none == 0)
  }

  test("q_pii_redact: planted counts recovered exactly, nothing left behind") {
    val rows = PiiRedact.qPiiRedact(spark, SfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == id % 3 + 1, s"doc $id emails")
      // doc 0 repeats its ref- block 0 times; every other planted number
      // (doc_id*7919, doc_id>=1) has >= 4 digits and is matched
      assert(r.getLong(2) == id % 4, s"doc $id numbers")
      assert(r.getLong(3) > 0 && r.getString(4).length == 32)
    }
    // redaction is idempotent: redacting the redacted text changes nothing
    import org.apache.spark.sql.functions._
    val redactedOnce = graft.Tables.documents(spark, SfDir)
      .filter(col("doc_id") < 500)
      .select(regexp_replace(regexp_replace(
        concat(col("text"), lit(" user-7@example.com ref-55433 ")),
        PiiRedact.EmailRe, "<EMAIL>"), PiiRedact.LongNumRe, "<NUM>").as("r"))
    val changed = redactedOnce.filter(
      regexp_replace(regexp_replace(col("r"), PiiRedact.EmailRe, "<EMAIL>"),
        PiiRedact.LongNumRe, "<NUM>") =!= col("r")).count()
    assert(changed == 0)
  }
}
