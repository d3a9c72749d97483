package graft.operators.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextQueriesSpec extends SparkSpec {

  test("chunking covers the document with stride 32 / window 48") {
    val ch = TextQueries.qChunking(spark, SfDir)
    val doc0 = ch.filter(col("doc_id") === 0).collect()
    assert(doc0.nonEmpty)
    // every chunk except possibly the tail has length 48
    val lens = doc0.map(_.getAs[Int]("chunk_len"))
    assert(lens.init.forall(_ == 48))
    // starts advance by the stride
    assert(doc0.map(_.getAs[Long]("chunk_idx")).toSeq == doc0.indices.map(_.toLong))
  }

  test("lang_id scores are consistent with prediction") {
    val r = TextQueries.qLangId(spark, SfDir).collect()
    r.foreach { row =>
      val scores = Map(
        "de" -> row.getAs[Int]("s_de"), "en" -> row.getAs[Int]("s_en"),
        "es" -> row.getAs[Int]("s_es"), "fr" -> row.getAs[Int]("s_fr"))
      val pred = row.getAs[String]("pred_lang")
      assert(scores(pred) == scores.values.max)
    }
  }

  test("quality_score within [0,1]") {
    val bad = TextQueries.qQualityScore(spark, SfDir)
      .filter(col("quality_score") < 0 || col("quality_score") > 1).count()
    assert(bad == 0)
  }

  test("repetition stats: ratios bounded, top word dominates its share") {
    val r = TextQueries.qRepetition(spark, SfDir)
    assert(r.filter(col("n_distinct") > col("n_words")).count() == 0)
    assert(r.filter(col("distinct_ratio") <= 0 || col("distinct_ratio") > 1).count() == 0)
    // top_frac >= 1/n_distinct (the mode is at least the mean share) and <= 1;
    // round(frac, 6) can shave up to 5e-7 * n_distinct off the product
    assert(r.filter(col("top_frac") * col("n_distinct") < 1.0 - 1e-3).count() == 0)
    assert(r.filter(col("top_frac") > 1).count() == 0)
    // token totals agree with the token-count query's whitespace counter
    val mismatch = r.join(TextQueries.qTokenCount(spark, SfDir), "doc_id")
      .filter(col("n_words") =!= col("n_ws_tokens")).count()
    assert(mismatch == 0)
  }

  test("per-language quality filter keeps roughly half of each language at its own median") {
    val rows = TextQueries.qLangQualityFilter(spark, SfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lang, n, kept) = (r.getString(0), r.getLong(1), r.getLong(3))
      // median-disc cut: at least half survives (>=), never everything
      // unless all scores tie
      assert(kept * 2 >= n, s"$lang: kept $kept of $n — below its own median?")
      assert(kept <= n)
    }
    // thresholds must differ across languages (the point of stratification)
    assert(rows.map(_.getDouble(2)).distinct.length > 1,
      "all language thresholds identical — stratification is a no-op")
  }

  test("source report card: totals reconcile with the corpus") {
    val rows = TextQueries.qSourceReport(spark, SfDir).collect()
    val docs = graft.Tables.documents(spark, SfDir)
    assert(rows.map(_.getLong(1)).sum == docs.count(), "n_docs must cover the corpus")
    assert(rows.map(_.getLong(3)).sum ==
      docs.agg(org.apache.spark.sql.functions.sum("n_chars")).head().getLong(0))
    rows.foreach { r =>
      assert(r.getLong(6) <= r.getLong(1), "above-bar count bounded by doc count")
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0, "quality is a [0,1] blend")
    }
  }
}
