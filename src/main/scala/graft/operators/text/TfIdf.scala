package graft.operators.text

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term weighting over the documents corpus (SURVEY §2 "Text
  * analysis" — the classic retrieval/corpus-statistics operator the
  * reference's keyword scoring builds on; same smooth-idf formula as
  * sklearn's TfidfVectorizer: idf = ln((1+N)/(1+df)) + 1).
  *
  * Scale shape: tokenize is a map over the scan; tf is one shuffle on
  * (doc_id, term); df is one shuffle on term over the already-reduced
  * (doc, term) pairs — both are partial-aggregated map-side. The df join
  * is vocab×1 row and shuffles on term. Nothing driver-side.
  *
  * Ranking determinism: ln() differs in the last ulp across engines, so
  * per-doc ranking happens on the ROUNDED score (round 6; exactly equal
  * cross-engine) with the term as tiebreak — never on the raw double.
  */
object TfIdfQueries extends QueryModule {

  /** Non-empty lowercase whitespace tokens of any (id, text) frame — THE
    * tokenizer for this family, shared with the Graft facade so the regex
    * and formulas can't drift between the two. */
  def tokensOf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      explode(filter(split(trim(lower(col(textCol))), TextQueries.WsRe),
        w => length(w) > 0)).as("term"))

  private def tokens(spark: SparkSession, dir: String): DataFrame =
    tokensOf(Tables.documents(spark, dir), "doc_id", "text")

  /** Top-k TF-IDF terms per document of any (id, text) frame, with the
    * corpus-wide df each weight came from (sklearn smooth-idf; ranking on
    * the ROUNDED score so cross-engine ln() ulps can't flip ranks).
    * `probe` restricts which documents are SCORED — df/N always come from
    * the whole frame — and is applied before the join so the scored side
    * stays small. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    topK: Int = 3,
                    probe: org.apache.spark.sql.Column = lit(true)): DataFrame = {
    val n = docs.count()
    val tf = tokensOf(docs, idCol, textCol).groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    tf.filter(probe)
      .join(df, Seq("term"))
      .withColumn("tfidf",
        round(col("tf") * (log((lit(1.0) + n) / (col("df") + lit(1.0))) + lit(1.0)), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col("doc_id").as(idCol), col("rk").cast("long").as("rk"), col("term"),
        col("tf"), col("df"), col("tfidf"))
  }

  /** Top-3 TF-IDF terms per document (doc_id < 500), with the corpus-wide
    * df each weight came from. */
  def qTfidf(spark: SparkSession, dir: String): DataFrame =
    tfidfTopTerms(Tables.documents(spark, dir), "doc_id", "text", 3,
      probe = col("doc_id") < 500)
      .orderBy("doc_id", "rk")

  /** Corpus vocabulary head: the 50 highest-df terms with collection
    * frequency — the stopword-discovery / vocab-pruning primitive. */
  def qVocabTop(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(spark, dir)
    toks.groupBy("term")
      .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("cf"))
      .orderBy(col("df").desc, col("cf").desc, col("term"))
      .limit(50)
  }

  /** Unigram log-probability quality score — the perplexity-proxy filter
    * LLM pipelines run before training (docs whose words are corpus-rare
    * score high): score(d) = mean over tokens of −ln(cf(w)/T), cf = corpus
    * collection frequency, T = total tokens. One cf shuffle + one term
    * join + one per-doc agg; no OOV (cf ≥ 1 by construction). Ranking /
    * filtering downstream happens on the rounded score. */
  def unigramScores(docs: DataFrame, idCol: String, textCol: String,
                    probe: org.apache.spark.sql.Column = lit(true)): DataFrame = {
    val toks = tokensOf(docs, idCol, textCol)
    val cf = toks.groupBy("term").agg(count(lit(1)).as("cf"))
    val total = toks.count()
    // per-token nll is ROUNDED to 6 then decimal-summed: ln() is cross-
    // engine bit-identical but avg(double) is partition-order-dependent —
    // the same boundary-flake class the covariance fix closed (decimal
    // sums of rounded terms are order-free and engine-exact)
    toks.filter(probe)
      .join(cf, Seq("term"))
      .withColumn("nll6",
        round(-log(col("cf").cast("double") / lit(total.toDouble)), 6)
          .cast("decimal(25,6)"))
      .groupBy(col("doc_id").as(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("nll6")).cast("double") / count(lit(1)), 6)
          .as("mean_neg_logprob"))
  }

  def qUnigramLogprob(spark: SparkSession, dir: String): DataFrame =
    unigramScores(Tables.documents(spark, dir), "doc_id", "text",
      probe = col("doc_id") < 500)
      .orderBy("doc_id")

  /** Bigram conditional log-prob quality score — the step past the
    * unigram proxy towards a real LM filter (CCNet-style): score(d) =
    * mean over adjacent token pairs of −ln(c(w1,w2)/c(w1·)), with c(w1·)
    * the bigram-HEAD count (doc-final tokens head nothing, so the
    * conditional sums to 1 per head — a proper MLE bigram model).
    * Bigram expansion is MAP-SIDE (array transform over the split, no
    * shuffle); counts are two partial-agg shuffles; docs with < 2 tokens
    * have no bigrams and drop out on both engines identically. Per-pair
    * nll is rounded then decimal-summed (the order-free mean pattern). */
  def bigramScores(docs: DataFrame, idCol: String, textCol: String,
                   probe: org.apache.spark.sql.Column = lit(true)): DataFrame = {
    val bg = docs
      .select(col(idCol).as("doc_id"),
        filter(split(trim(lower(col(textCol))), TextQueries.WsRe),
          w => length(w) > 0).as("ws"))
      .filter(size(col("ws")) > 1)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(ws) - 1),
          |  i -> named_struct('w1', ws[i-1], 'w2', ws[i]))""".stripMargin)).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
    bg.filter(probe)
      .join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .withColumn("nll6",
        round(-log(col("c2").cast("double") / col("c1")), 6).cast("decimal(25,6)"))
      .groupBy(col("doc_id").as(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("nll6")).cast("double") / count(lit(1)), 6)
          .as("mean_bigram_nll"))
  }

  def qBigramLogprob(spark: SparkSession, dir: String): DataFrame =
    bigramScores(Tables.documents(spark, dir), "doc_id", "text",
      probe = col("doc_id") < 500)
      .orderBy("doc_id")

  /** Counter budget of the heavy-hitters sketch; at 100 TB this scales
    * with the tolerable error n/(budget+1), like IVF cell counts. */
  val HhBudget = 64

  /** Heavy hitters via a MERGEABLE Misra-Gries sketch + exact verify —
    * the frequent-items member of the sketch family (q_sketch_stats /
    * q_hll_merge are the distinct-count/quantile members): one
    * [[graft.functions.MisraGriesSketch]] aggregation summarizes the
    * token stream into ≤ [[HhBudget]] counters (map-side partials, each
    * shuffle carries one budget-sized sketch per partition — never a
    * corpus-sized term shuffle), then the sketch's candidate terms get
    * EXACT counts from a broadcast-semi-joined groupBy and the top 10 by
    * exact count are emitted. MG guarantees every term with count >
    * n_tokens/(budget+1) survives in the sketch for ANY order/partition
    * split, so whenever the 10th-ranked term clears that margin (spec-
    * asserted for the test corpora; the production knob is the budget)
    * the output is deterministic and equals the plain exact top-10 — the
    * oracle — even though the sketch's internal estimates are not. Same
    * verify-after-sketch shape as q_bloom_dedup. */
  def qHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(spark, dir)
    val cands = toks.agg(graft.functions.MisraGries(col("term"), HhBudget).as("sk"))
      .select(explode(col("sk")).as("s"))
      .select(col("s.term").as("term"))
    exactTopWithMarginGuard(toks.sparkSession, toks, cands)
  }

  /** Exact-verify step shared by q_heavy_hitters and q_hh_stream: exact
    * counts for the sketch's candidate terms, top 10 emitted. The output
    * equals the exact top-10 oracle only while the 10th-ranked count
    * clears the MG survival margin n_tokens/(budget+1); that margin is a
    * property of the corpus and the budget knob, not of the arithmetic —
    * so it is ASSERTED here, making a too-small-budget configuration
    * fail loudly at the source instead of surfacing as an inscrutable
    * driver hash mismatch. One vocab-sized persist lets the n_tokens sum
    * and the candidate join share a single tokenization pass. */
  private[graft] def exactTopWithMarginGuard(
      spark: SparkSession, toks: DataFrame, cands: DataFrame): DataFrame = {
    val exact = toks.groupBy("term").agg(count(lit(1)).as("cf")).persist()
    try {
      val top = exact.join(broadcast(cands), Seq("term"))
        .orderBy(col("cf").desc, col("term"))
        .limit(10)
      val rows = top.collect() // ≤10 rows
      val nTokens = exact.agg(sum(col("cf"))).head().getLong(0)
      if (rows.length == 10) {
        val tenth = rows.last.getLong(1)
        val margin = nTokens / (HhBudget + 1L)
        require(tenth > margin,
          s"heavy-hitters margin violated: 10th-ranked exact count $tenth " +
            s"<= n_tokens/(budget+1) = $margin — the MG sketch no longer " +
            s"guarantees the exact top-10 on this corpus; raise HhBudget")
      }
      import spark.implicits._
      rows.map(r => (r.getString(0), r.getLong(1))).toSeq
        .toDF("term", "cf")
        .orderBy(col("cf").desc, col("term"))
    } finally { exact.unpersist(); () }
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tfidf" -> (qTfidf _),
    "q_vocab_top" -> (qVocabTop _),
    "q_unigram_logprob" -> (qUnigramLogprob _),
    "q_bigram_logprob" -> (qBigramLogprob _),
    "q_heavy_hitters" -> (qHeavyHitters _))

  override def oracles: Map[String, String] = Map(
    // the sketch is a guaranteed-superset candidate generator, so the
    // exact-verified top-10 equals the plain exact top-10 (margin
    // n/(budget+1) < cf_10 asserted in MisraGriesSpec)
    "q_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(
        |    string_split_regex(trim(lower(text)), '[ \t\n\r\f\x0B]+'),
        |    w -> len(w) > 0)) AS term
        |  FROM documents)
        |SELECT term, CAST(count(*) AS BIGINT) AS cf FROM toks
        |GROUP BY term ORDER BY cf DESC, term LIMIT 10""".stripMargin,
    "q_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(trim(lower(text)), '[ \t\n\r\f\x0B]+'), w -> len(w) > 0)) AS term
        |  FROM documents),
        |n AS (SELECT count(*) AS n FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    round(tf.tf * (ln((1.0 + n.n) / (df.df + 1.0)) + 1.0), 6) AS tfidf
        |  FROM tf JOIN df USING (term) CROSS JOIN n
        |  WHERE tf.doc_id < 500),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY tfidf DESC, term) AS rk
        |  FROM scored)
        |SELECT doc_id, CAST(rk AS BIGINT) AS rk, term,
        |  CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, tfidf
        |FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    "q_vocab_top" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(trim(lower(text)), '[ \t\n\r\f\x0B]+'), w -> len(w) > 0)) AS term
        |  FROM documents)
        |SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
        |  CAST(count(*) AS BIGINT) AS cf
        |FROM toks GROUP BY term
        |ORDER BY df DESC, cf DESC, term LIMIT 50""".stripMargin,
    "q_unigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(trim(lower(text)), '[ \t\n\r\f\x0B]+'), w -> len(w) > 0)) AS term
        |  FROM documents),
        |cf AS (SELECT term, count(*) AS cf FROM toks GROUP BY term),
        |t AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM toks)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  round(CAST(sum(CAST(round(-ln(CAST(cf.cf AS DOUBLE) / t.total), 6)
        |                      AS DECIMAL(25,6))) AS DOUBLE) / count(*), 6)
        |    AS mean_neg_logprob
        |FROM toks JOIN cf USING (term) CROSS JOIN t
        |WHERE doc_id < 500
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_bigram_logprob" ->
      """WITH docs2 AS (
        |  SELECT doc_id, list_filter(
        |    string_split_regex(trim(lower(text)), '[ \t\n\r\f\x0B]+'), w -> len(w) > 0) AS ws
        |  FROM documents),
        |idx AS (
        |  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
        |  FROM docs2 WHERE len(ws) > 1),
        |bg AS (
        |  SELECT doc_id, ws[CAST(i AS INT)] AS w1, ws[CAST(i AS INT) + 1] AS w2
        |  FROM idx),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  round(CAST(sum(CAST(round(-ln(CAST(c2.c2 AS DOUBLE) / c1.c1), 6)
        |                      AS DECIMAL(25,6))) AS DOUBLE) / count(*), 6)
        |    AS mean_bigram_nll
        |FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
        |WHERE doc_id < 500
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
}
