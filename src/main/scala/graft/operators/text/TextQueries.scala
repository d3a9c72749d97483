package graft.operators.text

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the LLM-data-pipeline surface (SURVEY §2
  * "Text analysis"): token counting (the reference counts tokens with
  * tiktoken, update-etiquetas.ipynb:108-110 — re-expressed as a BPE-ish
  * regex), language-ID and quality heuristics, fingerprints, chunking
  * (the reference's corpus is pre-chunked; the chunker reproduces that
  * ingestion step, fixed window + overlap).
  *
  * Everything here is a narrow map over the documents scan — no shuffle,
  * codegen'd string kernels — so at 100 TB it is I/O-bound per split.
  */
object TextQueries extends QueryModule {

  /** ASCII word/number/punct tokenization, same regex in Java (Spark) and
    * RE2 (DuckDB). */
  val TokenRegex = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r\\f\\x0B]"

  /** Explicit whitespace class shared by Spark queries and DuckDB oracles.
    * Java's \s is exactly [ \t\n\x0B\f\r] but RE2's (DuckDB's) excludes
    * vertical tab, so a tokenizer written as \s+ silently splits
    * differently across engines on any 0x0B byte — every regex that must
    * agree with an oracle spells the class out (this exact spelling
    * parses identically in both engines). */
  val WsRe = "[ \\t\\n\\r\\f\\x0B]+"

  val StopEn = Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "on")
  val StopEs = Seq("el", "la", "de", "que", "y", "en", "los", "del", "las", "por")
  val StopFr = Seq("le", "les", "des", "et", "un", "une", "dans", "pour", "sur", "avec")
  val StopDe = Seq("der", "die", "und", "das", "den", "von", "zu", "mit", "ist", "im")

  private def words(c: Column): Column = split(trim(c), WsRe)

  /** Count of words (non-distinct) belonging to a stopword set. */
  private def stopHits(ws: Column, stops: Seq[String]): Column =
    size(filter(ws, w => w.isin(stops: _*)))

  def qTokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(words(col("text"))).as("n_ws_tokens"),
      size(regexp_extract_all(col("text"), lit(TokenRegex), lit(0))).as("n_re_tokens"),
      length(col("text")).as("n_chars_m"))
      .orderBy("doc_id")

  /** Stopword-vote language ID; ties broken in fixed lang order (de, en,
    * es, fr) — identical CASE in the oracle. */
  def qLangId(spark: SparkSession, dir: String): DataFrame = {
    val ws = words(lower(col("text")))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        stopHits(ws, StopDe).as("s_de"), stopHits(ws, StopEn).as("s_en"),
        stopHits(ws, StopEs).as("s_es"), stopHits(ws, StopFr).as("s_fr"))
      .withColumn("pred_lang",
        when(col("s_de") >= col("s_en") && col("s_de") >= col("s_es") && col("s_de") >= col("s_fr"), "de")
          .when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr"), "en")
          .when(col("s_es") >= col("s_fr"), "es")
          .otherwise("fr"))
      .orderBy("doc_id")
  }

  /** Length/punctuation/stopword quality heuristic — per-row double
    * arithmetic, bit-identical cross-engine. */
  def qQualityScore(spark: SparkSession, dir: String): DataFrame = {
    val ws = words(lower(col("text")))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(ws).cast("double").as("n_words"),
        length(col("text")).cast("double").as("n_chars_m"),
        length(regexp_replace(col("text"), "[A-Za-z0-9 \\t\\n\\r\\f\\x0B]", "")).cast("double").as("n_punct"),
        stopHits(ws, StopEn).cast("double").as("n_stop"))
      .select(col("doc_id"), col("n_words"),
        round(col("n_punct") / col("n_chars_m"), 6).as("punct_ratio"),
        round(col("n_stop") / col("n_words"), 6).as("stop_ratio"),
        round(lit(0.4) * least(lit(1.0), col("n_words") / lit(50.0))
          + lit(0.3) * (lit(1.0) - col("n_punct") / col("n_chars_m"))
          + lit(0.3) * (col("n_stop") / col("n_words")), 6).as("quality_score"))
      .orderBy("doc_id")
  }

  /** Per-source data-audit report card — the rollup a corpus pipeline
    * publishes per ingest batch: volume, language spread, token mass,
    * mean quality, and the share of docs clearing a fixed quality bar.
    * One scan computes every per-doc term map-side; one groupBy(source)
    * with decimal mean sums (order-free) and round-then-compare for the
    * bar membership. */
  def qSourceReport(spark: SparkSession, dir: String): DataFrame = {
    val ws = words(lower(col("text")))
    val scored = Tables.documents(spark, dir)
      .select(col("source"), col("lang"), col("n_chars"),
        size(ws).cast("double").as("n_words"),
        length(col("text")).cast("double").as("n_chars_m"),
        length(regexp_replace(col("text"), "[A-Za-z0-9 \\t\\n\\r\\f\\x0B]", "")).cast("double").as("n_punct"),
        stopHits(ws, StopEn).cast("double").as("n_stop"))
      .select(col("source"), col("lang"), col("n_chars"),
        col("n_words").cast("long").as("n_tokens"),
        round(lit(0.4) * least(lit(1.0), col("n_words") / lit(50.0))
          + lit(0.3) * (lit(1.0) - col("n_punct") / col("n_chars_m"))
          + lit(0.3) * (col("n_stop") / col("n_words")), 6).as("q6"))
    scored.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(col("n_tokens")).as("sum_tokens"),
        round(sum(col("q6").cast("decimal(25,6)")).cast("double")
          / count(lit(1)), 6).as("mean_quality"),
        sum(when(col("q6") >= 0.5, 1L).otherwise(0L)).as("n_above_bar"))
      .orderBy("source")
  }

  /** CCNet-style per-language stratified quality filtering (Wenzek et al.
    * 2020): one global threshold over-prunes low-resource languages, so
    * the cut is the PER-LANGUAGE median of the quality score — keep docs
    * at or above their own language's median. The threshold is an exact
    * order statistic (`percentile_disc`), i.e. a value drawn from the
    * rounded score set, so the keep/drop boundary is engine-exact with no
    * float-mean ambiguity. Plan: one scan computes scores map-side, one
    * bounded groupBy(lang) finds the medians, and the scored rows join the
    * lang-row threshold table BROADCAST — corpus-size-independent state. */
  def qLangQualityFilter(spark: SparkSession, dir: String): DataFrame = {
    val ws = words(lower(col("text")))
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        size(ws).cast("double").as("n_words"),
        length(col("text")).cast("double").as("n_chars_m"),
        length(regexp_replace(col("text"), "[A-Za-z0-9 \\t\\n\\r\\f\\x0B]", "")).cast("double").as("n_punct"),
        stopHits(ws, StopEn).cast("double").as("n_stop"))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        round(lit(0.4) * least(lit(1.0), col("n_words") / lit(50.0))
          + lit(0.3) * (lit(1.0) - col("n_punct") / col("n_chars_m"))
          + lit(0.3) * (col("n_stop") / col("n_words")), 6).as("s"))
    val thr = scored.groupBy("lang")
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY s)").as("thr"))
    scored.join(broadcast(thr), Seq("lang"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        round(min(col("thr")), 6).as("threshold"),
        sum(when(col("s") >= col("thr"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("s") >= col("thr"), col("n_chars")).otherwise(0L)).as("kept_chars"))
      .orderBy("lang")
  }

  /** Curriculum quality DECILES — the bucket table a quality-ordered
    * (easy→hard) data-mixing schedule samples from: exact order-statistic
    * decile edges of the quality score (`percentile_disc` ≡ DuckDB
    * `quantile_disc`, the engine-exact binning of q_embedding_drift),
    * then per bucket the doc count, token mass and decimal-mean score.
    * Edges are a driver-read 9-double row embedded as literals (bounded);
    * the oracle recomputes the identical order statistics. */
  def qQualityDeciles(spark: SparkSession, dir: String): DataFrame = {
    val ws = words(lower(col("text")))
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(ws).cast("double").as("n_words"),
        length(col("text")).cast("double").as("n_chars_m"),
        length(regexp_replace(col("text"), "[A-Za-z0-9 \\t\\n\\r\\f\\x0B]", "")).cast("double").as("n_punct"),
        stopHits(ws, StopEn).cast("double").as("n_stop"))
      .select(col("doc_id"), col("n_words").cast("long").as("n_tokens"),
        round(lit(0.4) * least(lit(1.0), col("n_words") / lit(50.0))
          + lit(0.3) * (lit(1.0) - col("n_punct") / col("n_chars_m"))
          + lit(0.3) * (col("n_stop") / col("n_words")), 6).as("s"))
    val qs = (1 to 9).map(_ / 10.0)
    val edgeRow = scored.agg(
      expr(s"percentile_disc(${qs.head}) WITHIN GROUP (ORDER BY s)"),
      qs.tail.map(q => expr(s"percentile_disc($q) WITHIN GROUP (ORDER BY s)")): _*)
      .head()
    val edges = (0 until 9).map(edgeRow.getDouble)
    val binCol = edges.map(e => when(col("s") > lit(e), 1).otherwise(0)).reduce(_ + _)
    scored.groupBy(binCol.cast("long").as("decile"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        round(sum(col("s").cast("decimal(25,6)")).cast("double")
          / count(lit(1)), 6).as("mean_q"))
      .orderBy("decile")
  }

  /** Repetition scoring — the MassiveText/Gopher-style repetition filters
    * the quality heuristic doesn't capture: distinct-word ratio and
    * top-word mass per document. Classic wordcount shape: explode → two
    * partial-aggregated groupBys on (doc, word), top word via the bounded
    * TopKPerGroup heap (deterministic tie-break: lexicographically least
    * among the modes). Map-side combine keeps the (doc, word) shuffle
    * proportional to distinct words, not tokens — the 100 TB shape. */
  def qRepetition(spark: SparkSession, dir: String): DataFrame = {
    val wc = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(words(lower(col("text")))).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("c"))
    val stats = wc.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_words"), count(lit(1)).as("n_distinct"))
    val top = graft.plans.TopKPerGroup(
        wc.withColumn("neg_c", -col("c")),
        groupCols = Seq("doc_id"), orderCols = Seq("neg_c", "word"), k = 1)
      .select(col("doc_id"), col("word").as("top_word"), col("c").as("top_c"))
    stats.join(top, Seq("doc_id"))
      .select(col("doc_id"), col("n_words"), col("n_distinct"),
        round(col("n_distinct") / col("n_words"), 6).as("distinct_ratio"),
        col("top_word"),
        round(col("top_c") / col("n_words"), 6).as("top_frac"))
      .orderBy("doc_id")
  }

  /** End-to-end curation funnel — the composite training-data pipeline:
    * language filter (pred_lang = en) → quality cut (score ≥ 0.7) → exact
    * dedup (md5, keep min doc_id) → token budget of the surviving corpus.
    * ONE scan with conditional stage flags, one window for the dedup rank,
    * one aggregate — the funnel costs a single pass however many stages it
    * composes. Returns one row of per-stage counts. */
  def qCorpusCuration(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ws = words(lower(col("text")))
    // md5 lands in the first projection so `text` itself is pruned from
    // the window shuffle (only the hash + scalar flags travel); n_stop
    // reuses s_en rather than re-scanning the stopword list. The repeated
    // `ws` subtree is shared by codegen subexpression elimination within
    // this single projection.
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("h"),
        size(words(col("text"))).as("n_tok"),
        stopHits(ws, StopDe).as("s_de"), stopHits(ws, StopEn).as("s_en"),
        stopHits(ws, StopEs).as("s_es"), stopHits(ws, StopFr).as("s_fr"),
        size(ws).cast("double").as("n_words"),
        length(col("text")).cast("double").as("n_chars_m"),
        length(regexp_replace(col("text"), "[A-Za-z0-9 \\t\\n\\r\\f\\x0B]", "")).cast("double").as("n_punct"))
      .withColumn("n_stop", col("s_en").cast("double"))
      .withColumn("pred_lang",
        when(col("s_de") >= col("s_en") && col("s_de") >= col("s_es") && col("s_de") >= col("s_fr"), "de")
          .when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr"), "en")
          .when(col("s_es") >= col("s_fr"), "es")
          .otherwise("fr"))
      .withColumn("q",
        lit(0.4) * least(lit(1.0), col("n_words") / lit(50.0))
          + lit(0.3) * (lit(1.0) - col("n_punct") / col("n_chars_m"))
          + lit(0.3) * (col("n_stop") / col("n_words")))
      .withColumn("is_en", col("pred_lang") === "en")
      .withColumn("is_good", col("pred_lang") === "en" && col("q") >= 0.7)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("is_good"), col("h")).orderBy(col("doc_id"))))
      .withColumn("is_uniq", col("is_good") && col("rn") === 1)
    scored.agg(
      count(lit(1)).as("n_input"),
      sum(when(col("is_en"), 1L).otherwise(0L)).as("n_lang"),
      sum(when(col("is_good"), 1L).otherwise(0L)).as("n_quality"),
      sum(when(col("is_uniq"), 1L).otherwise(0L)).as("n_unique"),
      sum(when(col("is_uniq"), col("n_tok").cast("long"))).as("total_tokens"),
      // round-then-decimal-sum mean (the covariance lesson): q is a
      // fractional double, so avg's partition-order sums could flip the
      // 6th decimal on a boundary
      round(sum(when(col("is_uniq"), round(col("q"), 6).cast("decimal(25,6)")))
        .cast("double")
        / sum(when(col("is_uniq"), 1L).otherwise(0L)), 6).as("avg_quality"))
  }

  /** Whole-document fingerprint (md5 — identical hex in both engines).
    * The winnowing/rolling-hash variant lives in RollingHash (rows-only). */
  def qFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("fp"),
        substring(md5(col("text")), 1, 8).as("fp_short"))
      .orderBy("doc_id")

  /** Fixed-window chunker with overlap (window 48, stride 32) — the
    * ingestion step producing the reference's chunk table. Lateral
    * sequence explode; no shuffle. */
  def qChunking(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      // empty doc → sequence(0,-1) would throw; oracle's range() is empty
      .filter(col("n_chars") > 0)
      .withColumn("start", explode(sequence(lit(0L), col("n_chars") - 1, lit(32L))))
      .select(col("doc_id"), (col("start") / 32).cast("long").as("chunk_idx"),
        col("text").substr(col("start").cast("int") + 1, lit(48)).as("chunk_text"))
      .withColumn("chunk_len", length(col("chunk_text")))
      .orderBy("doc_id", "chunk_idx")

  /** Winnowing rolling-hash fingerprints — oracle-checked: the k-gram
    * polynomial (base 257 mod 1e9+7) is bounded arithmetic the oracle
    * recomputes directly (the rolling update is algebraically identical
    * to the direct fold), and winnowing's per-window rightmost-min
    * reduces to list_min per window since only VALUES are kept. */
  def qFingerprintWinnow(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.RollingFingerprint(col("text")).as("fps"))
      .select(col("doc_id"), size(col("fps")).as("n_fp"),
        array_min(col("fps")).as("fp_min"), array_max(col("fps")).as("fp_max"))
      .orderBy("doc_id")

  /** Unicode NFC normalization over a deterministically DECORATED corpus —
    * the canonical-composition ingest step (decomposed sequences like
    * `e`+U+0301 arrive from real converters and break hashing/dedup unless
    * composed first). The ASCII synthetic corpus can't exercise it, so
    * each doc is prefixed with a decomposed sequence chosen by doc_id % 4
    * (é, Å, ñ — built from combining marks — or nothing), following the
    * codec-family pattern: synthesize the payload deterministically,
    * normalize with the REAL code ([[graft.functions.NfcNormalize]], a
    * codegen'd Catalyst expression over java.text.Normalizer), emit exact
    * integer/boolean stats the oracle replays via DuckDB's nfc_normalize
    * (utf8proc — the same Unicode canonical composition). */
  def qTextNormalize(spark: SparkSession, dir: String): DataFrame = {
    // DECOMPOSED on purpose: base letter + combining mark (U+0301 acute,
    // U+030A ring, U+0303 tilde) -- NFC composes them to single code points
    val deco = when(col("doc_id") % 4 === 0, lit("cafe\u0301"))
      .when(col("doc_id") % 4 === 1, lit("A\u030A"))
      .when(col("doc_id") % 4 === 2, lit("n\u0303"))
      .otherwise(lit(""))
    Tables.documents(spark, dir)
      .select(col("doc_id"), concat(deco, lit(" "), col("text")).as("dec"))
      .select(col("doc_id"),
        length(col("dec")).cast("long").as("len_before"),
        length(graft.functions.NfcNormalize(col("dec"))).cast("long").as("len_after"),
        (col("dec") =!= graft.functions.NfcNormalize(col("dec"))).as("changed"))
      .orderBy("doc_id")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_normalize" -> (qTextNormalize _),
    "q_token_count" -> (qTokenCount _),
    "q_quality_deciles" -> (qQualityDeciles _),
    "q_lang_id" -> (qLangId _),
    "q_quality_score" -> (qQualityScore _),
    "q_lang_quality_filter" -> (qLangQualityFilter _),
    "q_source_report" -> (qSourceReport _),
    "q_fingerprint" -> (qFingerprint _),
    "q_fingerprint_winnow" -> (qFingerprintWinnow _),
    "q_chunking" -> (qChunking _),
    "q_repetition" -> (qRepetition _),
    "q_corpus_curation" -> (qCorpusCuration _))

  private def inList(stops: Seq[String]) = stops.map(s => s"'$s'").mkString(", ")
  private def scoreSql(alias: String, stops: Seq[String]) =
    s"len(list_filter(string_split_regex(trim(lower(text)), '[ \\t\\n\\r\\f\\x0B]+'), w -> w IN (${inList(stops)}))) AS $alias"

  override def oracles: Map[String, String] = Map(
    // same decomposed decoration by doc_id % 4 (chr(769)=U+0301 acute,
    // chr(778)=U+030A ring, chr(771)=U+0303 tilde); nfc_normalize is
    // utf8proc's canonical composition == java.text.Normalizer NFC;
    // length() counts code points in both engines
    "q_text_normalize" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    (CASE doc_id % 4
        |       WHEN 0 THEN 'cafe' || chr(769)
        |       WHEN 1 THEN 'A' || chr(778)
        |       WHEN 2 THEN 'n' || chr(771)
        |       ELSE '' END) || ' ' || text AS dec
        |  FROM documents)
        |SELECT doc_id, CAST(length(dec) AS BIGINT) AS len_before,
        |  CAST(length(nfc_normalize(dec)) AS BIGINT) AS len_after,
        |  (dec <> nfc_normalize(dec)) AS changed
        |FROM d ORDER BY doc_id""".stripMargin,
    "q_fingerprint_winnow" ->
      // k=8, w=4 (RollingFingerprint defaults); the k-gram hash is the
      // direct polynomial fold the rolling update is algebraically equal
      // to; winnowing keeps only min VALUES so list_min per window suffices
      """WITH g AS (
        |  SELECT doc_id,
        |    CASE WHEN length(text) < 8 THEN []
        |    ELSE list_transform(range(1, length(text) - 8 + 2),
        |      i -> list_reduce(
        |        list_prepend(CAST(0 AS BIGINT),
        |          list_transform(range(0, 8),
        |            j -> CAST(ord(substr(text, CAST(i + j AS INT), 1)) AS BIGINT))),
        |        (h, c) -> (h * 257 + c) % 1000000007))
        |    END AS hs
        |  FROM documents),
        |sel AS (
        |  SELECT doc_id,
        |    CASE WHEN len(hs) = 0 THEN []
        |         WHEN len(hs) <= 4 THEN [list_min(hs)]
        |         ELSE list_transform(range(1, len(hs) - 4 + 2),
        |                st -> list_min(list_slice(hs, st, st + 3)))
        |    END AS fps
        |  FROM g)
        |SELECT doc_id, CAST(len(list_distinct(fps)) AS INT) AS n_fp,
        |  list_min(fps) AS fp_min, list_max(fps) AS fp_max
        |FROM sel ORDER BY doc_id""".stripMargin,
    "q_repetition" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '[ \t\n\r\f\x0B]+')) AS word
        |  FROM documents),
        |wc AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY doc_id, word),
        |s AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
        |    count(*) AS n_distinct
        |  FROM wc GROUP BY doc_id),
        |t AS (
        |  SELECT doc_id, word, c FROM (
        |    SELECT doc_id, word, c,
        |      row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, word) AS rn
        |    FROM wc) WHERE rn = 1)
        |SELECT s.doc_id, s.n_words, s.n_distinct,
        |  round(CAST(s.n_distinct AS DOUBLE) / s.n_words, 6) AS distinct_ratio,
        |  t.word AS top_word,
        |  round(CAST(t.c AS DOUBLE) / s.n_words, 6) AS top_frac
        |FROM s JOIN t USING (doc_id) ORDER BY s.doc_id""".stripMargin,
    "q_token_count" ->
      s"""SELECT doc_id,
         |  len(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) AS n_ws_tokens,
         |  len(regexp_extract_all(text, '$TokenRegex')) AS n_re_tokens,
         |  length(text) AS n_chars_m
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_lang_id" ->
      s"""SELECT doc_id, lang, s_de, s_en, s_es, s_fr,
         |  CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
         |       WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
         |       WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS pred_lang
         |FROM (SELECT doc_id, lang,
         |  ${scoreSql("s_de", StopDe)},
         |  ${scoreSql("s_en", StopEn)},
         |  ${scoreSql("s_es", StopEs)},
         |  ${scoreSql("s_fr", StopFr)}
         |  FROM documents) ORDER BY doc_id""".stripMargin,
    "q_source_report" ->
      s"""WITH sc AS (
         |  SELECT source, lang, n_chars, CAST(n_words AS BIGINT) AS n_tokens,
         |    round(0.4 * least(1.0, n_words / 50.0)
         |        + 0.3 * (1.0 - n_punct / n_chars_m)
         |        + 0.3 * (n_stop / n_words), 6) AS q6
         |  FROM (SELECT source, lang, n_chars,
         |    CAST(len(string_split_regex(trim(lower(text)), '[ \\t\\n\\r\\f\\x0B]+')) AS DOUBLE) AS n_words,
         |    CAST(length(text) AS DOUBLE) AS n_chars_m,
         |    CAST(length(regexp_replace(text, '[A-Za-z0-9 \\t\\n\\r\\f\\x0B]', '', 'g')) AS DOUBLE) AS n_punct,
         |    CAST(len(list_filter(string_split_regex(trim(lower(text)), '[ \\t\\n\\r\\f\\x0B]+'),
         |         w -> w IN (${inList(StopEn)}))) AS DOUBLE) AS n_stop
         |    FROM documents))
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |  round(CAST(sum(CAST(q6 AS DECIMAL(25,6))) AS DOUBLE) / count(*), 6) AS mean_quality,
         |  CAST(sum(CASE WHEN q6 >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_above_bar
         |FROM sc GROUP BY source ORDER BY source""".stripMargin,
    "q_quality_deciles" ->
      s"""WITH sc AS (
         |  SELECT doc_id, CAST(n_words AS BIGINT) AS n_tokens,
         |    round(0.4 * least(1.0, n_words / 50.0)
         |        + 0.3 * (1.0 - n_punct / n_chars_m)
         |        + 0.3 * (n_stop / n_words), 6) AS s
         |  FROM (SELECT doc_id,
         |    CAST(len(string_split_regex(trim(lower(text)), '[ \\t\\n\\r\\f\\x0B]+')) AS DOUBLE) AS n_words,
         |    CAST(length(text) AS DOUBLE) AS n_chars_m,
         |    CAST(length(regexp_replace(text, '[A-Za-z0-9 \\t\\n\\r\\f\\x0B]', '', 'g')) AS DOUBLE) AS n_punct,
         |    CAST(len(list_filter(string_split_regex(trim(lower(text)), '[ \\t\\n\\r\\f\\x0B]+'),
         |         w -> w IN (${inList(StopEn)}))) AS DOUBLE) AS n_stop
         |    FROM documents)),
         |ed AS (SELECT quantile_disc(s, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS e FROM sc),
         |b AS (SELECT sc.n_tokens, sc.s,
         |    len(list_filter(ed.e, x -> sc.s > x)) AS decile
         |  FROM sc CROSS JOIN ed)
         |SELECT CAST(decile AS BIGINT) AS decile, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |  round(CAST(sum(CAST(s AS DECIMAL(25,6))) AS DOUBLE) / count(*), 6) AS mean_q
         |FROM b GROUP BY decile ORDER BY decile""".stripMargin,
    "q_lang_quality_filter" ->
      s"""WITH sc AS (
         |  SELECT doc_id, lang, n_chars,
         |    round(0.4 * least(1.0, n_words / 50.0)
         |        + 0.3 * (1.0 - n_punct / n_chars_m)
         |        + 0.3 * (n_stop / n_words), 6) AS s
         |  FROM (SELECT doc_id, lang, n_chars,
         |    CAST(len(string_split_regex(trim(lower(text)), '[ \\t\\n\\r\\f\\x0B]+')) AS DOUBLE) AS n_words,
         |    CAST(length(text) AS DOUBLE) AS n_chars_m,
         |    CAST(length(regexp_replace(text, '[A-Za-z0-9 \\t\\n\\r\\f\\x0B]', '', 'g')) AS DOUBLE) AS n_punct,
         |    CAST(len(list_filter(string_split_regex(trim(lower(text)), '[ \\t\\n\\r\\f\\x0B]+'),
         |         w -> w IN (${inList(StopEn)}))) AS DOUBLE) AS n_stop
         |    FROM documents)),
         |thr AS (SELECT lang, quantile_disc(s, 0.5) AS thr FROM sc GROUP BY lang)
         |SELECT sc.lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  round(min(t.thr), 6) AS threshold,
         |  CAST(sum(CASE WHEN sc.s >= t.thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN sc.s >= t.thr THEN sc.n_chars ELSE 0 END) AS BIGINT) AS kept_chars
         |FROM sc JOIN thr t USING (lang)
         |GROUP BY sc.lang ORDER BY sc.lang""".stripMargin,
    "q_quality_score" ->
      s"""SELECT doc_id, n_words,
         |  round(n_punct / n_chars_m, 6) AS punct_ratio,
         |  round(n_stop / n_words, 6) AS stop_ratio,
         |  round(0.4 * least(1.0, n_words / 50.0)
         |      + 0.3 * (1.0 - n_punct / n_chars_m)
         |      + 0.3 * (n_stop / n_words), 6) AS quality_score
         |FROM (SELECT doc_id,
         |  CAST(len(string_split_regex(trim(lower(text)), '[ \\t\\n\\r\\f\\x0B]+')) AS DOUBLE) AS n_words,
         |  CAST(length(text) AS DOUBLE) AS n_chars_m,
         |  CAST(length(regexp_replace(text, '[A-Za-z0-9 \\t\\n\\r\\f\\x0B]', '', 'g')) AS DOUBLE) AS n_punct,
         |  CAST(len(list_filter(string_split_regex(trim(lower(text)), '[ \\t\\n\\r\\f\\x0B]+'),
         |       w -> w IN (${inList(StopEn)}))) AS DOUBLE) AS n_stop
         |  FROM documents) ORDER BY doc_id""".stripMargin,
    "q_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp, substring(md5(text), 1, 8) AS fp_short
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_corpus_curation" ->
      s"""WITH scored AS (
         |  SELECT doc_id, text,
         |    len(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) AS n_tok,
         |    ${scoreSql("s_de", StopDe)},
         |    ${scoreSql("s_en", StopEn)},
         |    ${scoreSql("s_es", StopEs)},
         |    ${scoreSql("s_fr", StopFr)},
         |    CAST(len(string_split_regex(trim(lower(text)), '[ \\t\\n\\r\\f\\x0B]+')) AS DOUBLE) AS n_words,
         |    CAST(length(text) AS DOUBLE) AS n_chars_m,
         |    CAST(length(regexp_replace(text, '[A-Za-z0-9 \\t\\n\\r\\f\\x0B]', '', 'g')) AS DOUBLE) AS n_punct,
         |    CAST(len(list_filter(string_split_regex(trim(lower(text)), '[ \\t\\n\\r\\f\\x0B]+'),
         |         w -> w IN (${inList(StopEn)}))) AS DOUBLE) AS n_stop
         |  FROM documents),
         |flagged AS (
         |  SELECT *,
         |    CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
         |         WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
         |         WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS pred_lang,
         |    0.4 * least(1.0, n_words / 50.0)
         |      + 0.3 * (1.0 - n_punct / n_chars_m)
         |      + 0.3 * (n_stop / n_words) AS q
         |  FROM scored),
         |staged AS (
         |  SELECT *,
         |    (pred_lang = 'en') AS is_en,
         |    (pred_lang = 'en' AND q >= 0.7) AS is_good
         |  FROM flagged),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY is_good, md5(text) ORDER BY doc_id) AS rn
         |  FROM staged)
         |SELECT count(*) AS n_input,
         |  CAST(sum(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
         |  CAST(sum(CASE WHEN is_good THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
         |  CAST(sum(CASE WHEN is_good AND rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
         |  CAST(sum(CASE WHEN is_good AND rn = 1 THEN n_tok END) AS BIGINT) AS total_tokens,
         |  round(CAST(sum(CASE WHEN is_good AND rn = 1
         |                  THEN CAST(round(q, 6) AS DECIMAL(25,6)) END) AS DOUBLE)
         |        / sum(CASE WHEN is_good AND rn = 1 THEN 1 ELSE 0 END), 6) AS avg_quality
         |FROM ranked""".stripMargin,
    "q_chunking" ->
      """SELECT doc_id, start // 32 AS chunk_idx,
        |  substring(text, CAST(start AS INT) + 1, 48) AS chunk_text,
        |  length(substring(text, CAST(start AS INT) + 1, 48)) AS chunk_len
        |FROM documents, UNNEST(range(0, n_chars, 32)) AS t(start)
        |ORDER BY doc_id, chunk_idx""".stripMargin)
}
