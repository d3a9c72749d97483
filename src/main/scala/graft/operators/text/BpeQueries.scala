package graft.operators.text

import graft.{QueryModule, Tables}
import graft.functions.{Bpe, BpeTokens}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Real BPE tokenization over the corpus (SURVEY §2 "Text analysis") —
  * upgrades the BPE-ish regex substitute toward the reference's tiktoken
  * counting (its token budgeter). Self-contained: the vocabulary is
  * trained on the corpus itself with the classic word-frequency recipe,
  * then every document is greedy-encoded with the learned merge ranks.
  *
  * Scale shape: training reads ONE distributed
  * groupBy(word).count() capped at the top-K words (BPE always trains on
  * frequency tables, not raw text — driver cost is independent of corpus
  * size); encoding is a map-side expression with the merge table riding
  * the plan as a constant.
  */
object BpeQueries extends QueryModule {

  val NumMerges = 200
  val MaxVocabWords = 50000

  /** Deterministic corpus-trained merge rules, memoized per dir so the
    * query and its literal-replay oracle embed bit-identical tables. */
  private val mergeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, String)]]

  def trainMerges(spark: SparkSession, dir: String): Seq[(String, String)] =
    mergeCache.computeIfAbsent(dir, _ => {
      val freqs = Tables.documents(spark, dir)
        .select(explode(split(trim(lower(col("text"))), TextQueries.WsRe)).as("w"))
        .filter(col("w") =!= "")
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w"))
        .limit(MaxVocabWords)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      Bpe.learn(freqs, NumMerges)
    })

  /** Per-doc subword counts + fertility (tokens per word) — the token
    * budget a training pipeline prices a corpus by. Oracle-checked via the
    * literal-replay bridge: the trained merge table (driver-sized, already
    * a plan constant) is embedded as SQL literals and the greedy
    * lowest-rank merge loop of [[Bpe.encodeWord]] is replayed per distinct
    * word in a DuckDB recursive CTE — the fit stays engine-specific, the
    * encode arithmetic goes under the hash. Exact integers throughout;
    * only the final fertility ratio is per-row double, rounded 6. */
  def qTokenBpe(spark: SparkSession, dir: String): DataFrame = {
    val merges = trainMerges(spark, dir)
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(trim(col("text")), TextQueries.WsRe)).as("n_words"),
        size(BpeTokens(trim(lower(col("text"))), merges)).as("n_bpe_tokens"))
      .withColumn("fertility",
        round(col("n_bpe_tokens").cast("double") / col("n_words"), 6))
      .orderBy("doc_id")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_token_bpe" -> (qTokenBpe _))

  override def oracles: Map[String, String] = Map.empty

  /** Literal-replay oracle: merge ranks ride the SQL as a literal key list
    * (`"left|right"`, rank = 1-based list position), and each DISTINCT
    * corpus word is greedy-encoded by a recursive CTE that mirrors
    * [[Bpe.encodeWord]] step for step — per iteration, rank every adjacent
    * symbol pair, merge the FIRST occurrence of the lowest rank, stop when
    * no pair is in the table. The final state per word is the max-step row
    * (each step shrinks the list by exactly one). Per-doc counts then join
    * word multiplicities against the per-word token counts.
    *
    * The '|' key separator is unambiguous because no trained symbol may
    * contain '|' (asserted here): any composite key that parses two ways
    * would need a '|' inside a merge symbol. */
  override def dynamicOracles(spark: SparkSession, dir: String): Map[String, String] = {
    val merges = trainMerges(spark, dir)
    merges.foreach { case (a, b) =>
      require(!a.contains("|") && !b.contains("|"),
        s"BPE merge symbol contains the '|' oracle key separator: ($a, $b)")
    }
    def esc(s: String) = s.replace("'", "''")
    val ks = merges.map { case (a, b) => s"'${esc(a)}|${esc(b)}'" }
      .mkString("[", ", ", "]")
    val ws = "[ \\t\\n\\r\\f\\x0B]+"
    Map("q_token_bpe" ->
      s"""WITH RECURSIVE
         |mm AS (SELECT $ks AS ks),
         |toks AS (
         |  SELECT doc_id,
         |    unnest(string_split_regex(trim(lower(text)), '$ws')) AS w
         |  FROM documents),
         |uwords AS (SELECT DISTINCT w FROM toks WHERE w <> ''),
         |enc AS (
         |  SELECT w,
         |    list_append(list_transform(range(1, length(w) + 1), i -> w[i]), '</w>') AS syms,
         |    0 AS step
         |  FROM uwords
         |  UNION ALL
         |  SELECT w,
         |    list_concat(list_concat(syms[1:bi-1], [syms[bi] || syms[bi+1]]),
         |                syms[bi+2:len(syms)]) AS syms,
         |    step + 1
         |  FROM (
         |    SELECT w, syms, step,
         |      list_position(rl, list_min(rl)) AS bi, list_min(rl) AS br
         |    FROM (
         |      SELECT e.w, e.syms, e.step,
         |        list_transform(range(1, len(e.syms)), i ->
         |          coalesce(nullif(list_position(mm.ks,
         |            e.syms[i] || '|' || e.syms[i+1]), 0), 999999999)) AS rl
         |      FROM enc e, mm))
         |  WHERE br < 999999999),
         |wtok AS (
         |  SELECT w, len(syms) AS nt FROM (
         |    SELECT w, syms,
         |      row_number() OVER (PARTITION BY w ORDER BY step DESC) AS rn
         |    FROM enc)
         |  WHERE rn = 1),
         |per_doc AS (
         |  SELECT t.doc_id, CAST(sum(f.nt) AS BIGINT) AS n_bpe
         |  FROM toks t JOIN wtok f USING (w) WHERE t.w <> ''
         |  GROUP BY t.doc_id)
         |SELECT d.doc_id,
         |  len(string_split_regex(trim(d.text), '$ws')) AS n_words,
         |  coalesce(p.n_bpe, 0) AS n_bpe_tokens,
         |  round(CAST(coalesce(p.n_bpe, 0) AS DOUBLE)
         |        / len(string_split_regex(trim(d.text), '$ws')), 6) AS fertility
         |FROM documents d LEFT JOIN per_doc p USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin)
  }
}
