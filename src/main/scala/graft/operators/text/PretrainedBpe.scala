package graft.operators.text

import graft.{QueryModule, Tables}
import graft.functions.MarkedBpeTokens
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PRETRAINED-tokenizer counting — the reference's tiktoken/cl100k token
  * budgeting (nuevo-kmeans-pre.ipynb and update-etiquetas.ipynb count
  * tokens with a FIXED released vocabulary, never one trained on the
  * corpus at hand). Where [[BpeQueries]] trains its merges on the corpus,
  * this module LOADS a frozen vocabulary artifact in the published
  * GPT-2/RoBERTa merges.txt format (`#version` header, one
  * space-separated symbol pair per line, rank = line order) and encodes
  * with the matching conventions: case-sensitive words, Ġ space marker
  * on every non-initial word, greedy lowest-rank merging with no `</w>`
  * terminator ([[graft.functions.MarkedBpeTokens]]).
  *
  * The shipped artifact (src/main/resources/graft/bpe/) is a STAND-IN
  * vocabulary — trained offline by [[graft.tools.GenFrozenMerges]] and
  * frozen, because this build environment has no network egress to
  * fetch a released file. The load path is the point: a user drops a
  * real published merges.txt (GPT-2's file is byte-compatible with this
  * parser) in its place and gets that tokenizer's counts with no code
  * change. Remaining fidelity gaps to full tiktoken parity, stated
  * precisely: (1) pre-tokenization here is a whitespace split, not
  * GPT-2's contraction/letter/number regex (RE2 engines — DuckDB's —
  * cannot run its negative lookahead, and the oracle must replay the
  * split); (2) non-ASCII bytes are not remapped through the byte-unicode
  * table (documents here are NFC text, not arbitrary bytes).
  *
  * Scale shape: identical to q_token_bpe — the vocabulary rides the
  * plan as a constant (~500 pairs), encoding is one map-side
  * codegen-fused expression with a per-partition Zipf cache; no
  * training scan at all (the vocabulary is fixed), so the query is a
  * single pass over documents.
  *
  * The oracle is STATIC SQL (not [[dynamicOracles]]): the merge table
  * is a classpath constant, embedded as literals at assembly time, and
  * the greedy loop replays in the same recursive CTE as q_token_bpe
  * minus the `</w>` append, over Ġ-marked distinct words.
  */
object PretrainedBpe extends QueryModule {

  val Resource = "/graft/bpe/frozen_gpt2_style.merges.txt"

  /** Parse the published merges.txt format: `#`-prefixed header lines
    * and blanks are skipped; each remaining line is exactly two
    * space-separated symbols; rank = order of appearance. */
  def loadMerges(lines: Iterator[String]): Seq[(String, String)] =
    lines.filterNot(l => l.isEmpty || l.startsWith("#")).map { l =>
      val sp = l.indexOf(' ')
      require(sp > 0 && l.indexOf(' ', sp + 1) < 0,
        s"malformed merges.txt line (want 'left right'): '$l'")
      (l.substring(0, sp), l.substring(sp + 1))
    }.toSeq

  /** The frozen vocabulary, loaded once per JVM from the classpath. */
  lazy val merges: Seq[(String, String)] = {
    val in = getClass.getResourceAsStream(Resource)
    require(in != null, s"frozen vocabulary resource missing: $Resource")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      val m = loadMerges(src.getLines())
      m.foreach { case (a, b) =>
        require(!a.contains("|") && !b.contains("|"),
          s"merge symbol contains the '|' oracle key separator: ($a, $b)")
      }
      m
    } finally src.close()
  }

  /** Per-doc token counts under the frozen vocabulary + fertility — the
    * numbers a user compares against the thesis's token budgets. */
  def qTokenPretrained(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(trim(col("text")), TextQueries.WsRe)).as("n_words"),
        size(MarkedBpeTokens(trim(col("text")), merges)).as("n_tokens"))
      .withColumn("fertility",
        round(col("n_tokens").cast("double") / col("n_words"), 6))
      .orderBy("doc_id")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_token_pretrained" -> (qTokenPretrained _))

  override def oracles: Map[String, String] = {
    def esc(s: String) = s.replace("'", "''")
    val ks = merges.map { case (a, b) => s"'${esc(a)}|${esc(b)}'" }
      .mkString("[", ", ", "]")
    val ws = "[ \\t\\n\\r\\f\\x0B]+"
    Map("q_token_pretrained" ->
      s"""WITH RECURSIVE
         |mm AS (SELECT $ks AS ks),
         |toks0 AS (
         |  SELECT doc_id, string_split_regex(trim(text), '$ws') AS l FROM documents),
         |toksp AS (
         |  SELECT doc_id, generate_subscripts(l, 1) AS i, unnest(l) AS w0 FROM toks0),
         |toks AS (
         |  -- the unmarked word is the first NON-EMPTY one, not position 1:
         |  -- SQL trim strips spaces only, so text leading with a tab or
         |  -- newline yields a phantom '' at i=1 while the engine's
         |  -- Java-trim encoder sees the real word first (r12 review)
         |  SELECT doc_id, CASE WHEN i = fi THEN w0 ELSE 'Ġ' || w0 END AS w
         |  FROM (SELECT doc_id, i, w0,
         |          min(CASE WHEN w0 <> '' THEN i END)
         |            OVER (PARTITION BY doc_id) AS fi
         |        FROM toksp)
         |  WHERE w0 <> ''),
         |uwords AS (SELECT DISTINCT w FROM toks),
         |enc AS (
         |  SELECT w,
         |    list_transform(range(1, length(w) + 1), i -> w[i]) AS syms,
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
         |  SELECT t.doc_id, CAST(sum(f.nt) AS BIGINT) AS n_tok
         |  FROM toks t JOIN wtok f USING (w)
         |  GROUP BY t.doc_id)
         |SELECT d.doc_id,
         |  len(string_split_regex(trim(d.text), '$ws')) AS n_words,
         |  coalesce(p.n_tok, 0) AS n_tokens,
         |  round(CAST(coalesce(p.n_tok, 0) AS DOUBLE)
         |        / len(string_split_regex(trim(d.text), '$ws')), 6) AS fertility
         |FROM documents d LEFT JOIN per_doc p USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin)
  }
}
