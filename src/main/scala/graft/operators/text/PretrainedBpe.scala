package graft.operators.text

import graft.{QueryModule, Tables}
import graft.functions.{Gpt2, Gpt2BpeTokens}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PRETRAINED-tokenizer counting — the reference's tiktoken/cl100k token
  * budgeting (nuevo-kmeans-pre.ipynb and update-etiquetas.ipynb count
  * tokens with a FIXED released vocabulary, never one trained on the
  * corpus at hand). Where [[BpeQueries]] trains its merges on the corpus,
  * this module LOADS a frozen vocabulary artifact in the published
  * GPT-2/RoBERTa merges.txt format (`#version` header, one
  * space-separated symbol pair per line, rank = line order) and encodes
  * with the FULL published pipeline ([[graft.functions.Gpt2]], closing
  * the two r12-stated fidelity gaps):
  * regex pre-tokenization (contractions / ` ?letters` / ` ?numbers` /
  * ` ?punctuation` / whitespace-run rules, as a lookahead-free scan both
  * engines replay identically) → the 256-entry byte-unicode remap (Ġ is
  * byte 0x20's image, multi-byte UTF-8 becomes multiple symbols) →
  * greedy lowest-rank merging with no `</w>`.
  *
  * The shipped artifact (src/main/resources/graft/bpe/) is a STAND-IN
  * vocabulary — trained offline by [[graft.tools.GenFrozenMerges]] over
  * the same decorated corpus and frozen (the artifact's own line count
  * is the merge count; training stops early if the pair space
  * exhausts), because this build environment has no network egress to
  * fetch a released file. The load path is the point: a user drops a
  * real published merges.txt (GPT-2's file is byte-compatible with this
  * parser — same format, same alphabet) in its place and gets that
  * tokenizer's counts with no code change. Character classes match
  * Python's `regex` module exactly, including the 25-code-point
  * Unicode White_Space set ([[graft.functions.Gpt2.WsClassRe2]] —
  * the r12 ASCII-\\s residue, closed r13 and exercised by the
  * U+00A0/U+2009/U+3000 decoration arms).
  *
  * The synthetic corpus is ASCII-only, so each document is DECORATED
  * deterministically by doc_id (the q_text_normalize pattern) with the
  * exact shapes the pipeline must get right: contractions, multi-byte
  * UTF-8, digit/punctuation runs, letter↔digit boundaries, tabs,
  * multi-space runs, and trailing whitespace.
  *
  * Scale shape: identical to q_token_bpe — the vocabulary rides the
  * plan as a constant, encoding is one map-side codegen-fused
  * expression with a per-partition Zipf cache keyed by pre-token; no
  * training scan at all (the vocabulary is fixed), so the query is a
  * single pass over documents.
  *
  * The oracle is STATIC SQL (not [[dynamicOracles]]): the merge table
  * and byte map are classpath/code constants embedded as literals at
  * assembly time; pre-tokenization replays as anchored RE2 regexes
  * over a recursive CTE on DISTINCT `[ws]*[non-ws]+` segments (sound
  * because a non-ws→ws boundary always ends a pre-token — the
  * [[graft.functions.Gpt2]] equivalence note), and the greedy merge
  * loop replays per distinct pre-token in the q_token_bpe CTE style
  * over the byte-mapped initial symbols.
  */
object PretrainedBpe extends QueryModule {

  val Resource = "/graft/bpe/frozen_gpt2_style.merges.txt"

  /** Deterministic decoration arms (prefix by doc_id % 4, suffix by
    * doc_id % 3) — ONE definition feeding both engines. */
  val Prefixes: Seq[String] = Seq(
    "Don't stop — it's café №5, naïve 42.7% ",
    "We'll we're I'm they've you'd 100x  ",
    "über Straße ¡hola! 'tis x3 3x　\t",
    "")
  val Suffixes: Seq[String] = Seq(" end.  ", "\t", "")

  /** The decorated text column (shared with [[graft.tools.GenFrozenMerges]]
    * so the frozen vocabulary trains on the distribution it encodes). */
  def decorated(text: Column, docId: Column): Column = {
    val pre = Prefixes.zipWithIndex.foldLeft(lit("")) { case (acc, (p, i)) =>
      when(docId % 4 === i, lit(p)).otherwise(acc)
    }
    val suf = Suffixes.zipWithIndex.foldLeft(lit("")) { case (acc, (s, i)) =>
      when(docId % 3 === i, lit(s)).otherwise(acc)
    }
    concat(pre, text, suf)
  }

  private def esc(s: String) = s.replace("'", "''")

  /** The same decoration in DuckDB SQL (tabs travel via chr(9) — the
    * Verify JSON escaper would pass them, but keeping the SQL text
    * control-char-free is cheap insurance). */
  private def decoratedSql: String = {
    def litSql(s: String): String =
      if (s.isEmpty) "''"
      else s.split("\t", -1).map(p => s"'${esc(p)}'").mkString(" || chr(9) || ")
    val pre = Prefixes.zipWithIndex.map { case (p, i) =>
      s"WHEN $i THEN ${litSql(p)}" }.mkString(" ")
    val suf = Suffixes.zipWithIndex.map { case (s, i) =>
      s"WHEN $i THEN ${litSql(s)}" }.mkString(" ")
    s"(CASE doc_id % 4 $pre END) || text || (CASE doc_id % 3 $suf END)"
  }

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
    * numbers a user compares against the thesis's token budgets.
    * n_words counts NON-EMPTY whitespace-split words (the r12 advice:
    * size-of-split counts phantom empties on leading/trailing
    * whitespace), so `fertility = tokens per word` stays honest on
    * decorated docs. */
  def qTokenPretrained(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), decorated(col("text"), col("doc_id")).as("txt"))
      .select(col("doc_id"),
        size(array_remove(split(col("txt"), TextQueries.WsRe), "")).as("n_words"),
        size(Gpt2BpeTokens(col("txt"), merges)).as("n_tokens"))
      .withColumn("fertility",
        when(col("n_words") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_tokens").cast("double") / col("n_words"), 6)))
      .orderBy("doc_id")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_token_pretrained" -> (qTokenPretrained _))

  override def oracles: Map[String, String] = {
    val ks = merges.map { case (a, b) => s"'${esc(a)}|${esc(b)}'" }
      .mkString("[", ", ", "]")
    // the 256-entry byte-unicode map as parallel literal lists: hex pair
    // (uppercase, DuckDB hex() convention) → chr(mapped code point)
    val hxs = (0 until 256).map(b => f"'$b%02X'").mkString("[", ", ", "]")
    val mcs = (0 until 256).map(b => s"chr(${Gpt2.ByteChar(b).toInt})")
      .mkString("[", ", ", "]")
    val ws = "[ \\t\\n\\r\\f\\x0B]+"          // TextQueries.WsRe, RE2 form
    val wsCls = Gpt2.WsClassRe2       // the EXACT Python-\\s class (Gpt2)
    Map("q_token_pretrained" ->
      s"""WITH RECURSIVE
         |mm AS (SELECT $ks AS ks),
         |bm AS (SELECT unnest($hxs) AS hx, unnest($mcs) AS mc),
         |d AS (SELECT doc_id, $decoratedSql AS txt FROM documents),
         |-- pre-token boundaries never cross a non-ws->ws transition, so
         |-- the scan runs once per DISTINCT [ws]*[non-ws]+ segment (plus
         |-- the trailing all-ws run) and counts rejoin by segment
         |segs AS (
         |  SELECT doc_id, unnest(regexp_extract_all(txt,
         |    '[$wsCls]*[^$wsCls]+')) AS seg FROM d
         |  UNION ALL
         |  SELECT doc_id, regexp_extract(txt, '[$wsCls]+$$') AS seg FROM d
         |  WHERE regexp_extract(txt, '[$wsCls]+$$') <> ''),
         |useg AS (SELECT DISTINCT seg FROM segs),
         |-- the GPT-2 pre-tokenizer as anchored RE2 branches in the
         |-- published alternation order; the lookahead branch \\s+(?!\\S)
         |-- is the two ws rules (run-at-end whole, else run minus its
         |-- last char, a lone non-space ws standing alone)
         |scan AS (
         |  SELECT seg, seg AS rest, CAST(NULL AS VARCHAR) AS tok, 0 AS stp
         |  FROM useg
         |  UNION ALL
         |  SELECT seg, substr(rest, length(tok2) + 1), tok2, stp + 1 FROM (
         |    SELECT seg, rest, stp,
         |      CASE WHEN c1 <> '' THEN c1 WHEN c2 <> '' THEN c2
         |           WHEN c3 <> '' THEN c3 WHEN c4 <> '' THEN c4
         |           WHEN wr = rest THEN wr
         |           WHEN length(wr) = 1 THEN wr
         |           ELSE substr(wr, 1, length(wr) - 1) END AS tok2
         |    FROM (
         |      SELECT seg, rest, stp,
         |        regexp_extract(rest, '^''(?:s|t|re|ve|m|ll|d)') AS c1,
         |        regexp_extract(rest, '^ ?\\p{L}+') AS c2,
         |        regexp_extract(rest, '^ ?\\p{N}+') AS c3,
         |        regexp_extract(rest, '^ ?[^\\p{L}\\p{N}$wsCls]+') AS c4,
         |        regexp_extract(rest, '^[$wsCls]+') AS wr
         |      FROM scan WHERE rest <> ''))),
         |ptoks AS (SELECT seg, tok FROM scan WHERE tok IS NOT NULL),
         |uptok AS (SELECT DISTINCT tok FROM ptoks),
         |-- byte-unicode remap: UTF-8 bytes via hex pairs -> mapped chars
         |tpos AS (SELECT tok, hex(encode(tok)) AS hs,
         |    unnest(range(1, octet_length(encode(tok)) + 1)) AS bi
         |  FROM uptok),
         |tsym AS (SELECT t.tok, t.bi, bm.mc
         |  FROM tpos t JOIN bm ON bm.hx = substr(t.hs, 2 * t.bi - 1, 2)),
         |syms0 AS (SELECT tok, list(mc ORDER BY bi) AS syms
         |  FROM tsym GROUP BY tok),
         |enc AS (
         |  SELECT tok, syms, 0 AS step FROM syms0
         |  UNION ALL
         |  SELECT tok,
         |    list_concat(list_concat(syms[1:bi-1], [syms[bi] || syms[bi+1]]),
         |                syms[bi+2:len(syms)]) AS syms,
         |    step + 1
         |  FROM (
         |    SELECT tok, syms, step,
         |      list_position(rl, list_min(rl)) AS bi, list_min(rl) AS br
         |    FROM (
         |      SELECT e.tok, e.syms, e.step,
         |        list_transform(range(1, len(e.syms)), i ->
         |          coalesce(nullif(list_position(mm.ks,
         |            e.syms[i] || '|' || e.syms[i+1]), 0), 999999999)) AS rl
         |      FROM enc e, mm))
         |  WHERE br < 999999999),
         |wtok AS (
         |  SELECT tok, len(syms) AS nt FROM (
         |    SELECT tok, syms,
         |      row_number() OVER (PARTITION BY tok ORDER BY step DESC) AS rn
         |    FROM enc)
         |  WHERE rn = 1),
         |segtok AS (SELECT p.seg, sum(w.nt) AS nt
         |  FROM ptoks p JOIN wtok w USING (tok) GROUP BY p.seg),
         |per_doc AS (
         |  SELECT s.doc_id, CAST(sum(st.nt) AS BIGINT) AS n_tok
         |  FROM segs s JOIN segtok st USING (seg)
         |  GROUP BY s.doc_id)
         |SELECT d.doc_id,
         |  len(list_filter(string_split_regex(txt, '$ws'), w -> w <> '')) AS n_words,
         |  coalesce(p.n_tok, 0) AS n_tokens,
         |  CASE WHEN len(list_filter(string_split_regex(txt, '$ws'), w -> w <> '')) = 0
         |       THEN NULL
         |       ELSE round(CAST(coalesce(p.n_tok, 0) AS DOUBLE)
         |         / len(list_filter(string_split_regex(txt, '$ws'), w -> w <> '')), 6)
         |  END AS fertility
         |FROM d LEFT JOIN per_doc p USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin)
  }
}
