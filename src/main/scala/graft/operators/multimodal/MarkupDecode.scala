package graft.operators.multimodal

import java.nio.charset.StandardCharsets
import java.util.regex.Pattern

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** REAL text-format decoding (SURVEY §2 "Multimodal") — the no-native-libs
  * slice of the reference's document-conversion zoo (analisis-informe.ipynb
  * html/markdown/plaintext converters; the pdf/docx/OCR converters need
  * external codecs and remain represented by the declared-fake
  * [[MediaQueries.FakeDecoder]] boundary).
  *
  * [[MarkupExtractor]] converts an html or markdown payload to plain text:
  * script/style blocks, tags, and entities for html; code fences, images,
  * links, and emphasis markers for markdown; whitespace collapsed. It runs
  * inside `mapPartitions` with patterns compiled once per JVM — the same
  * expensive-init boundary a real codec needs — and the whole transform is
  * plain regex/replace arithmetic, so the DuckDB oracle replays it exactly
  * (no fake anywhere in this path).
  *
  * The corpus has no native markup, so [[markupDocs]] wraps each document
  * in deterministic html/markdown/plain scaffolding first (doc_id mod 3) —
  * the decode then strips real tags/fences/links from real payload bytes.
  */
object MarkupDecode extends QueryModule {

  /** html/markdown/plaintext → text. Patterns are shared Java regex / RE2
    * syntax (no lookaround, inline (?s) only) so both engines agree. */
  object MarkupExtractor extends Serializable {
    private val ScriptStyle =
      Pattern.compile("(?s)<(?:script|style)[^>]*>.*?</(?:script|style)>")
    private val Tags = Pattern.compile("<[^>]*>")
    private val Fences = Pattern.compile("(?s)```.*?```")
    private val Images = Pattern.compile("!\\[[^\\]]*\\]\\([^)]*\\)")
    private val Links = Pattern.compile("\\[([^\\]]*)\\]\\([^)]*\\)")
    private val Emphasis = Pattern.compile("[*_#`]")
    private val Space = Pattern.compile(graft.operators.text.TextQueries.WsRe)

    def extract(fmt: String, payload: Array[Byte]): String = {
      val s = new String(payload, StandardCharsets.UTF_8)
      val stripped = fmt match {
        case "html" =>
          val noBlocks = ScriptStyle.matcher(s).replaceAll(" ")
          val noTags = Tags.matcher(noBlocks).replaceAll(" ")
          noTags.replace("&nbsp;", " ").replace("&lt;", "<")
            .replace("&gt;", ">").replace("&quot;", "\"")
            .replace("&amp;", "&")
        case "md" =>
          val noFences = Fences.matcher(s).replaceAll(" ")
          val noImages = Images.matcher(noFences).replaceAll(" ")
          val noLinks = Links.matcher(noImages).replaceAll("$1")
          Emphasis.matcher(noLinks).replaceAll("")
        case _ => s
      }
      Space.matcher(stripped).replaceAll(" ").trim
    }
  }

  /** Documents wrapped in deterministic markup: payload = real html /
    * markdown / plain bytes (doc_id mod 3). */
  def markupDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      element_at(array(lit("html"), lit("md"), lit("txt")),
        (col("doc_id") % 3 + 1).cast("int")).as("fmt"),
      encode(
        when(col("doc_id") % 3 === 0,
          concat(lit("<html><head><style>p{margin:0}</style>"),
            lit("<script>var x=1;</script></head><body><h1>Title</h1><p>"),
            col("text"), lit(" &amp; more</p></body></html>")))
        .when(col("doc_id") % 3 === 1,
          concat(lit("# Title\n\n**intro** "), col("text"),
            lit(" [source](http://example.com/a)\n\n```x = 1```\n")))
        .otherwise(col("text")),
        "UTF-8").as("payload"))

  case class MarkupRecord(doc_id: Long, fmt: String, payload: Array[Byte])
  case class Extracted(doc_id: Long, fmt: String, raw_len: Int,
                       text_len: Int, n_words: Int)

  /** The decode stage: per-partition extractor over the payload bytes. */
  def extractText(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    markupDocs(spark, dir).as[MarkupRecord].mapPartitions { it =>
      val ex = MarkupExtractor // per-partition init point for real codecs
      it.map { r =>
        val text = ex.extract(r.fmt, r.payload)
        val words = if (text.isEmpty) 0 else text.split(' ').count(_.nonEmpty)
        Extracted(r.doc_id, r.fmt, r.payload.length, text.length, words)
      }
    }.toDF()
  }

  /** Per-format decode rollup — oracle-checked end to end: the oracle
    * rebuilds the wrapped payloads and replays the strip pipeline with
    * the same regexes in SQL. */
  def qMediaDecode(spark: SparkSession, dir: String): DataFrame =
    extractText(spark, dir)
      .groupBy(col("fmt"))
      .agg(count(lit(1)).as("n"),
        sum(col("raw_len").cast("long")).as("sum_raw"),
        sum(col("text_len").cast("long")).as("sum_text"),
        round(avg(col("n_words").cast("double")), 6).as("avg_words"))
      .orderBy("fmt")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_decode" -> (qMediaDecode _))

  override def oracles: Map[String, String] = Map(
    "q_media_decode" ->
      """WITH wrapped AS (
        |  SELECT doc_id,
        |    ['html','md','txt'][CAST(doc_id % 3 + 1 AS INT)] AS fmt,
        |    CASE
        |      WHEN doc_id % 3 = 0 THEN
        |        '<html><head><style>p{margin:0}</style>' ||
        |        '<script>var x=1;</script></head><body><h1>Title</h1><p>' ||
        |        text || ' &amp; more</p></body></html>'
        |      WHEN doc_id % 3 = 1 THEN
        |        '# Title' || chr(10) || chr(10) || '**intro** ' || text ||
        |        ' [source](http://example.com/a)' || chr(10) || chr(10) ||
        |        '```x = 1```' || chr(10)
        |      ELSE text
        |    END AS payload
        |  FROM documents),
        |extracted AS (
        |  SELECT doc_id, fmt, octet_length(encode(payload)) AS raw_len,
        |    trim(regexp_replace(
        |      CASE
        |        WHEN fmt = 'html' THEN
        |          replace(replace(replace(replace(replace(
        |            regexp_replace(
        |              regexp_replace(payload,
        |                '(?s)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g'),
        |              '<[^>]*>', ' ', 'g'),
        |            '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
        |            '&quot;', '"'), '&amp;', '&')
        |        WHEN fmt = 'md' THEN
        |          regexp_replace(
        |            regexp_replace(
        |              regexp_replace(
        |                regexp_replace(payload, '(?s)```.*?```', ' ', 'g'),
        |                '!\[[^\]]*\]\([^)]*\)', ' ', 'g'),
        |              '\[([^\]]*)\]\([^)]*\)', '\1', 'g'),
        |            '[*_#`]', '', 'g')
        |        ELSE payload
        |      END,
        |      '[ \t\n\r\f\x0B]+', ' ', 'g')) AS text
        |  FROM wrapped)
        |SELECT fmt, count(*) AS n,
        |  CAST(sum(raw_len) AS BIGINT) AS sum_raw,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_text,
        |  round(avg(CAST(len(list_filter(string_split(text, ' '), w -> w != ''))
        |                 AS DOUBLE)), 6) AS avg_words
        |FROM extracted
        |GROUP BY fmt ORDER BY fmt""".stripMargin)
}
