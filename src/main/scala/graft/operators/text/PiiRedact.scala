package graft.operators.text

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII detection + redaction — a first-class stage of any LLM
  * training-data pipeline (scrub emails / long identifier runs before
  * training). The synthetic corpus deliberately contains no PII (pure
  * word-salad ASCII, no digits), which would make detection over raw
  * `text` degenerate — so the query plants a deterministic, per-document
  * amount of PII first (doc_id%3+1 emails, doc_id%4 numeric ids), then
  * detects and redacts it. Pattern counts are exactly predictable, and
  * the redacted text's md5/length prove the replacement path byte-for-byte
  * against the oracle.
  *
  * Map-only over the scan (regex detect + replace in one projection) —
  * I/O-bound per split at 100 TB, no shuffle.
  */
object PiiRedact extends QueryModule {

  /** Same semantics in Java regex (Spark) and RE2 (DuckDB): no
    * backtracking constructs, explicit character classes. */
  val EmailRe = "[a-z0-9._%-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val LongNumRe = "[0-9]{4,}"

  /** Documents with planted PII appended (deterministic in doc_id). */
  private def planted(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id") < 500)
      .withColumn("injected", concat(
        col("text"), lit(" "),
        expr("repeat(concat('user-', CAST(doc_id AS STRING), '@example.com '), " +
          "CAST(doc_id % 3 + 1 AS INT))"),
        expr("repeat(concat('ref-', CAST(doc_id * 7919 AS STRING), ' '), " +
          "CAST(doc_id % 4 AS INT))")))

  def qPiiRedact(spark: SparkSession, dir: String): DataFrame = {
    def redacted(c: Column): Column =
      regexp_replace(regexp_replace(c, EmailRe, "<EMAIL>"), LongNumRe, "<NUM>")
    planted(spark, dir).select(
      col("doc_id"),
      size(regexp_extract_all(col("injected"), lit(EmailRe), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col("injected"), lit(LongNumRe), lit(0)))
        .cast("long").as("n_numbers"),
      length(redacted(col("injected"))).cast("long").as("n_chars_redacted"),
      md5(redacted(col("injected")).cast("binary")).as("redacted_md5"))
      .orderBy("doc_id")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pii_redact" -> (qPiiRedact _))

  override def oracles: Map[String, String] = Map(
    "q_pii_redact" ->
      s"""WITH planted AS (
         |  SELECT doc_id, text || ' '
         |    || repeat('user-' || CAST(doc_id AS VARCHAR) || '@example.com ',
         |              CAST(doc_id % 3 + 1 AS INT))
         |    || repeat('ref-' || CAST(doc_id * 7919 AS VARCHAR) || ' ',
         |              CAST(doc_id % 4 AS INT)) AS injected
         |  FROM documents WHERE doc_id < 500),
         |red AS (
         |  SELECT doc_id, injected,
         |    regexp_replace(regexp_replace(injected,
         |      '$EmailRe', '<EMAIL>', 'g'), '$LongNumRe', '<NUM>', 'g') AS r
         |  FROM planted)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(injected, '$EmailRe')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(injected, '$LongNumRe')) AS BIGINT) AS n_numbers,
         |  CAST(len(r) AS BIGINT) AS n_chars_redacted,
         |  md5(r) AS redacted_md5
         |FROM red ORDER BY doc_id""".stripMargin)
}
