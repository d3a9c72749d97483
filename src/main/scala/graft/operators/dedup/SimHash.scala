package graft.operators.dedup

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection (SURVEY §2 "Deduplication").
  *
  * 64-bit simhash per document: explode words → xxhash64(word) → per-bit
  * ±1 vote sums (64 codegen'd conditional-sum aggregates, one shuffle on
  * doc_id) → sign bits reassembled into one long. Candidates block on the
  * 4 × 16-bit sub-bands (a pair within Hamming distance ≤ 3 must share at
  * least one of 4 bands — pigeonhole), then exact `bit_count(xor)` filter.
  */
object SimHash extends QueryModule {

  val Bits = 64
  val BandBits = 16
  val NumBands = 4
  val MaxHamming = 3

  /** (doc_id, simhash) — bit b set iff Σ±1 votes over words > 0.
    * Votes are one graft.functions.SimHashSketch buffer per doc (a single
    * update loop per word) rather than 64 separate sum(when(...)) slots. */
  def simhashes(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("w"))
      .select(col("doc_id"), xxhash64(col("w")).as("h"))
      .groupBy(col("doc_id"))
      .agg(graft.functions.SimHashSketch(col("h")).as("simhash"))

  /** Column-form twin of [[simhashes]] kept for the spec cross-check. */
  def simhashesViaColumns(docs: DataFrame): DataFrame = {
    val withH = docs
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("w"))
      .select(col("doc_id"), xxhash64(col("w")).as("h"))
    val votes: Seq[Column] = (0 until Bits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
        .as(s"v_$b")
    }
    val assembled = (0 until Bits).map { b =>
      when(col(s"v_$b") > 0, lit(1L) * lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    withH.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), assembled.as("simhash"))
  }

  /** Near-dup pairs by banded blocking + exact Hamming verification. */
  def nearDupPairs(docs: DataFrame): DataFrame = {
    val sh = simhashes(docs)
    val bandCols = (0 until NumBands).map { i =>
      struct(lit(i).as("band"),
        shiftright(col("simhash"), i * BandBits).bitwiseAND(lit(0xFFFFL)).as("bv"))
    }
    val banded = sh.select(col("doc_id"), col("simhash"),
      explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band").as("band"), col("bk.bv").as("bv"))
    banded.alias("l").join(banded.alias("r"), Seq("band", "bv"))
      .filter(col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("d1"), col("r.doc_id").as("d2"),
        col("l.simhash").as("h1"), col("r.simhash").as("h2"))
      .distinct()
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))))
      .filter(col("hamming") <= MaxHamming)
      .select(col("d1"), col("d2"), col("hamming"))
  }

  def qDedupSimhash(spark: SparkSession, dir: String): DataFrame =
    nearDupPairs(MinHashLsh.withPlantedDups(Tables.documents(spark, dir)))
      .orderBy("d1", "d2")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_simhash" -> (qDedupSimhash _))

  override def oracles: Map[String, String] = Map.empty
}
