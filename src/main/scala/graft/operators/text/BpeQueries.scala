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

  /** Deterministic corpus-trained merge rules. */
  def trainMerges(spark: SparkSession, dir: String,
                  numMerges: Int = NumMerges): Seq[(String, String)] = {
    val freqs = Tables.documents(spark, dir)
      .select(explode(split(trim(lower(col("text"))), TextQueries.WsRe)).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(MaxVocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    Bpe.learn(freqs, numMerges)
  }

  /** Per-doc subword counts + fertility (tokens per word) — the token
    * budget a training pipeline prices a corpus by. Merge table is
    * data-dependent → rows-only; the algorithm is pinned by BpeSpec's
    * hand-computed merges. */
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
}
