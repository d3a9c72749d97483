package graft.operators.search

import graft.{QueryModule, Tables}
import graft.functions.VectorOps._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vector-primitive queries over the embeddings table, oracle-checked
  * against DuckDB's list functions (list_inner_product / list_distance /
  * list_cosine_similarity). Pair enumeration is the adjacent-id self-join —
  * a co-partitioned merge join on vec_id, no cross product.
  *
  * DuckDB accumulates its list kernels in double; our expressions accumulate
  * in double in index order, so results agree bit-for-bit — still rounded to
  * 6 for defense (SURVEY §5).
  */
object VectorQueries extends QueryModule {

  private def adjacentPairs(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val a = e.select(col("vec_id"), col("embedding").as("emb_a"))
    val b = e.select((col("vec_id") - 1).as("vec_id"), col("embedding").as("emb_b"))
    a.join(b, "vec_id") // pairs (i, i+1)
  }

  def qVecNorm(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), round(vec_norm(col("embedding")), 6).as("norm"))
      .orderBy("vec_id")

  /** Unit-normalize, emitted as (vec_id, dim_idx, value) scalar rows — the
    * driver's pandas harness cannot hash array-typed columns, so the array
    * is unnested with lockstep ordinals (posexplode here; DuckDB unnest +
    * generate_subscripts in the oracle). */
  def qVecNormalize(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        posexplode(vec_normalize(col("embedding"))).as(Seq("dim_idx", "v")))
      .select(col("vec_id"), col("dim_idx"), round(col("v"), 6).as("value"))
      .orderBy("vec_id", "dim_idx")

  def qVecDot(spark: SparkSession, dir: String): DataFrame =
    adjacentPairs(spark, dir)
      .select(col("vec_id"), round(vec_dot(col("emb_a"), col("emb_b")), 6).as("dot"))
      .orderBy("vec_id")

  def qCosinePairs(spark: SparkSession, dir: String): DataFrame =
    adjacentPairs(spark, dir)
      .select(col("vec_id"), round(cosine_sim(col("emb_a"), col("emb_b")), 6).as("cos_sim"))
      .orderBy("vec_id")

  def qEuclideanPairs(spark: SparkSession, dir: String): DataFrame =
    adjacentPairs(spark, dir)
      .select(col("vec_id"), round(euclidean_dist(col("emb_a"), col("emb_b")), 6).as("l2_dist"))
      .orderBy("vec_id")

  def qManhattanPairs(spark: SparkSession, dir: String): DataFrame =
    adjacentPairs(spark, dir)
      .select(col("vec_id"), round(manhattan_dist(col("emb_a"), col("emb_b")), 6).as("l1_dist"))
      .orderBy("vec_id")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_vec_norm" -> (qVecNorm _),
    "q_vec_normalize" -> (qVecNormalize _),
    "q_vec_dot" -> (qVecDot _),
    "q_cosine_pairs" -> (qCosinePairs _),
    "q_euclidean_pairs" -> (qEuclideanPairs _),
    "q_manhattan_pairs" -> (qManhattanPairs _))

  // DuckDB list element access is 1-based; embeddings are FLOAT[] so every
  // kernel casts to DOUBLE[] first to match our double accumulation.
  override def oracles: Map[String, String] = Map(
    "q_vec_norm" ->
      """SELECT vec_id,
        |  round(sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))), 6) AS norm
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_vec_normalize" ->
      """SELECT vec_id,
        |  CAST(generate_subscripts(CAST(embedding AS DOUBLE[]), 1) - 1 AS INT) AS dim_idx,
        |  round(unnest(CAST(embedding AS DOUBLE[]))
        |        * (1.0 / sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))), 6) AS value
        |FROM embeddings ORDER BY vec_id, dim_idx""".stripMargin,
    "q_vec_dot" ->
      """SELECT a.vec_id,
        |  round(list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS dot
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |ORDER BY a.vec_id""".stripMargin,
    "q_cosine_pairs" ->
      """SELECT a.vec_id,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |ORDER BY a.vec_id""".stripMargin,
    "q_euclidean_pairs" ->
      """SELECT a.vec_id,
        |  round(list_distance(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS l2_dist
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |ORDER BY a.vec_id""".stripMargin,
    "q_manhattan_pairs" ->
      """SELECT a.vec_id,
        |  round(list_sum(list_transform(range(1, len(a.embedding) + 1),
        |    i -> abs(CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)))), 6) AS l1_dist
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |ORDER BY a.vec_id""".stripMargin)
}
