package graft.operators.search

import graft.{QueryModule, Tables}
import graft.functions.VectorOps._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity-search operators (SURVEY §2 "Similarity & search").
  *
  * - Chunk-similarity stats re-express the reference's per-document pairwise
  *   cosine loop (chunk_similarities.ipynb:177-240) as a co-partitioned
  *   self-join on document_id — the pair count is bounded by the per-doc
  *   chunk count, so it scales linearly in documents.
  * - Brute-force top-k compiles to TakeOrderedAndProject: per-partition
  *   top-k heaps + driver merge, no global sort shuffle.
  * - kNN is a label-blocked pair join + per-key window — the blocked shape
  *   is what survives 100 TB (block = LSH bucket / IVF cell there).
  */
object SearchQueries extends QueryModule {

  /** τ for "near" pairs; the synthetic embeddings top out at cos≈0.47
    * within blocks (reference used 0.8 on real embeddings). */
  val Tau = 0.4

  def qChunkSimStats(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.chunks(spark, dir)
    val a = c.select(col("document_id"), col("vec_id").as("va"), col("embedding").as("emb_a"))
    val b = c.select(col("document_id"), col("vec_id").as("vb"), col("embedding").as("emb_b"))
    val pairs = a.join(b, Seq("document_id")).filter(col("va") < col("vb"))
      .withColumn("cos_sim", cosine_sim(col("emb_a"), col("emb_b")))
      .groupBy(col("document_id"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("cos_sim") > Tau, 1L).otherwise(0L)).as("n_above"),
        // round-then-decimal-sum mean (not avg of raw doubles): decimal
        // sums are order-free and engine-exact -- the covariance lesson
        round(sum(round(col("cos_sim"), 6).cast("decimal(25,6)")).cast("double")
          / count(lit(1)), 6).as("mean_cos"))
    val counts = c.groupBy(col("document_id")).agg(count(lit(1)).as("n_chunks"))
    counts.join(pairs, Seq("document_id"), "left")
      .select(col("document_id"), col("n_chunks"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_above"), lit(0L)).as("n_above"),
        col("mean_cos"))
      .orderBy("document_id")
  }

  /** Top-k cosine search: query = embedding of vec_id 0, corpus = rest.
    * The one-row query side is collected to a literal (driver-sized) and
    * inlined — at scale this is exactly a broadcast of the query batch. */
  def qTopkBruteforce(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = graft.Tables.headEmbeddingDouble(e.filter(col("vec_id") === 0))
    val qCol = array(q.map(v => lit(v)).toIndexedSeq: _*)
    e.filter(col("vec_id") > 0)
      .select(col("vec_id"), round(cosine_sim(col("embedding"), qCol), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(10)
  }

  /** 3 nearest neighbors per vector within its label block (euclidean):
    * exact-duplicate contraction ([[KnnContracted]]) runs the pair scan on
    * distinct vectors only, then reconstructs each point's exact top-3
    * from bounded per-group expansions — identical rows to the
    * uncontracted window formulation (the oracle replays point-level), at
    * a pair cost quadratically smaller in duplicate depth. Ties broken on
    * rounded distance then neighbor id so both engines pick the same
    * rows. */
  def qKnn(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    KnnContracted.knn(e, 3, (a, b) => round(euclidean_dist(a, b), 6))
      .select(col("v").as("vec_id"), col("rk"), col("nb").as("neighbor"),
        col("d").as("l2_dist"))
      .orderBy("vec_id", "rk")
  }

  /** kth-NN-distance outliers — the reference's NearestNeighbors outlier
    * study (analisis-informe.ipynb): a point whose 3rd-nearest neighbor is
    * far away sits in a sparse region. Reuses the contracted kNN kernel;
    * the global top-20 compiles to TakeOrderedAndProject (per-partition
    * heaps, no full sort). */
  def qKnnOutlier(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    KnnContracted.knn(e, 3, (a, b) => round(euclidean_dist(a, b), 6))
      .filter(col("rk") === 3)
      .select(col("v").as("vec_id"), col("d").as("knn_dist"))
      .orderBy(col("knn_dist").desc, col("vec_id"))
      .limit(20)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_chunk_sim_stats" -> (qChunkSimStats _),
    "q_topk_bruteforce" -> (qTopkBruteforce _),
    "q_knn" -> (qKnn _),
    "q_knn_outlier" -> (qKnnOutlier _))

  override def oracles: Map[String, String] = Map(
    "q_chunk_sim_stats" ->
      s"""WITH c AS (SELECT vec_id, vec_id // 8 AS document_id, embedding FROM embeddings),
         |p AS (
         |  SELECT a.document_id, count(*) AS n_pairs,
         |    sum(CASE WHEN list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) > $Tau
         |        THEN 1 ELSE 0 END) AS n_above,
         |    round(CAST(sum(CAST(round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6)
         |                       AS DECIMAL(25,6))) AS DOUBLE) / count(*), 6) AS mean_cos
         |  FROM c a JOIN c b ON a.document_id = b.document_id AND a.vec_id < b.vec_id
         |  GROUP BY a.document_id),
         |n AS (SELECT document_id, count(*) AS n_chunks FROM c GROUP BY document_id)
         |SELECT n.document_id, n.n_chunks,
         |  CAST(coalesce(p.n_pairs, 0) AS BIGINT) AS n_pairs,
         |  CAST(coalesce(p.n_above, 0) AS BIGINT) AS n_above, p.mean_cos
         |FROM n LEFT JOIN p ON n.document_id = p.document_id
         |ORDER BY n.document_id""".stripMargin,
    "q_topk_bruteforce" ->
      """SELECT e.vec_id,
        |  round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 6) AS cos_sim
        |FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        |WHERE e.vec_id > 0
        |ORDER BY cos_sim DESC, e.vec_id LIMIT 10""".stripMargin,
    "q_knn" ->
      """SELECT vec_id, rk, neighbor, l2_dist FROM (
        |  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor,
        |    round(list_distance(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS l2_dist,
        |    row_number() OVER (PARTITION BY a.vec_id
        |      ORDER BY round(list_distance(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6), b.vec_id) AS rk
        |  FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id <> b.vec_id)
        |WHERE rk <= 3 ORDER BY vec_id, rk""".stripMargin,
    "q_knn_outlier" ->
      """SELECT vec_id, l2_dist AS knn_dist FROM (
        |  SELECT a.vec_id AS vec_id,
        |    round(list_distance(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS l2_dist,
        |    row_number() OVER (PARTITION BY a.vec_id
        |      ORDER BY round(list_distance(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6), b.vec_id) AS rk
        |  FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id <> b.vec_id)
        |WHERE rk = 3 ORDER BY knn_dist DESC, vec_id LIMIT 20""".stripMargin)
}
