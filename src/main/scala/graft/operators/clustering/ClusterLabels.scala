package graft.operators.clustering

import graft.{QueryModule, Tables}
import graft.operators.text.TfIdfQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cluster LABELING — the offline stand-in for the reference's LLM
  * cluster-labeling step (nuevo-kmeans-pre.ipynb / update-etiquetas.ipynb
  * send per-cluster exemplar text to an external LLM for an `etiqueta`;
  * that call is out of scope, but its input-building and a defensible
  * label are not): the top class-distinctive terms per embedding cluster
  * via class-based TF-IDF (the BERTopic c-TF-IDF formula, Grootendorst
  * 2022: W(t,c) = tf(t,c) · ln(1 + A / f(t)), A = average tokens per
  * class, f(t) = corpus frequency of t).
  *
  * Composition: deterministic centroids + the map-side NearestCentroid
  * assignment (no assignment shuffle) → chunk→doc text join → one
  * (cluster, term) shuffle with map-side partial agg → term-frequency
  * join → per-cluster top-5 window over the vocab-sized frame. Ranking on
  * the ROUNDED score (ln differs in the last ulp across engines — the
  * q_tfidf discipline). Fully replayed by the DuckDB oracle.
  *
  * Scale: everything is (cluster, term)- or term-keyed aggregation; the
  * only corpus-sized shuffle is the doc join, standard equi-join. Nothing
  * driver-side but two scalars (doc count, token total).
  */
object ClusterLabels extends QueryModule {

  private val TopTerms = 5
  private val tfCache = new graft.RollingCache

  /** Top-5 c-TF-IDF label terms per cluster. */
  def qClusterLabels(spark: SparkSession, dir: String): DataFrame = {
    val k = ClusteringQueries.K
    val asg = ClusteringQueries.assigned(spark, dir)
      .select(col("vec_id"), col("centroid_id"))
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.count()
    // FACTORIZED tf: every chunk of a document carries the document's
    // text, so tokenizing the chunk join would tokenize each text once
    // per chunk (~ChunksPerDoc× the string work). Instead tokenize each
    // document ONCE, then weight its per-term counts by the number of
    // that document's chunks assigned to each cluster — exact integer
    // algebra, tf(c,t) = Σ_d nd(t,d)·chunks(d,c), bit-identical to the
    // unfactored form (and to the oracle, which replays the join shape).
    val chunkMult = asg
      .withColumn("doc_id", col("vec_id") % nDocs)
      .groupBy("doc_id", "centroid_id").agg(count(lit(1)).as("mult"))
    val docTf = TfIdfQueries.tokensOf(docs.select(col("doc_id"), col("text")),
        "doc_id", "text")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("ntf"))
    // tf feeds THREE consumers (the `total` scalar below, ft, and the
    // final join) — cache it or the doc join + both groupBys run per
    // consumer (RollingCache: survives the lazy caller, one live copy)
    val tf = tfCache.persist(docTf.join(chunkMult, Seq("doc_id"))
      .groupBy(col("centroid_id").as("cid"), col("term"))
      .agg(sum(col("ntf") * col("mult")).as("tf")))
    val ft = tf.groupBy("term").agg(sum(col("tf")).as("ft"))
    // A = total tokens / k. total < 2^53 and k is a power of two in the
    // diagnostic, so the division is exact — the oracle recomputes the
    // same double instead of pasting a literal.
    val total = tf.agg(sum(col("tf"))).head().getLong(0)
    val a = total.toDouble / k
    val w = Window.partitionBy(col("cid"))
      .orderBy(col("ctfidf").desc, col("term"))
    tf.join(ft, Seq("term"))
      .withColumn("ctfidf",
        round(col("tf") * log(lit(1.0) + lit(a) / col("ft")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopTerms)
      .select(col("cid").as("centroid_id"), col("rk").cast("long").as("rk"),
        col("term"), col("tf"), col("ft"), col("ctfidf"))
      .orderBy("centroid_id", "rk")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cluster_labels" -> (qClusterLabels _))

  /** Replays assignment (shared centroid CTE), the chunk→doc text join,
    * tokenization, and the c-TF-IDF formula; ranks on the rounded score
    * with the term as tiebreak. */
  override def oracles: Map[String, String] = Map(
    "q_cluster_labels" ->
      s"""WITH ${ClusteringQueries.NrmCte},
         |nd AS (SELECT count(*) AS n FROM documents),
         |chunks AS (
         |  SELECT a.centroid_id AS cid, d.text
         |  FROM asg a CROSS JOIN nd
         |  JOIN documents d ON d.doc_id = a.vec_id % nd.n),
         |toks AS (
         |  SELECT cid, unnest(list_filter(
         |    string_split_regex(trim(lower(text)), '[ \\t\\n\\r\\f\\x0B]+'), w -> len(w) > 0)) AS term
         |  FROM chunks),
         |tf AS (SELECT cid, term, count(*) AS tf FROM toks GROUP BY cid, term),
         |ft AS (SELECT term, sum(tf) AS ft FROM tf GROUP BY term),
         |tot AS (SELECT CAST(sum(tf) AS DOUBLE) AS total FROM tf),
         |scored AS (
         |  SELECT tf.cid, tf.term, tf.tf, ft.ft,
         |    round(tf.tf * ln(1.0 + t.total / ${ClusteringQueries.K}.0 / ft.ft), 6) AS ctfidf
         |  FROM tf JOIN ft USING (term) CROSS JOIN tot t),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY cid
         |    ORDER BY ctfidf DESC, term) AS rk
         |  FROM scored)
         |SELECT CAST(cid AS INT) AS centroid_id, CAST(rk AS BIGINT) AS rk, term,
         |  CAST(tf AS BIGINT) AS tf, CAST(ft AS BIGINT) AS ft, ctfidf
         |FROM ranked WHERE rk <= $TopTerms ORDER BY centroid_id, rk""".stripMargin)
}
