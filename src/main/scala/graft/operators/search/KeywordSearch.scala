package graft.operators.search

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BM25 keyword relevance — the lexical half of the reference's hybrid
  * index (Azure AI Search scores keyword queries with BM25 alongside vector
  * similarity; the thesis's corpus lives in exactly such an index).
  *
  * Shape: tokenize → per-doc term frequencies for the query terms only
  * (the filter lands BEFORE the shuffle, so the aggregated frame is
  * O(docs × query_terms), not O(total tokens)) → document frequencies
  * (query_terms rows, broadcast) → per-(doc, term) BM25 partial → fixed
  * per-term sum. The per-term sum is written as one conditional max per
  * query term added in a FIXED order, so the double addition is
  * order-deterministic and the DuckDB oracle matches bit-for-bit.
  */
object KeywordSearch extends QueryModule {

  val K1 = 1.2
  val B = 0.75
  /** Query terms for the oracle-checked query (fixed order — the score sum
    * adds them in this order on both engines). */
  val Query: Seq[String] = Seq("vector", "spark", "merge")

  /** Top-k BM25 search over `docs(idCol, textCol)` for `terms`.
    *
    * ONE tokenize + ONE groupBy: per-doc length and per-term tf come out of
    * the same aggregation (conditional sums — the term list is query-sized),
    * and corpus stats (n_docs, avgdl, per-term df) reduce the doc-sized
    * frame to one broadcast row. The token stream is scanned once — the
    * count that actually matters at 100 TB. Per-term score contributions
    * are added in fixed term order, keeping the double sum
    * engine-deterministic (oracle matches bit-for-bit). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int): DataFrame = {
    val tokens = docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), graft.operators.text.TextQueries.WsRe)).as("term"))
      .filter(length(col("term")) > 0)
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, 1L).otherwise(0L)).as(s"tf_$i") }
    val perDoc = tokens.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dl"), tfCols: _*)
      .cache()
    val statAggs = Seq(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl")) ++
      terms.indices.map(i => sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)
    val termScore: Seq[Column] = terms.indices.map { i =>
      when(col(s"tf_$i") > 0,
        log((col("n_docs") - col(s"df_$i") + 0.5) / (col(s"df_$i") + 0.5) + 1.0) *
          (col(s"tf_$i") * (K1 + 1.0)) /
          (col(s"tf_$i") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl"))))
        .otherwise(lit(0.0))
    }
    perDoc.crossJoin(broadcast(stats))
      .filter(terms.indices.map(i => col(s"tf_$i") > 0).reduce(_ || _))
      .select(col("doc_id"), round(termScore.reduce(_ + _), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  def qBm25(spark: SparkSession, dir: String): DataFrame =
    bm25TopK(Tables.documents(spark, dir), "doc_id", "text", Query, 10)

  /** Reciprocal-rank fusion (Azure AI Search's hybrid fusion): each input
    * is an (id, score) frame, ranked by score desc with id tie-break; a doc
    * scores Σ 1/(rrfK + rank) over the lists it appears in. Rank-based, so
    * the fused double sum is float-order-proof across engines. */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, k: Int,
              rrfK: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def ranked(df: DataFrame, rkName: String) = {
      val score = df.columns.filter(_ != idCol).head
      df.withColumn(rkName, row_number().over(
        Window.orderBy(col(score).desc, col(idCol))))
        .select(col(idCol), col(rkName))
    }
    ranked(a, "__rka").join(ranked(b, "__rkb"), Seq(idCol), "full_outer")
      .select(col(idCol),
        round(coalesce(lit(1.0) / (lit(rrfK) + col("__rka")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("__rkb")), lit(0.0)), 6).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
  }

  /** Hybrid keyword+vector retrieval fused with reciprocal-rank fusion —
    * the reference index's hybrid mode (Azure AI Search fuses its BM25 and
    * vector rankings with RRF at k=60). Doc-level vector rank = best chunk
    * cosine to the query vector (vec 0); both candidate lists are top-50;
    * rrf = Σ 1/(60+rank) over the lists a doc appears in. Rank-based, so
    * fusion is float-order-proof and the oracle matches exactly. */
  def qHybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val n = 50
    val kw = bm25TopK(Tables.documents(spark, dir), "doc_id", "text", Query, n)
    val e = Tables.embeddings(spark, dir)
    val q = Tables.headEmbeddingDouble(e.filter(col("vec_id") === 0))
    val qCol = array(q.map(v => lit(v)).toIndexedSeq: _*)
    val vec = e
      .select(expr("vec_id DIV 8").as("doc_id"),
        graft.functions.VectorOps.cosine_sim(col("embedding"), qCol).as("cos"))
      .groupBy("doc_id").agg(round(max(col("cos")), 6).as("best_cos"))
      .orderBy(col("best_cos").desc, col("doc_id")).limit(n)
    rrfFuse(kw, vec, "doc_id", k = 10)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bm25" -> (qBm25 _),
    "q_hybrid_rrf" -> (qHybridRrf _))

  override def oracles: Map[String, String] = Map(
    "q_bm25" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(text, '[ \t\n\r\f\x0B]+')) AS term FROM documents),
        |tok2 AS (SELECT doc_id, term FROM tok WHERE length(term) > 0),
        |dl AS (SELECT doc_id, count(*) AS dl FROM tok2 GROUP BY doc_id),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok2
        |  WHERE term IN ('vector', 'spark', 'merge') GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |sc AS (
        |  SELECT tf.doc_id, tf.term,
        |    ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) *
        |      (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS s
        |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats)
        |SELECT doc_id, round(
        |    coalesce(max(CASE WHEN term = 'vector' THEN s END), 0) +
        |    coalesce(max(CASE WHEN term = 'spark' THEN s END), 0) +
        |    coalesce(max(CASE WHEN term = 'merge' THEN s END), 0), 6) AS score
        |FROM sc GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,
    "q_hybrid_rrf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(text, '[ \t\n\r\f\x0B]+')) AS term FROM documents),
        |tok2 AS (SELECT doc_id, term FROM tok WHERE length(term) > 0),
        |dl AS (SELECT doc_id, count(*) AS dl FROM tok2 GROUP BY doc_id),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok2
        |  WHERE term IN ('vector', 'spark', 'merge') GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |sc AS (
        |  SELECT tf.doc_id, tf.term,
        |    ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) *
        |      (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS s
        |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
        |bm AS (
        |  SELECT doc_id, round(
        |      coalesce(max(CASE WHEN term = 'vector' THEN s END), 0) +
        |      coalesce(max(CASE WHEN term = 'spark' THEN s END), 0) +
        |      coalesce(max(CASE WHEN term = 'merge' THEN s END), 0), 6) AS score
        |  FROM sc GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 50),
        |kw AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rk_kw FROM bm),
        |vecs AS (
        |  SELECT vec_id // 8 AS doc_id,
        |    list_cosine_similarity(CAST(embedding AS DOUBLE[]),
        |      (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) AS cos
        |  FROM embeddings),
        |bestv AS (SELECT doc_id, round(max(cos), 6) AS best_cos FROM vecs
        |  GROUP BY doc_id ORDER BY best_cos DESC, doc_id LIMIT 50),
        |vec AS (SELECT doc_id, row_number() OVER (ORDER BY best_cos DESC, doc_id) AS rk_vec FROM bestv)
        |SELECT doc_id, round(
        |    coalesce(1.0 / (60 + rk_kw), 0) + coalesce(1.0 / (60 + rk_vec), 0), 6) AS rrf
        |FROM kw FULL OUTER JOIN vec USING (doc_id)
        |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin)
}
