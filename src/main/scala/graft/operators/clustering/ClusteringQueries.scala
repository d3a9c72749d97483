package graft.operators.clustering

import graft.{QueryModule, Tables}
import graft.functions.VectorOps._
import graft.functions.NearestCentroid
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Clustering-support operators around a fixed centroid table (SURVEY §2
  * "Clustering & evaluation") — the deterministic half of the reference's
  * clustering pipeline, oracle-checkable because the centroids are a
  * deterministic function of the data (normalized embeddings of vec_id<8,
  * standing in for the reference's cluster_centroids.csv).
  *
  * Assignment is the map-side [[NearestCentroid]] expression — no join, no
  * shuffle; every downstream stat is one shuffle on centroid_id/document_id.
  */
object ClusteringQueries extends QueryModule {

  val K = 8

  /** Deterministic centroid matrix: L2-normalized embeddings of the first K
    * vec_ids (driver-sized: K×64 doubles). */
  def centroids(spark: SparkSession, dir: String): Seq[Seq[Double]] =
    Tables.embeddings(spark, dir)
      .filter(col("vec_id") < K)
      .orderBy("vec_id")
      .select(vec_normalize(col("embedding")))
      .collect()
      .map(_.getSeq[Double](0).toIndexedSeq)
      .toIndexedSeq

  /** Normalized points with their assignment struct. */
  def assigned(spark: SparkSession, dir: String): DataFrame = {
    val cs = centroids(spark, dir)
    Tables.embeddings(spark, dir)
      .withColumn("asg", NearestCentroid(vec_normalize(col("embedding")), cs))
      .select(col("vec_id"), col("label"),
        col("asg.centroid_id").as("centroid_id"), col("asg.dist").as("dist"))
  }

  /** Nearest-centroid classification (cluster_creator.py classify_embedding). */
  def qNearestCentroid(spark: SparkSession, dir: String): DataFrame =
    assigned(spark, dir)
      .select(col("vec_id"), col("centroid_id"), round(col("dist"), 6).as("dist"))
      .orderBy("vec_id")

  /** Per-cluster distance outliers: dist > mean + 1·std within the assigned
    * cluster (nuevo-kmeans-pre.ipynb plot_histograms_and_identify_outliers).
    *
    * The mean/std feed a row-membership FILTER, so they are computed from
    * DECIMAL window sums of the ROUNDED distance (order-free, engine-
    * exact — avg/stddev_samp window merges are partition-order-dependent
    * and could flip a boundary row in or out; same hardening as
    * q_covariance). d6² is a per-row double product (bit-identical), the
    * variance algebra mirrors the oracle token-for-token. */
  def qCentroidOutliers(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("centroid_id"))
    assigned(spark, dir)
      .withColumn("d6", round(col("dist"), 6))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s1", sum(col("d6").cast("decimal(25,6)")).over(w).cast("double"))
      .withColumn("s2",
        sum((col("d6") * col("d6")).cast("decimal(30,12)")).over(w).cast("double"))
      .withColumn("mean_d", col("s1") / col("n"))
      .withColumn("std_d", sqrt(
        (col("s2") - col("n") * (col("s1") / col("n")) * (col("s1") / col("n")))
          / (col("n") - 1)))
      .filter(col("d6") > col("mean_d") + lit(1.0) * col("std_d"))
      .select(col("vec_id"), col("centroid_id"), col("d6").as("dist"),
        round(col("mean_d"), 6).as("mean_d"), round(col("std_d"), 6).as("std_d"))
      .orderBy("vec_id")
  }

  /** Per-cluster distance-to-centroid histogram (0.1-wide buckets) — the
    * distribution behind nuevo-kmeans-pre.ipynb's
    * plot_histograms_and_identify_outliers; one shuffle on
    * (centroid_id, bucket) after the map-side assignment. */
  def qCentroidHist(spark: SparkSession, dir: String): DataFrame =
    assigned(spark, dir)
      .groupBy(col("centroid_id"), floor(col("dist") * 10).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("centroid_id", "bucket")

  /** Top-3 nearest-to-centroid exemplars per cluster — the reference samples
    * these as LLM labeling prompts (update-etiquetas.ipynb:228). Uses the
    * custom TopKPerGroup operator (bounded heaps, no window sort). */
  def qClusterExemplars(spark: SparkSession, dir: String): DataFrame =
    graft.plans.TopKPerGroup(
      assigned(spark, dir).select(col("centroid_id"), col("vec_id"), col("dist")),
      Seq("centroid_id"), Seq("dist", "vec_id"), 3)
      .select(col("centroid_id"), col("rk"), col("vec_id"), round(col("dist"), 6).as("dist"))
      .orderBy("centroid_id", "rk")

  /** Label merge-back (ChunkLabelingProcesor.merge_documents): majority
    * assigned cluster over a document's chunks becomes the document's
    * etiqueta_cluster; join-update onto the documents table. */
  def qLabelMerge(spark: SparkSession, dir: String): DataFrame = {
    val cs = centroids(spark, dir)
    val chunkAsg = Tables.chunks(spark, dir)
      .withColumn("centroid_id",
        NearestCentroid(vec_normalize(col("embedding")), cs).getField("centroid_id"))
    val w = Window.partitionBy(col("document_id"))
      .orderBy(col("n").desc, col("centroid_id"))
    val docLabel = chunkAsg.groupBy(col("document_id"), col("centroid_id"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("document_id"), col("centroid_id").as("etiqueta_cluster"))
    Tables.documents(spark, dir)
      .join(docLabel, col("doc_id") === col("document_id"), "left")
      .select(col("doc_id"), col("lang"), col("etiqueta_cluster"))
      .orderBy("doc_id")
  }

  /** Hard ceiling for [[silhouetteExact]]'s all-pairs form: ~10k rows =
    * 10⁸ candidate pairs, the most a sample-scale diagnostic should pay.
    * Guarded with a loud failure so the operator cannot silently be
    * pointed at a full table. */
  val MaxSilhouetteRows = 10000L

  /** Exact silhouette over an (id, label, vector) frame. All-pairs BY
    * DESIGN and therefore sample-only (guarded): the reference itself
    * computes silhouette_score with sample_size=2000
    * (nuevo-kmeans-pre.ipynb:112); at 100 TB this operator runs on such a
    * sample, never the corpus. */
  def silhouetteExact(e: DataFrame): DataFrame = {
    // limit-bounded guard: scans at most MaxSilhouetteRows+1 rows even
    // when pointed at a huge upstream plan it is about to reject
    val over = e.limit(MaxSilhouetteRows.toInt + 1).count() > MaxSilhouetteRows
    require(!over,
      s"silhouetteExact is an all-pairs sample-scale diagnostic: input exceeds " +
        s"$MaxSilhouetteRows rows. Sample the input first " +
        "(df.sample or limit) — the result is an estimate either way.")
    silhouetteUnguarded(e)
  }

  /** Deterministic self-sample before the guarded all-pairs kernel: keep
    * ids ≡ 0 (mod ceil(n / MaxSilhouetteRows)) — the identity filter at
    * reference scale (m = 1), an id-arithmetic sample the oracle replays
    * verbatim beyond it. The reference itself silhouettes a sample
    * (sample_size=2000, nuevo-kmeans-pre.ipynb:112); this makes the
    * query's sampling contract explicit instead of failing the guard the
    * first time the corpus outgrows the cap (found by the sf1 stress
    * pass). */
  def qSilhouetteExact(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val m = math.max(1L,
      math.ceil(e.count() / MaxSilhouetteRows.toDouble).toLong)
    silhouetteExact(e.filter(col("vec_id") % m === 0))
  }

  private def silhouetteUnguarded(e: DataFrame): DataFrame = {
    val a = e.select(col("vec_id").as("i"), col("label").as("la"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("j"), col("label").as("lb"), col("embedding").as("eb"))
    val meanDists = a.join(b, col("i") =!= col("j"))
      .select(col("i"), col("la"), col("lb"),
        euclidean_dist(col("ea"), col("eb")).as("d"))
      .groupBy(col("i"), col("la"), col("lb"))
      // round-then-decimal-sum means throughout (not avg of raw doubles):
      // decimal sums are order-free and engine-exact -- the covariance
      // lesson applied to both aggregation levels of the silhouette
      .agg(round(sum(round(col("d"), 6).cast("decimal(25,6)")).cast("double")
        / count(lit(1)), 6).as("md"))
    val perPoint = meanDists.groupBy(col("i"), col("la"))
      .agg(
        max(when(col("lb") === col("la"), col("md"))).as("a_i"),
        min(when(col("lb") =!= col("la"), col("md"))).as("b_i"))
      .withColumn("s_i", (col("b_i") - col("a_i")) / greatest(col("a_i"), col("b_i")))
    perPoint.groupBy(col("la").as("label"))
      .agg(round(sum(round(col("s_i"), 6).cast("decimal(25,6)")).cast("double")
        / count(lit(1)), 4).as("mean_sil"), count(lit(1)).as("n"))
      .orderBy("label")
  }

  /** Cluster-validity indices the reference's k-sweeps pair with the
    * silhouette (sklearn's other two standard metrics): Calinski-Harabasz
    * = (B/(k−1))/(W/(n−k)) and Davies-Bouldin = mean_i max_{j≠i}
    * (s_i+s_j)/d(c_i,c_j), over the deterministic first-K centroids so
    * both engines replay the identical assignment.
    *
    * Scale shape: ONE scan computes all per-point terms map-side
    * (NearestCentroid distance); W and the per-dim global mean are
    * decimal-summed partial aggregates; everything after collapses to
    * k-sized frames (k=8) — the k×k Davies-Bouldin pair table is a
    * driver-built literal frame joined by equi-key, never a nested-loop
    * join. Rounding discipline: per-row terms rounded(6) → DECIMAL sums;
    * all downstream algebra token-identical in the oracle. */
  def qClusterValidity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cs = centroids(spark, dir)
    val k = cs.length
    val pts = validityCache.persist(Tables.embeddings(spark, dir)
      .withColumn("v", vec_normalize(col("embedding")))
      .withColumn("asg", NearestCentroid(col("v"), cs))
      .select(col("vec_id"), col("v"),
        col("asg.centroid_id").as("cell"), col("asg.dist").as("dist")))
    // global count + within-cluster sum of squares (decimal: order-free)
    val glob = pts.agg(
      count(lit(1)).as("n_pts"),
      sum(round(col("dist") * col("dist"), 6).cast("decimal(25,6)"))
        .cast("double").as("w_raw"))
    // per-dim global mean of the normalized vectors (64 rows, driver-bounded)
    val gRows = pts.select(posexplode(col("v")).as(Seq("d", "x")))
      .groupBy("d")
      .agg((sum(round(col("x"), 6).cast("decimal(25,6)")).cast("double")
        / count(lit(1))).as("m"))
      .collect()
    val gbar = new Array[Double](gRows.length)
    gRows.foreach(r => gbar(r.getInt(0)) = r.getDouble(1))
    val gbarCol = array(gbar.map(lit).toIndexedSeq: _*)
    // per-centroid squared distance to the global mean (k literal rows)
    val centDf = cs.zipWithIndex.map { case (c, i) => (i, c) }.toDF("cell", "cv")
    val bDf = centDf.select(col("cell"),
      round(aggregate(zip_with(col("cv"), gbarCol, (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x), 6).as("bd6"))
    // per-cluster size + mean distance to own centroid
    val si = pts.groupBy("cell").agg(
      count(lit(1)).as("n_i"),
      round(sum(round(col("dist"), 6).cast("decimal(25,6)")).cast("double")
        / count(lit(1)), 6).as("s_i"))
    val bSum = si.join(broadcast(bDf), Seq("cell"))
      .agg(sum(col("n_i").cast("decimal(9,0)") * col("bd6").cast("decimal(9,6)"))
        .cast("double").as("b_raw"))
    // Davies-Bouldin: k(k−1) literal centroid-pair distances, equi-joined
    val pairSeq = for {
      i <- cs.indices; j <- cs.indices if i != j
    } yield (i, j, math.sqrt(cs(i).zip(cs(j)).map { case (a, b) => (a - b) * (a - b) }.sum))
    val pairs = pairSeq.toDF("ci", "cj", "dij")
    val dbv = pairs
      .join(broadcast(si.select(col("cell").as("ci"), col("s_i").as("s1"))), Seq("ci"))
      .join(broadcast(si.select(col("cell").as("cj"), col("s_i").as("s2"))), Seq("cj"))
      .groupBy("ci")
      .agg(max(round((col("s1") + col("s2")) / col("dij"), 6)).as("db_i"))
      .agg(round(sum(col("db_i").cast("decimal(9,6)")).cast("double")
        / count(lit(1)), 6).as("db_index"))
    glob.crossJoin(broadcast(bSum)).crossJoin(broadcast(dbv))
      .select(lit(k).as("k"), col("n_pts"),
        round(col("w_raw"), 6).as("w_ssq"),
        round(col("b_raw"), 6).as("b_ssq"),
        round((col("b_raw") / (lit(k) - 1)) / (col("w_raw") / (col("n_pts") - lit(k))), 6)
          .as("ch_index"),
        col("db_index"))
  }
  private val validityCache = new graft.RollingCache

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cluster_validity" -> (qClusterValidity _),
    "q_nearest_centroid" -> (qNearestCentroid _),
    "q_centroid_outliers" -> (qCentroidOutliers _),
    "q_centroid_hist" -> (qCentroidHist _),
    "q_cluster_exemplars" -> (qClusterExemplars _),
    "q_label_merge" -> (qLabelMerge _),
    "q_silhouette_exact" -> (qSilhouetteExact _))

  /** Shared SQL fragments: normalized vectors (mirroring VecNormalize's
    * multiply-by-reciprocal) and the centroid CTE. Shared with the
    * streaming classify twin (graft.streaming). */
  private[graft] val NrmCte =
    """nrm AS (SELECT vec_id, label,
      |  list_transform(CAST(embedding AS DOUBLE[]),
      |    x -> x * (1.0 / sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))))) AS v
      |  FROM embeddings),
      |c AS (SELECT vec_id AS cid, v AS cv FROM nrm WHERE vec_id < 8),
      |asg AS (
      |  SELECT vec_id, label, cid AS centroid_id, dist FROM (
      |    SELECT n.vec_id, n.label, c.cid, list_distance(n.v, c.cv) AS dist,
      |      row_number() OVER (PARTITION BY n.vec_id ORDER BY list_distance(n.v, c.cv), c.cid) AS rn
      |    FROM nrm n CROSS JOIN c) WHERE rn = 1)""".stripMargin

  override def oracles: Map[String, String] = Map(
    "q_cluster_validity" ->
      s"""WITH $NrmCte,
         |tot AS (SELECT count(*) AS n,
         |  CAST(sum(CAST(round(dist * dist, 6) AS DECIMAL(25,6))) AS DOUBLE) AS w_raw
         |  FROM asg),
         |dims AS (SELECT ord,
         |    CAST(sum(CAST(round(x, 6) AS DECIMAL(25,6))) AS DOUBLE) / count(*) AS m
         |  FROM (SELECT unnest(v) AS x, generate_subscripts(v, 1) AS ord FROM nrm)
         |  GROUP BY ord),
         |gb AS (SELECT list(m ORDER BY ord) AS g FROM dims),
         |bc AS (SELECT c.cid AS cell,
         |    round(list_reduce(list_transform(range(1, len(c.cv) + 1),
         |      i -> (c.cv[i] - g.g[i]) * (c.cv[i] - g.g[i])), (a, b) -> a + b), 6) AS bd6
         |  FROM c CROSS JOIN gb g),
         |si AS (SELECT centroid_id AS cell, count(*) AS n_i,
         |    round(CAST(sum(CAST(round(dist, 6) AS DECIMAL(25,6))) AS DOUBLE) / count(*), 6) AS s_i
         |  FROM asg GROUP BY centroid_id),
         |bsum AS (SELECT
         |    CAST(sum(CAST(s.n_i AS DECIMAL(9,0)) * CAST(b.bd6 AS DECIMAL(9,6))) AS DOUBLE) AS b_raw
         |  FROM si s JOIN bc b USING (cell)),
         |cd AS (SELECT a.cid AS ci, b.cid AS cj, list_distance(a.cv, b.cv) AS dij
         |  FROM c a JOIN c b ON a.cid <> b.cid),
         |ratios AS (SELECT cd.ci, max(round((s1.s_i + s2.s_i) / cd.dij, 6)) AS db_i
         |  FROM cd JOIN si s1 ON s1.cell = cd.ci JOIN si s2 ON s2.cell = cd.cj
         |  GROUP BY cd.ci),
         |dbv AS (SELECT
         |    round(CAST(sum(CAST(db_i AS DECIMAL(9,6))) AS DOUBLE) / count(*), 6) AS db_index
         |  FROM ratios)
         |SELECT $K AS k, CAST(g.n AS BIGINT) AS n_pts,
         |  round(g.w_raw, 6) AS w_ssq,
         |  round(bs.b_raw, 6) AS b_ssq,
         |  round((bs.b_raw / ($K - 1)) / (g.w_raw / (g.n - $K)), 6) AS ch_index,
         |  d.db_index
         |FROM tot g CROSS JOIN bsum bs CROSS JOIN dbv d""".stripMargin,
    "q_nearest_centroid" ->
      s"""WITH $NrmCte
         |SELECT vec_id, centroid_id, round(dist, 6) AS dist FROM asg ORDER BY vec_id""".stripMargin,
    "q_centroid_outliers" ->
      s"""WITH $NrmCte
         |SELECT vec_id, centroid_id, d6 AS dist,
         |  round(mean_d, 6) AS mean_d, round(std_d, 6) AS std_d
         |FROM (SELECT vec_id, centroid_id, d6, mean_d,
         |    sqrt((s2 - n * (s1 / n) * (s1 / n)) / (n - 1)) AS std_d
         |  FROM (SELECT vec_id, centroid_id, d6, n,
         |      s1, s2, s1 / n AS mean_d
         |    FROM (SELECT vec_id, centroid_id, d6,
         |        count(*) OVER w AS n,
         |        CAST(sum(CAST(d6 AS DECIMAL(25,6))) OVER w AS DOUBLE) AS s1,
         |        CAST(sum(CAST(d6 * d6 AS DECIMAL(30,12))) OVER w AS DOUBLE) AS s2
         |      FROM (SELECT vec_id, centroid_id, round(dist, 6) AS d6 FROM asg)
         |      WINDOW w AS (PARTITION BY centroid_id))))
         |WHERE d6 > mean_d + 1.0 * std_d ORDER BY vec_id""".stripMargin,
    "q_centroid_hist" ->
      s"""WITH $NrmCte
         |SELECT centroid_id, CAST(floor(dist * 10) AS BIGINT) AS bucket, count(*) AS n
         |FROM asg GROUP BY 1, 2 ORDER BY centroid_id, bucket""".stripMargin,
    "q_cluster_exemplars" ->
      s"""WITH $NrmCte
         |SELECT centroid_id, rk, vec_id, round(dist, 6) AS dist FROM (
         |  SELECT centroid_id, vec_id, dist,
         |    row_number() OVER (PARTITION BY centroid_id ORDER BY dist, vec_id) AS rk
         |  FROM asg)
         |WHERE rk <= 3 ORDER BY centroid_id, rk""".stripMargin,
    "q_label_merge" ->
      s"""WITH $NrmCte,
         |docasg AS (
         |  SELECT vec_id // 8 AS document_id, centroid_id FROM asg),
         |doclabel AS (
         |  SELECT document_id, centroid_id AS etiqueta_cluster FROM (
         |    SELECT document_id, centroid_id, count(*) AS n,
         |      row_number() OVER (PARTITION BY document_id ORDER BY count(*) DESC, centroid_id) AS rk
         |    FROM docasg GROUP BY document_id, centroid_id) WHERE rk = 1)
         |SELECT doc_id, lang, etiqueta_cluster
         |FROM documents LEFT JOIN doclabel ON doc_id = document_id
         |ORDER BY doc_id""".stripMargin,
    "q_silhouette_exact" ->
      s"""WITH sprm AS (SELECT greatest(1, CAST(ceil(count(*) / $MaxSilhouetteRows.0) AS BIGINT)) AS m
        |  FROM embeddings),
        |se AS (SELECT vec_id, label, embedding FROM embeddings
        |  WHERE vec_id % (SELECT m FROM sprm) = 0),
        |md AS (
        |  SELECT a.vec_id AS i, a.label AS la, b.label AS lb,
        |    round(CAST(sum(CAST(round(list_distance(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6)
        |                       AS DECIMAL(25,6))) AS DOUBLE) / count(*), 6) AS md
        |  FROM se a JOIN se b ON a.vec_id <> b.vec_id
        |  GROUP BY 1, 2, 3),
        |pp AS (
        |  SELECT i, la,
        |    max(CASE WHEN lb = la THEN md END) AS a_i,
        |    min(CASE WHEN lb <> la THEN md END) AS b_i
        |  FROM md GROUP BY i, la)
        |SELECT la AS label,
        |  round(CAST(sum(CAST(round((b_i - a_i) / greatest(a_i, b_i), 6)
        |                      AS DECIMAL(25,6))) AS DOUBLE) / count(*), 4) AS mean_sil,
        |  count(*) AS n
        |FROM pp GROUP BY la ORDER BY label""".stripMargin)
}
