package graft.operators.text

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-based quality scoring — the "fastText quality classifier" role of
  * the GPT-3/CCNet pipelines (score documents by a trained classifier
  * rather than hand rules; here the target concept is the English slice,
  * the same proxy [[graft.operators.sampling.SamplingQueries.qDsirWeights]]
  * uses). Logistic regression over the repo's own quality features:
  *
  *  - FIT: full-batch gradient descent, each step ONE distributed
  *    aggregation (Σ (σ(w·x)−y)·x via map-side partial sums) — only the
  *    (d+1)-vector visits the driver, any corpus size. The fitted weights
  *    are memoized per dir so the query and its oracle replay
  *    bit-identical literals (the q_mahalanobis pattern; exact float
  *    reproducibility of the FIT itself is not required — both sides see
  *    the same constants).
  *  - SCORE: map-side σ(w·x) with the dot product written as an explicit
  *    fixed-order sum, so per-row doubles are bit-identical across
  *    engines; ranked on the rounded score.
  */
object QualityClassifier extends QueryModule {

  /** (bias, len_score, punct_ratio, stop_ratio) feature columns. */
  private def featureCols: Seq[Column] = Seq(
    lit(1.0),
    least(lit(1.0), col("n_words") / lit(50.0)),
    col("n_punct") / col("n_chars_m"),
    col("n_stop") / col("n_words"))

  private def rawFeatures(docs: DataFrame): DataFrame = {
    val ws = filter(split(trim(lower(col("text"))), TextQueries.WsRe),
      w => length(w) > 0)
    docs.select(col("doc_id"), col("lang"),
      size(ws).cast("double").as("n_words"),
      length(col("text")).cast("double").as("n_chars_m"),
      length(regexp_replace(col("text"), "[A-Za-z0-9 \\t\\n\\r\\f\\x0B]", ""))
        .cast("double").as("n_punct"),
      size(filter(ws, w => w.isInCollection(TextQueries.StopEn)))
        .cast("double").as("n_stop"))
      .filter(col("n_words") > 0 && col("n_chars_m") > 0)
  }

  /** Fit by Newton/IRLS — 8 iterations, each ONE distributed aggregation
    * of (gradient, Hessian): grad = Σ(σ(w·x)−y)·x, H = Σ σ(1−σ)·xxᵀ
    * (+1e-6 ridge). d=4, so the driver solves a 4×4 system per step —
    * quadratic convergence where plain GD needs hundreds of passes. */
  private def fit(feats: DataFrame): Array[Double] = {
    val spark = feats.sparkSession
    import spark.implicits._
    val data = feats.select(
      array(featureCols: _*).as("x"),
      (col("lang") === "en").cast("double").as("y"))
      .as[(Seq[Double], Double)].rdd
      .map { case (x, y) => (x.toArray, y) }
      .persist()
    val d = 4
    var w = new Array[Double](d)
    for (_ <- 0 until 8) {
      val zero = (new Array[Double](d), new Array[Double](d * d))
      val (grad, hess) = data.treeAggregate(zero)(
        seqOp = { case ((g, h), (x, y)) =>
          var z = 0.0
          var i = 0
          while (i < d) { z += w(i) * x(i); i += 1 }
          val p = 1.0 / (1.0 + math.exp(-z))
          val s = p * (1.0 - p)
          i = 0
          while (i < d) {
            g(i) += (p - y) * x(i)
            var j = 0
            while (j < d) { h(i * d + j) += s * x(i) * x(j); j += 1 }
            i += 1
          }
          (g, h)
        },
        combOp = { case ((g1, h1), (g2, h2)) =>
          var i = 0
          while (i < d) { g1(i) += g2(i); i += 1 }
          i = 0
          while (i < d * d) { h1(i) += h2(i); i += 1 }
          (g1, h1)
        })
      w = subtractSolved(w, hess, grad, d)
    }
    data.unpersist()
    w
  }

  /** w − H⁻¹g via Gaussian elimination with partial pivoting (+ridge). */
  private def subtractSolved(w: Array[Double], hFlat: Array[Double],
                             g: Array[Double], d: Int): Array[Double] = {
    val a = Array.tabulate(d, d)((i, j) =>
      hFlat(i * d + j) + (if (i == j) 1e-6 else 0.0))
    val b = g.clone()
    for (c <- 0 until d) {
      var piv = c
      for (r <- c + 1 until d) if (math.abs(a(r)(c)) > math.abs(a(piv)(c))) piv = r
      val (ta, tb) = (a(c), b(c)); a(c) = a(piv); a(piv) = ta
      b(c) = b(piv); b(piv) = tb
      for (r <- c + 1 until d) {
        val f = a(r)(c) / a(c)(c)
        for (k <- c until d) a(r)(k) -= f * a(c)(k)
        b(r) -= f * b(c)
      }
    }
    val step = new Array[Double](d)
    for (i <- (d - 1) to 0 by -1) {
      var s = b(i)
      for (j <- i + 1 until d) s -= a(i)(j) * step(j)
      step(i) = s / a(i)(i)
    }
    Array.tabulate(d)(i => w(i) - step(i))
  }

  // memoized per dir: query and oracle must see identical weight literals
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Array[Double]]()
  def model(spark: SparkSession, dir: String): Array[Double] =
    cache.computeIfAbsent(dir,
      _ => fit(rawFeatures(Tables.documents(spark, dir))))

  /** Top-20 most-English-like docs by the trained classifier. */
  def qQualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    val w = model(spark, dir)
    val fs = featureCols
    // explicit fixed-order dot product: ((w0·f0 + w1·f1) + w2·f2) + w3·f3
    val z = fs.zip(w).map { case (f, wi) => f * lit(wi) }.reduce(_ + _)
    rawFeatures(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"),
        round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("p_en"))
      .orderBy(col("p_en").desc, col("doc_id"))
      .limit(20)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_quality_classifier" -> (qQualityClassifier _))

  override def oracles: Map[String, String] = Map.empty

  /** Replays the fitted weights as literals and the feature/score
    * arithmetic token-for-token (σ's exp is transcendental, hence the
    * rounded score — the same ln/exp discipline every scoring oracle
    * uses). */
  override def dynamicOracles(spark: SparkSession, dir: String): Map[String, String] = {
    val w = model(spark, dir)
    Map("q_quality_classifier" ->
      s"""WITH f AS (
         |  SELECT doc_id, lang,
         |    CAST(len(list_filter(string_split_regex(trim(lower(text)), '[ \\t\\n\\r\\f\\x0B]+'), w -> len(w) > 0)) AS DOUBLE) AS n_words,
         |    CAST(length(text) AS DOUBLE) AS n_chars_m,
         |    CAST(length(regexp_replace(text, '[A-Za-z0-9 \\t\\n\\r\\f\\x0B]', '', 'g')) AS DOUBLE) AS n_punct,
         |    CAST(len(list_filter(string_split_regex(trim(lower(text)), '[ \\t\\n\\r\\f\\x0B]+'),
         |         w -> w IN (${TextQueries.StopEn.map(s => s"'$s'").mkString(", ")}))) AS DOUBLE) AS n_stop
         |  FROM documents),
         |z AS (
         |  SELECT doc_id, lang,
         |    1.0 * (${w(0)}) + least(1.0, n_words / 50.0) * (${w(1)})
         |      + n_punct / n_chars_m * (${w(2)}) + n_stop / n_words * (${w(3)}) AS z
         |  FROM f WHERE n_words > 0 AND n_chars_m > 0)
         |SELECT doc_id, lang, round(1.0 / (1.0 + exp(-z)), 6) AS p_en
         |FROM z ORDER BY p_en DESC, doc_id LIMIT 20""".stripMargin)
  }
}
