package graft.operators.projection

import graft.{QueryModule, Tables}
import graft.functions.VectorOps._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Landmark MDS nonlinear projection (SURVEY §2 "Projection") — the
  * distributed stand-in for the reference's UMAP 2D/3D embeddings
  * (nuevo-kmeans-pre.ipynb). UMAP itself has no faithful distributed
  * form; Landmark MDS (de Silva & Tenenbaum 2004 — public) is the
  * classical scalable approximation: solve MDS exactly on m landmarks,
  * then place every other point by distance-based triangulation.
  *
  * Scale shape:
  *  1. landmarks: the m lowest-id points (deterministic, driver-sized
  *     collect — same pattern as IVF centroids / DBSCAN pivots);
  *  2. driver: m×m squared-distance matrix → double centering
  *     B = −½·J·Δ·J → top-k eigenpairs by power iteration with
  *     deflation (deterministic fixed init). O(m²·d + k·m²) on the
  *     driver, independent of n;
  *  3. map-side out-of-sample embedding: for point x with squared
  *     landmark distances δ(x), coordinate k is
  *     −½·(vₖ/√λₖ)·(δ(x) − δ̄) — per-landmark `euclidean_dist_sq`
  *     against plan-constant vectors + a literal linear combination,
  *     all inside whole-stage codegen. No shuffle, no join: the model
  *     rides the plan.
  */
object LandmarkMds {

  /** Fitted model: landmark vectors, column means of Δ, and per-axis
    * triangulation weights wₖ = vₖ/√λₖ (axes ordered by descending λ). */
  case class Model(landmarks: Array[Array[Double]], deltaMean: Array[Double],
                   weights: Array[Array[Double]], eigenvalues: Array[Double])

  def fit(points: DataFrame, idCol: String, vecCol: String,
          numLandmarks: Int = 32, dims: Int = 2): Model = {
    require(dims >= 1 && dims <= numLandmarks,
      s"dims must be in [1, numLandmarks]: $dims vs $numLandmarks")
    val lm: Array[Array[Double]] = points
      .orderBy(col(idCol)).limit(numLandmarks)
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val m = lm.length
    require(m >= 2, s"need at least 2 landmarks, got $m")
    // squared-distance matrix and its double centering
    val delta = Array.tabulate(m, m)((i, j) => sqDist(lm(i), lm(j)))
    val colMean = Array.tabulate(m)(j => delta.map(_(j)).sum / m)
    val grand = colMean.sum / m
    val b = Array.tabulate(m, m)((i, j) =>
      -0.5 * (delta(i)(j) - colMean(i) - colMean(j) + grand))
    val (values, vectors) = topEigen(b, dims)
    val weights = Array.tabulate(dims) { k =>
      val s = math.sqrt(math.max(values(k), 1e-12))
      vectors(k).map(_ / s)
    }
    Model(lm, colMean, weights, values)
  }

  /** Append `dims` projection columns (p0, p1, …) — map-side only. */
  def transform(df: DataFrame, vecCol: String, model: Model,
                precision: Int = 6): DataFrame = {
    val m = model.landmarks.length
    // δ(x) − δ̄ per landmark, then one literal linear combination per axis
    val dCols: IndexedSeq[Column] = (0 until m).map { j =>
      euclidean_dist_sq(col(vecCol),
        typedLit(model.landmarks(j).toSeq)) - lit(model.deltaMean(j))
    }
    model.weights.zipWithIndex.foldLeft(df) { case (acc, (w, k)) =>
      val proj = (0 until m).map(j => dCols(j) * lit(-0.5 * w(j))).reduce(_ + _)
      acc.withColumn(s"p$k", round(proj, precision))
    }
  }

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Top-k eigenpairs of a symmetric matrix by power iteration with
    * deflation. Deterministic: fixed alternating-sign init (never
    * orthogonal to all of a symmetric spectrum in practice; convergence
    * is checked, not assumed). */
  private[projection] def topEigen(a: Array[Array[Double]], k: Int,
                                   maxIter: Int = 500,
                                   tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val m = a.length
    val work = a.map(_.clone())
    val values = new Array[Double](k)
    val vectors = new Array[Array[Double]](k)
    for (e <- 0 until k) {
      var v = Array.tabulate(m)(i => if (i % 2 == 0) 1.0 else -1.0 + 0.1 * e)
      normalize(v)
      var lambda = 0.0
      var it = 0
      var done = false
      while (it < maxIter && !done) {
        val next = matVec(work, v)
        val nl = norm(next)
        if (nl < 1e-300) { done = true; lambda = 0.0 } // zero block: spectrum exhausted
        else {
          normalize(next)
          val newLambda = dot(next, matVec(work, next))
          if (math.abs(newLambda - lambda) <= tol * math.max(1.0, math.abs(newLambda)))
            done = true
          lambda = newLambda
          v = next
        }
        it += 1
      }
      values(e) = lambda
      vectors(e) = v
      // deflate: A ← A − λ v vᵀ
      for (i <- 0 until m; j <- 0 until m) work(i)(j) -= lambda * v(i) * v(j)
    }
    (values, vectors)
  }

  private def matVec(a: Array[Array[Double]], v: Array[Double]): Array[Double] =
    Array.tabulate(a.length)(i => dot(a(i), v))
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def norm(v: Array[Double]): Double = math.sqrt(dot(v, v))
  private def normalize(v: Array[Double]): Unit = {
    val n = norm(v)
    if (n > 0) { var i = 0; while (i < v.length) { v(i) /= n; i += 1 } }
  }
}

/** Query module: 2-D Landmark-MDS embedding of the corpus. */
object LandmarkMdsQueries extends QueryModule {

  /** Per-label centroid of the 2-D embedding + spread — the scatter-plot
    * summary the reference reads off its UMAP figures. Model is
    * data-dependent (rows-only); geometry invariants in LandmarkMdsSpec. */
  // memoized per dir: the query and the dynamic-oracle generator must
  // embed bit-identical model literals (fit is deterministic driver
  // arithmetic, but sharing one instance makes that contract structural)
  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[String, LandmarkMds.Model]()

  def model(spark: SparkSession, dir: String): LandmarkMds.Model =
    modelCache.computeIfAbsent(dir,
      _ => LandmarkMds.fit(Tables.embeddings(spark, dir), "vec_id", "embedding"))

  /** Per-label centroid/σ of the 2-D LMDS projection. The per-row
    * projections are literal linear combinations (map-side, replayable);
    * the means/σ use ROUNDED-then-DECIMAL sums so the label stats are
    * partition-order-free — which is what lets the whole query sit under
    * the driver hash via [[dynamicOracles]] literal replay (r4; was
    * rows-only while it aggregated with avg/stddev_samp). */
  def qLmds(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val mdl = model(spark, dir)
    def mean(c: String) =
      round(sum(col(c).cast("decimal(25,6)")).cast("double") / count(lit(1)), 4)
    def std(c: String) = {
      val n = count(lit(1))
      val s1 = sum(col(c).cast("decimal(25,6)")).cast("double")
      val s2 = sum((col(c) * col(c)).cast("decimal(30,12)")).cast("double")
      round(sqrt((s2 - n * (s1 / n) * (s1 / n)) / (n - 1)), 4)
    }
    LandmarkMds.transform(e, "embedding", mdl)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        mean("p0").as("c0"), mean("p1").as("c1"),
        std("p0").as("s0"), std("p1").as("s1"))
      .orderBy("label")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_lmds" -> (qLmds _))

  override def oracles: Map[String, String] = Map.empty

  /** Replays the fitted landmarks / Δ-means / axis weights as SQL
    * literals, the VecEuclideanSq and Σⱼ folds addition-for-addition, and
    * the decimal label stats token-for-token (the q_mahalanobis pattern;
    * literals hoisted into a one-row CTE so DuckDB materializes them once,
    * not per lambda call). */
  override def dynamicOracles(spark: SparkSession, dir: String): Map[String, String] = {
    val mdl = model(spark, dir)
    val m = mdl.landmarks.length
    def l(v: Array[Double]): String = v.mkString("[", ", ", "]")
    val lms = mdl.landmarks.map(l).mkString("[", ", ", "]")
    // per-axis coefficients fold the -0.5 in, exactly as transform does
    val w0 = l(mdl.weights(0).map(-0.5 * _))
    val w1 = l(mdl.weights(1).map(-0.5 * _))
    Map("q_lmds" ->
      s"""WITH lits AS (SELECT $lms AS lms, ${l(mdl.deltaMean)} AS dm,
         |                     $w0 AS w0, $w1 AS w1),
         |pts AS (SELECT label, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
         |dz AS (SELECT label,
         |  list_transform(range(1, $m + 1), j ->
         |    list_reduce(list_transform(range(1, len(x) + 1),
         |      i -> (x[i] - l.lms[j][i]) * (x[i] - l.lms[j][i])), (p, q) -> p + q)
         |    - l.dm[j]) AS d,
         |  l.w0 AS w0, l.w1 AS w1
         |  FROM pts CROSS JOIN lits l),
         |pr AS (SELECT label,
         |  round(list_reduce(list_transform(range(1, $m + 1), j -> d[j] * w0[j]),
         |    (p, q) -> p + q), 6) AS p0,
         |  round(list_reduce(list_transform(range(1, $m + 1), j -> d[j] * w1[j]),
         |    (p, q) -> p + q), 6) AS p1
         |  FROM dz)
         |SELECT label, count(*) AS n,
         |  round(CAST(sum(CAST(p0 AS DECIMAL(25,6))) AS DOUBLE) / count(*), 4) AS c0,
         |  round(CAST(sum(CAST(p1 AS DECIMAL(25,6))) AS DOUBLE) / count(*), 4) AS c1,
         |  round(sqrt((CAST(sum(CAST(p0 * p0 AS DECIMAL(30,12))) AS DOUBLE)
         |    - count(*) * (CAST(sum(CAST(p0 AS DECIMAL(25,6))) AS DOUBLE) / count(*))
         |      * (CAST(sum(CAST(p0 AS DECIMAL(25,6))) AS DOUBLE) / count(*)))
         |    / (count(*) - 1)), 4) AS s0,
         |  round(sqrt((CAST(sum(CAST(p1 * p1 AS DECIMAL(30,12))) AS DOUBLE)
         |    - count(*) * (CAST(sum(CAST(p1 AS DECIMAL(25,6))) AS DOUBLE) / count(*))
         |      * (CAST(sum(CAST(p1 AS DECIMAL(25,6))) AS DOUBLE) / count(*)))
         |    / (count(*) - 1)), 4) AS s1
         |FROM pr GROUP BY label ORDER BY label""".stripMargin)
  }
}
