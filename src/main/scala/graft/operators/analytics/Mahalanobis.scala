package graft.operators.analytics

import graft.{QueryModule, Tables}
import graft.functions.MahalanobisSq
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Covariance-based (Mahalanobis) outlier scoring — the distributed
  * re-expression of analisis-informe.ipynb's MinCovDet / EllipticEnvelope
  * study (robust covariance → Mahalanobis distance → outlier cut).
  *
  * Two estimators over the same distributed moment pass:
  *  - [[fitInverse]] — classical (mean, covariance) in ONE `treeAggregate`
  *    (n, Σx, upper triangle of Σxxᵀ; O(d²) per partition, nothing scales
  *    with n on the driver) + driver-side Cholesky inversion of the d×d
  *    matrix;
  *  - [[fitRobust]] — MinCovDet-style robust covariance via C-steps
  *    (Rousseeuw & Van Driessen's FastMCD refinement): score all points
  *    with the current model, keep the best-supported half, refit, repeat
  *    to a fixed point. Each C-step is one map-side scoring pass + one
  *    moment pass — fully distributed; only the d×d model visits the
  *    driver. Deterministic: starts from the classical fit rather than
  *    FastMCD's random elemental subsets (documented deviation — at
  *    moderate contamination the C-step fixed point is the same).
  *
  * Scoring is then a map-side O(d²) expression ([[MahalanobisSq]]) — the
  * same shape nearest-centroid uses: plan-constant model, no join.
  */
object Mahalanobis extends QueryModule {

  /** One distributed pass: (n, Σx, upper-tri Σxxᵀ) → (n, mean, covariance
    * + ridge). */
  private def moments(points: DataFrame, vecCol: String,
                      ridge: Double): (Long, Array[Double], Array[Array[Double]]) = {
    val spark = points.sparkSession
    import spark.implicits._
    val data = points.select(col(vecCol).cast("array<float>")).as[Array[Float]].rdd
    val first = data.take(1).headOption.getOrElse(
      throw new IllegalArgumentException("Mahalanobis: empty input"))
    val d = first.length
    val tri = d * (d + 1) / 2
    val zero = (0L, new Array[Double](d), new Array[Double](tri))
    val (n, s, ss) = data.treeAggregate(zero)(
      seqOp = (acc, x) => {
        val (cnt, sum, outer) = acc
        val n = math.min(d, x.length) // guard ragged rows like fitMinMax does
        var i = 0
        while (i < n) {
          val xi = x(i).toDouble
          sum(i) += xi
          // upper-triangle row offset: i*d - i*(i-1)/2, col j>=i
          val off = i * d - i * (i - 1) / 2 - i
          var j = i
          while (j < n) { outer(off + j) += xi * x(j); j += 1 }
          i += 1
        }
        (cnt + 1, sum, outer)
      },
      combOp = (a, b) => {
        var i = 0
        while (i < d) { a._2(i) += b._2(i); i += 1 }
        var t = 0
        while (t < tri) { a._3(t) += b._3(t); t += 1 }
        (a._1 + b._1, a._2, a._3)
      })
    require(n > 1, "Mahalanobis: need at least 2 rows")
    val mu = s.map(_ / n)
    val cov = Array.ofDim[Double](d, d)
    for (i <- 0 until d) {
      val off = i * d - i * (i - 1) / 2 - i
      for (j <- i until d) {
        val c = (ss(off + j) - n * mu(i) * mu(j)) / (n - 1)
        cov(i)(j) = c
        cov(j)(i) = c
      }
      cov(i)(i) += ridge
    }
    (n, mu, cov)
  }

  /** (mean, inverse covariance) of `vecCol` (array<float>) — classical. */
  def fitInverse(points: DataFrame, vecCol: String,
                 ridge: Double = 1e-9): (Array[Double], Array[Array[Double]]) = {
    val (_, mu, cov) = moments(points, vecCol, ridge)
    (mu, invertSpd(cov))
  }

  /** MinCovDet-style robust (mean, inverse covariance): C-step iteration
    * from the classical fit. Each step scores every point map-side with
    * the current model, thresholds at the `supportFraction` quantile of
    * the squared distances (percentile_approx at high accuracy — the
    * scale-safe threshold; an exact k-th would gather O(n) rows), refits
    * moments on the supported subset, and stops at a fixed point (stable
    * threshold) or `maxIter`. Contaminated points fall out of the support
    * after the first step, so the final covariance is not inflated by the
    * very outliers it is meant to expose (the masking effect the
    * reference's MinCovDet study targets). */
  def fitRobust(points: DataFrame, vecCol: String,
                supportFraction: Double = 0.5, maxIter: Int = 10,
                ridge: Double = 1e-9, rTol: Double = 1e-3): (Array[Double], Array[Array[Double]]) = {
    require(supportFraction > 0.0 && supportFraction <= 1.0,
      s"supportFraction must be in (0, 1], got $supportFraction")
    require(rTol >= 0, s"rTol must be non-negative, got $rTol")
    val pts = points.select(col(vecCol).cast("array<float>").as("v")).cache()
    try {
      var (_, mu, cov) = moments(pts, "v", ridge)
      var inv = invertSpd(cov)
      var prevT = Double.NaN
      var it = 0
      var converged = false
      while (it < maxIter && !converged) {
        val scored = pts.select(col("v"),
          MahalanobisSq(col("v"), mu.toIndexedSeq,
            inv.map(_.toIndexedSeq).toIndexedSeq).as("m2"))
        val t = scored.agg(
          percentile_approx(col("m2"), lit(supportFraction), lit(100000)))
          .head().getDouble(0)
        // fixed point up to relative tolerance (FastMCD stops on a stable
        // scatter determinant; the support quantile is our scale proxy).
        // Past the first few C-steps the threshold only jitters ±0.1% as
        // individual points hop across the support boundary — that is support-set
        // sampling noise, not model movement, so 1e-3 relative is the
        // productive stopping point (1e-9 runs every budgeted iteration
        // chasing noise).
        if (math.abs(t - prevT) <= rTol * math.max(1.0, math.abs(prevT)))
          converged = true
        else {
          val next = moments(scored.filter(col("m2") <= t).select("v"), "v", ridge)
          mu = next._2
          cov = next._3
          inv = invertSpd(cov)
          prevT = t
        }
        it += 1
        if (sys.env.contains("GRAFT_PROFILE"))
          System.err.println(s"[fitRobust] iter=$it t=$t converged=$converged")
      }
      (mu, inv)
    } finally pts.unpersist(blocking = false)
  }

  /** Inverse of a symmetric positive-definite matrix via Cholesky
    * (LLᵀ = A; A⁻¹ = L⁻ᵀ L⁻¹). Deterministic, no external solver. */
  private[analytics] def invertSpd(a: Array[Array[Double]]): Array[Array[Double]] = {
    val d = a.length
    val l = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- 0 to i) {
      var s = a(i)(j)
      var k = 0
      while (k < j) { s -= l(i)(k) * l(j)(k); k += 1 }
      if (i == j) {
        require(s > 0, s"covariance not positive definite at $i (pivot $s)")
        l(i)(i) = math.sqrt(s)
      } else l(i)(j) = s / l(j)(j)
    }
    // columns of L⁻¹ by forward substitution
    val linv = Array.ofDim[Double](d, d)
    for (c <- 0 until d) {
      linv(c)(c) = 1.0 / l(c)(c)
      for (i <- c + 1 until d) {
        var s = 0.0
        var k = c
        while (k < i) { s -= l(i)(k) * linv(k)(c); k += 1 }
        linv(i)(c) = s / l(i)(i)
      }
    }
    // A⁻¹ = L⁻ᵀ L⁻¹  (sum over rows k ≥ max(i,j))
    val out = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      var s = 0.0
      var k = j
      while (k < d) { s += linv(k)(i) * linv(k)(j); k += 1 }
      out(i)(j) = s
      out(j)(i) = s
    }
    out
  }

  // memoized per corpus dir: the query and the dynamic-oracle generator
  // MUST embed bit-identical (mu, Σ⁻¹) literals — the fit itself uses
  // partition-order-dependent double treeAggregate sums, which is fine
  // exactly because both sides replay the SAME fitted constants
  private val classicalCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Array[Double], Array[Array[Double]])]()

  def classicalModel(spark: SparkSession, dir: String): (Array[Double], Array[Array[Double]]) =
    classicalCache.computeIfAbsent(dir,
      _ => fitInverse(Tables.embeddings(spark, dir), "embedding"))

  // the ROBUST fit memoizes for the same reason: the C-step iteration
  // (percentile_approx thresholds, partition-order double moments) is not
  // replayable, but the FITTED (μ, Σ⁻¹) is just a constant — query and
  // oracle embed bit-identical literals, so the scoring arithmetic sits
  // under the driver hash exactly like the classical estimator's
  private val robustCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Array[Double], Array[Array[Double]])]()

  def robustModel(spark: SparkSession, dir: String): (Array[Double], Array[Array[Double]]) =
    robustCache.computeIfAbsent(dir,
      _ => fitRobust(Tables.embeddings(spark, dir), "embedding"))

  /** Top-20 Mahalanobis outliers of the embedding corpus. */
  def qMahalanobis(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val (mu, inv) = classicalModel(spark, dir)
    e.select(col("vec_id"),
      round(MahalanobisSq(col("embedding"), mu.toIndexedSeq,
        inv.map(_.toIndexedSeq).toIndexedSeq), 4).as("maha_sq"))
      .orderBy(col("maha_sq").desc, col("vec_id"))
      .limit(20)
  }

  /** Top-20 outliers by ROBUST (MinCovDet-style) distance. */
  def qMahalanobisRobust(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val (mu, inv) = robustModel(spark, dir)
    e.select(col("vec_id"),
      round(MahalanobisSq(col("embedding"), mu.toIndexedSeq,
        inv.map(_.toIndexedSeq).toIndexedSeq), 4).as("robust_maha_sq"))
      .orderBy(col("robust_maha_sq").desc, col("vec_id"))
      .limit(20)
  }

  /** The distributed moment pass under the driver hash: upper-triangle
    * sample covariance (and mean) of the embedding corpus as
    * (i, j, n, mu_i, cov) rows — the same algebra [[fitInverse]] /
    * [[fitRobust]] / PCA's Gram stage run before their (driver-side,
    * engine-specific) matrix inversion / eigen step. Ridge 0 here: the
    * regularizer is a modeling choice, not part of the moment algebra. */
  def qCovariance(spark: SparkSession, dir: String): DataFrame =
    covarianceExact(Tables.embeddings(spark, dir))

  /** Engine-exact covariance of `embedding` — shared by [[qCovariance]]
    * and the PCA projection's deterministic eigen stage.
    *
    * EVERY prior version of this query diverged between Spark and DuckDB
    * because it fed a data-dependent raw double into an engine-divergent
    * operation — round-3: partition-order double sums; round-4: the
    * double→DECIMAL(38,18) cast (Spark converts via the shortest decimal
    * repr, DuckDB scales the raw binary value: 1.0/3.0 lands on …333300
    * vs …333312) plus a final round(_, 6) on a raw double. This version
    * has NO decimal cast and NO fractional rounding of a raw double —
    * the only operations on data-dependent values are ones that are
    * provably bit-identical across IEEE-754 engines:
    *
    *  1. Quantize each component to an exact micro-unit integer,
    *     `k = CAST(round(v * 1e6) AS BIGINT)`. Integer rounding of the
    *     SAME double always agrees across engines: every half-integer
    *     below 2^52 is exactly representable in binary, so a double is
    *     either exactly on the tie (both engines round away from zero —
    *     BigDecimal HALF_UP ≡ C++ std::round) or strictly on one side of
    *     it, and Spark's shortest-repr detour cannot cross a representable
    *     boundary. (Rounding to a FRACTIONAL scale has no such guarantee —
    *     (2k+1)/2·10⁻¹² is not representable — which is why round(p, 12)
    *     alone would not close the gap.)
    *  2. Sum the k and k_i·k_j as integers (DECIMAL(38,0) accumulators on
    *     the Spark side, HUGEINT in DuckDB: exact at any corpus size —
    *     plain BIGINT sums would overflow past ~9e6 rows — and the
    *     integer→decimal cast is exact, unlike the double→decimal one).
    *     Exact sums are order-independent: repartitioning cannot move the
    *     result (the round-3 failure mode).
    *  3. Final algebra on doubles DERIVED from those exact integers, with
    *     token-identical expression trees both sides — individual IEEE
    *     ops on identical inputs are bit-identical — and the 6-decimal
    *     output rounding done as round-to-INTEGER in micro units
    *     (guarantee 1 again), never round(x, 6) on a raw double.
    *
    * Shape: two aggregations, then a dim-sized join — the d(d+1)/2-per-row
    * pair expansion sums only the products (one sum over n·d²/2 rows),
    * while Σk per dimension comes from the d-per-row element expansion (a
    * d²/2-times smaller frame); exactness makes the per-dim Σk identical
    * to what the pair groups would have summed. Both aggregates are
    * map-side partial; the join is 2080×d, broadcast-sized. */
  private[graft] def covarianceExact(points: DataFrame): DataFrame = {
    val ke = points.select(expr(
      "transform(cast(embedding as array<double>), v -> cast(round(v * 1000000.0) as bigint))")
      .as("ke"))
    val sums = ke
      .select(posexplode(col("ke")).as(Seq("i0", "k")))
      .groupBy((col("i0") + 1).cast("long").as("d"))
      .agg(count(lit(1)).as("n"), sum(col("k").cast("decimal(38,0)")).as("sx"))
    val pairs = ke
      .select(explode(expr(
        """flatten(transform(sequence(1, size(ke)), i ->
          |  transform(sequence(i, size(ke)), j ->
          |    named_struct('i', i, 'j', j, 'p', ke[i-1] * ke[j-1]))))""".stripMargin)).as("s"))
      .select(col("s.i").cast("long").as("i"), col("s.j").cast("long").as("j"),
        col("s.p").as("p"))
      .groupBy("i", "j")
      .agg(sum(col("p").cast("decimal(38,0)")).as("sxx"))
    val si = sums.select(col("d").as("i"), col("n"), col("sx").as("sxi"))
    val sj = sums.select(col("d").as("j"), col("sx").as("sxj"))
    val sxxD = col("sxx").cast("double")
    val sxiD = col("sxi").cast("double")
    val sxjD = col("sxj").cast("double")
    pairs.join(broadcast(si), Seq("i")).join(broadcast(sj), Seq("j"))
      .select(col("i"), col("j"), col("n"),
        (round(sxiD / col("n")).cast("long") / lit(1000000.0)).as("mu_i"),
        (round((sxxD - sxiD * sxjD / col("n")) / (col("n") - 1) / lit(1000000.0))
          .cast("long") / lit(1000000.0)).as("cov"))
      .orderBy("i", "j")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mahalanobis" -> (qMahalanobis _),
    "q_mahalanobis_robust" -> (qMahalanobisRobust _),
    "q_covariance" -> (qCovariance _))

  /** Replays the driver-fitted (μ, Σ⁻¹) as SQL literals and the
    * [[MahalanobisSq]] fold ADDITION-FOR-ADDITION: per i ascending, the
    * diagonal term M_ii·z_i², then 2·z_i·(Σ_{j>i} M_ij·z_j) with the inner
    * fold ascending — flatten + list_reduce reproduces the exact
    * accumulation order, so every per-row double is bit-identical and
    * q_mahalanobis sits under the driver hash (the same literal-replay
    * trick as q_pca_proj). The ROBUST twin stays rows-only: its C-step
    * support thresholds come from percentile_approx sketches. */
  override def dynamicOracles(spark: SparkSession, dir: String): Map[String, String] = {
    def replay(mu: Array[Double], inv: Array[Array[Double]], outCol: String): String = {
      val muL = mu.mkString("[", ", ", "]")
      val mL = inv.map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")
      s"""WITH lits AS (SELECT $muL AS mu, $mL AS m),
         |pts AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
         |mz AS (SELECT vec_id, len(x) AS d, l.m AS m,
         |  list_transform(range(1, len(x) + 1), i -> x[i] - l.mu[i]) AS z
         |  FROM pts CROSS JOIN lits l),
         |sc AS (SELECT vec_id,
         |  list_reduce(flatten(list_transform(range(1, d + 1), i ->
         |    [ m[i][i] * z[i] * z[i],
         |      2.0 * z[i] * (CASE WHEN i = d THEN 0.0 ELSE
         |        list_reduce(list_transform(range(i + 1, d + 1), j -> m[i][j] * z[j]),
         |          (p, q) -> p + q) END) ])),
         |    (p, q) -> p + q) AS m2
         |  FROM mz)
         |SELECT vec_id, round(m2, 4) AS $outCol FROM sc
         |ORDER BY $outCol DESC, vec_id LIMIT 20""".stripMargin
    }
    val (cMu, cInv) = classicalModel(spark, dir)
    val (rMu, rInv) = robustModel(spark, dir)
    Map(
      "q_mahalanobis" -> replay(cMu, cInv, "maha_sq"),
      // same literal-replay argument as the classical estimator: the
      // C-step FIT is not replayable, the fitted constants are
      "q_mahalanobis_robust" -> replay(rMu, rInv, "robust_maha_sq"))
  }

  /** Matrix inversion is not SQL-expressible in static form — the ROBUST
    * distance query stays rows-only (invariants incl. planted-contamination
    * recovery in MahalanobisSpec); the classical one is oracled via
    * [[dynamicOracles]] literal replay. The shared moment pass IS plain
    * aggregation: q_covariance replays [[covarianceExact]]'s micro-unit
    * algebra — quantize to BIGINT (engine-exact integer rounding), exact
    * integer sums (HUGEINT here, DECIMAL(38,0) on the Spark side), then
    * the identical double expression tree with round-to-integer output
    * quantization. No double→decimal cast and no fractional round of a
    * raw double on either side. */
  override def oracles: Map[String, String] = Map(
    "q_covariance" ->
      """WITH el AS (
        |  SELECT vec_id, generate_subscripts(ke, 1) AS i, unnest(ke) AS k
        |  FROM (SELECT vec_id,
        |          list_transform(CAST(embedding AS DOUBLE[]),
        |                         v -> CAST(round(v * 1000000.0) AS BIGINT)) AS ke
        |        FROM embeddings)),
        |pairs AS (
        |  SELECT a.i AS i, b.i AS j, a.k * b.k AS p, a.k AS ki, b.k AS kj
        |  FROM el a JOIN el b ON a.vec_id = b.vec_id AND b.i >= a.i),
        |ag AS (
        |  SELECT i, j, count(*) AS n,
        |    sum(p) AS sxx, sum(ki) AS sxi, sum(kj) AS sxj
        |  FROM pairs GROUP BY i, j)
        |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
        |  CAST(n AS BIGINT) AS n,
        |  CAST(round(CAST(sxi AS DOUBLE) / n) AS BIGINT) / 1000000.0 AS mu_i,
        |  CAST(round((CAST(sxx AS DOUBLE) - CAST(sxi AS DOUBLE) * CAST(sxj AS DOUBLE) / n)
        |             / (n - 1) / 1000000.0) AS BIGINT) / 1000000.0 AS cov
        |FROM ag ORDER BY i, j""".stripMargin)
}
