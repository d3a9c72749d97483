package graft.operators.projection

import graft.{QueryModule, Tables}
import graft.functions.VectorOps._
import graft.operators.analytics.Mahalanobis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ORACLE-CHECKED PCA projection (nuevo-kmeans-pre.ipynb's 2D projection,
  * the half of PCA that IS deterministic): top-2 eigenvectors of the
  * DETERMINISTIC engine-exact covariance ([[Mahalanobis.covarianceExact]])
  * are computed once on the driver (64×64 cyclic Jacobi — d²-sized, no
  * engine-specific solver), then each row's |projection| onto them is a
  * map-side plan-constant dot product. The oracle replays the SAME
  * eigenvector literals in SQL (the LSH seeded-planes pattern generalized
  * to data-derived constants via [[QueryModule.dynamicOracles]]), so the
  * whole projection arithmetic sits under the driver hash. |proj| is
  * emitted because an eigenvector's SIGN is arbitrary: abs makes the
  * output invariant to solver convention while still failing on any real
  * covariance/eigen/projection bug.
  *
  * q_pca (MLlib full PCA) stays rows-only — MLlib's eigensolver is
  * engine-specific; THIS query pins the arithmetic.
  *
  * Scale: covariance is the one-shuffle decimal moment pass; eigen is
  * O(d³) on d=64 driver-side; projection is map-side, no join, inside
  * whole-stage codegen via the VecDot expression.
  */
object PcaProjection extends QueryModule {

  final case class Model(v1: Array[Double], v2: Array[Double],
                         c1: Double, c2: Double)

  // memoized per corpus dir: the queries() invocation and the oracle
  // generator MUST see bit-identical literals
  private val cached = new java.util.concurrent.ConcurrentHashMap[String, Model]()

  def model(spark: SparkSession, dir: String): Model =
    cached.computeIfAbsent(dir, _ => compute(spark, dir))

  private def compute(spark: SparkSession, dir: String): Model = {
    val rows = Mahalanobis.covarianceExact(Tables.embeddings(spark, dir))
      .collect() // d(d+1)/2 rows — driver-sized by construction
    val d = rows.map(_.getLong(0)).max.toInt
    val cov = Array.ofDim[Double](d, d)
    val mu = new Array[Double](d)
    rows.foreach { r =>
      val i = r.getLong(0).toInt - 1
      val j = r.getLong(1).toInt - 1
      val c = r.getDouble(4)
      cov(i)(j) = c; cov(j)(i) = c
      if (i == j) mu(i) = r.getDouble(3)
    }
    val (vals, vecs) = jacobiEigen(cov)
    val order = vals.indices.sortBy(i => (-vals(i), i))
    val v1 = canonical(vecs(order(0)))
    val v2 = canonical(vecs(order(1)))
    Model(v1, v2, dot(mu, v1), dot(mu, v2))
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Deterministic sign convention: the largest-|component| coordinate
    * (first such index on ties) is made positive. */
  private def canonical(v: Array[Double]): Array[Double] = {
    var bi = 0; var i = 1
    while (i < v.length) { if (math.abs(v(i)) > math.abs(v(bi))) bi = i; i += 1 }
    if (v(bi) < 0) v.map(x => -x) else v
  }

  /** Cyclic Jacobi eigen-decomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvectors as rows). Deterministic sweep order,
    * fixed stopping rule — no RNG, no external solver. */
  private[projection] def jacobiEigen(a: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val n = a.length
    val m = a.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      for (p <- 0 until n; q <- p + 1 until n) s += m(p)(q) * m(p)(q)
      s
    }
    var sweep = 0
    while (sweep < 100 && off() > 1e-22) {
      for (p <- 0 until n - 1; q <- p + 1 until n if math.abs(m(p)(q)) > 1e-300) {
        val theta = (m(q)(q) - m(p)(p)) / (2.0 * m(p)(q))
        val t =
          if (theta == 0.0) 1.0
          else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        val mpp = m(p)(p); val mqq = m(q)(q); val mpq = m(p)(q)
        m(p)(p) = c * c * mpp - 2.0 * s * c * mpq + s * s * mqq
        m(q)(q) = s * s * mpp + 2.0 * s * c * mpq + c * c * mqq
        m(p)(q) = 0.0; m(q)(p) = 0.0
        for (k <- 0 until n if k != p && k != q) {
          val mkp = m(k)(p); val mkq = m(k)(q)
          m(k)(p) = c * mkp - s * mkq; m(p)(k) = m(k)(p)
          m(k)(q) = s * mkp + c * mkq; m(q)(k) = m(k)(q)
        }
        for (k <- 0 until n) {
          val vkp = v(k)(p); val vkq = v(k)(q)
          v(k)(p) = c * vkp - s * vkq
          v(k)(q) = s * vkp + c * vkq
        }
      }
      sweep += 1
    }
    // eigenvector i = column i of v, returned as row i for convenience
    (Array.tabulate(n)(i => m(i)(i)), Array.tabulate(n)(i =>
      Array.tabulate(n)(k => v(k)(i))))
  }

  /** |projection| of every embedding onto the top-2 covariance
    * eigenvectors (centered: dot(x, v) − dot(μ, v)). */
  def qPcaProj(spark: SparkSession, dir: String): DataFrame = {
    val mdl = model(spark, dir)
    def lits(v: Array[Double]) = array(v.map(lit).toIndexedSeq: _*)
    Tables.embeddings(spark, dir).select(col("vec_id"),
      round(abs(vec_dot(col("embedding"), lits(mdl.v1)) - lit(mdl.c1)), 6).as("p1"),
      round(abs(vec_dot(col("embedding"), lits(mdl.v2)) - lit(mdl.c2)), 6).as("p2"))
      .orderBy("vec_id")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pca_proj" -> (qPcaProj _))

  override def oracles: Map[String, String] = Map.empty

  /** Replays the driver-computed eigenvectors/centers as SQL literals —
    * list_inner_product's in-order fold matches VecDot bit-for-bit (the
    * q_vec_dot-green kernel), and round/abs are per-row double ops. */
  override def dynamicOracles(spark: SparkSession, dir: String): Map[String, String] = {
    val mdl = model(spark, dir)
    def l(v: Array[Double]): String = v.mkString("[", ", ", "]")
    Map("q_pca_proj" ->
      s"""SELECT vec_id,
         |  round(abs(list_inner_product(CAST(embedding AS DOUBLE[]), ${l(mdl.v1)}) - (${mdl.c1})), 6) AS p1,
         |  round(abs(list_inner_product(CAST(embedding AS DOUBLE[]), ${l(mdl.v2)}) - (${mdl.c2})), 6) AS p2
         |FROM embeddings ORDER BY vec_id""".stripMargin)
  }
}
