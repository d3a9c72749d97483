package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** Squared Mahalanobis distance (x−μ)ᵀ Σ⁻¹ (x−μ) as a scalar expression.
  *
  * Reference: analisis-informe.ipynb's MinCovDet/EllipticEnvelope outlier
  * study scores chunks by Mahalanobis distance to the corpus distribution.
  * Spark-first shape: μ and Σ⁻¹ are plan-embedded constants (estimated in
  * one distributed pass, inverted driver-side at O(d³) — driver-sized for
  * embedding dims), scoring is a map-side O(d²) pass. No join, no shuffle.
  */
case class MahalanobisSq(child: Expression, mean: Seq[Double],
                         invCov: Seq[Seq[Double]])
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "mahalanobis_sq"
  override def dataType: DataType = DoubleType

  @transient private lazy val mu: Array[Double] = mean.toArray
  /** flattened row-major d×d */
  @transient private lazy val m: Array[Double] = invCov.flatten.toArray
  @transient private lazy val get = VecUtil.toDoubles(child.dataType)

  override def nullSafeEval(v: Any): Any = {
    val a = get(v.asInstanceOf[ArrayData])
    val d = math.min(a.length, mu.length)
    val z = new Array[Double](d)
    var i = 0
    while (i < d) { z(i) = a(i) - mu(i); i += 1 }
    // zᵀ M z, exploiting symmetry: Σ_i M_ii z_i² + 2 Σ_{i<j} M_ij z_i z_j
    var s = 0.0
    i = 0
    while (i < d) {
      val zi = z(i)
      s += m(i * d + i) * zi * zi
      var j = i + 1
      var t = 0.0
      while (j < d) { t += m(i * d + j) * z(j); j += 1 }
      s += 2.0 * zi * t
      i += 1
    }
    s
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MahalanobisSq {
  def apply(vec: Column, mean: Seq[Double], invCov: Seq[Seq[Double]]): Column =
    Shim.column(MahalanobisSq(Shim.expression(vec), mean, invCov))
}
