package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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
    extends UnaryExpression {

  override def prettyName: String = "mahalanobis_sq"
  override def dataType: DataType = DoubleType

  @transient private lazy val mu: Array[Double] = mean.toArray
  /** flattened row-major d×d */
  @transient private lazy val m: Array[Double] = invCov.flatten.toArray
  @transient private lazy val get = VecUtil.toDoubles(child.dataType)

  override def nullSafeEval(v: Any): Any = {
    val a = get(v.asInstanceOf[ArrayData])
    // stride of the flattened matrix is ALWAYS mu.length — a shorter input
    // vector only shortens the loops, never the row stride
    val dim = mu.length
    val d = math.min(a.length, dim)
    val z = new Array[Double](d)
    var i = 0
    while (i < d) { z(i) = a(i) - mu(i); i += 1 }
    // zᵀ M z, exploiting symmetry: Σ_i M_ii z_i² + 2 Σ_{i<j} M_ij z_i z_j
    var s = 0.0
    i = 0
    while (i < d) {
      val zi = z(i)
      s += m(i * dim + i) * zi * zi
      var j = i + 1
      var t = 0.0
      while (j < d) { t += m(i * dim + j) * z(j); j += 1 }
      s += 2.0 * zi * t
      i += 1
    }
    s
  }

  // Codegen mirrors nullSafeEval exactly (same loop order/symmetry trick) —
  // bit-identical paths; μ and the flattened Σ⁻¹ ride as reference objects.
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val extract: Option[String => String] = child.dataType match {
      case ArrayType(FloatType, _)  => Some(c => s"$c.toFloatArray()")
      case ArrayType(DoubleType, _) => Some(c => s"$c.toDoubleArray()")
      case _                        => None
    }
    nullSafeCodeGen(ctx, ev, c => extract match {
      case Some(ex) =>
        val muTerm = ctx.addReferenceObj("muArr", mu, "double[]")
        val mTerm = ctx.addReferenceObj("invCovFlat", m, "double[]")
        val elemJava = child.dataType match {
          case ArrayType(FloatType, _) => "float"
          case _                       => "double"
        }
        val arr = ctx.freshName("arr")
        val z = ctx.freshName("z")
        val d = ctx.freshName("d")
        val dim = ctx.freshName("dim")
        val acc = ctx.freshName("acc")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        s"""
           |$elemJava[] $arr = ${ex(c)};
           |int $dim = $muTerm.length;
           |int $d = Math.min($arr.length, $dim);
           |double[] $z = new double[$d];
           |for (int $i = 0; $i < $d; $i++) { $z[$i] = ((double) $arr[$i]) - $muTerm[$i]; }
           |double $acc = 0.0;
           |for (int $i = 0; $i < $d; $i++) {
           |  double zi = $z[$i];
           |  $acc += $mTerm[$i * $dim + $i] * zi * zi;
           |  double t = 0.0;
           |  for (int $j = $i + 1; $j < $d; $j++) { t += $mTerm[$i * $dim + $j] * $z[$j]; }
           |  $acc += 2.0 * zi * t;
           |}
           |${ev.value} = $acc;
           |""".stripMargin
      case None =>
        val expr = ctx.addReferenceObj("thisExpr", this, classOf[MahalanobisSq].getName)
        s"${ev.value} = (Double) $expr.nullSafeEval($c);"
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MahalanobisSq {
  def apply(vec: Column, mean: Seq[Double], invCov: Seq[Seq[Double]]): Column =
    Shim.column(MahalanobisSq(Shim.expression(vec), mean, invCov))
}
