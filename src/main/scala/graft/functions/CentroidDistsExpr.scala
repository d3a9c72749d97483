package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** Per-centroid SQUARED distances of a vector against a plan-constant
  * centroid matrix, as `array<double>` ordered by centroid id — the
  * multi-distance sibling of [[NearestCentroid]] for consumers that need
  * the whole distance profile (prefix minima in the k-sweep, second-min
  * for the simplified silhouette) rather than just the argmin.
  *
  * Each entry is the 0.0-init ascending fold Σ(aᵢ−cᵢ)², i.e. exactly the
  * `list_inner_product(df, df)` the DuckDB oracles replay — and exactly
  * what `aggregate(zip_with(v, c, (x,y) -> (x-y)²), 0.0, +)` computes,
  * which this expression replaces: higher-order functions are interpreted
  * per row, while this kernel is one generated loop inside whole-stage
  * codegen (bit-identical to the interpreted path, asserted in
  * CentroidDistsSpec). */
case class CentroidDists(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {

  override def prettyName: String = "centroid_dists"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float|double> input, got ${other.sql}")
    }

  // toFloatArray/toDoubleArray silently read a null ELEMENT as 0.0, which
  // would skew every distance; parquet-read arrays are containsNull=true
  // even when the data never has nulls, so instead of rejecting the type
  // at analysis we guard nullable-element inputs with an explicit scan
  // that fails loudly on the first null element
  @transient private lazy val elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _               => false
  }

  private def requireNoNullElements(a: ArrayData): Unit = {
    var j = 0
    val n = a.numElements()
    while (j < n) {
      if (a.isNullAt(j)) throw new IllegalArgumentException(
        s"$prettyName: null array element at index $j — toFloatArray/" +
          "toDoubleArray would silently read it as 0.0")
      j += 1
    }
  }

  @transient private lazy val mat: Array[Array[Double]] = centroids.map(_.toArray).toArray
  @transient private lazy val get = VecUtil.toDoubles(child.dataType)

  override def nullSafeEval(v: Any): Any = {
    if (elementsNullable) requireNoNullElements(v.asInstanceOf[ArrayData])
    val a = get(v.asInstanceOf[ArrayData])
    val out = new Array[Double](mat.length)
    var k = 0
    while (k < mat.length) {
      val c = mat(k)
      val n = math.min(a.length, c.length)
      var s = 0.0
      var i = 0
      while (i < n) { val diff = a(i) - c(i); s += diff * diff; i += 1 }
      out(k) = s
      k += 1
    }
    new GenericArrayData(out)
  }

  // mirrors nullSafeEval exactly (same loop order, double accumulation) so
  // compiled and interpreted paths are bit-identical
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
        val matTerm = ctx.addReferenceObj("centroidMat", mat, "double[][]")
        val nullGuard = if (elementsNullable) {
          val j = ctx.freshName("j")
          s"""
             |for (int $j = 0; $j < $c.numElements(); $j++) {
             |  if ($c.isNullAt($j)) throw new IllegalArgumentException(
             |    "centroid_dists: null array element at index " + $j);
             |}
             |""".stripMargin
        } else ""
        val elemJava = child.dataType match {
          case ArrayType(FloatType, _) => "float"
          case _                       => "double"
        }
        val arr = ctx.freshName("arr")
        val out = ctx.freshName("out")
        val k = ctx.freshName("k")
        val i = ctx.freshName("i")
        s"""
           |$nullGuard
           |$elemJava[] $arr = ${ex(c)};
           |double[] $out = new double[$matTerm.length];
           |for (int $k = 0; $k < $matTerm.length; $k++) {
           |  double[] cen = $matTerm[$k];
           |  int n = Math.min($arr.length, cen.length);
           |  double s = 0.0;
           |  for (int $i = 0; $i < n; $i++) {
           |    double diff = ((double) $arr[$i]) - cen[$i];
           |    s += diff * diff;
           |  }
           |  $out[$k] = s;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           |""".stripMargin
      case None => // unexpected element type: defer to the interpreted path
        val expr = ctx.addReferenceObj("thisExpr", this, classOf[CentroidDists].getName)
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $expr.nullSafeEval($c);"
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object CentroidDists {
  /** Column API: `centroid_dists(vecCol, centroids)` → array<double> of
    * squared distances ordered by centroid id. */
  def apply(vec: Column, centroids: Seq[Seq[Double]]): Column =
    Shim.column(CentroidDists(Shim.expression(vec), centroids))
}
