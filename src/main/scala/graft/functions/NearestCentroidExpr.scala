package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** Nearest-centroid assignment as a single scalar expression.
  *
  * Reference: cluster_creator.py / nuevo-kmeans-pre.ipynb `classify_embedding`
  * (cdist argmin over the centroid matrix). The Spark-first shape: the
  * centroid matrix is a plan-embedded constant (broadcast with the closure),
  * and assignment is one map-side pass — no join, no shuffle, O(k·d) per
  * row. This is the kernel a distributed KMeans assign step uses at 100 TB.
  *
  * Ties (bit-equal distances) resolve to the smallest centroid index,
  * matching the oracle's `ORDER BY dist, cid`.
  *
  * Returns struct(centroid_id int, dist double) — euclidean distance.
  */
case class NearestCentroid(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {

  override def prettyName: String = "nearest_centroid"
  override def dataType: DataType = StructType(Seq(
    StructField("centroid_id", IntegerType, nullable = false),
    StructField("dist", DoubleType, nullable = false)))

  @transient private lazy val mat: Array[Array[Double]] = centroids.map(_.toArray).toArray
  @transient private lazy val get = VecUtil.toDoubles(child.dataType)

  override def nullSafeEval(v: Any): Any = {
    val a = get(v.asInstanceOf[ArrayData])
    val d = a.length
    var best = -1
    var bestDist = Double.PositiveInfinity
    var k = 0
    while (k < mat.length) {
      val c = mat(k)
      val n = math.min(d, c.length)
      var s = 0.0
      var i = 0
      while (i < n) { val diff = a(i) - c(i); s += diff * diff; i += 1 }
      val dist = math.sqrt(s)
      if (dist < bestDist) { bestDist = dist; best = k }
      k += 1
    }
    InternalRow(best, bestDist)
  }

  // ---- whole-stage codegen -----------------------------------------------
  // Mirrors nullSafeEval exactly (same loop order, double accumulation) so
  // compiled and interpreted paths are bit-identical; the centroid matrix
  // rides along as a reference object. Keeps the assignment inside the
  // surrounding WholeStageCodegen span (and lets subexpression elimination
  // compute the struct once for .getField("centroid_id")/.getField("dist")).
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
        val elemJava = child.dataType match {
          case ArrayType(FloatType, _) => "float"
          case _                       => "double"
        }
        val arr = ctx.freshName("arr")
        val best = ctx.freshName("best")
        val bestD = ctx.freshName("bestD")
        val k = ctx.freshName("k")
        val i = ctx.freshName("i")
        s"""
           |$elemJava[] $arr = ${ex(c)};
           |int $best = -1;
           |double $bestD = Double.POSITIVE_INFINITY;
           |for (int $k = 0; $k < $matTerm.length; $k++) {
           |  double[] cen = $matTerm[$k];
           |  int n = Math.min($arr.length, cen.length);
           |  double s = 0.0;
           |  for (int $i = 0; $i < n; $i++) {
           |    double diff = ((double) $arr[$i]) - cen[$i];
           |    s += diff * diff;
           |  }
           |  double dist = Math.sqrt(s);
           |  if (dist < $bestD) { $bestD = dist; $best = $k; }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
           |  new Object[]{ Integer.valueOf($best), Double.valueOf($bestD) });
           |""".stripMargin
      case None => // unexpected element type: defer to the interpreted path
        val expr = ctx.addReferenceObj("thisExpr", this, classOf[NearestCentroid].getName)
        s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $expr.nullSafeEval($c);"
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object NearestCentroid {
  /** Column API: `nearest_centroid(vecCol, centroids)` → struct. */
  def apply(vec: Column, centroids: Seq[Seq[Double]]): Column =
    Shim.column(NearestCentroid(Shim.expression(vec), centroids))
}
