package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
    extends UnaryExpression with CodegenFallback {

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

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object NearestCentroid {
  /** Column API: `nearest_centroid(vecCol, centroids)` → struct. */
  def apply(vec: Column, centroids: Seq[Seq[Double]]): Column =
    Shim.column(NearestCentroid(Shim.expression(vec), centroids))
}
