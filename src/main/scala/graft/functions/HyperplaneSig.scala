package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** Random-hyperplane LSH signature: bit i = sign(v · plane_i). The plane
  * matrix is a plan constant; one map-side pass, O(planes·d) per row —
  * the bucket-key kernel for cosine-LSH ANN (SURVEY §2).
  */
case class HyperplaneSig(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression with CodegenFallback {

  require(planes.nonEmpty && planes.length <= 64,
    s"signature is one long: need 1..64 planes, got ${planes.length} " +
      "(1L << p wraps past bit 63 and would silently alias buckets)")

  override def prettyName: String = "hyperplane_sig"
  override def dataType: DataType = LongType

  @transient private lazy val mat: Array[Array[Double]] = planes.map(_.toArray).toArray
  @transient private lazy val get = VecUtil.toDoubles(child.dataType)

  override def nullSafeEval(v: Any): Any = {
    val a = get(v.asInstanceOf[ArrayData])
    val d = a.length
    var sig = 0L
    var p = 0
    while (p < mat.length) {
      val plane = mat(p)
      val n = math.min(d, plane.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += a(i) * plane(i); i += 1 }
      if (s > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HyperplaneSig {
  def apply(vec: Column, planes: Seq[Seq[Double]]): Column =
    Shim.column(HyperplaneSig(Shim.expression(vec), planes))

  /** Deterministic gaussian planes. */
  def randomPlanes(numPlanes: Int, dim: Int, seed: Long = 7L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    IndexedSeq.fill(numPlanes)(IndexedSeq.fill(dim)(rnd.nextGaussian()))
  }
}
