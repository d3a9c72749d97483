package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** Random-hyperplane LSH signature: bit i = sign(v · plane_i). The plane
  * matrix is a plan constant; one map-side pass, O(planes·d) per row —
  * the bucket-key kernel for cosine-LSH ANN (SURVEY §2). Codegen'd (the
  * plane matrix rides along as a reference object; the generated loop
  * mirrors nullSafeEval's accumulation order exactly).
  */
case class HyperplaneSig(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val extract: Option[String => String] = child.dataType match {
      case ArrayType(FloatType, _)  => Some(c => s"$c.toFloatArray()")
      case ArrayType(DoubleType, _) => Some(c => s"$c.toDoubleArray()")
      case _                        => None
    }
    nullSafeCodeGen(ctx, ev, c => extract match {
      case Some(ex) =>
        val matTerm = ctx.addReferenceObj("planesMat", mat, "double[][]")
        val elemJava = child.dataType match {
          case ArrayType(FloatType, _) => "float"
          case _                       => "double"
        }
        val arr = ctx.freshName("arr")
        val sig = ctx.freshName("sig")
        val p = ctx.freshName("p")
        val i = ctx.freshName("i")
        s"""
           |$elemJava[] $arr = ${ex(c)};
           |long $sig = 0L;
           |for (int $p = 0; $p < $matTerm.length; $p++) {
           |  double[] plane = $matTerm[$p];
           |  int n = Math.min($arr.length, plane.length);
           |  double s = 0.0;
           |  for (int $i = 0; $i < n; $i++) {
           |    s += ((double) $arr[$i]) * plane[$i];
           |  }
           |  if (s > 0) $sig |= (1L << $p);
           |}
           |${ev.value} = $sig;
           |""".stripMargin
      case None => // unexpected element type: defer to the interpreted path
        val expr = ctx.addReferenceObj("thisExpr", this, classOf[HyperplaneSig].getName)
        s"${ev.value} = (Long) $expr.nullSafeEval($c);"
    })
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
