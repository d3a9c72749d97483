package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** PQ codeword gather: codes (array<int>, one per subspace) → the
  * reconstructed d-dim vector, concatenating each subspace's codeword.
  *
  * Replaces the previous formulation — `concat(element_at(<array-of-array
  * literal>, ...))` per subspace — whose M×k×subDim literal doubles (2048
  * at M=8, k=32) unrolled into seconds of Janino compilation per plan and
  * forced k down to 32 (VERDICT r2 #8). Here the codebooks ride along as
  * ONE plan-constant flat double[] reference (no literals in the generated
  * source); eval and the generated loop are the same arraycopy gather, so
  * the two paths are trivially bit-identical and compile time no longer
  * scales with codebook size.
  */
// codebooks is an IndexedSeq, not Array: case-class equality on arrays is
// reference-based, which would make two semantically identical instances
// compare unequal and defeat Catalyst subexpression elimination /
// exchange-reuse plan matching
case class PqReconstruct(child: Expression,
                         codebooks: IndexedSeq[IndexedSeq[IndexedSeq[Double]]])
    extends UnaryExpression {

  private val numSub = codebooks.length
  require(numSub > 0, "need at least one codebook")
  private val k = codebooks(0).length
  private val subDim = codebooks(0)(0).length
  require(codebooks.forall(b => b.length == k && b.forall(_.length == subDim)),
    "ragged codebooks")

  /** flat((s·k + c)·subDim + d) = codebooks(s)(c)(d). Transient: rebuilt
    * lazily after task deserialization so the codebooks ship once, not
    * twice. */
  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](numSub * k * subDim)
    var i = 0
    var s = 0
    while (s < numSub) {
      var c = 0
      while (c < k) {
        val cw = codebooks(s)(c)
        var d = 0
        while (d < subDim) { out(i) = cw(d); i += 1; d += 1 }
        c += 1
      }
      s += 1
    }
    out
  }

  override def prettyName: String = "pq_reconstruct"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val codes = v.asInstanceOf[ArrayData]
    val out = new Array[Double](numSub * subDim)
    var s = 0
    while (s < numSub) {
      val c = codes.getInt(s)
      require(c >= 0 && c < k, s"code $c out of range [0, $k) in subspace $s")
      System.arraycopy(flat, (s * k + c) * subDim, out, s * subDim, subDim)
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
      val out = ctx.freshName("pqOut")
      val s = ctx.freshName("pqS")
      val cw = ctx.freshName("pqCw")
      s"""
         |double[] $out = new double[${numSub * subDim}];
         |for (int $s = 0; $s < $numSub; $s++) {
         |  int $cw = $c.getInt($s);
         |  if ($cw < 0 || $cw >= $k) {
         |    throw new IllegalArgumentException("code " + $cw + " out of range");
         |  }
         |  System.arraycopy($flatRef, ($s * $k + $cw) * $subDim, $out, $s * $subDim, $subDim);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PqReconstruct {
  def toSeqs(codebooks: Array[Array[Array[Double]]])
      : IndexedSeq[IndexedSeq[IndexedSeq[Double]]] =
    codebooks.map(_.map(_.toIndexedSeq).toIndexedSeq).toIndexedSeq

  def apply(codes: Column, codebooks: Array[Array[Array[Double]]]): Column =
    Shim.column(PqReconstruct(Shim.expression(codes), toSeqs(codebooks)))
}
