package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for dense-vector math over `array<float>` /
  * `array<double>` columns.
  *
  * Rationale (see SURVEY §4): the reference computes these with
  * numpy/sklearn (`normalizar_vector`, `cdist`, `cosine_similarity` in
  * chunk_similarities.ipynb:72-107, nuevo-kmeans-pre.ipynb cells); in Spark
  * the idiomatic equivalent is a scalar expression evaluated inside the
  * operator pipeline. Each eval bulk-copies the array to a primitive
  * buffer (`toFloatArray` is a single Platform.copyMemory for
  * UnsafeArrayData) and runs a branch-free JIT-friendly loop — no per
  * element virtual calls, no boxing. Accumulation is sequential in Double
  * (index order), keeping results bit-comparable with single-threaded
  * oracles.
  */
object VecUtil {
  type Getter = (ArrayData, Int) => Double

  /** Per-element getter — kept for consumers that embed constant matrices
    * ([[NearestCentroid]], [[HyperplaneSig]]) where the other operand is
    * already primitive. */
  def getter(dt: DataType): Getter = dt match {
    case ArrayType(FloatType, _)   => (a, i) => a.getFloat(i).toDouble
    case ArrayType(DoubleType, _)  => (a, i) => a.getDouble(i)
    case ArrayType(IntegerType, _) => (a, i) => a.getInt(i).toDouble
    case ArrayType(LongType, _)    => (a, i) => a.getLong(i).toDouble
    case other => throw new IllegalArgumentException(
      s"vector op expects array<float|double|int|long>, got $other")
  }

  /** Bulk-extract to double[] (sequential copy; element order preserved). */
  def toDoubles(dt: DataType): ArrayData => Array[Double] = dt match {
    case ArrayType(DoubleType, _) => a => a.toDoubleArray()
    case ArrayType(FloatType, _) => a => {
      val f = a.toFloatArray()
      val out = new Array[Double](f.length)
      var i = 0
      while (i < f.length) { out(i) = f(i); i += 1 }
      out
    }
    case other =>
      val g = getter(other)
      a => {
        val n = a.numElements()
        val out = new Array[Double](n)
        var i = 0
        while (i < n) { out(i) = g(a, i); i += 1 }
        out
      }
  }
}

abstract class BinaryVectorReduce extends BinaryExpression {
  override def dataType: DataType = DoubleType
  @transient private lazy val lGet = VecUtil.toDoubles(left.dataType)
  @transient private lazy val rGet = VecUtil.toDoubles(right.dataType)

  protected def reduce(a: Array[Double], b: Array[Double], n: Int): Double

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = lGet(l.asInstanceOf[ArrayData])
    val b = rGet(r.asInstanceOf[ArrayData])
    reduce(a, b, math.min(a.length, b.length))
  }

  // ---- whole-stage codegen -----------------------------------------------
  // The generated loop mirrors nullSafeEval's accumulation order exactly
  // (sequential, double), so interpreted and compiled paths are
  // bit-identical. Subclasses supply accumulator decls / update / result.

  /** Java accumulator declarations; every local MUST be prefixed with `p`
    * (a ctx.freshName) — two instances of the same expression can land in
    * one codegen scope, and with non-nullable inputs nullSafeCodeGen emits
    * the body without an isolating block, so fixed names would declare
    * duplicate Java locals and fail Janino compilation. */
  protected def cgDecls(p: String): String
  /** Java update statement(s); x and y are double-valued element exprs. */
  protected def cgUpdate(p: String, x: String, y: String): String
  /** Java double expression producing the final value. */
  protected def cgResult(p: String): String

  private def cgExtract(dt: DataType, term: String, arr: String): Option[String] = dt match {
    case ArrayType(FloatType, _)   => Some(s"float[] $arr = $term.toFloatArray();")
    case ArrayType(DoubleType, _)  => Some(s"double[] $arr = $term.toDoubleArray();")
    case ArrayType(IntegerType, _) => Some(s"int[] $arr = $term.toIntArray();")
    case ArrayType(LongType, _)    => Some(s"long[] $arr = $term.toLongArray();")
    case _ => None
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (aTerm, bTerm) => {
      val aArr = ctx.freshName("aArr")
      val bArr = ctx.freshName("bArr")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val p = ctx.freshName("vr")
      (cgExtract(left.dataType, aTerm, aArr), cgExtract(right.dataType, bTerm, bArr)) match {
        case (Some(ea), Some(eb)) =>
          s"""
             |$ea
             |$eb
             |int $n = Math.min($aArr.length, $bArr.length);
             |${cgDecls(p)}
             |for (int $i = 0; $i < $n; $i++) {
             |  ${cgUpdate(p, s"((double) $aArr[$i])", s"((double) $bArr[$i])")}
             |}
             |${ev.value} = ${cgResult(p)};
             |""".stripMargin
        case _ => // unexpected element type: defer to the interpreted path
          val expr = ctx.addReferenceObj("thisExpr", this, classOf[BinaryVectorReduce].getName)
          s"${ev.value} = (Double) $expr.nullSafeEval($aTerm, $bTerm);"
      }
    })
}

/** Inner product; reference: np.dot / list_inner_product semantics. */
case class VecDot(left: Expression, right: Expression) extends BinaryVectorReduce {
  override protected def cgDecls(p: String): String = s"double ${p}_s = 0.0;"
  override protected def cgUpdate(p: String, x: String, y: String): String =
    s"${p}_s += $x * $y;"
  override protected def cgResult(p: String): String = s"${p}_s"
  override def prettyName: String = "vec_dot"
  override protected def reduce(a: Array[Double], b: Array[Double], n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Cosine similarity; ref chunk_similarities.ipynb:193 (sklearn
  * cosine_similarity). dot/(|a||b|); NaN when either norm is 0. */
case class VecCosine(left: Expression, right: Expression) extends BinaryVectorReduce {
  override protected def cgDecls(p: String): String =
    s"double ${p}_dot = 0.0; double ${p}_na = 0.0; double ${p}_nb = 0.0;"
  override protected def cgUpdate(p: String, x: String, y: String): String =
    s"double ${p}_x = $x; double ${p}_y = $y; ${p}_dot += ${p}_x * ${p}_y; " +
      s"${p}_na += ${p}_x * ${p}_x; ${p}_nb += ${p}_y * ${p}_y;"
  override protected def cgResult(p: String): String =
    s"${p}_dot / java.lang.Math.sqrt(${p}_na * ${p}_nb)"
  override def prettyName: String = "vec_cosine"
  override protected def reduce(a: Array[Double], b: Array[Double], n: Int): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a(i); val y = b(i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / math.sqrt(na * nb)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Euclidean (L2) distance; ref silhouettes.ipynb:99 (np.linalg.norm of
  * difference), scipy cdist 'euclidean'. */
case class VecEuclidean(left: Expression, right: Expression) extends BinaryVectorReduce {
  override protected def cgDecls(p: String): String = s"double ${p}_s = 0.0;"
  override protected def cgUpdate(p: String, x: String, y: String): String =
    s"double ${p}_d = $x - $y; ${p}_s += ${p}_d * ${p}_d;"
  override protected def cgResult(p: String): String = s"java.lang.Math.sqrt(${p}_s)"
  override def prettyName: String = "vec_euclidean"
  override protected def reduce(a: Array[Double], b: Array[Double], n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    math.sqrt(s)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Manhattan (L1) distance; ref imports manhattan_distances
  * (chunk_similarities.ipynb:9). */
case class VecManhattan(left: Expression, right: Expression) extends BinaryVectorReduce {
  override protected def cgDecls(p: String): String = s"double ${p}_s = 0.0;"
  override protected def cgUpdate(p: String, x: String, y: String): String =
    s"${p}_s += java.lang.Math.abs($x - $y);"
  override protected def cgResult(p: String): String = s"${p}_s"
  override def prettyName: String = "vec_manhattan"
  override protected def reduce(a: Array[Double], b: Array[Double], n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) { s += math.abs(a(i) - b(i)); i += 1 }
    s
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Squared L2 distance (no sqrt) — cheaper kernel for argmin searches where
  * the monotone transform doesn't change the winner (kmeans assign, knn). */
case class VecEuclideanSq(left: Expression, right: Expression) extends BinaryVectorReduce {
  override protected def cgDecls(p: String): String = s"double ${p}_s = 0.0;"
  override protected def cgUpdate(p: String, x: String, y: String): String =
    s"double ${p}_d = $x - $y; ${p}_s += ${p}_d * ${p}_d;"
  override protected def cgResult(p: String): String = s"${p}_s"
  override def prettyName: String = "vec_euclidean_sq"
  override protected def reduce(a: Array[Double], b: Array[Double], n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Shared codegen for the unary vector kernels: bulk-extract the child
  * array to a primitive buffer, then run the same sequential-double loop
  * as the interpreted path (bit-identical by construction). Element types
  * outside the fast set defer to nullSafeEval through a reference object. */
abstract class UnaryVectorExpr extends UnaryExpression {
  /** Java statements: input `double[] $arr` (already widened), assign the
    * result to $result (declared by the caller). */
  protected def cgBody(p: String, arr: String, result: String): String

  private def cgExtract(dt: DataType, term: String, arr: String,
                        p: String): Option[String] = dt match {
    case ArrayType(DoubleType, _) => Some(s"double[] $arr = $term.toDoubleArray();")
    case ArrayType(FloatType, _) => Some(
      s"""float[] ${p}_f = $term.toFloatArray();
         |double[] $arr = new double[${p}_f.length];
         |for (int ${p}_i = 0; ${p}_i < ${p}_f.length; ${p}_i++) {
         |  $arr[${p}_i] = (double) ${p}_f[${p}_i];
         |}""".stripMargin)
    case _ => None
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, term => {
      val p = ctx.freshName("uv")
      val arr = ctx.freshName("uvArr")
      cgExtract(child.dataType, term, arr, p) match {
        case Some(extract) =>
          s"""
             |$extract
             |${cgBody(p, arr, ev.value.toString)}
             |""".stripMargin
        case None =>
          val expr = ctx.addReferenceObj("thisExpr", this,
            classOf[UnaryVectorExpr].getName)
          val javaType = org.apache.spark.sql.catalyst.expressions.codegen
            .CodeGenerator.javaType(dataType)
          val boxed = org.apache.spark.sql.catalyst.expressions.codegen
            .CodeGenerator.boxedType(dataType)
          s"${ev.value} = ($javaType) ($boxed) $expr.nullSafeEval($term);"
      }
    })
}

/** L2 norm; ref chunk_similarities.ipynb:73 (np.linalg.norm). */
case class VecNorm(child: Expression) extends UnaryVectorExpr {
  override def prettyName: String = "vec_norm"
  override def dataType: DataType = DoubleType
  @transient private lazy val get = VecUtil.toDoubles(child.dataType)
  override def nullSafeEval(v: Any): Any = {
    val a = get(v.asInstanceOf[ArrayData])
    var s = 0.0; var i = 0
    while (i < a.length) { val x = a(i); s += x * x; i += 1 }
    math.sqrt(s)
  }
  override protected def cgBody(p: String, arr: String, result: String): String =
    s"""double ${p}_s = 0.0;
       |for (int ${p}_j = 0; ${p}_j < $arr.length; ${p}_j++) {
       |  ${p}_s += $arr[${p}_j] * $arr[${p}_j];
       |}
       |$result = java.lang.Math.sqrt(${p}_s);""".stripMargin
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** L2-normalize to array<double>; zero vector returned unchanged — matches
  * reference `normalizar_vector` (chunk_similarities.ipynb:72-74). */
case class VecNormalize(child: Expression) extends UnaryVectorExpr {
  override def prettyName: String = "vec_normalize"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  @transient private lazy val get = VecUtil.toDoubles(child.dataType)
  override def nullSafeEval(v: Any): Any = {
    val a = get(v.asInstanceOf[ArrayData])
    var s = 0.0; var i = 0
    while (i < a.length) { val x = a(i); s += x * x; i += 1 }
    val norm = math.sqrt(s)
    val inv = if (norm == 0.0) 1.0 else 1.0 / norm
    i = 0
    while (i < a.length) { a(i) = a(i) * inv; i += 1 }
    new GenericArrayData(a)
  }
  override protected def cgBody(p: String, arr: String, result: String): String =
    s"""double ${p}_s = 0.0;
       |for (int ${p}_j = 0; ${p}_j < $arr.length; ${p}_j++) {
       |  ${p}_s += $arr[${p}_j] * $arr[${p}_j];
       |}
       |double ${p}_n = java.lang.Math.sqrt(${p}_s);
       |double ${p}_inv = (${p}_n == 0.0) ? 1.0 : 1.0 / ${p}_n;
       |for (int ${p}_j2 = 0; ${p}_j2 < $arr.length; ${p}_j2++) {
       |  $arr[${p}_j2] = $arr[${p}_j2] * ${p}_inv;
       |}
       |$result = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);""".stripMargin
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
