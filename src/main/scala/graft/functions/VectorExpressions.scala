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
  * operator pipeline — a tight primitive loop over [[ArrayData]], no boxing
  * per element, no Scala UDF serialization. All accumulate sequentially in
  * Double (index order), which keeps results bit-comparable with
  * single-threaded oracles.
  */
object VecUtil {
  type Getter = (ArrayData, Int) => Double

  def getter(dt: DataType): Getter = dt match {
    case ArrayType(FloatType, _)  => (a, i) => a.getFloat(i).toDouble
    case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
    case ArrayType(IntegerType, _) => (a, i) => a.getInt(i).toDouble
    case ArrayType(LongType, _)   => (a, i) => a.getLong(i).toDouble
    case other => throw new IllegalArgumentException(
      s"vector op expects array<float|double|int|long>, got $other")
  }
}

abstract class BinaryVectorReduce extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  @transient protected lazy val lGet: VecUtil.Getter = VecUtil.getter(left.dataType)
  @transient protected lazy val rGet: VecUtil.Getter = VecUtil.getter(right.dataType)

  protected def reduce(a: ArrayData, b: ArrayData, n: Int): Double

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    reduce(a, b, n)
  }
}

/** Inner product; reference: np.dot / list_inner_product semantics. */
case class VecDot(left: Expression, right: Expression) extends BinaryVectorReduce {
  override def prettyName: String = "vec_dot"
  override protected def reduce(a: ArrayData, b: ArrayData, n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) { s += lGet(a, i) * rGet(b, i); i += 1 }
    s
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Cosine similarity; ref chunk_similarities.ipynb:193 (sklearn
  * cosine_similarity). dot/(|a||b|); NaN when either norm is 0. */
case class VecCosine(left: Expression, right: Expression) extends BinaryVectorReduce {
  override def prettyName: String = "vec_cosine"
  override protected def reduce(a: ArrayData, b: ArrayData, n: Int): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = lGet(a, i); val y = rGet(b, i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / math.sqrt(na * nb)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Euclidean (L2) distance; ref silhouettes.ipynb:99 (np.linalg.norm of
  * difference), scipy cdist 'euclidean'. */
case class VecEuclidean(left: Expression, right: Expression) extends BinaryVectorReduce {
  override def prettyName: String = "vec_euclidean"
  override protected def reduce(a: ArrayData, b: ArrayData, n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) { val d = lGet(a, i) - rGet(b, i); s += d * d; i += 1 }
    math.sqrt(s)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Manhattan (L1) distance; ref imports manhattan_distances
  * (chunk_similarities.ipynb:9). */
case class VecManhattan(left: Expression, right: Expression) extends BinaryVectorReduce {
  override def prettyName: String = "vec_manhattan"
  override protected def reduce(a: ArrayData, b: ArrayData, n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) { s += math.abs(lGet(a, i) - rGet(b, i)); i += 1 }
    s
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Squared L2 distance (no sqrt) — cheaper kernel for argmin searches where
  * the monotone transform doesn't change the winner (kmeans assign, knn). */
case class VecEuclideanSq(left: Expression, right: Expression) extends BinaryVectorReduce {
  override def prettyName: String = "vec_euclidean_sq"
  override protected def reduce(a: ArrayData, b: ArrayData, n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) { val d = lGet(a, i) - rGet(b, i); s += d * d; i += 1 }
    s
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** L2 norm; ref chunk_similarities.ipynb:73 (np.linalg.norm). */
case class VecNorm(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "vec_norm"
  override def dataType: DataType = DoubleType
  @transient private lazy val get: VecUtil.Getter = VecUtil.getter(child.dataType)
  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var s = 0.0; var i = 0
    while (i < n) { val x = get(a, i); s += x * x; i += 1 }
    math.sqrt(s)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** L2-normalize to array<double>; zero vector returned unchanged — matches
  * reference `normalizar_vector` (chunk_similarities.ipynb:72-74). */
case class VecNormalize(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "vec_normalize"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  @transient private lazy val get: VecUtil.Getter = VecUtil.getter(child.dataType)
  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var s = 0.0; var i = 0
    while (i < n) { val x = get(a, i); s += x * x; i += 1 }
    val norm = math.sqrt(s)
    val out = new Array[Double](n)
    val inv = if (norm == 0.0) 1.0 else 1.0 / norm
    i = 0
    while (i < n) { out(i) = get(a, i) * inv; i += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
