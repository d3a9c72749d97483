package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-side registration of the vector expressions, so `spark.sql` users
  * get them as first-class functions:
  *
  * {{{
  *   val spark = SparkSession.builder()
  *     .withExtensions(new GraftExtensions).getOrCreate()
  *   spark.sql("SELECT vec_cosine(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * (The Column API in [[graft.functions.VectorOps]] needs no registration.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach(e.injectFunction)
    e.injectOptimizerRule(_ => graft.plans.EliminateNormalizeUnderCosine)
    e.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    // the full non-deprecated ctor: (class, db, name, usage, arguments,
    // examples, note, group, since, deprecated, source)
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  private def binary(name: String, usage: String)(build: (Expression, Expression) => Expression) =
    (FunctionIdentifier(name), info(name, usage),
      (exprs: Seq[Expression]) => build(exprs(0), exprs(1)))
  private def unary(name: String, usage: String)(build: Expression => Expression) =
    (FunctionIdentifier(name), info(name, usage),
      (exprs: Seq[Expression]) => build(exprs.head))

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    binary("vec_dot", "vec_dot(a, b) - inner product of two vectors")(VecDot),
    binary("vec_cosine", "vec_cosine(a, b) - cosine similarity")(VecCosine),
    binary("vec_euclidean", "vec_euclidean(a, b) - L2 distance")(VecEuclidean),
    binary("vec_euclidean_sq", "vec_euclidean_sq(a, b) - squared L2 distance")(VecEuclideanSq),
    binary("vec_manhattan", "vec_manhattan(a, b) - L1 distance")(VecManhattan),
    unary("vec_norm", "vec_norm(a) - L2 norm")(VecNorm),
    unary("vec_normalize", "vec_normalize(a) - L2-normalize")(VecNormalize))

  /** Register on an already-built session (getOrCreate ignores
    * withExtensions when a session exists). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (id, inf, b) =>
      org.apache.spark.sql.graftshim.Shim.registerFunction(spark, id, inf, b) }
}
