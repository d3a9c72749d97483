package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.Shim

/** Public Column API for the vector primitives (SURVEY §2 "Vector
  * primitives"). Usage mirrors `org.apache.spark.sql.functions`:
  *
  * {{{
  *   import graft.functions.VectorOps._
  *   emb.select(cosine_sim($"a", $"b"))
  * }}}
  */
object VectorOps {
  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column = Shim.column(e)
  private def e(col: Column) = Shim.expression(col)

  /** Inner product of two vectors. */
  def vec_dot(a: Column, b: Column): Column = c(VecDot(e(a), e(b)))

  /** Cosine similarity. */
  def cosine_sim(a: Column, b: Column): Column = c(VecCosine(e(a), e(b)))

  /** Cosine distance = 1 - similarity. */
  def cosine_dist(a: Column, b: Column): Column =
    c(org.apache.spark.sql.catalyst.expressions.Subtract(
      org.apache.spark.sql.catalyst.expressions.Literal(1.0), VecCosine(e(a), e(b))))

  /** Euclidean (L2) distance. */
  def euclidean_dist(a: Column, b: Column): Column = c(VecEuclidean(e(a), e(b)))

  /** Squared euclidean distance (argmin-equivalent, no sqrt). */
  def euclidean_dist_sq(a: Column, b: Column): Column = c(VecEuclideanSq(e(a), e(b)))

  /** Manhattan (L1) distance. */
  def manhattan_dist(a: Column, b: Column): Column = c(VecManhattan(e(a), e(b)))

  /** L2 norm. */
  def vec_norm(a: Column): Column = c(VecNorm(e(a)))

  /** L2-normalize (zero vectors pass through unchanged). */
  def vec_normalize(a: Column): Column = c(VecNormalize(e(a)))
}
