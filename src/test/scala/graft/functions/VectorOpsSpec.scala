package graft.functions

import graft.SparkSpec
import graft.functions.VectorOps._
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (Array(1.0f, 2.0f, 2.0f), Array(3.0f, 0.0f, 4.0f)),
    (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f))
  ).toDF("a", "b")

  test("vec_dot") {
    val r = df.select(vec_dot($"a", $"b")).as[Double].collect()
    assert(approx(r(0), 11.0) && approx(r(1), 0.0))
  }

  test("vec_norm") {
    val r = df.select(vec_norm($"a")).as[Double].collect()
    assert(approx(r(0), 3.0) && approx(r(1), 0.0))
  }

  test("euclidean / manhattan") {
    val r = df.select(euclidean_dist($"a", $"b"), manhattan_dist($"a", $"b"))
      .as[(Double, Double)].collect()
    assert(approx(r(0)._1, math.sqrt(4 + 4 + 4)) && approx(r(0)._2, 6.0))
  }

  test("cosine_sim bounded and exact on known pair") {
    val cos = df.select(cosine_sim($"a", $"b")).as[Double].collect()
    assert(approx(cos(0), 11.0 / (3.0 * 5.0)))
    assert(cos(1).isNaN) // zero vector → NaN (matches sklearn warning case)
  }

  test("vec_normalize: unit norm, zero vector passes through") {
    val r = df.select(vec_norm(vec_normalize($"a"))).as[Double].collect()
    assert(approx(r(0), 1.0) && approx(r(1), 0.0))
  }

  test("multiple kernel instances compile in one codegen scope (non-nullable inputs)") {
    // Regression: fixed accumulator names would declare duplicate Java
    // locals when two instances of the same kernel share a scope with
    // non-nullable inputs (no isolating if-block) — Janino then fails and
    // the whole stage silently drops to interpreted execution. Generating
    // the projection directly makes that failure loud.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val t = ArrayType(DoubleType, containsNull = false)
    val a = BoundReference(0, t, nullable = false)
    val b = BoundReference(1, t, nullable = false)
    val proj = GenerateUnsafeProjection.generate(Seq(
      VecDot(a, b), VecDot(b, a), VecCosine(a, b), VecCosine(b, a),
      VecEuclidean(a, b), VecEuclideanSq(a, b), VecManhattan(a, b),
      VecNorm(a), VecNorm(b), VecNormalize(a), VecNormalize(a)))
    val row = proj(InternalRow(
      ArrayData.toArrayData(Array(1.0, 2.0)), ArrayData.toArrayData(Array(3.0, 4.0))))
    assert(row.getDouble(0) == 11.0 && row.getDouble(1) == 11.0)
    assert(approx(row.getDouble(4), math.sqrt(8.0)) && row.getDouble(5) == 8.0
      && row.getDouble(6) == 4.0)
    // the unary kernels run through the same generated scope
    assert(row.getDouble(7) == math.sqrt(5.0) && row.getDouble(8) == 5.0)
    val nrm = row.getArray(9)
    assert(nrm.getDouble(0) == 1.0 / math.sqrt(5.0) * 1.0
      && nrm.getDouble(1) == 2.0 * (1.0 / math.sqrt(5.0)))
  }

  test("unary kernels: generated == interpreted on float and double inputs") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    val rnd = new scala.util.Random(11)
    for (
      (mk, t) <- Seq(
        ((xs: Array[Double]) => ArrayData.toArrayData(xs.map(_.toFloat)),
          ArrayType(FloatType, containsNull = false)),
        ((xs: Array[Double]) => ArrayData.toArrayData(xs),
          ArrayType(DoubleType, containsNull = false)))
    ) {
      val ref = BoundReference(0, t, nullable = true)
      val exprs = Seq(VecNorm(ref), VecNormalize(ref))
      val proj = GenerateUnsafeProjection.generate(exprs)
      for (_ <- 0 until 20) {
        val xs = Array.fill(16)(rnd.nextDouble() * 4 - 2)
        val row = InternalRow(mk(xs))
        val out = proj(row)
        assert(out.getDouble(0) == exprs.head.eval(row).asInstanceOf[Double])
        val gen = out.getArray(1)
        val interp = exprs(1).eval(row).asInstanceOf[ArrayData]
        assert((0 until 16).forall(i => gen.getDouble(i) == interp.getDouble(i)))
      }
      // zero vector passes through unchanged
      val z = InternalRow(mk(Array.fill(4)(0.0)))
      val outZ = proj(z)
      assert(outZ.getDouble(0) == 0.0
        && (0 until 4).forall(i => outZ.getArray(1).getDouble(i) == 0.0))
    }
  }

  test("works on real embeddings and matches euclidean identity") {
    val e = graft.Tables.embeddings(spark, SfDir).limit(100)
    // |a-b|^2 = |a|^2 + |b|^2 - 2<a,b>
    val bad = e.crossJoin(e.select($"embedding".as("emb2")).limit(5))
      .select(
        (euclidean_dist($"embedding", $"emb2") * euclidean_dist($"embedding", $"emb2")
          - (vec_norm($"embedding") * vec_norm($"embedding")
            + vec_norm($"emb2") * vec_norm($"emb2")
            - lit(2.0) * vec_dot($"embedding", $"emb2"))).as("resid"))
      .filter(abs($"resid") > 1e-6).count()
    assert(bad === 0)
  }
}
