package graft.operators.projection

import graft.SparkSpec

class PcaProjectionSpec extends SparkSpec {

  test("jacobi recovers a known 2x2 eigensystem") {
    val (vals, vecs) = PcaProjection.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = vals.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-12)
    assert(math.abs(sorted(1) - 3.0) < 1e-12)
    // eigenvector for λ=3 is ±(1,1)/√2
    val i3 = vals.indexWhere(v => math.abs(v - 3.0) < 1e-12)
    val v3 = vecs(i3)
    assert(math.abs(math.abs(v3(0)) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(v3(0) - v3(1)) < 1e-12)
  }

  test("corpus model: unit eigenvectors, ordered eigenvalues, Cv = λv") {
    val mdl = PcaProjection.model(spark, SfDir)
    def norm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm(mdl.v1) - 1.0) < 1e-9)
    assert(math.abs(norm(mdl.v2) - 1.0) < 1e-9)
    // orthogonality of the top-2 directions
    val d12 = mdl.v1.zip(mdl.v2).map { case (a, b) => a * b }.sum
    assert(math.abs(d12) < 1e-9, s"v1·v2 = $d12")
    // residual ||Cv - λv|| small for the top eigenpair, λ1 >= λ2
    val rows = graft.operators.analytics.Mahalanobis
      .covarianceExact(graft.Tables.embeddings(spark, SfDir)).collect()
    val d = rows.map(_.getLong(0)).max.toInt
    val cov = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      val i = r.getLong(0).toInt - 1; val j = r.getLong(1).toInt - 1
      cov(i)(j) = r.getDouble(4); cov(j)(i) = r.getDouble(4)
    }
    def mul(v: Array[Double]) = cov.map(row =>
      row.zip(v).map { case (a, b) => a * b }.sum)
    def rayleigh(v: Array[Double]) = v.zip(mul(v)).map { case (a, b) => a * b }.sum
    val l1 = rayleigh(mdl.v1); val l2 = rayleigh(mdl.v2)
    assert(l1 >= l2, s"top eigenvalue $l1 below second $l2")
    val res = mul(mdl.v1).zip(mdl.v1.map(_ * l1))
      .map { case (a, b) => a - b }.map(x => x * x).sum
    assert(math.sqrt(res) < 1e-8 * math.max(1.0, math.abs(l1)), s"residual $res")
  }

  test("model is memoized: identical literals for query and oracle") {
    val a = PcaProjection.model(spark, SfDir)
    val b = PcaProjection.model(spark, SfDir)
    assert(a eq b)
  }
}
