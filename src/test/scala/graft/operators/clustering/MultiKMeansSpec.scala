package graft.operators.clustering

import graft.SparkSpec

class MultiKMeansSpec extends SparkSpec {
  import spark.implicits._

  /** 3 well-separated blobs around (0,0), (10,0), (0,10), 30 points each. */
  private def blobs = {
    val rnd = new scala.util.Random(1)
    val centers = Seq(Array(0f, 0f), Array(10f, 0f), Array(0f, 10f))
    centers.flatMap(c => Seq.fill(30)(
      Array(c(0) + rnd.nextFloat() * 0.5f, c(1) + rnd.nextFloat() * 0.5f)))
  }

  test("lloydStep: counts conserve n, step from blob centers is a fixed point") {
    val df = blobs.toDF("v")
    // exact blob means as start centroids -> every point stays with its
    // blob and the update returns (numerically) the same means
    val k = 3
    val dim = 2
    val exact = blobs.grouped(30).map { g =>
      Array(g.map(_(0).toDouble).sum / 30, g.map(_(1).toDouble).sum / 30)
    }.toArray
    val init = exact.flatten
    val (next, counts, inertia) = MultiKMeans.lloydStep(df, "v", init, k)
    assert(counts.toSeq == Seq(30L, 30L, 30L))
    assert(inertia > 0)
    next.zip(init).foreach { case (a, b) => assert(approx(a, b, 1e-9)) }
  }

  test("lloydStep from bad centroids strictly reduces inertia") {
    val df = blobs.toDF("v")
    val init = Array(0.0, 0.0, 1.0, 1.0, 2.0, 2.0) // all 3 near one blob
    val (next, _, cost0) = MultiKMeans.lloydStep(df, "v", init, 3)
    val (_, _, cost1) = MultiKMeans.lloydStep(df, "v", next, 3)
    assert(cost1 < cost0, s"one Lloyd step must not increase inertia ($cost0 -> $cost1)")
  }

  test("lloydStep: empty cluster keeps its starting coordinate") {
    val df = blobs.toDF("v")
    // a centroid far outside the data never wins a point
    val init = Array(0.0, 0.0, 10.0, 0.0, 1e6, 1e6)
    val (next, counts, _) = MultiKMeans.lloydStep(df, "v", init, 3)
    assert(counts(2) == 0L)
    assert(next(4) == 1e6 && next(5) == 1e6)
  }

  test("sweep recovers separated blobs at k=3 with high silhouette") {
    val df = blobs.toDF("v")
    val out = MultiKMeans.sweep(df, "v", ks = Seq(2, 3, 4), seed = 7L, maxIter = 20)
    val byK = out.map(m => m.k -> m).toMap
    // at the true k the fit is near-perfect
    assert(byK(3).silhouette > 0.9, s"sil=${byK(3).silhouette}")
    assert(byK(3).inertia < byK(2).inertia)
    // each blob contributes ~30·(intra-blob variance); inertia tiny vs k=2
    assert(byK(3).inertia < byK(2).inertia / 10)
    assert(out.forall(m => m.silhouette >= -1 && m.silhouette <= 1))
    assert(out.forall(m => m.centroids.length == m.k))
  }

  test("sweep is deterministic under a fixed seed (up to float combine order)") {
    val df = blobs.toDF("v")
    val a = MultiKMeans.sweep(df, "v", Seq(3), seed = 7L, maxIter = 20).head
    val b = MultiKMeans.sweep(df, "v", Seq(3), seed = 7L, maxIter = 20).head
    // treeAggregate combine order jitters double sums run-to-run
    assert(approx(a.inertia, b.inertia, 1e-6 * math.max(1.0, a.inertia)))
    assert(approx(a.silhouette, b.silhouette, 1e-9))
  }

  test("restarts: best-of-n never worse than the first seed alone") {
    val df = blobs.toDF("v")
    val many = MultiKMeans.restarts(df, "v", k = 4, seeds = (0 until 5).map(11L + _))
    val one = MultiKMeans.restarts(df, "v", k = 4, seeds = Seq(11L))
    assert(many.map(_.inertia).min <= one.head.inertia * 1.0001)
    assert(many.forall(_.k == 4))
  }

  test("evaluate at fixed centroids matches the sweep's own metrics") {
    val df = blobs.toDF("v")
    val m = MultiKMeans.sweep(df, "v", Seq(3), seed = 7L, maxIter = 20).head
    val data = df.as[Array[Float]].rdd
    val flat = m.centroids.flatten
    val (in, sil) = MultiKMeans.evaluate(data, Array(3), Array(flat), 2)
    assert(approx(in(0), m.inertia, 1e-6))
    assert(approx(sil(0), m.silhouette, 1e-6))
  }
}
