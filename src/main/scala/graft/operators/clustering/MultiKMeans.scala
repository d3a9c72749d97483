package graft.operators.clustering

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel

/** Multi-model Lloyd's k-means: fits EVERY k of a sweep concurrently, one
  * shared scan per iteration (reference: silhouettes.ipynb:146-186 fits
  * sklearn KMeans per k serially).
  *
  * Per iteration: broadcast all models' centroids (Σk × dim doubles — tiny),
  * one `treeAggregate` accumulates per-(model, cluster) partial sums map-side
  * — exactly MLlib's per-model pass, amortized over the whole sweep. A
  * 7-model sweep costs ~maxIter+2 scans instead of ~7·(init+maxIter+2); at
  * 100 TB the scan IS the cost, so the sweep gets ~7× cheaper. Models drop
  * out of the loop individually once their centroids move < tol.
  *
  * Evaluation reuses the same machinery: one stats pass (per-cluster count /
  * mean / mean-squared-norm + inertia) and one silhouette pass computing the
  * squared-Euclidean silhouette in closed form for all models at once —
  * avg over y∈C of ||x−y||² = ||x||² − 2·x·μ_C + E_C[||y||²], so no pairwise
  * work, mirroring MLlib's SquaredEuclideanSilhouette.
  *
  * Nothing driver-side grows with n: init draws one bounded seeded sample
  * (k-means++ on the driver over ≤1000 points); all passes reduce to
  * O(Σk · dim) accumulators. Results are seed-deterministic up to float
  * combine order → rows-only driver checks, invariants in KMeansOpSpec.
  */
object MultiKMeans {

  final case class SweepModel(k: Int, inertia: Double, silhouette: Double,
                              centroids: Array[Array[Double]], iterations: Int)

  /** @param points  DataFrame with `vecCol: array<float>`
    * @param ks      the k values to fit (e.g. 2 to 8)
    */
  def sweep(points: DataFrame, vecCol: String, ks: Seq[Int], seed: Long = 42L,
            maxIter: Int = 10, tol: Double = 1e-4): Seq[SweepModel] =
    sweepConfigs(points, vecCol, ks.map(k => (k, seed + k)), maxIter, tol)

  /** Restart form: the same k fitted from `seeds.size` different seeded
    * inits, all in the shared scans — the reference's sklearn `n_init`
    * (cluster_creator.py:18 N_ITER_KMEANS) without n_init serial fits. */
  def restarts(points: DataFrame, vecCol: String, k: Int, seeds: Seq[Long],
               maxIter: Int = 10, tol: Double = 1e-4): Seq[SweepModel] =
    sweepConfigs(points, vecCol, seeds.map(s => (k, s)), maxIter, tol)

  /** General form: one (k, init-seed) pair per concurrently-fitted model.
    * @param evaluate  false skips the final inertia/silhouette passes
    *                  (callers that only need centroids — e.g. PQ codebook
    *                  training — save two scans; inertia then reports the
    *                  last assignment pass's cost and silhouette is NaN). */
  def sweepConfigs(points: DataFrame, vecCol: String, configs: Seq[(Int, Long)],
                   maxIter: Int = 10, tol: Double = 1e-4,
                   evaluate: Boolean = true): Seq[SweepModel] = {
    val spark = points.sparkSession
    import spark.implicits._
    // cast pins the typed read to array<float> whatever element type the
    // corpus ships (exact for float-valued data; a true-double corpus
    // quantizes to the float lattice here, and the literal-replay oracle
    // replays whatever this fit produced, so correctness is self-consistent)
    val data = points.select(col(vecCol).cast("array<float>")).as[Array[Float]].rdd
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val sample = data.takeSample(withReplacement = false, num = 1000,
        configs.head._2)
      require(sample.nonEmpty, "MultiKMeans: empty input")
      val dim = sample.head.length
      val kArr = configs.map(_._1).toArray
      // k-means++ init per model from the shared sample (driver-side, seeded)
      val centroids: Array[Array[Double]] = configs.toArray.map { case (k, s) =>
        kppInit(sample, k, dim, new scala.util.Random(s)) }
      val active = Array.fill(kArr.length)(true)
      val iters = Array.fill(kArr.length)(0)
      val lastCosts = Array.fill(kArr.length)(Double.NaN)
      var iter = 0
      while (iter < maxIter && active.exists(identity)) {
        val agg = assignPass(data, kArr, centroids, active, dim, withSquares = false)
        for (m <- kArr.indices if active(m)) lastCosts(m) = agg.costs(m)
        val tol2 = tol * tol
        for (m <- kArr.indices if active(m)) {
          val k = kArr(m); val old = centroids(m)
          val next = new Array[Double](k * dim)
          var maxMove = 0.0
          for (c <- 0 until k) {
            val n = agg.counts(m)(c)
            var move = 0.0
            var d = 0
            while (d < dim) {
              val v = if (n > 0) agg.sums(m)(c * dim + d) / n else old(c * dim + d)
              next(c * dim + d) = v
              val dd = v - old(c * dim + d)
              move += dd * dd
              d += 1
            }
            if (move > maxMove) maxMove = move
          }
          centroids(m) = next
          iters(m) += 1
          if (maxMove <= tol2) active(m) = false
        }
        iter += 1
      }
      val (inertias, sils) =
        if (evaluate) this.evaluate(data, kArr, centroids, dim)
        else (lastCosts, Array.fill(kArr.length)(Double.NaN))
      kArr.indices.map { m =>
        val k = kArr(m)
        SweepModel(k, inertias(m), sils(m),
          Array.tabulate(k)(c => centroids(m).slice(c * dim, (c + 1) * dim)),
          iters(m))
      }
    } finally { data.unpersist(blocking = false); () }
  }

  /** ONE Lloyd iteration from explicit starting centroids: a single
    * [[assignPass]] scan (nearest-centroid assignment accumulating
    * per-cluster vector sums/counts and total cost), then the same
    * mean-update rule the sweep loop applies (empty cluster keeps its old
    * coordinate). Returns (updated k×dim centroids, per-cluster counts,
    * inertia under the STARTING centroids).
    *
    * Exists so the iterative machinery's arithmetic can sit under the
    * driver's DuckDB hash (q_kmeans_1step): from deterministic start
    * centroids, one step is plain relational algebra — assignment is
    * per-row sequential double arithmetic (bit-identical cross-engine) and
    * the update means/costs round(6)-stable — while full fits stay
    * seed-/engine-specific and rows-only. */
  def lloydStep(points: DataFrame, vecCol: String,
                init: Array[Double], k: Int): (Array[Double], Array[Long], Double) = {
    val spark = points.sparkSession
    import spark.implicits._
    require(init.length % k == 0, s"init length ${init.length} not divisible by k=$k")
    val dim = init.length / k
    // cast pins the typed read to array<float> whatever element type the
    // corpus ships (exact for float-valued data; a true-double corpus
    // quantizes to the float lattice here, and the literal-replay oracle
    // replays whatever this fit produced, so correctness is self-consistent)
    val data = points.select(col(vecCol).cast("array<float>")).as[Array[Float]].rdd
    val agg = assignPass(data, Array(k), Array(init), Array(true), dim,
      withSquares = false)
    val next = new Array[Double](k * dim)
    var c = 0
    while (c < k) {
      val n = agg.counts(0)(c)
      var d = 0
      while (d < dim) {
        next(c * dim + d) =
          if (n > 0) agg.sums(0)(c * dim + d) / n else init(c * dim + d)
        d += 1
      }
      c += 1
    }
    (next, agg.counts(0), agg.costs(0))
  }

  /** Inertia + squared-Euclidean silhouette for fixed centroids (e.g. an
    * MLlib model's) — two shared scans, all models at once. Assignment is
    * nearest-centroid, which for any converged Lloyd model equals its
    * prediction. */
  def evaluate(data: RDD[Array[Float]], kArr: Array[Int],
               centroids: Array[Array[Double]], dim: Int): (Array[Double], Array[Double]) = {
    val allActive = Array.fill(kArr.length)(true)
    val stats = assignPass(data, kArr, centroids, allActive, dim, withSquares = true)
    val sils = silhouettePass(data, kArr, centroids, stats, dim)
    (stats.costs, sils)
  }

  /** Per-(model, cluster) accumulator of one assignment pass. */
  final case class Acc(sums: Array[Array[Double]], counts: Array[Array[Long]],
                       costs: Array[Double], sqSums: Array[Array[Double]]) {
    def merge(o: Acc): Acc = {
      for (m <- sums.indices) {
        val s = sums(m); val os = o.sums(m)
        var i = 0; while (i < s.length) { s(i) += os(i); i += 1 }
        val c = counts(m); val oc = o.counts(m)
        var j = 0; while (j < c.length) { c(j) += oc(j); j += 1 }
        if (sqSums(m).nonEmpty) {
          val q = sqSums(m); val oq = o.sqSums(m)
          var l = 0; while (l < q.length) { q(l) += oq(l); l += 1 }
        }
        costs(m) += o.costs(m)
      }
      this
    }
  }

  private def zeroAcc(kArr: Array[Int], dim: Int, withSquares: Boolean): Acc =
    Acc(kArr.map(k => new Array[Double](k * dim)),
      kArr.map(k => new Array[Long](k)),
      new Array[Double](kArr.length),
      kArr.map(k => if (withSquares) new Array[Double](k) else Array.emptyDoubleArray))

  /** One scan: nearest-centroid assignment for every active model,
    * accumulating per-cluster vector sums, counts, total cost, and (for the
    * stats pass) per-cluster Σ||y||². */
  private def assignPass(data: RDD[Array[Float]], kArr: Array[Int],
                         centroids: Array[Array[Double]], active: Array[Boolean],
                         dim: Int, withSquares: Boolean): Acc = {
    val sc = data.sparkContext
    val bc = sc.broadcast(centroids)
    val act = active.clone()
    val agg = data.treeAggregate(zeroAcc(kArr, dim, withSquares))(
      seqOp = (acc, x) => {
        val cen = bc.value
        var m = 0
        while (m < kArr.length) {
          if (act(m)) {
            val (best, bestD) = nearest(x, cen(m), kArr(m), dim)
            val s = acc.sums(m)
            var d = 0
            while (d < dim) { s(best * dim + d) += x(d); d += 1 }
            acc.counts(m)(best) += 1
            acc.costs(m) += bestD
            if (withSquares) {
              var sq = 0.0
              var i = 0
              while (i < dim) { sq += x(i).toDouble * x(i); i += 1 }
              acc.sqSums(m)(best) += sq
            }
          }
          m += 1
        }
        acc
      },
      combOp = (a, b) => a.merge(b))
    bc.unpersist(blocking = false)
    agg
  }

  /** Closed-form silhouette pass: ψ_C(x) = ||x||² − 2·x·μ_C + E_C[||y||²];
    * a = ψ_own, b = min over other clusters; s = (b−a)/max(a,b); singleton
    * own-cluster ⇒ s = 0. Returns the mean silhouette per model. */
  private def silhouettePass(data: RDD[Array[Float]], kArr: Array[Int],
                             centroids: Array[Array[Double]], stats: Acc,
                             dim: Int): Array[Double] = {
    val sc = data.sparkContext
    // per-model per-cluster: mean vector and E[||y||²]
    val means = kArr.indices.map { m =>
      val k = kArr(m)
      val mu = new Array[Double](k * dim)
      val esq = new Array[Double](k)
      for (c <- 0 until k) {
        val n = stats.counts(m)(c)
        if (n > 0) {
          var d = 0
          while (d < dim) { mu(c * dim + d) = stats.sums(m)(c * dim + d) / n; d += 1 }
          esq(c) = stats.sqSums(m)(c) / n
        }
      }
      (mu, esq)
    }.toArray
    val bcCen = sc.broadcast(centroids)
    val bcStats = sc.broadcast((means, stats.counts))
    val zero = (new Array[Double](kArr.length), 0L)
    val (silSums, n) = data.treeAggregate(zero)(
      seqOp = (acc, x) => {
        val cen = bcCen.value
        val (mn, counts) = bcStats.value
        var xx = 0.0
        var i = 0
        while (i < dim) { xx += x(i).toDouble * x(i); i += 1 }
        var m = 0
        while (m < kArr.length) {
          val k = kArr(m)
          val (own, _) = nearest(x, cen(m), k, dim)
          if (counts(m)(own) > 1) {
            val (mu, esq) = mn(m)
            var a = 0.0
            var b = Double.MaxValue
            var c = 0
            while (c < k) {
              if (counts(m)(c) > 0) {
                var dot = 0.0
                var d = 0
                while (d < dim) { dot += x(d) * mu(c * dim + d); d += 1 }
                val psi = xx - 2 * dot + esq(c)
                if (c == own) a = psi else if (psi < b) b = psi
              }
              c += 1
            }
            val mx = math.max(a, b)
            if (mx > 0 && b != Double.MaxValue) acc._1(m) += (b - a) / mx
          }
          m += 1
        }
        (acc._1, acc._2 + 1)
      },
      combOp = (p, q) => {
        var i = 0
        while (i < p._1.length) { p._1(i) += q._1(i); i += 1 }
        (p._1, p._2 + q._2)
      })
    bcCen.unpersist(blocking = false)
    bcStats.unpersist(blocking = false)
    silSums.map(s => if (n == 0) 0.0 else s / n)
  }

  /** Index and squared distance of the nearest centroid (flattened k×dim). */
  private def nearest(x: Array[Float], cen: Array[Double], k: Int,
                      dim: Int): (Int, Double) = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < k) {
      var dist = 0.0
      var d = 0
      val off = c * dim
      while (d < dim) { val dd = x(d) - cen(off + d); dist += dd * dd; d += 1 }
      if (dist < bestD) { bestD = dist; best = c }
      c += 1
    }
    (best, bestD)
  }

  /** Driver-side k-means++ over the bounded sample (seeded). */
  private def kppInit(sample: Array[Array[Float]], k: Int, dim: Int,
                      rnd: scala.util.Random): Array[Double] = {
    val out = new Array[Double](k * dim)
    val n = sample.length
    val first = sample(rnd.nextInt(n))
    var d = 0
    while (d < dim) { out(d) = first(d); d += 1 }
    val minD = Array.fill(n)(Double.MaxValue)
    for (c <- 1 until k) {
      // distances to the newest centroid (c-1)
      val off = (c - 1) * dim
      var i = 0
      while (i < n) {
        var dist = 0.0
        var j = 0
        while (j < dim) { val dd = sample(i)(j) - out(off + j); dist += dd * dd; j += 1 }
        if (dist < minD(i)) minD(i) = dist
        i += 1
      }
      val total = minD.sum
      val pick =
        if (total <= 0) rnd.nextInt(n)
        else {
          val r = rnd.nextDouble() * total
          var acc = 0.0
          var i2 = 0
          while (i2 < n - 1 && acc + minD(i2) < r) { acc += minD(i2); i2 += 1 }
          i2
        }
      val p = sample(pick)
      var j2 = 0
      while (j2 < dim) { out(c * dim + j2) = p(j2); j2 += 1 }
    }
    out
  }
}
