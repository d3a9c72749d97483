package graft.operators.search

import graft.{QueryModule, Tables}
import graft.functions.{NearestCentroid, VectorOps}
import VectorOps._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the second classic vector-index compression
  * (after SQ8): split each d-dim vector into M subvectors and replace each
  * with the id of its nearest codeword from a per-subspace k-means
  * codebook. 64-dim float32 → M=8 codes: 32× smaller in a packed layout.
  * The reference thesis's index tuning is exactly this family of
  * accuracy-for-footprint trades.
  *
  * Spark-first shape:
  *  - codebook training is sample-based (one distributed `takeSample`,
  *    then M tiny driver-side Lloyd's runs — the FAISS recipe; quality
  *    depends on the sample, not corpus size);
  *  - encoding is M map-side [[NearestCentroid]] expressions over slices —
  *    plan-constant codebooks, no join, no shuffle;
  *  - reconstruction for scoring is one plan-constant codeword gather
  *    ([[graft.functions.PqReconstruct]]) back to a d-dim vector —
  *    codegen'd, with generated-code size independent of codebook size.
  *
  * Codebooks are seeded-k-means outputs → engine-specific → rows-only
  * check; invariants in ProductQuantizationSpec.
  */
object ProductQuantization {

  final case class PqModel(subDim: Int, codebooks: Array[Array[Array[Double]]]) {
    def numSub: Int = codebooks.length
  }

  /** Train M codebooks of k codewords each on a bounded seeded sample of
    * the normalized corpus — the standard PQ training recipe (FAISS trains
    * codebooks on a sample too): ONE distributed `takeSample`, then M tiny
    * k-means runs on the driver over sample×subDim floats. Codebook quality
    * depends on the sample, not the corpus size, so this is the
    * 10^11-vector shape as well. */
  def fit(points: DataFrame, vecCol: String, numSub: Int, k: Int,
          seed: Long = 42L, maxIter: Int = 15, sampleSize: Int = 4096): PqModel = {
    val spark = points.sparkSession
    import spark.implicits._
    val sample = points
      .select(vec_normalize(col(vecCol)).cast("array<float>").as("v"))
      .as[Array[Float]].rdd
      .takeSample(withReplacement = false, num = sampleSize, seed)
    require(sample.nonEmpty, "ProductQuantization.fit: empty input")
    val dim = sample.head.length
    require(dim % numSub == 0, s"dim $dim not divisible by $numSub subspaces")
    val subDim = dim / numSub
    val books = Array.tabulate(numSub) { s =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim))
      localKMeans(sub, k, subDim, maxIter, new scala.util.Random(seed + s))
    }
    PqModel(subDim, books)
  }

  /** Driver-side Lloyd's over the sample (k-means++ init, min-id empty-
    * cluster retention). */
  private def localKMeans(xs: Array[Array[Float]], k: Int, dim: Int,
                          maxIter: Int, rnd: scala.util.Random): Array[Array[Double]] = {
    val n = xs.length
    // k-means++ init
    val cen = Array.ofDim[Double](k, dim)
    val first = xs(rnd.nextInt(n))
    for (d <- 0 until dim) cen(0)(d) = first(d)
    val minD = Array.fill(n)(Double.MaxValue)
    for (c <- 1 until k) {
      var i = 0
      while (i < n) {
        var s = 0.0
        var d = 0
        while (d < dim) { val dd = xs(i)(d) - cen(c - 1)(d); s += dd * dd; d += 1 }
        if (s < minD(i)) minD(i) = s
        i += 1
      }
      val tot = minD.sum
      val pick =
        if (tot <= 0) rnd.nextInt(n)
        else {
          val r = rnd.nextDouble() * tot
          var acc = 0.0; var i2 = 0
          while (i2 < n - 1 && acc + minD(i2) < r) { acc += minD(i2); i2 += 1 }
          i2
        }
      for (d <- 0 until dim) cen(c)(d) = xs(pick)(d)
    }
    // Lloyd iterations
    val sums = Array.ofDim[Double](k, dim)
    val counts = new Array[Int](k)
    for (_ <- 0 until maxIter) {
      java.util.Arrays.fill(counts, 0)
      sums.foreach(a => java.util.Arrays.fill(a, 0.0))
      var i = 0
      while (i < n) {
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var s = 0.0; var d = 0
          while (d < dim) { val dd = xs(i)(d) - cen(c)(d); s += dd * dd; d += 1 }
          if (s < bestD) { bestD = s; best = c }
          c += 1
        }
        counts(best) += 1
        var d2 = 0
        while (d2 < dim) { sums(best)(d2) += xs(i)(d2); d2 += 1 }
        i += 1
      }
      for (c <- 0 until k if counts(c) > 0; d <- 0 until dim)
        cen(c)(d) = sums(c)(d) / counts(c)
    }
    cen
  }

  /** Code column (array<int>, one entry per subspace) for a vector column
    * (applied to the NORMALIZED vector, matching fit). */
  def encode(vec: Column, model: PqModel): Column = {
    val v = vec_normalize(vec)
    array(model.codebooks.zipWithIndex.map { case (book, s) =>
      NearestCentroid(slice(v, s * model.subDim + 1, model.subDim),
        book.map(_.toIndexedSeq).toIndexedSeq).getField("centroid_id")
    }.toIndexedSeq: _*)
  }

  /** Reconstructed (approximate) normalized vector from a code column —
    * one plan-constant codeword gather ([[graft.functions.PqReconstruct]]),
    * not an unrolled literal table: generated-code size is independent of
    * k, so codebook size is no longer capped by Janino compile time. */
  def reconstruct(codes: Column, model: PqModel): Column =
    graft.functions.PqReconstruct(codes, model.codebooks)
}

object ProductQuantizationQueries extends QueryModule {

  /** Recall@10 of the full PQ serving pipeline (M=8 subs, k=32 codewords):
    * PQ-approximate scoring shortlists 50 candidates, an exact rerank of
    * just those candidates produces the final 10 — the standard
    * compress-then-refine shape (candidate generation touches only codes;
    * exact vectors are fetched for 50 rows, not the corpus). */
  def qPqRecall(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).cache()
    val model = ProductQuantization.fit(e, "embedding", numSub = 8, k = 32)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    val qCol = array(q.map(v => lit(v)).toIndexedSeq: _*)
    def topN(df: DataFrame, scoreCol: Column, n: Int): DataFrame =
      df.filter(col("vec_id") > 0)
        .select(col("vec_id"), round(scoreCol, 6).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(n)
        .select("vec_id")
    val approxVec = ProductQuantization.reconstruct(
      ProductQuantization.encode(col("embedding"), model), model)
    val shortlist = topN(e, cosine_sim(approxVec, qCol), 50)
    val reranked = topN(e.join(broadcast(shortlist), Seq("vec_id")),
      cosine_sim(col("embedding"), qCol), 10)
    reranked
      .join(topN(e, cosine_sim(col("embedding"), qCol), 10), Seq("vec_id"))
      .agg(round(count(lit(1)) / 10.0, 6).as("recall"))
      .select(lit(10).as("k"), col("recall"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pq_recall" -> (qPqRecall _))

  /** Codebooks are seeded k-means — engine-specific, rows-only. */
  override def oracles: Map[String, String] = Map.empty
}
