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

  /** DETERMINISTIC codebooks: codeword c of subspace s = the s-th slice of
    * the L2-NORMALIZED embedding of vec_id c+1 (first-k rows by id — the
    * same first-K trick q_kmeans_1step uses for replayable centroids).
    * No sampling, no RNG, no iteration: every value is a pure function of
    * the corpus, so a SQL oracle can rebuild the exact codebooks and
    * replay encode→reconstruct→recall bit-for-bit. Codeword quality is
    * below a trained k-means codebook — this variant exists to put the
    * whole PQ serving pipeline's arithmetic under the driver hash; [[fit]]
    * remains the production trainer. */
  def fitDeterministic(points: DataFrame, vecCol: String, numSub: Int,
                       k: Int, idCol: String = "vec_id"): PqModel = {
    val rows = points.filter(col(idCol).between(1, k))
      .select(col(idCol).cast("long").as("id"),
        vec_normalize(col(vecCol)).cast("array<double>").as("v"))
      .orderBy("id").collect() // k rows — driver-sized by construction
    require(rows.length == k, s"need ids 1..$k present, got ${rows.length}")
    val dim = rows.head.getSeq[Double](1).length
    require(dim % numSub == 0, s"dim $dim not divisible by $numSub subspaces")
    val subDim = dim / numSub
    val books = Array.tabulate(numSub) { s =>
      rows.map(_.getSeq[Double](1).slice(s * subDim, (s + 1) * subDim).toArray)
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

  private val cache = new graft.RollingCache
  /** Subspaces / codewords of the oracled diagnostic (64-dim → 8×8). */
  private val NumSub = 8
  private val SubDim = 8
  private val Codewords = 32

  /** Recall@10 of the full PQ serving pipeline (M=8 subs, k=32 codewords):
    * PQ-approximate scoring shortlists 50 candidates, an exact rerank of
    * just those candidates produces the final 10 — the standard
    * compress-then-refine shape (candidate generation touches only codes;
    * exact vectors are fetched for 50 rows, not the corpus).
    *
    * Codebooks are the DETERMINISTIC first-k variant
    * ([[ProductQuantization.fitDeterministic]]) so the oracle can rebuild
    * them in SQL and replay encode→reconstruct→shortlist→rerank→recall —
    * the entire serving arithmetic sits under the driver hash. */
  def qPqRecall(spark: SparkSession, dir: String): DataFrame = {
    val e = cache.persist(Tables.embeddings(spark, dir))
    val model = ProductQuantization.fitDeterministic(
      e, "embedding", numSub = NumSub, k = Codewords)
    val q = graft.Tables.headEmbeddingDouble(e.filter(col("vec_id") === 0))
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

  /** Full SQL replay of the deterministic-PQ pipeline. Codebook = slices
    * of the first-k normalized embeddings (the q_kmeans_1step trick);
    * assignment = argmin of list_inner_product(diff, diff) (bit-identical
    * to NearestCentroid's fold; sqrt is monotone so dropping it keeps the
    * argmin; ties break to the lowest code in both engines);
    * reconstruction = codeword concatenation in subspace order; ranking on
    * round(cos, 6) with vec_id tie-break (the q_topk_bruteforce scheme). */
  override def oracles: Map[String, String] = Map(
    "q_pq_recall" ->
      s"""WITH pts AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS pe FROM embeddings),
         |nv AS (SELECT vec_id,
         |    list_transform(pe, x -> x * (1.0 / sqrt(list_inner_product(pe, pe)))) AS v
         |  FROM pts),
         |subs AS (SELECT CAST(unnest(generate_series(0, ${NumSub - 1})) AS INT) AS sub),
         |cb AS (SELECT s.sub, CAST(n.vec_id - 1 AS INT) AS code,
         |    n.v[s.sub * $SubDim + 1 : s.sub * $SubDim + $SubDim] AS cw
         |  FROM nv n CROSS JOIN subs s WHERE n.vec_id BETWEEN 1 AND $Codewords),
         |sl AS (SELECT n.vec_id, s.sub,
         |    n.v[s.sub * $SubDim + 1 : s.sub * $SubDim + $SubDim] AS sv
         |  FROM nv n CROSS JOIN subs s),
         |d2 AS (SELECT vec_id, sub, code, list_inner_product(df, df) AS dd FROM (
         |    SELECT sl.vec_id, sl.sub, cb.code,
         |      list_transform(generate_series(1, $SubDim),
         |        i -> sl.sv[CAST(i AS INT)] - cb.cw[CAST(i AS INT)]) AS df
         |    FROM sl JOIN cb USING (sub))),
         |enc AS (SELECT vec_id, sub, code FROM (
         |    SELECT vec_id, sub, code,
         |      row_number() OVER (PARTITION BY vec_id, sub ORDER BY dd, code) AS rn
         |    FROM d2) WHERE rn = 1),
         |recon AS (SELECT e2.vec_id, flatten(list(cb.cw ORDER BY e2.sub)) AS rv
         |  FROM enc e2 JOIN cb ON e2.sub = cb.sub AND e2.code = cb.code
         |  GROUP BY e2.vec_id),
         |q AS (SELECT pe AS qe FROM pts WHERE vec_id = 0),
         |appx AS (SELECT r.vec_id,
         |    round(list_cosine_similarity(r.rv, q.qe), 6) AS cos_sim
         |  FROM recon r CROSS JOIN q WHERE r.vec_id > 0),
         |short AS (SELECT vec_id FROM appx ORDER BY cos_sim DESC, vec_id LIMIT 50),
         |exact AS (SELECT p.vec_id,
         |    round(list_cosine_similarity(p.pe, q.qe), 6) AS cos_sim
         |  FROM pts p CROSS JOIN q WHERE p.vec_id > 0),
         |rtop AS (SELECT e3.vec_id, e3.cos_sim FROM exact e3 JOIN short USING (vec_id)
         |  ORDER BY e3.cos_sim DESC, e3.vec_id LIMIT 10),
         |etop AS (SELECT vec_id FROM exact ORDER BY cos_sim DESC, vec_id LIMIT 10)
         |SELECT 10 AS k, round(count(*) / 10.0, 6) AS recall
         |FROM rtop JOIN etop USING (vec_id)""".stripMargin)
}
