package graft.operators.search

import graft.{QueryModule, Tables}
import graft.functions.VectorOps._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) of the embedding corpus — the storage/IO
  * optimization a vector index applies at scale (the reference thesis
  * studies exactly these index-compression trade-offs; Azure AI Search
  * ships it as "scalar quantization"). One 8-bit code per element is a 4×
  * cut over float32 in a packed layout; the demo keeps codes as smallint
  * (Spark's smallest integral type covering 0..255 — still 2× smaller,
  * and a production sink would pack them into a binary column). At 10^11
  * vectors this is the difference between RAM and disk for the index.
  *
  * Fit = ONE `treeAggregate` pass for per-dimension (min, max) — nothing
  * driver-side grows with n. Quantize / dequantize are declarative
  * `transform(...)` higher-order functions over plan-constant min/scale
  * arrays — codegen'd, no UDF. Quantized values use floor(x+0.5) so both
  * engines round identically, making the whole pipeline — including the
  * recall-vs-exact metric — DuckDB-oracle-checkable.
  */
object Quantization extends QueryModule {

  /** Per-dimension (min, max) of `vecCol` in one pass — in DOUBLE precision
    * (a float downcast here would shift bounds for double-typed inputs and
    * push codes outside [0, 255]). Quantize only data covered by the fit. */
  def fitMinMax(points: DataFrame, vecCol: String): (Array[Double], Array[Double]) = {
    val spark = points.sparkSession
    import spark.implicits._
    val data = points.select(col(vecCol).cast("array<double>")).as[Array[Double]].rdd
    val dim = data.take(1).headOption.map(_.length).getOrElse(
      throw new IllegalArgumentException("Quantization.fitMinMax: empty input"))
    val zero = (Array.fill(dim)(Double.MaxValue), Array.fill(dim)(Double.MinValue))
    val (mins, maxs) = data.treeAggregate(zero)(
      seqOp = { case ((mn, mx), x) =>
        var i = 0
        while (i < dim && i < x.length) {
          val v = x(i)
          if (v < mn(i)) mn(i) = v
          if (v > mx(i)) mx(i) = v
          i += 1
        }
        (mn, mx)
      },
      combOp = { case ((a1, a2), (b1, b2)) =>
        var i = 0
        while (i < dim) {
          if (b1(i) < a1(i)) a1(i) = b1(i)
          if (b2(i) > a2(i)) a2(i) = b2(i)
          i += 1
        }
        (a1, a2)
      })
    (mins, maxs)
  }

  /** 8-bit code per element: floor((x−mn)/range·255 + 0.5). */
  def quantize(vec: Column, mins: Array[Double], maxs: Array[Double]): Column = {
    val mn = array(mins.map(lit).toIndexedSeq: _*)
    val rg = array(mins.zip(maxs).map { case (a, b) =>
      lit(math.max(b - a, 1e-30)) }.toIndexedSeq: _*)
    transform(vec, (x, i) =>
      floor((x - element_at(mn, i + 1)) / element_at(rg, i + 1) * 255 + 0.5))
  }

  /** Reconstruction: mn + code·range/255 (same assoc order as the oracle). */
  def dequantize(codes: Column, mins: Array[Double], maxs: Array[Double]): Column = {
    val mn = array(mins.map(lit).toIndexedSeq: _*)
    val rg = array(mins.zip(maxs).map { case (a, b) =>
      lit(math.max(b - a, 1e-30)) }.toIndexedSeq: _*)
    transform(codes, (q, i) =>
      element_at(mn, i + 1) + q * element_at(rg, i + 1) / 255)
  }

  /** Recall@10 of cosine search over the DEQUANTIZED corpus vs exact floats
    * (query vector stays full precision, as served systems do). */
  def qQuantizedRecall(spark: SparkSession, dir: String): DataFrame = {
    // cached: the fit, the query lookup, and both top-10 branches all scan it
    val e = Tables.embeddings(spark, dir).cache()
    val (mins, maxs) = fitMinMax(e, "embedding")
    val q = Tables.headEmbeddingDouble(e.filter(col("vec_id") === 0))
    val qCol = array(q.map(v => lit(v)).toIndexedSeq: _*)
    def top10(scoreCol: Column): DataFrame =
      e.filter(col("vec_id") > 0)
        .select(col("vec_id"), round(scoreCol, 6).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(10)
        .select("vec_id")
    val dq = dequantize(
      quantize(col("embedding").cast("array<double>"), mins, maxs), mins, maxs)
    top10(cosine_sim(dq, qCol))
      .join(top10(cosine_sim(col("embedding"), qCol)), Seq("vec_id"))
      .agg(round(count(lit(1)) / 10.0, 6).as("recall"))
      .select(lit(10).as("k"), col("recall"))
  }

  /** Binary quantization (1 bit/dim, threshold = per-dim mean) + Hamming
    * candidate generation + exact rerank — the most aggressive index
    * compression tier (32× over float32; Azure AI Search ships it as
    * "binary quantization", the thesis's index-cost axis taken to its
    * limit). The 64-dim sign pattern packs into two 32-bit halves held as
    * BIGINT so both engines stay inside exact integer arithmetic (a single
    * 64-bit pack would overflow DuckDB's checked BIGINT math at bit 63).
    *
    * Scale shape: the fit is one 64-row aggregate; candidate generation is
    * a map-side XOR+popcount over packed codes (8 bytes/vector — 10^11
    * vectors fit in ~1.6 TB, RAM-resident across a cluster) followed by a
    * bounded top-C; only C=100 candidates pay the full-precision rerank.
    * Per-dim means use the decimal-sum discipline so the bit threshold is
    * engine-exact (QueryModule scaladoc).
    */
  def qBqRecall(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).cache()
    // per-dim mean: round(x,6) → DECIMAL sum (order-independent) → /n
    val meanRows = e
      .select(posexplode(col("embedding").cast("array<double>")).as(Seq("d", "x")))
      .groupBy("d")
      .agg((sum(round(col("x"), 6).cast("decimal(25,6)")).cast("double")
        / count(lit(1))).as("mn"))
      .collect()
    val means = new Array[Double](meanRows.length) // dim-sized: driver-bounded
    meanRows.foreach(r => means(r.getInt(0)) = r.getDouble(1))
    val mnCol = array(means.map(lit).toIndexedSeq: _*)
    val bits = transform(col("embedding").cast("array<double>"),
      (x, i) => when(x > element_at(mnCol, i + 1), 1L).otherwise(0L))
    def pack(half: Column): Column = aggregate(half, lit(0L), (acc, b) => acc * 2 + b)
    val packed = e.select(col("vec_id"), col("embedding"),
      pack(slice(bits, 1, 32)).as("h1"), pack(slice(bits, 33, 32)).as("h2"))
    val qRow = packed.filter(col("vec_id") === 0)
      // element-type-independent pull (see Tables.headEmbeddingDouble)
      .select(col("embedding").cast("array<double>"), col("h1"), col("h2")).head()
    val qVec = qRow.getSeq[Double](0)
    val qCol = array(qVec.map(v => lit(v)).toIndexedSeq: _*)
    val ham = bit_count(col("h1").bitwiseXOR(lit(qRow.getLong(1)))) +
      bit_count(col("h2").bitwiseXOR(lit(qRow.getLong(2))))
    val cand = packed.filter(col("vec_id") > 0)
      .select(col("vec_id"), col("embedding"), ham.as("ham"))
      .orderBy(col("ham"), col("vec_id")).limit(100)
    val rerank = cand
      .select(col("vec_id"), round(cosine_sim(col("embedding"), qCol), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id")).limit(10).select("vec_id")
    val exact = e.filter(col("vec_id") > 0)
      .select(col("vec_id"), round(cosine_sim(col("embedding"), qCol), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id")).limit(10).select("vec_id")
    rerank.join(exact, Seq("vec_id"))
      .agg(round(count(lit(1)) / 10.0, 6).as("recall"))
      .select(lit(10).as("k"), lit(100).as("n_cand"), col("recall"))
  }

  /** Matryoshka prefix-truncation sweep: recall@10 of cosine search over
    * the first m dims vs the full vector, for m ∈ {8,16,32,64} — the
    * "shorten the embedding, keep the index cheap" knob (Kusupati et al.,
    * Matryoshka Representation Learning; Azure AI Search exposes it as
    * `truncationDimension`). One cached scan feeds every arm; each arm is
    * a map-side prefix dot product + bounded top-k, so the sweep costs
    * m-arms × one pass, never a shuffle per arm.
    */
  val MatryoshkaDims: Seq[Int] = Seq(8, 16, 32, 64)
  def qMatryoshkaRecall(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).cache()
    val qVec = Tables.headEmbeddingDouble(e.filter(col("vec_id") === 0))
    val qCol = array(qVec.map(v => lit(v)).toIndexedSeq: _*)
    def top10(m: Int): DataFrame =
      e.filter(col("vec_id") > 0)
        .select(col("vec_id"),
          round(cosine_sim(slice(col("embedding"), 1, m), slice(qCol, 1, m)), 6).as("cs"))
        .orderBy(col("cs").desc, col("vec_id")).limit(10).select("vec_id")
    val full = top10(MatryoshkaDims.last)
    MatryoshkaDims.map { m =>
      top10(m).join(full, Seq("vec_id"))
        .agg(round(count(lit(1)) / 10.0, 6).as("recall"))
        .select(lit(m).as("m_dims"), col("recall"))
    }.reduce(_.unionByName(_)).orderBy("m_dims")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_quantized_recall" -> (qQuantizedRecall _),
    "q_bq_recall" -> (qBqRecall _),
    "q_matryoshka_recall" -> (qMatryoshkaRecall _))

  private val matryoshkaOracle: String = {
    val arms = MatryoshkaDims.map { m =>
      s"""SELECT $m AS m_dims, round(count(*) / 10.0, 6) AS recall
         |FROM (SELECT vec_id FROM (
         |  SELECT e.vec_id, row_number() OVER (ORDER BY
         |    round(list_cosine_similarity((CAST(e.embedding AS DOUBLE[]))[1:$m], (SELECT v[1:$m] FROM qv)), 6) DESC, e.vec_id) AS rn
         |  FROM embeddings e WHERE e.vec_id > 0) WHERE rn <= 10) t
         |JOIN full10 USING (vec_id)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH qv AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0),
       |full10 AS (SELECT vec_id FROM (
       |  SELECT e.vec_id, row_number() OVER (ORDER BY
       |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), (SELECT v FROM qv)), 6) DESC, e.vec_id) AS rn
       |  FROM embeddings e WHERE e.vec_id > 0) WHERE rn <= 10)
       |$arms
       |ORDER BY m_dims""".stripMargin
  }

  override def oracles: Map[String, String] = Map(
    "q_bq_recall" ->
      """WITH ex AS (
        |  SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS x,
        |    generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS ord
        |  FROM embeddings),
        |dims AS (
        |  SELECT ord, CAST(sum(CAST(round(x, 6) AS DECIMAL(25,6))) AS DOUBLE) / count(*) AS mn
        |  FROM ex GROUP BY ord),
        |bits AS (
        |  SELECT e.vec_id, e.ord, CASE WHEN e.x > d.mn THEN 1 ELSE 0 END AS b
        |  FROM ex e JOIN dims d USING (ord)),
        |halves AS (
        |  SELECT vec_id,
        |    CAST(sum(CASE WHEN ord <= 32 THEN b * CAST(power(2, 32 - ord) AS BIGINT) ELSE 0 END) AS BIGINT) AS h1,
        |    CAST(sum(CASE WHEN ord > 32 THEN b * CAST(power(2, 64 - ord) AS BIGINT) ELSE 0 END) AS BIGINT) AS h2
        |  FROM bits GROUP BY vec_id),
        |qh AS (SELECT h1, h2 FROM halves WHERE vec_id = 0),
        |qv AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0),
        |cand AS (SELECT vec_id FROM (
        |  SELECT h.vec_id, row_number() OVER (ORDER BY
        |    bit_count(xor(h.h1, (SELECT h1 FROM qh))) + bit_count(xor(h.h2, (SELECT h2 FROM qh))), h.vec_id) AS rn
        |  FROM halves h WHERE h.vec_id > 0) WHERE rn <= 100),
        |rerank AS (SELECT vec_id FROM (
        |  SELECT c.vec_id, row_number() OVER (ORDER BY
        |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), (SELECT v FROM qv)), 6) DESC, c.vec_id) AS rn
        |  FROM cand c JOIN embeddings e USING (vec_id)) WHERE rn <= 10),
        |exact AS (SELECT vec_id FROM (
        |  SELECT e.vec_id, row_number() OVER (ORDER BY
        |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), (SELECT v FROM qv)), 6) DESC, e.vec_id) AS rn
        |  FROM embeddings e WHERE e.vec_id > 0) WHERE rn <= 10)
        |SELECT 10 AS k, 100 AS n_cand, round(count(*) / 10.0, 6) AS recall
        |FROM rerank JOIN exact USING (vec_id)""".stripMargin,
    "q_matryoshka_recall" -> matryoshkaOracle,
    "q_quantized_recall" ->
      """WITH ex AS (
        |  SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS x,
        |    generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS ord
        |  FROM embeddings),
        |dims AS (
        |  SELECT ord, min(x) AS mn, greatest(max(x) - min(x), 1e-30) AS rg
        |  FROM ex GROUP BY ord),
        |dqv AS (
        |  SELECT e.vec_id,
        |    list(d.mn + floor((e.x - d.mn) / d.rg * 255 + 0.5) * d.rg / 255 ORDER BY e.ord) AS dq
        |  FROM ex e JOIN dims d ON d.ord = e.ord
        |  GROUP BY e.vec_id),
        |qv AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0),
        |approx AS (SELECT vec_id FROM (
        |  SELECT d.vec_id, row_number() OVER (ORDER BY
        |    round(list_cosine_similarity(d.dq, (SELECT v FROM qv)), 6) DESC, d.vec_id) AS rn
        |  FROM dqv d WHERE d.vec_id > 0) WHERE rn <= 10),
        |exact AS (SELECT vec_id FROM (
        |  SELECT e.vec_id, row_number() OVER (ORDER BY
        |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), (SELECT v FROM qv)), 6) DESC, e.vec_id) AS rn
        |  FROM embeddings e WHERE e.vec_id > 0) WHERE rn <= 10)
        |SELECT 10 AS k, round(count(*) / 10.0, 6) AS recall
        |FROM approx JOIN exact USING (vec_id)""".stripMargin)
}
