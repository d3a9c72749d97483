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
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
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

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_quantized_recall" -> (qQuantizedRecall _))

  override def oracles: Map[String, String] = Map(
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
