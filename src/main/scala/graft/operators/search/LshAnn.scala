package graft.operators.search

import graft.{QueryModule, Tables}
import graft.functions.{HyperplaneSig, VectorOps}
import VectorOps._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cosine-LSH ANN: 6 random hyperplanes → 64 buckets; a query probes its
  * own bucket plus the 6 flip-one-bit neighbors (multiprobe), then runs
  * exact cosine top-k on the candidates. At 100 TB the corpus is written
  * bucketed by `bucket` so a probe is a partition-pruned scan; the index
  * build is one map-side pass (SURVEY §6).
  */
object LshAnn extends QueryModule {

  val NumPlanes = 6
  val Dim = 64

  lazy val planes: Seq[Seq[Double]] = HyperplaneSig.randomPlanes(NumPlanes, Dim)

  /** Corpus with bucket keys — the "index". */
  def indexed(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .withColumn("bucket", HyperplaneSig(vec_normalize(col("embedding")), planes))

  def qAnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = indexed(spark, dir)
    val q = Tables.headEmbeddingDouble(
      Tables.embeddings(spark, dir).filter(col("vec_id") === 0))
    val qNorm = {
      val n = math.sqrt(q.map(x => x.toDouble * x).sum)
      q.map(x => if (n == 0) x.toDouble else x * (1.0 / n))
    }
    val qBucket = planes.map(p => p.zip(qNorm).map { case (a, b) => a * b }.sum)
      .zipWithIndex.foldLeft(0L) { case (acc, (s, i)) => if (s > 0) acc | (1L << i) else acc }
    val probes = qBucket +: (0 until NumPlanes).map(i => qBucket ^ (1L << i))
    val qCol = array(q.map(v => lit(v)).toIndexedSeq: _*)
    e.filter(col("vec_id") > 0 && col("bucket").isin(probes: _*))
      .select(col("vec_id"), col("bucket"),
        round(cosine_sim(col("embedding"), qCol), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(10)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_lsh" -> (qAnnLsh _))

  /** DuckDB replay: the plane matrix is a deterministic seeded constant
    * available at oracle-build time, so the signature computation is
    * embedded literally — per-plane dot products as explicit left-
    * associated chains (same sequential double accumulation as
    * HyperplaneSig), sign bits summed into the bucket, the query's
    * multiprobe set derived with xor, exact cosine rerank on candidates.
    * Double literals round-trip exactly via Double.toString. */
  override def oracles: Map[String, String] = Map(
    "q_ann_lsh" -> {
      def planeDot(p: Int): String =
        (1 to Dim).map(i => s"nv[$i] * (${planes(p)(i - 1)})").mkString(" + ")
      val bucketExpr = (0 until NumPlanes)
        .map(p => s"(CASE WHEN ${planeDot(p)} > 0 THEN ${1L << p} ELSE 0 END)")
        .mkString("\n      + ")
      val probeVals = (0L +: (0 until NumPlanes).map(i => 1L << i))
        .map(v => s"($v)").mkString(", ")
      s"""WITH nrm AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS raw,
         |    list_transform(CAST(embedding AS DOUBLE[]),
         |      x -> x * (1.0 / sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
         |                                              CAST(embedding AS DOUBLE[]))))) AS nv
         |  FROM embeddings),
         |sig AS (
         |  SELECT vec_id, raw,
         |    CAST($bucketExpr AS BIGINT) AS bucket
         |  FROM nrm),
         |qrow AS (SELECT bucket AS qb, raw AS qv FROM sig WHERE vec_id = 0),
         |probes AS (
         |  SELECT xor(qb, v) AS pb
         |  FROM qrow, (VALUES $probeVals) t(v))
         |SELECT s.vec_id, s.bucket,
         |  round(list_cosine_similarity(s.raw, q.qv), 6) AS cos_sim
         |FROM sig s, qrow q
         |WHERE s.vec_id > 0 AND s.bucket IN (SELECT pb FROM probes)
         |ORDER BY cos_sim DESC, s.vec_id
         |LIMIT 10""".stripMargin
    })
}
