package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Element-type drift guard for the embeddings table — the vector twin of
  * TablesSchemaDriftSpec: the corpus writer ships `embedding` as
  * array<float> today, but nothing promises that forever. The vector
  * kernels widen elements to double before any arithmetic, so a corpus
  * holding the SAME values as doubles must produce bit-identical results
  * end to end (float values are exactly representable in double).
  */
class EmbeddingsSchemaDriftSpec extends SparkSpec {

  private lazy val dirs: (String, String) = {
    val src = Tables.embeddings(spark, SfDir).limit(300)
    def write(cast: Boolean): String = {
      val d = java.nio.file.Files.createTempDirectory(
        if (cast) "graft_embdrift_double" else "graft_embdrift_float")
      Fs.deleteAtExit(d)
      val df = if (cast) src.withColumn("embedding",
        col("embedding").cast(ArrayType(DoubleType))) else src
      df.coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
      d.toString
    }
    (write(cast = false), write(cast = true))
  }

  test("the two dirs carry distinct element types") {
    val (f, d) = dirs
    assert(spark.read.parquet(s"$f/embeddings.parquet")
      .schema("embedding").dataType === ArrayType(FloatType, containsNull = true))
    assert(spark.read.parquet(s"$d/embeddings.parquet")
      .schema("embedding").dataType === ArrayType(DoubleType, containsNull = true))
  }

  test("nearest-centroid classification is bit-identical across element types") {
    val (f, d) = dirs
    val a = graft.operators.clustering.ClusteringQueries
      .qNearestCentroid(spark, f).collect()
    val b = graft.operators.clustering.ClusteringQueries
      .qNearestCentroid(spark, d).collect()
    assert(a.toSeq == b.toSeq)
  }

  test("vector norms and brute-force top-k are bit-identical across element types") {
    val (f, d) = dirs
    def run(dir: String) = (
      SparkEntry.queries("q_vec_norm")(spark, dir).collect().toSeq,
      SparkEntry.queries("q_topk_bruteforce")(spark, dir).collect().toSeq)
    assert(run(f) == run(d))
  }
}
