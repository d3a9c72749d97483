package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Readers/writers for the reference's interchange formats (SURVEY §1):
  *
  *  - `cluster_centroids.csv` — `cluster_label, centroid, etiqueta` where
  *    centroid is a stringified float list `"[0.1, 0.2, …]"` parsed with
  *    np.fromstring in the reference (chunk_similarities.ipynb:80);
  *  - `documentos_pre.json` — a JSON array of chunk documents with
  *    `content_vector` (chunk_similarities.ipynb:63-69).
  *
  * Spark-side: schema-enforced reads, array columns materialized as
  * `array<double>`, and symmetric writers so the reference's files can be
  * produced as well as consumed. All are ordinary DataFrame sources —
  * pushdown/pruning work as usual downstream.
  */
object Sources {

  val CentroidSchema: StructType = StructType(Seq(
    StructField("cluster_label", IntegerType),
    StructField("centroid", StringType),
    StructField("etiqueta", StringType)))

  /** Parse `"[v, v, …]"` → array<double> (np.fromstring equivalent). */
  def parseVector(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(
      split(regexp_replace(c, "[\\[\\] \\t\\n\\r\\f\\x0B]", ""), ","),
      x => x.cast("double"))

  /** cluster_centroids.csv → (cluster_label int, centroid array<double>,
    * etiqueta string). */
  def readCentroidsCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(CentroidSchema)
      .option("header", "true").option("quote", "\"").option("escape", "\"")
      .csv(path)
      .select(col("cluster_label"), parseVector(col("centroid")).as("centroid"),
        col("etiqueta"))

  /** Symmetric writer: array<double> centroid → bracketed string csv. */
  def writeCentroidsCsv(df: DataFrame, path: String): Unit =
    df.select(col("cluster_label"),
      concat(lit("["), concat_ws(", ", col("centroid")), lit("]")).as("centroid"),
      col("etiqueta"))
      .coalesce(1)
      .write.mode("overwrite")
      .option("header", "true").option("quote", "\"").option("escape", "\"")
      .csv(path)

  /** documentos_pre.json (a top-level JSON array) → one row per chunk with
    * content_vector as array<double>. */
  def readDocumentsJson(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)

  /** Symmetric writer for the chunk-dump shape (one JSON array file). */
  def writeDocumentsJson(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").json(path)
}
