package graft.streaming

import graft.SparkSpec
import graft.functions.{NearestCentroid, VectorOps}
import VectorOps._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference classifies embeddings online against the centroid table
  * (classify_embedding). The Spark-native serving path: the same map-side
  * NearestCentroid expression applied to a stream — no state, no shuffle,
  * so it runs at source throughput. */
class StreamingClassifySpec extends SparkSpec {

  test("streaming nearest-centroid assignment equals the batch assignment") {
    // stage embeddings parquet into a streaming dir
    val stage = java.nio.file.Files.createTempDirectory("graft_stream_cls")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(SfDir, "embeddings.parquet"),
      stage.resolve("embeddings.parquet"))
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val cs = graft.operators.clustering.ClusteringQueries.centroids(spark, SfDir)
    val classified = spark.readStream.schema(schema).parquet(stage.toString)
      .withColumn("centroid_id",
        NearestCentroid(vec_normalize(col("embedding")), cs).getField("centroid_id"))
      .select("vec_id", "centroid_id")
    val q = classified.writeStream.outputMode("append")
      .format("memory").queryName("stream_classify").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("stream_classify")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val batch = graft.operators.clustering.ClusteringQueries.assigned(spark, SfDir)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("centroid_id")).toMap
    assert(streamed == batch)
  }
}
