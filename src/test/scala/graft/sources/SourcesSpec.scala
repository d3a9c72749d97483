package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("centroid csv roundtrip preserves labels and vectors") {
    val dir = java.nio.file.Files.createTempDirectory("graft_centroids").toString
    val centroids = Seq(
      (0, Array(0.5, -0.25, 0.125), "etiqueta uno"),
      (1, Array(1.0, 2.0, 3.0), "etiqueta, con coma")
    ).toDF("cluster_label", "centroid", "etiqueta")
    Sources.writeCentroidsCsv(centroids, dir)
    val back = Sources.readCentroidsCsv(spark, dir)
      .orderBy("cluster_label").collect()
    assert(back.length == 2)
    assert(back(0).getSeq[Double](1) == Seq(0.5, -0.25, 0.125))
    assert(back(1).getAs[String]("etiqueta") == "etiqueta, con coma")
  }

  test("parseVector handles the reference's bracketed format") {
    val v = spark.range(1)
      .select(Sources.parseVector(lit("[0.1, -2.5,3.0]")).as("v"))
      .head().getSeq[Double](0)
    assert(v == Seq(0.1, -2.5, 3.0))
  }

  test("documents json roundtrip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_docs").toString
    val docs = Seq((1L, "hola", Array(0.1, 0.2)), (2L, "adios", Array(0.3, 0.4)))
      .toDF("document_id", "content", "content_vector")
    Sources.writeDocumentsJson(docs, dir)
    val back = spark.read.json(dir)
    assert(back.count() == 2)
    assert(back.columns.toSet == Set("document_id", "content", "content_vector"))
  }
}
