package graft.operators.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MediaSpec extends SparkSpec {

  test("media table has one row per document with valid metadata") {
    val m = MediaQueries.mediaTable(spark, SfDir)
    assert(m.count() == graft.Tables.documents(spark, SfDir).count())
    assert(m.filter(col("width") < 64 || col("height") < 64 || col("sample_rate") < 8000)
      .count() == 0)
    assert(m.select("media_type").distinct().count() == 3)
  }

  test("decode produces fixed-dim deterministic features") {
    val f1 = MediaQueries.decodeFeatures(spark, SfDir).collect()
      .map(r => r.doc_id -> r.feature.toSeq).toMap
    val f2 = MediaQueries.decodeFeatures(spark, SfDir).collect()
      .map(r => r.doc_id -> r.feature.toSeq).toMap
    assert(f1 == f2, "fake decode must be deterministic")
    assert(f1.values.forall(_.length == MediaQueries.FakeDecoder.FeatureDim))
  }

  test("repartitioning does not change decode results") {
    val base = MediaQueries.decodeFeatures(spark, SfDir).collect()
      .map(r => r.doc_id -> r.feature.toSeq).toMap
    import spark.implicits._
    val repart = MediaQueries.mediaTable(spark, SfDir).repartition(7)
      .as[MediaQueries.MediaRecord]
      .mapPartitions(it => it.map(r =>
        r.doc_id -> MediaQueries.FakeDecoder.decode(r).toSeq))
      .collect().toMap
    assert(base == repart)
  }

  test("n_bytes matches payload length") {
    val bad = MediaQueries.decodeFeatures(spark, SfDir).toDF()
      .join(graft.Tables.documents(spark, SfDir), "doc_id")
      .filter(col("n_bytes") =!= col("n_chars")).count()
    assert(bad == 0)
  }
}
