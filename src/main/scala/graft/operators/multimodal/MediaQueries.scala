package graft.operators.multimodal

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY §2 "Multimodal"): media as opaque `binary`
  * with typed metadata, and a decode/feature-extract stage shaped for
  * scale — per-partition decoder reuse over `mapPartitions`, fixed feature
  * schema. The reference's document-conversion zoo + OCR pipeline
  * (analisis-informe.ipynb converters, ocr.py) splits here into two
  * boundaries: the text formats (html/markdown/plain) get a REAL decoder —
  * [[MarkupDecode]], oracle-checked — while the image/audio/video codecs
  * (absent from this container) are a clearly-marked deterministic fake
  * with all Spark-side plumbing — schema, batching, partitioning — real.
  */
object MediaQueries extends QueryModule {

  case class MediaMeta(media_type: String, width: Int, height: Int, sample_rate: Int)
  case class MediaRecord(doc_id: Long, media_bytes: Array[Byte], media_type: String,
                         width: Int, height: Int, sample_rate: Int)
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
                           feature: Array[Float])

  /** Decoder boundary — a real implementation would wrap an image/audio
    * codec; container has none, so the fake derives features from bytes
    * deterministically. One instance per partition (the expensive-init
    * pattern real codecs need). */
  trait MediaDecoder extends Serializable {
    def decode(r: MediaRecord): Array[Float]
  }

  /** STUB: deterministic fake decode (polynomial byte-hash per feature
    * lane) standing in for pixel/sample decoding. */
  object FakeDecoder extends MediaDecoder {
    val FeatureDim = 8
    def decode(r: MediaRecord): Array[Float] = {
      val out = new Array[Float](FeatureDim)
      var lane = 0
      while (lane < FeatureDim) {
        var h = 1469598103934665603L ^ (lane * 1099511628211L)
        var i = lane
        while (i < r.media_bytes.length) {
          h = (h ^ r.media_bytes(i)) * 1099511628211L
          i += FeatureDim
        }
        out(lane) = ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat
        lane += 1
      }
      out
    }
  }

  /** The media table: documents' text bytes as the opaque payload, with
    * deterministic typed metadata (oracle-expressible arithmetic). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      col("text").cast("binary").as("media_bytes"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      (lit(64) + (col("doc_id") % 8) * 16).cast("int").as("width"),
      (lit(64) + (col("doc_id") % 4) * 32).cast("int").as("height"),
      (lit(8000) * pow(lit(2), (col("doc_id") % 3).cast("int"))).cast("int").as("sample_rate"))

  /** Metadata/schema query — oracle-checked (pure arithmetic). */
  def qMediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n"),
        sum(length(col("media_bytes"))).as("sum_bytes"),
        max(col("width")).as("max_w"), max(col("height")).as("max_h"),
        max(col("sample_rate")).as("max_sr"))
      .orderBy("media_type")

  /** Decode + feature extraction over mapPartitions: one decoder per
    * partition, streamed batches, fixed output schema. Rows-only (the
    * fake decode is engine-specific); invariants in MediaSpec. */
  def decodeFeatures(spark: SparkSession, dir: String,
                     decoder: MediaDecoder = FakeDecoder): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRecord].mapPartitions { it =>
      val d = decoder // per-partition init point for real codecs
      it.map(r => MediaFeatures(r.doc_id, r.media_type, r.media_bytes.length,
        d.decode(r)))
    }
  }

  def qMediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{aggregate => fold}
    decodeFeatures(spark, dir).toDF()
      .withColumn("f_norm",
        sqrt(fold(col("feature"), lit(0.0d), (acc, x) => acc + x * x)))
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("n_bytes")), 6).as("avg_bytes"),
        round(avg(col("f_norm")), 4).as("avg_feature_norm"))
      .orderBy("media_type")
  }

  /** Thumbnail resize to 64×64: payload scaled by the area ratio (STUB
    * content transform — a real codec would re-encode pixels; the byte-
    * length arithmetic, schema, and scan shape are real and
    * oracle-checked). Declarative substring over binary — no UDF, stays in
    * whole-stage codegen. */
  def qMediaResize(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .withColumn("out_len",
        greatest(lit(1L),
          floor(length(col("media_bytes")) * lit(4096.0) /
            (col("width") * col("height")))))
      .withColumn("resized",
        expr("substring(media_bytes, 1, cast(out_len AS int))"))
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n"),
        sum(length(col("resized")).cast("long")).as("sum_resized_bytes"))
      .orderBy("media_type")

  /** Frame sampling: every 10th 256-byte "frame" of each video payload
    * (last frame partial). explode(sequence(...)) + substring — the frame
    * fan-out is a declarative generator the optimizer sees, not opaque
    * per-row code. */
  def qFrameSample(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .filter(col("media_type") === "video")
      .withColumn("n_frames", expr("(length(media_bytes) + 255) DIV 256"))
      // empty payload → sequence(0,-1) would throw; the oracle's range()
      // returns empty for the same row, so filter keeps the engines aligned
      .filter(col("n_frames") > 0)
      .withColumn("idx", explode(sequence(lit(0L), col("n_frames") - 1, lit(10L))))
      .withColumn("frame", expr("substring(media_bytes, cast(idx*256+1 AS int), 256)"))
      .agg(countDistinct(col("doc_id")).as("n_videos"),
        count(lit(1)).as("n_frames_sampled"),
        sum(length(col("frame")).cast("long")).as("sum_frame_bytes"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_meta" -> (qMediaMeta _),
    "q_media_features" -> (qMediaFeatures _),
    "q_media_resize" -> (qMediaResize _),
    "q_frame_sample" -> (qFrameSample _))

  override def oracles: Map[String, String] = Map(
    "q_media_meta" ->
      """SELECT media_type, count(*) AS n, CAST(sum(n_b) AS BIGINT) AS sum_bytes,
        |  CAST(max(64 + (doc_id % 8) * 16) AS INT) AS max_w,
        |  CAST(max(64 + (doc_id % 4) * 32) AS INT) AS max_h,
        |  max(CAST(8000 * power(2, doc_id % 3) AS INT)) AS max_sr
        |FROM (SELECT doc_id, octet_length(encode(text)) AS n_b,
        |  ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type
        |  FROM documents)
        |GROUP BY media_type ORDER BY media_type""".stripMargin,
    "q_media_resize" ->
      """SELECT media_type, count(*) AS n,
        |  CAST(sum(least(greatest(1, CAST(floor(n_b * 4096.0 / (width * height)) AS BIGINT)),
        |                 n_b)) AS BIGINT) AS sum_resized_bytes
        |FROM (SELECT doc_id, octet_length(encode(text)) AS n_b,
        |    ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
        |    64 + (doc_id % 8) * 16 AS width, 64 + (doc_id % 4) * 32 AS height
        |  FROM documents)
        |GROUP BY media_type ORDER BY media_type""".stripMargin,
    "q_frame_sample" ->
      """SELECT count(DISTINCT doc_id) AS n_videos, count(*) AS n_frames_sampled,
        |  CAST(sum(least(256, n_b - idx * 256)) AS BIGINT) AS sum_frame_bytes
        |FROM (
        |  SELECT doc_id, n_b, unnest(range(0, (n_b + 255) // 256, 10)) AS idx
        |  FROM (SELECT doc_id, octet_length(encode(text)) AS n_b FROM documents
        |        WHERE doc_id % 3 = 2))""".stripMargin)
}
