package graft.operators.multimodal

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY §2 "Multimodal"): media as opaque `binary`
  * with typed metadata, and a decode/feature-extract stage shaped for
  * scale — per-partition decoder reuse over `mapPartitions`, fixed feature
  * schema. The reference's document-conversion zoo + OCR pipeline
  * (analisis-informe.ipynb converters, ocr.py) splits here into three
  * boundaries: the text formats (html/markdown/plain) get a REAL decoder —
  * [[MarkupDecode]], oracle-checked; WAV audio and PNG images get REAL
  * pure-JVM codecs — [[WavCodec]] (RIFF chunk walk + PCM16) and
  * [[PngCodec]] (zlib inflate + all five scanline filters), both under
  * the DuckDB oracle via qMediaWav/qMediaPng; only the formats that
  * genuinely need native libs absent from this container (pdf/docx/OCR)
  * remain a clearly-marked deterministic fake with all Spark-side
  * plumbing — schema, batching, partitioning — real.
  */
object MediaQueries extends QueryModule {

  case class MediaMeta(media_type: String, width: Int, height: Int, sample_rate: Int)
  case class MediaRecord(doc_id: Long, media_bytes: Array[Byte], media_type: String,
                         width: Int, height: Int, sample_rate: Int)
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
                           feature: Array[Float])

  /** Decoder boundary — [[WavCodec]]/[[PngCodec]] sit behind it for the
    * formats this container can genuinely decode; the fake below stands in
    * for pdf/docx/OCR only. One instance per partition (the expensive-init
    * pattern real codecs need). */
  trait MediaDecoder extends Serializable {
    def decode(r: MediaRecord): Array[Float]
  }

  /** STUB: deterministic fake decode (polynomial byte-hash per feature
    * lane) standing in for pdf/docx/OCR decoding (native-lib formats). */
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

  // ---- real binary decode under the oracle ---------------------------------
  // Strategy: synthesize payloads with the real ENCODERS from a pure-
  // integer-arithmetic signal (a deterministic function of doc_id), decode
  // them back with the real DECODERS inside the distributed pipeline, and
  // emit features computed FROM THE DECODED samples/pixels. The DuckDB
  // oracle replays the signal formula directly — it never sees the bytes —
  // so any header-parse / inflate / unfilter / endianness bug in the codec
  // shows up as a driver hash mismatch. All sums are exact integers
  // (< 2^53) and the float ops are deterministic scalar double arithmetic,
  // so round(6) is engine-stable.

  case class WavDoc(doc_id: Long, wav: Array[Byte])
  case class PngDoc(doc_id: Long, png: Array[Byte])

  /** Synthetic PCM16 signal: n = 200 + id%300 samples at 8000·2^(id%3) Hz,
    * s_k = (id·31 + k·17) mod 65536 − 32768. */
  def wavTable(spark: SparkSession, dir: String): Dataset[WavDoc] = {
    import spark.implicits._
    Tables.documents(spark, dir).filter(col("doc_id") < 500)
      .select(col("doc_id")).as[Long].mapPartitions { it =>
        it.map { id =>
          val n = (200 + id % 300).toInt
          val sr = 8000 << (id % 3).toInt
          val samples = Array.tabulate(n)(k =>
            ((id * 31 + k.toLong * 17) % 65536 - 32768).toShort)
          WavDoc(id, WavCodec.encode(samples, sr))
        }
      }
  }

  /** Synthetic grayscale image: (16 + id%16) × (16 + id%8), row-major
    * p_k = (id·7 + k·13) mod 256, scanline y filtered with type y mod 5 —
    * every decode exercises all five PNG filter reconstructions. */
  def pngTable(spark: SparkSession, dir: String): Dataset[PngDoc] = {
    import spark.implicits._
    Tables.documents(spark, dir).filter(col("doc_id") < 500)
      .select(col("doc_id")).as[Long].mapPartitions { it =>
        it.map { id =>
          val w = (16 + id % 16).toInt
          val h = (16 + id % 8).toInt
          val px = Array.tabulate(w * h)(k => ((id * 7 + k.toLong * 13) % 256).toInt)
          PngDoc(id, PngCodec.encode(w, h, px, y => y % 5))
        }
      }
  }

  /** Amplitude stats from genuinely decoded PCM (RIFF walk + 16-bit LE
    * samples): count, rate, duration, RMS, peak, zero-crossing count. */
  def qMediaWav(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    wavTable(spark, dir).mapPartitions { it =>
      it.map { d =>
        val pcm = WavCodec.decode(d.wav)
        val s = pcm.samples
        var sumSq = 0L
        var peak = 0L
        var zcr = 0L
        var i = 0
        while (i < s.length) {
          val v = s(i).toLong
          sumSq += v * v
          if (math.abs(v) > peak) peak = math.abs(v)
          if (i > 0 && ((v >= 0) != (s(i - 1) >= 0))) zcr += 1
          i += 1
        }
        (d.doc_id, s.length.toLong, pcm.sampleRate.toLong,
          s.length * 1000.0 / pcm.sampleRate,
          math.sqrt(sumSq.toDouble / s.length), peak, zcr)
      }
    }.toDF("doc_id", "n_samples", "sample_rate", "dur_raw", "rms_raw", "peak", "zcr")
      .select(col("doc_id"), col("n_samples"), col("sample_rate"),
        round(col("dur_raw"), 6).as("duration_ms"),
        round(col("rms_raw"), 6).as("rms"), col("peak"), col("zcr"))
      .orderBy("doc_id")
  }

  /** Pixel stats from genuinely decoded PNGs (CRC-checked chunks, zlib
    * inflate, per-row unfilter incl. Sub/Up/Average/Paeth). */
  def qMediaPng(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pngTable(spark, dir).mapPartitions { it =>
      it.map { d =>
        val img = PngCodec.decode(d.png)
        var sp = 0L
        var spp = 0L
        img.pixels.foreach { p => sp += p; spp += p.toLong * p }
        val n = img.pixels.length
        val mean = sp.toDouble / n
        (d.doc_id, img.width.toLong, img.height.toLong, n.toLong,
          mean, spp.toDouble / n - mean * mean)
      }
    }.toDF("doc_id", "width", "height", "n_px", "mean_raw", "var_raw")
      .select(col("doc_id"), col("width"), col("height"), col("n_px"),
        round(col("mean_raw"), 6).as("mean_px"),
        round(col("var_raw"), 6).as("var_px"))
      .orderBy("doc_id")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_meta" -> (qMediaMeta _),
    "q_media_features" -> (qMediaFeatures _),
    "q_media_resize" -> (qMediaResize _),
    "q_media_wav" -> (qMediaWav _),
    "q_media_png" -> (qMediaPng _),
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
        |        WHERE doc_id % 3 = 2))""".stripMargin,
    // replays the synthetic PCM signal arithmetic — never touches the wav
    // bytes, so it cross-checks the whole encode→RIFF-walk→decode path
    "q_media_wav" ->
      """WITH docs AS (
        |  SELECT doc_id, 200 + doc_id % 300 AS n,
        |    CAST(8000 * power(2, doc_id % 3) AS BIGINT) AS sr
        |  FROM documents WHERE doc_id < 500),
        |s AS (
        |  SELECT doc_id, n, sr, k, (doc_id * 31 + k * 17) % 65536 - 32768 AS v
        |  FROM (SELECT doc_id, n, sr, unnest(range(0, n)) AS k FROM docs)),
        |lagged AS (
        |  SELECT doc_id, n, sr, k, v,
        |    lag(v) OVER (PARTITION BY doc_id ORDER BY k) AS vp
        |  FROM s),
        |feat AS (
        |  SELECT doc_id, any_value(n) AS n, any_value(sr) AS sr,
        |    CAST(sum(v * v) AS BIGINT) AS sumsq,
        |    CAST(max(abs(v)) AS BIGINT) AS peak,
        |    CAST(sum(CASE WHEN k > 0 AND ((v >= 0) != (vp >= 0)) THEN 1 ELSE 0 END) AS BIGINT) AS zcr
        |  FROM lagged GROUP BY doc_id)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_samples, sr AS sample_rate,
        |  round(n * 1000.0 / sr, 6) AS duration_ms,
        |  round(sqrt(CAST(sumsq AS DOUBLE) / n), 6) AS rms,
        |  peak, zcr
        |FROM feat ORDER BY doc_id""".stripMargin,
    // replays the synthetic pixel arithmetic — cross-checks PNG chunk
    // framing, CRCs, inflate, and all five filter reconstructions
    "q_media_png" ->
      """WITH docs AS (
        |  SELECT doc_id, 16 + doc_id % 16 AS w, 16 + doc_id % 8 AS h
        |  FROM documents WHERE doc_id < 500),
        |px AS (
        |  SELECT doc_id, w, h, (doc_id * 7 + k * 13) % 256 AS p
        |  FROM (SELECT doc_id, w, h, unnest(range(0, w * h)) AS k FROM docs)),
        |agg AS (
        |  SELECT doc_id, any_value(w) AS w, any_value(h) AS h, count(*) AS n,
        |    CAST(sum(p) AS BIGINT) AS sp, CAST(sum(p * p) AS BIGINT) AS spp
        |  FROM px GROUP BY doc_id)
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(n AS BIGINT) AS n_px,
        |  round(CAST(sp AS DOUBLE) / n, 6) AS mean_px,
        |  round(CAST(spp AS DOUBLE) / n - (CAST(sp AS DOUBLE) / n) * (CAST(sp AS DOUBLE) / n), 6) AS var_px
        |FROM agg ORDER BY doc_id""".stripMargin)
}
