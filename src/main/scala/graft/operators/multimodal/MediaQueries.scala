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
  * [[PngCodec]] (zlib inflate + all five scanline filters); the OOXML/PDF
  * document formats get REAL pure-JVM parsers too — [[PdfCodec]] (object
  * walk, FlateDecode inflate, literal-string unescape, Tj/TJ),
  * [[DocxCodec]] (paragraph/run concat), [[XlsxCodec]] (shared-string /
  * inline / numeric cells) and [[PptxCodec]] (slide-ordered paragraph
  * runs) — all six under the DuckDB oracle via
  * qMediaWav/Png/Pdf/Docx/Xlsx/Pptx, which covers the reference's whole
  * conversion zoo except OCR of scanned images (a vision model, not a
  * parser): that remains a clearly-marked deterministic fake with all
  * Spark-side plumbing — schema, batching, partitioning — real.
  */
object MediaQueries extends QueryModule {

  case class MediaMeta(media_type: String, width: Int, height: Int, sample_rate: Int)
  case class MediaRecord(doc_id: Long, media_bytes: Array[Byte], media_type: String,
                         width: Int, height: Int, sample_rate: Int)
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
                           feature: Array[Float])

  /** Decoder boundary — [[WavCodec]]/[[PngCodec]]/[[PdfCodec]]/[[DocxCodec]]
    * sit behind it for the formats this container can genuinely decode; the
    * fake below stands in for OCR only. One instance per partition (the
    * expensive-init pattern real codecs need). */
  trait MediaDecoder extends Serializable {
    def decode(r: MediaRecord): Array[Float]
  }

  /** STUB: deterministic fake decode (polynomial byte-hash per feature
    * lane) standing in for OCR of scanned images (needs a vision model,
    * not a parser — reference calls an external service, ocr.py). */
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

  /** Shared alphabet for the PDF/DOCX synthetic text: the 26 letters plus
    * the PDF literal-string metachars `(` `)` `\` and the XML metachars
    * `&` `<` `>`, so EVERY synthesized line exercises both codecs' escape
    * paths. 32 chars → cheap `% 32` indexing on both engines. */
  val DocAlphabet: String = "abcdefghijklmnopqrstuvwxyz()\\&<>"
  private val DocAlphabetCodes = DocAlphabet.map(_.toInt)

  case class PdfDoc(doc_id: Long, pdf: Array[Byte])
  case class DocxDoc(doc_id: Long, docx: Array[Byte])

  /** PDF synthetic text: 3 + id%8 lines; line j has 20 + (id + 7j)%40
    * chars; char k = alphabet[(31·id + 13·j + 7·k) mod 32]. */
  def pdfLines(id: Long): IndexedSeq[String] = {
    val nLines = (3 + id % 8).toInt
    IndexedSeq.tabulate(nLines) { j =>
      val len = (20 + (id + j * 7) % 40).toInt
      val sb = new java.lang.StringBuilder(len)
      var k = 0
      while (k < len) {
        sb.append(DocAlphabet.charAt(((id * 31 + j * 13 + k * 7) % 32).toInt)); k += 1
      }
      sb.toString
    }
  }

  /** DOCX synthetic text: different constants so the two decode paths
    * can't mask each other's bugs: 2 + id%9 lines of 15 + (3id + 5j)%50
    * chars, char k = alphabet[(13·id + 17·j + 11·k) mod 32]. */
  def docxLines(id: Long): IndexedSeq[String] = {
    val nLines = (2 + id % 9).toInt
    IndexedSeq.tabulate(nLines) { j =>
      val len = (15 + (id * 3 + j * 5) % 50).toInt
      val sb = new java.lang.StringBuilder(len)
      var k = 0
      while (k < len) {
        sb.append(DocAlphabet.charAt(((id * 13 + j * 17 + k * 11) % 32).toInt)); k += 1
      }
      sb.toString
    }
  }

  def pdfTable(spark: SparkSession, dir: String): Dataset[PdfDoc] = {
    import spark.implicits._
    Tables.documents(spark, dir).filter(col("doc_id") < 500)
      .select(col("doc_id")).as[Long].mapPartitions { it =>
        it.map(id => PdfDoc(id, PdfCodec.encode(pdfLines(id))))
      }
  }

  def docxTable(spark: SparkSession, dir: String): Dataset[DocxDoc] = {
    import spark.implicits._
    Tables.documents(spark, dir).filter(col("doc_id") < 500)
      .select(col("doc_id")).as[Long].mapPartitions { it =>
        it.map(id => DocxDoc(id, DocxCodec.encode(docxLines(id))))
      }
  }

  /** Exact-integer stats over a decoded line set: line count, char count,
    * Σ codepoint, and a position-weighted checksum Σ code·(k+1) that a
    * char-order bug (run/TJ concatenation, escape slippage) cannot fake. */
  private def lineStats(lines: Seq[String]): (Long, Long, Long, Long) = {
    var nChars = 0L
    var sumCode = 0L
    var posSum = 0L
    lines.foreach { s =>
      var k = 0
      while (k < s.length) {
        val c = s.charAt(k).toLong
        nChars += 1; sumCode += c; posSum += c * (k + 1)
        k += 1
      }
    }
    (lines.length.toLong, nChars, sumCode, posSum)
  }

  /** Text stats from a genuinely parsed PDF: object walk, zlib inflate of
    * the FlateDecode content stream, literal-string unescape, Tj/TJ
    * extraction. The oracle replays the synthetic text arithmetic and
    * never sees the bytes — any parse bug fails the driver hash. */
  def qMediaPdf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pdfTable(spark, dir).mapPartitions { it =>
      it.map { d =>
        val (nl, nc, sc, ps) = lineStats(PdfCodec.decodeText(d.pdf))
        (d.doc_id, nl, nc, sc, ps)
      }
    }.toDF("doc_id", "n_lines", "n_chars", "sum_code", "pos_checksum")
      .orderBy("doc_id")
  }

  /** Text stats from a genuinely parsed DOCX: zip walk to
    * word/document.xml, paragraph/run concatenation, entity unescape. */
  def qMediaDocx(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docxTable(spark, dir).mapPartitions { it =>
      it.map { d =>
        val (nl, nc, sc, ps) = lineStats(DocxCodec.decodeText(d.docx))
        (d.doc_id, nl, nc, sc, ps)
      }
    }.toDF("doc_id", "n_lines", "n_chars", "sum_code", "pos_checksum")
      .orderBy("doc_id")
  }

  /** Replay oracle for the synthetic-line stats (both codecs): unnest the
    * (line, char) grid, index a literal codepoint array, aggregate. */
  private def docStatsOracle(nLinesExpr: String, lenExpr: String,
                             idxExpr: String): String = {
    val codes = DocAlphabetCodes.mkString("[", ",", "]")
    s"""WITH docs AS (
       |  SELECT doc_id, $nLinesExpr AS n_lines
       |  FROM documents WHERE doc_id < 500),
       |ch AS (
       |  SELECT doc_id, j, k, $codes[CAST(($idxExpr) % 32 AS INT) + 1] AS code
       |  FROM (
       |    SELECT doc_id, j, unnest(range(0, $lenExpr)) AS k
       |    FROM (SELECT doc_id, unnest(range(0, n_lines)) AS j FROM docs))),
       |agg AS (
       |  SELECT doc_id, count(*) AS n_chars,
       |    CAST(sum(code) AS BIGINT) AS sum_code,
       |    CAST(sum(code * (k + 1)) AS BIGINT) AS pos_checksum
       |  FROM ch GROUP BY doc_id)
       |SELECT d.doc_id, CAST(d.n_lines AS BIGINT) AS n_lines,
       |  CAST(a.n_chars AS BIGINT) AS n_chars, a.sum_code, a.pos_checksum
       |FROM docs d JOIN agg a USING (doc_id) ORDER BY d.doc_id""".stripMargin
  }

  case class XlsxDoc(doc_id: Long, xlsx: Array[Byte])
  case class PptxDoc(doc_id: Long, pptx: Array[Byte])

  /** Synthetic spreadsheet: (2 + id%6) × (2 + id%4) grid; cell (r,c) is a
    * string when (r+c)%3 == 0 (len 5 + (id + 3r + c)%10, char k =
    * alphabet[(11·id + 7r + 5c + 3k) mod 32]) else the number
    * ((17·id + 13r + 19c) mod 4000) / 4 — exact quarters, so double sums
    * are engine-exact. */
  def xlsxGrid(id: Long): IndexedSeq[IndexedSeq[XlsxCodec.Cell]] = {
    val nr = (2 + id % 6).toInt
    val nc = (2 + id % 4).toInt
    IndexedSeq.tabulate(nr, nc) { (r, c) =>
      if ((r + c) % 3 == 0) {
        val len = (5 + (id + r * 3 + c) % 10).toInt
        val sb = new java.lang.StringBuilder(len)
        var k = 0
        while (k < len) {
          sb.append(DocAlphabet.charAt(((id * 11 + r * 7 + c * 5 + k * 3) % 32).toInt)); k += 1
        }
        XlsxCodec.StrCell(sb.toString)
      } else XlsxCodec.NumCell(((id * 17 + r * 13 + c * 19) % 4000) / 4.0)
    }
  }

  /** Synthetic deck: 1 + id%4 slides; slide j has 2 + (id+j)%3 lines of
    * 10 + (2·id + 3j + 7l)%30 chars, char k =
    * alphabet[(19·id + 5j + 13l + 17k) mod 32]. */
  def pptxSlides(id: Long): IndexedSeq[IndexedSeq[String]] = {
    val nSlides = (1 + id % 4).toInt
    IndexedSeq.tabulate(nSlides) { j =>
      val nLines = (2 + (id + j) % 3).toInt
      IndexedSeq.tabulate(nLines) { l =>
        val len = (10 + (id * 2 + j * 3 + l * 7) % 30).toInt
        val sb = new java.lang.StringBuilder(len)
        var k = 0
        while (k < len) {
          sb.append(DocAlphabet.charAt(((id * 19 + j * 5 + l * 13 + k * 17) % 32).toInt)); k += 1
        }
        sb.toString
      }
    }
  }

  def xlsxTable(spark: SparkSession, dir: String): Dataset[XlsxDoc] = {
    import spark.implicits._
    Tables.documents(spark, dir).filter(col("doc_id") < 500)
      .select(col("doc_id")).as[Long].mapPartitions { it =>
        it.map(id => XlsxDoc(id, XlsxCodec.encode(xlsxGrid(id))))
      }
  }

  def pptxTable(spark: SparkSession, dir: String): Dataset[PptxDoc] = {
    import spark.implicits._
    Tables.documents(spark, dir).filter(col("doc_id") < 500)
      .select(col("doc_id")).as[Long].mapPartitions { it =>
        it.map(id => PptxDoc(id, PptxCodec.encode(pptxSlides(id))))
      }
  }

  /** Cell stats from a genuinely parsed XLSX: zip walk, shared-string
    * resolution, numeric cells. Sum of quarters is exact in double, so no
    * rounding games; string checksum is the positional scheme shared with
    * the PDF/DOCX queries. */
  def qMediaXlsx(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    xlsxTable(spark, dir).mapPartitions { it =>
      it.map { d =>
        val grid = XlsxCodec.decode(d.xlsx)
        var nNum = 0L
        var sumNum = 0.0
        var nStr = 0L
        var strSum = 0L
        grid.foreach(_.foreach {
          case XlsxCodec.NumCell(v) => nNum += 1; sumNum += v
          case XlsxCodec.StrCell(s) =>
            nStr += 1
            var k = 0
            while (k < s.length) { strSum += s.charAt(k).toLong * (k + 1); k += 1 }
        })
        (d.doc_id, grid.length.toLong, (nNum + nStr), nNum, sumNum, nStr, strSum)
      }
    }.toDF("doc_id", "n_rows", "n_cells", "n_num", "sum_num", "n_str", "str_code_sum")
      .orderBy("doc_id")
  }

  /** Text stats from a genuinely parsed PPTX: slide parts in deck order,
    * paragraph/run concatenation. */
  def qMediaPptx(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pptxTable(spark, dir).mapPartitions { it =>
      it.map { d =>
        val slides = PptxCodec.decodeText(d.pptx)
        val (nl, nc, sc, ps) = lineStats(slides.flatten)
        (d.doc_id, slides.length.toLong, nl, nc, sc, ps)
      }
    }.toDF("doc_id", "n_slides", "n_lines", "n_chars", "sum_code", "pos_checksum")
      .orderBy("doc_id")
  }

  /** Amplitude stats from genuinely decoded PCM (RIFF walk + 16-bit LE
    * samples): count, rate, duration, RMS, peak, zero-crossing count. */
  /** THE CONVERSION ZOO as one operator — the reference's actual ingestion
    * loop (analisis-informe.ipynb iterates a folder of mixed pdf/docx/
    * xlsx/pptx/wav files and dispatches each to its converter): a mixed-
    * format corpus routed to the right REAL codec inside one
    * mapPartitions pass, normalized to a common (format, units, checksum)
    * schema. Every payload is built by the real writer and parsed back by
    * the real parser; the oracle replays only the synthetic arithmetic,
    * so a routing bug or any single codec's parse bug fails the hash. */
  def qMediaZoo(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).filter(col("doc_id") < 480)
      .select(col("doc_id")).as[Long].mapPartitions { it =>
        it.map { id =>
          def textStats(lines: Seq[String]): (Long, Long) = {
            var pos = 0L
            lines.foreach { s =>
              var k = 0
              while (k < s.length) { pos += s.charAt(k).toLong * (k + 1); k += 1 }
            }
            (lines.length.toLong, pos)
          }
          val (fmt, nUnits, checksum) = (id % 6).toInt match {
            case 0 =>
              val (n, pos) = textStats(PdfCodec.decodeText(PdfCodec.encode(pdfLines(id))))
              ("pdf", n, pos)
            case 1 =>
              val (n, pos) = textStats(DocxCodec.decodeText(DocxCodec.encode(docxLines(id))))
              ("docx", n, pos)
            case 2 =>
              val grid = XlsxCodec.decode(XlsxCodec.encode(xlsxGrid(id)))
              var n = 0L
              var sum = 0L
              grid.foreach(_.foreach {
                case XlsxCodec.NumCell(v) => n += 1; sum += math.round(v * 4) // exact quarters
                case XlsxCodec.StrCell(s) =>
                  n += 1
                  var k = 0
                  while (k < s.length) { sum += s.charAt(k).toLong * (k + 1); k += 1 }
              })
              ("xlsx", n, sum)
            case 3 =>
              val (n, pos) = textStats(
                PptxCodec.decodeText(PptxCodec.encode(pptxSlides(id))).flatten)
              ("pptx", n, pos)
            case 4 =>
              val n = (200 + id % 300).toInt
              val sr = 8000 << (id % 3).toInt
              val samples = Array.tabulate(n)(k =>
                ((id * 31 + k.toLong * 17) % 65536 - 32768).toShort)
              val pcm = WavCodec.decode(WavCodec.encode(samples, sr))
              var sumSq = 0L
              pcm.samples.foreach(s => sumSq += s.toLong * s)
              ("wav", pcm.samples.length.toLong, sumSq)
            case _ =>
              val w = (16 + id % 16).toInt
              val h = (16 + id % 8).toInt
              val px = Array.tabulate(w * h)(k => ((id * 7 + k.toLong * 13) % 256).toInt)
              val img = PngCodec.decode(PngCodec.encode(w, h, px, y => y % 5))
              var spp = 0L
              img.pixels.foreach(p => spp += p.toLong * p)
              ("png", img.pixels.length.toLong, spp)
          }
          (id, fmt, nUnits, checksum)
        }
      }.toDF("doc_id", "fmt", "n_units", "checksum")
      .orderBy("doc_id")
  }

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
    "q_media_pdf" -> (qMediaPdf _),
    "q_media_docx" -> (qMediaDocx _),
    "q_media_xlsx" -> (qMediaXlsx _),
    "q_media_pptx" -> (qMediaPptx _),
    "q_media_zoo" -> (qMediaZoo _),
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
    // replay the synthetic text arithmetic — cross-checks PDF object walk +
    // inflate + literal-string unescape + Tj/TJ, and the DOCX zip walk +
    // run concatenation + XML entity unescape, respectively
    "q_media_pdf" -> docStatsOracle(
      "3 + doc_id % 8", "20 + (doc_id + j * 7) % 40",
      "doc_id * 31 + j * 13 + k * 7"),
    "q_media_docx" -> docStatsOracle(
      "2 + doc_id % 9", "15 + (doc_id * 3 + j * 5) % 50",
      "doc_id * 13 + j * 17 + k * 11"),
    // replays the synthetic grid arithmetic — cross-checks the XLSX zip
    // walk, shared-string resolution, and numeric-cell parse (quarters
    // sum exactly in double on both engines)
    "q_media_xlsx" -> {
      val codes = DocAlphabetCodes.mkString("[", ",", "]")
      s"""WITH docs AS (
         |  SELECT doc_id, 2 + doc_id % 6 AS nr, 2 + doc_id % 4 AS nc
         |  FROM documents WHERE doc_id < 500),
         |cells AS (
         |  SELECT doc_id, r, unnest(range(0, nc)) AS c
         |  FROM (SELECT doc_id, nc, unnest(range(0, nr)) AS r FROM docs)),
         |num AS (
         |  SELECT doc_id, count(*) AS n_num,
         |    sum(((doc_id * 17 + r * 13 + c * 19) % 4000) / 4.0) AS sum_num
         |  FROM cells WHERE (r + c) % 3 <> 0 GROUP BY doc_id),
         |strs AS (
         |  SELECT doc_id, r, c, 5 + (doc_id + r * 3 + c) % 10 AS len
         |  FROM cells WHERE (r + c) % 3 = 0),
         |chars AS (
         |  SELECT doc_id, k,
         |    $codes[CAST((doc_id * 11 + r * 7 + c * 5 + k * 3) % 32 AS INT) + 1] AS code
         |  FROM (SELECT doc_id, r, c, unnest(range(0, len)) AS k FROM strs)),
         |stragg AS (
         |  SELECT doc_id, CAST(sum(code * (k + 1)) AS BIGINT) AS str_code_sum
         |  FROM chars GROUP BY doc_id),
         |strcnt AS (SELECT doc_id, count(*) AS n_str FROM strs GROUP BY doc_id)
         |SELECT d.doc_id, CAST(d.nr AS BIGINT) AS n_rows,
         |  CAST(d.nr * d.nc AS BIGINT) AS n_cells,
         |  n.n_num, n.sum_num, sc.n_str, sa.str_code_sum
         |FROM docs d JOIN num n USING (doc_id) JOIN strcnt sc USING (doc_id)
         |  JOIN stragg sa USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin
    },
    // replays the synthetic deck arithmetic — cross-checks slide ordering,
    // paragraph grouping, and run concatenation
    "q_media_pptx" -> {
      val codes = DocAlphabetCodes.mkString("[", ",", "]")
      s"""WITH docs AS (
         |  SELECT doc_id, 1 + doc_id % 4 AS ns FROM documents WHERE doc_id < 500),
         |lines_ AS (
         |  SELECT doc_id, j, unnest(range(0, 2 + (doc_id + j) % 3)) AS l
         |  FROM (SELECT doc_id, unnest(range(0, ns)) AS j FROM docs)),
         |chars AS (
         |  SELECT doc_id, k,
         |    $codes[CAST((doc_id * 19 + j * 5 + l * 13 + k * 17) % 32 AS INT) + 1] AS code
         |  FROM (SELECT doc_id, j, l,
         |          unnest(range(0, 10 + (doc_id * 2 + j * 3 + l * 7) % 30)) AS k
         |        FROM lines_)),
         |agg AS (
         |  SELECT doc_id, count(*) AS n_chars,
         |    CAST(sum(code) AS BIGINT) AS sum_code,
         |    CAST(sum(code * (k + 1)) AS BIGINT) AS pos_checksum
         |  FROM chars GROUP BY doc_id),
         |lcnt AS (SELECT doc_id, count(*) AS n_lines FROM lines_ GROUP BY doc_id)
         |SELECT d.doc_id, CAST(d.ns AS BIGINT) AS n_slides, lc.n_lines,
         |  CAST(a.n_chars AS BIGINT) AS n_chars, a.sum_code, a.pos_checksum
         |FROM docs d JOIN lcnt lc USING (doc_id) JOIN agg a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin
    },
    // the zoo dispatch: six replay branches (one per format's synthetic
    // arithmetic) UNION ALL — a routing bug or any codec's parse bug
    // lands in the wrong branch and fails the hash
    "q_media_zoo" -> {
      val codes = DocAlphabetCodes.mkString("[", ",", "]")
      s"""WITH base AS (SELECT doc_id FROM documents WHERE doc_id < 480),
         |pdfch AS (
         |  SELECT doc_id, k, $codes[CAST((doc_id*31 + j*13 + k*7) % 32 AS INT)+1] AS code
         |  FROM (SELECT doc_id, j, unnest(range(0, 20 + (doc_id + j*7) % 40)) AS k
         |        FROM (SELECT doc_id, unnest(range(0, 3 + doc_id % 8)) AS j
         |              FROM base WHERE doc_id % 6 = 0))),
         |pdf AS (
         |  SELECT b.doc_id, 'pdf' AS fmt, CAST(3 + b.doc_id % 8 AS BIGINT) AS n_units, a.checksum
         |  FROM base b JOIN (SELECT doc_id, CAST(sum(code*(k+1)) AS BIGINT) AS checksum
         |                    FROM pdfch GROUP BY doc_id) a USING (doc_id)
         |  WHERE b.doc_id % 6 = 0),
         |dch AS (
         |  SELECT doc_id, k, $codes[CAST((doc_id*13 + j*17 + k*11) % 32 AS INT)+1] AS code
         |  FROM (SELECT doc_id, j, unnest(range(0, 15 + (doc_id*3 + j*5) % 50)) AS k
         |        FROM (SELECT doc_id, unnest(range(0, 2 + doc_id % 9)) AS j
         |              FROM base WHERE doc_id % 6 = 1))),
         |docx AS (
         |  SELECT b.doc_id, 'docx' AS fmt, CAST(2 + b.doc_id % 9 AS BIGINT) AS n_units, a.checksum
         |  FROM base b JOIN (SELECT doc_id, CAST(sum(code*(k+1)) AS BIGINT) AS checksum
         |                    FROM dch GROUP BY doc_id) a USING (doc_id)
         |  WHERE b.doc_id % 6 = 1),
         |xcells AS (
         |  SELECT doc_id, r, unnest(range(0, 2 + doc_id % 4)) AS c
         |  FROM (SELECT doc_id, unnest(range(0, 2 + doc_id % 6)) AS r
         |        FROM base WHERE doc_id % 6 = 2)),
         |xnum AS (
         |  SELECT doc_id, CAST(sum((doc_id*17 + r*13 + c*19) % 4000) AS BIGINT) AS s
         |  FROM xcells WHERE (r + c) % 3 <> 0 GROUP BY doc_id),
         |xstr AS (
         |  SELECT doc_id, CAST(sum(code*(k+1)) AS BIGINT) AS s FROM (
         |    SELECT doc_id, k, $codes[CAST((doc_id*11 + r*7 + c*5 + k*3) % 32 AS INT)+1] AS code
         |    FROM (SELECT doc_id, r, c, unnest(range(0, 5 + (doc_id + r*3 + c) % 10)) AS k
         |          FROM xcells WHERE (r + c) % 3 = 0))
         |  GROUP BY doc_id),
         |xlsx AS (
         |  SELECT b.doc_id, 'xlsx' AS fmt,
         |    CAST((2 + b.doc_id % 6) * (2 + b.doc_id % 4) AS BIGINT) AS n_units,
         |    xn.s + xs.s AS checksum
         |  FROM base b JOIN xnum xn USING (doc_id) JOIN xstr xs USING (doc_id)
         |  WHERE b.doc_id % 6 = 2),
         |plines AS (
         |  SELECT doc_id, j, unnest(range(0, 2 + (doc_id + j) % 3)) AS l
         |  FROM (SELECT doc_id, unnest(range(0, 1 + doc_id % 4)) AS j
         |        FROM base WHERE doc_id % 6 = 3)),
         |pptx AS (
         |  SELECT lc.doc_id, 'pptx' AS fmt, lc.n AS n_units, a.checksum
         |  FROM (SELECT doc_id, count(*) AS n FROM plines GROUP BY doc_id) lc
         |  JOIN (SELECT doc_id, CAST(sum(code*(k+1)) AS BIGINT) AS checksum FROM (
         |          SELECT doc_id, k, $codes[CAST((doc_id*19 + j*5 + l*13 + k*17) % 32 AS INT)+1] AS code
         |          FROM (SELECT doc_id, j, l,
         |                  unnest(range(0, 10 + (doc_id*2 + j*3 + l*7) % 30)) AS k
         |                FROM plines))
         |        GROUP BY doc_id) a USING (doc_id)),
         |wav AS (
         |  SELECT doc_id, 'wav' AS fmt, CAST(200 + doc_id % 300 AS BIGINT) AS n_units,
         |    CAST(sum(v*v) AS BIGINT) AS checksum
         |  FROM (SELECT doc_id, (doc_id*31 + k*17) % 65536 - 32768 AS v
         |        FROM (SELECT doc_id, unnest(range(0, 200 + doc_id % 300)) AS k
         |              FROM base WHERE doc_id % 6 = 4))
         |  GROUP BY doc_id),
         |png AS (
         |  SELECT doc_id, 'png' AS fmt,
         |    CAST((16 + doc_id % 16) * (16 + doc_id % 8) AS BIGINT) AS n_units,
         |    CAST(sum(p*p) AS BIGINT) AS checksum
         |  FROM (SELECT doc_id, (doc_id*7 + k*13) % 256 AS p
         |        FROM (SELECT doc_id, unnest(range(0, (16 + doc_id % 16) * (16 + doc_id % 8))) AS k
         |              FROM base WHERE doc_id % 6 = 5))
         |  GROUP BY doc_id)
         |SELECT * FROM pdf UNION ALL SELECT * FROM docx UNION ALL
         |SELECT * FROM xlsx UNION ALL SELECT * FROM pptx UNION ALL
         |SELECT * FROM wav UNION ALL SELECT * FROM png
         |ORDER BY doc_id""".stripMargin
    },
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
