package graft.operators.multimodal

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.util.zip.{CRC32, Deflater, Inflater}

/** Real, dependency-free PNG codec for 8-bit grayscale — the image half of
  * the reference's media pipeline (thumbnail/feature extraction over
  * decoded pixels; the reference OCRs scans via ocr.py, whose first step
  * is exactly "decode the image container"). Pure JVM: PNG is zlib
  * (java.util.zip.Inflater/Deflater) + per-scanline prediction filters +
  * CRC-32 chunk framing — no native codec needed.
  *
  * encode() writes real chunked PNG (IHDR/IDAT/IEND, correct CRCs) and can
  * filter each scanline with any of the five standard filters; decode()
  * walks chunks, validates CRCs, inflates, and reconstructs all five
  * filter types (None/Sub/Up/Average/Paeth) — the part a fake would skip.
  */
object PngCodec {

  /** Decoded grayscale image; pixels row-major in [0, 255]. */
  final case class Image(width: Int, height: Int, pixels: Array[Int])

  private val Signature =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** @param filterForRow standard PNG filter type (0-4) to apply per
    *   scanline — exercising decode's full reconstruction matrix. */
  def encode(width: Int, height: Int, pixels: Array[Int],
             filterForRow: Int => Int = _ => 0): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(pixels.length == width * height,
      s"expected ${width * height} pixels, got ${pixels.length}")
    // raw filtered stream: each scanline = 1 filter byte + width bytes
    val raw = new Array[Byte](height * (width + 1))
    var y = 0
    while (y < height) {
      val f = filterForRow(y) & 0xff
      require(f <= 4, s"filter type $f out of range")
      raw(y * (width + 1)) = f.toByte
      var x = 0
      while (x < width) {
        val cur = pixels(y * width + x)
        val left = if (x > 0) pixels(y * width + x - 1) else 0
        val up = if (y > 0) pixels((y - 1) * width + x) else 0
        val upLeft = if (x > 0 && y > 0) pixels((y - 1) * width + x - 1) else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, upLeft)
        }
        raw(y * (width + 1) + 1 + x) = ((cur - pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val idat = deflate(raw)
    val out = new ByteArrayOutputStream()
    out.write(Signature, 0, Signature.length)
    val ihdr = ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(0.toByte)  // color type: grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
      .array()
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", idat)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length > Signature.length &&
      Signature.indices.forall(i => bytes(i) == Signature(i)), "not a PNG")
    val bb = ByteBuffer.wrap(bytes, Signature.length,
      bytes.length - Signature.length)
    var width = -1
    var height = -1
    val idat = new ByteArrayOutputStream()
    var done = false
    while (!done) {
      require(bb.remaining() >= 8, "truncated PNG: no IEND")
      val len = bb.getInt()
      require(len >= 0 && bb.remaining() >= len + 8,
        s"chunk declares $len bytes but ${bb.remaining()} remain")
      val typeBytes = new Array[Byte](4)
      bb.get(typeBytes)
      val cType = new String(typeBytes, java.nio.charset.StandardCharsets.US_ASCII)
      val data = new Array[Byte](len)
      bb.get(data)
      val crc = bb.getInt()
      val c = new CRC32
      c.update(typeBytes)
      c.update(data)
      require(crc == c.getValue.toInt, s"CRC mismatch in $cType chunk")
      cType match {
        case "IHDR" =>
          val h = ByteBuffer.wrap(data)
          width = h.getInt()
          height = h.getInt()
          val depth = h.get()
          val colorType = h.get()
          require(depth == 8 && colorType == 0,
            s"only 8-bit grayscale supported (depth=$depth colorType=$colorType)")
          require(h.get() == 0 && h.get() == 0 && h.get() == 0,
            "unsupported compression/filter/interlace method")
        case "IDAT" => idat.write(data, 0, len)
        case "IEND" => done = true
        case _ => () // ancillary chunk (tEXt, pHYs, ...) — ignore
      }
    }
    require(width > 0 && height > 0, "missing IHDR")
    val raw = inflate(idat.toByteArray, height * (width + 1))
    // reconstruct scanlines (bpp = 1 for 8-bit grayscale)
    val px = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val f = raw(y * (width + 1)) & 0xff
      require(f <= 4, s"bad filter type $f on row $y")
      var x = 0
      while (x < width) {
        val filt = raw(y * (width + 1) + 1 + x) & 0xff
        val left = if (x > 0) px(y * width + x - 1) else 0
        val up = if (y > 0) px((y - 1) * width + x) else 0
        val upLeft = if (x > 0 && y > 0) px((y - 1) * width + x - 1) else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, upLeft)
        }
        px(y * width + x) = (filt + pred) & 0xff
        x += 1
      }
      y += 1
    }
    Image(width, height, px)
  }

  /** Paeth predictor (PNG spec §9.4) — shared by encode and decode. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def writeChunk(out: ByteArrayOutputStream, cType: String,
                         data: Array[Byte]): Unit = {
    val typeBytes = cType.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val head = ByteBuffer.allocate(4).putInt(data.length).array()
    out.write(head, 0, 4)
    out.write(typeBytes, 0, 4)
    out.write(data, 0, data.length)
    val c = new CRC32
    c.update(typeBytes)
    c.update(data)
    out.write(ByteBuffer.allocate(4).putInt(c.getValue.toInt).array(), 0, 4)
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(raw)
      d.finish()
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  private def inflate(z: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater()
    try {
      inf.setInput(z)
      val out = new Array[Byte](expected)
      var off = 0
      while (off < expected && !inf.finished()) {
        val n = inf.inflate(out, off, expected - off)
        // n == 0 with needsInput => truncated; n == 0 WITHOUT needsInput
        // (e.g. a preset-dictionary FDICT stream) would loop forever on
        // identical state — both must fail loudly, not hang
        require(n > 0, if (inf.needsDictionary())
          "IDAT stream requires a preset dictionary (FDICT unsupported)"
        else "truncated IDAT stream")
        off += n
      }
      require(off == expected, s"inflated $off bytes, expected $expected")
      out
    } finally inf.end()
  }
}
