package graft.operators.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

/** Real, dependency-free RIFF/WAVE PCM16 codec (the audio half of the
  * reference's media-conversion zoo — wav→text feature extraction in
  * analisis-informe.ipynb's converter table). Pure JVM: the container has
  * no native audio libs, but RIFF is just a chunked little-endian header
  * over raw PCM — nothing about parsing it needs one.
  *
  * encode() emits a canonical 44-byte-header mono/stereo PCM16 file;
  * decode() is a proper chunk walker (handles extra chunks, odd-length
  * padding, fmt anywhere before data) so it reads files from other
  * writers, not only its own.
  */
object WavCodec {

  /** Decoded PCM payload. Samples are interleaved when channels > 1. */
  final case class Pcm(sampleRate: Int, channels: Int, bitsPerSample: Int,
                       samples: Array[Short])

  def encode(samples: Array[Short], sampleRate: Int, channels: Int = 1): Array[Byte] = {
    require(channels >= 1, "need at least one channel")
    require(sampleRate > 0, "sample rate must be positive")
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(US_ASCII)).putInt(36 + dataLen)
      .put("WAVE".getBytes(US_ASCII))
    bb.put("fmt ".getBytes(US_ASCII)).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
    bb.put("data".getBytes(US_ASCII)).putInt(dataLen)
    var i = 0
    while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
    bb.array()
  }

  def decode(bytes: Array[Byte]): Pcm = {
    require(bytes.length >= 12, s"not a RIFF file: ${bytes.length} bytes")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4)
    bb.get(magic)
    require(new String(magic, US_ASCII) == "RIFF", "missing RIFF magic")
    bb.getInt() // declared riff size; trust the actual buffer instead
    bb.get(magic)
    require(new String(magic, US_ASCII) == "WAVE", "missing WAVE form type")

    var sampleRate = -1
    var channels = -1
    var bits = -1
    var data: Array[Byte] = null
    while (data == null || sampleRate < 0) {
      require(bb.remaining() >= 8,
        s"truncated WAV: missing ${if (data == null) "data" else "fmt"} chunk")
      bb.get(magic)
      val id = new String(magic, US_ASCII)
      val len = bb.getInt()
      require(len >= 0 && len <= bb.remaining(),
        s"chunk '$id' declares $len bytes but ${bb.remaining()} remain")
      id match {
        case "fmt " =>
          require(len >= 16, s"fmt chunk too short ($len)")
          val fmtEnd = bb.position() + len
          val audioFormat = bb.getShort()
          require(audioFormat == 1, s"only PCM (format 1) supported, got $audioFormat")
          channels = bb.getShort()
          sampleRate = bb.getInt()
          bb.getInt()   // byte rate
          bb.getShort() // block align
          bits = bb.getShort()
          require(bits == 16, s"only 16-bit PCM supported, got $bits")
          bb.position(fmtEnd)
        case "data" =>
          data = new Array[Byte](len)
          bb.get(data)
        case _ => // skip unknown chunk (LIST, fact, ...)
          bb.position(bb.position() + len)
      }
      // RIFF chunks are word-aligned: odd payloads carry a pad byte
      if (len % 2 == 1 && bb.remaining() > 0) bb.get()
    }
    val sb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val samples = new Array[Short](data.length / 2)
    var i = 0
    while (i < samples.length) { samples(i) = sb.getShort(); i += 1 }
    Pcm(sampleRate, channels, bits, samples)
  }
}
