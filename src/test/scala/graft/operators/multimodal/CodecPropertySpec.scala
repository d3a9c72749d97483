package graft.operators.multimodal

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based roundtrips for the document codecs: any representable
  * input must survive encode→decode bit-exactly, whatever mix of
  * metachars, entities, and sizes ScalaCheck throws at it. (Raw
  * ScalaCheck runner — the scalatestplus bridge isn't in the offline
  * dependency cache.) */
class CodecPropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  // PDF literal strings are byte strings: printable Latin-1 minus raw EOLs
  // (which the escaper rewrites to \n/\r on purpose — covered separately)
  private val latin1Line: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.choose(32, 126).map(_.toChar),
      2 -> Gen.oneOf('(', ')', '\\', '&', '<', '>', '"', '\''),
      1 -> Gen.choose(0xA0, 0xFF).map(_.toChar))).map(_.mkString)

  // XML text layer: full BMP unicode minus the control chars XML 1.0
  // forbids and the surrogates that need pairing
  private val xmlLine: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.choose(32, 126).map(_.toChar),
      2 -> Gen.oneOf('&', '<', '>', '"', '\''),
      1 -> Gen.choose(0xA0, 0xD7FF).map(_.toChar))).map(_.mkString)

  private val latin1Lines = Gen.listOf(latin1Line)
  private val xmlLines = Gen.listOf(xmlLine)

  test("pdf: any Latin-1 line list survives the roundtrip") {
    check(Prop.forAll(latin1Lines) { lines =>
      PdfCodec.decodeText(PdfCodec.encode(lines)) == lines.toVector
    })
  }

  test("pdf: lines containing raw CR/LF also roundtrip (escaped forms)") {
    val withEols = Gen.listOf(latin1Line.flatMap(s =>
      Gen.oneOf(s, s + "\n", "\r" + s, s.take(3) + "\r\n" + s.drop(3))))
    check(Prop.forAll(withEols) { lines =>
      PdfCodec.decodeText(PdfCodec.encode(lines)) == lines.toVector
    })
  }

  test("docx: any XML-legal unicode line list survives the roundtrip") {
    check(Prop.forAll(xmlLines) { lines =>
      DocxCodec.decodeText(DocxCodec.encode(lines)) == lines.toVector
    })
  }

  test("pptx: any XML-legal slide deck survives the roundtrip") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.listOf(xmlLine))) { slides =>
      PptxCodec.decodeText(PptxCodec.encode(slides.map(_.toVector))) ==
        slides.map(_.toVector).toVector
    })
  }

  test("xlsx: any grid of unicode strings and finite doubles survives") {
    val cell: Gen[XlsxCodec.Cell] = Gen.frequency(
      2 -> xmlLine.map(XlsxCodec.StrCell.apply),
      1 -> Gen.chooseNum(-1e12, 1e12).map(XlsxCodec.NumCell.apply),
      1 -> Gen.choose(-1000000L, 1000000L).map(n => XlsxCodec.NumCell(n.toDouble)))
    check(Prop.forAll(Gen.listOf(Gen.listOf(cell))) { rows =>
      XlsxCodec.decode(XlsxCodec.encode(rows.map(_.toVector))) ==
        rows.map(_.toVector).toVector
    })
  }

  test("wav: any PCM16 sample array survives at any rate/channel count") {
    val gen = for {
      samples <- Gen.containerOf[Array, Short](Gen.chooseNum(Short.MinValue, Short.MaxValue))
      rate <- Gen.choose(1, 192000)
      ch <- Gen.choose(1, 8)
    } yield (samples, rate, ch)
    check(Prop.forAll(gen) { case (samples, rate, ch) =>
      val pcm = WavCodec.decode(WavCodec.encode(samples, rate, ch))
      pcm.sampleRate == rate && pcm.channels == ch &&
        pcm.samples.toSeq == samples.toSeq
    })
  }

  test("png: any gray image with any per-row filter choice survives") {
    val gen = for {
      w <- Gen.choose(1, 40)
      h <- Gen.choose(1, 24)
      px <- Gen.containerOfN[Array, Int](w * h, Gen.choose(0, 255))
      fseed <- Gen.choose(0, 4)
    } yield (w, h, px, fseed)
    check(Prop.forAll(gen) { case (w, h, px, fseed) =>
      val img = PngCodec.decode(PngCodec.encode(w, h, px, y => (y + fseed) % 5))
      img.width == w && img.height == h && img.pixels.toSeq == px.toSeq
    })
  }

  test("pdf encode rejects non-Latin-1 text loudly instead of mangling it") {
    intercept[IllegalArgumentException](PdfCodec.encode(Seq("café €")))
    // …but the full Latin-1 range is fine
    val line = (0xA0 to 0xFF).map(_.toChar).mkString
    assert(PdfCodec.decodeText(PdfCodec.encode(Seq(line))) == Vector(line))
  }
}
