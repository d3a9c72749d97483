package graft.operators.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM PDF/DOCX text-codec correctness: encode→decode roundtrips,
  * escape/entity torture, tolerance of foreign-writer constructs, and loud
  * failure on garbage — no Spark needed. */
class DocCodecSpec extends AnyFunSuite {

  private val torture = Seq(
    "plain ascii line",
    "parens (nested (deep)) and \\ backslash",
    ")( unbalanced-looking but escaped",
    "xml &amp; friends < > & mixed",
    "", // empty line
    "a", // single char
    MediaQueries.DocAlphabet * 3)

  // ---- PDF -----------------------------------------------------------------

  test("pdf roundtrip preserves every line, with and without compression") {
    for (compress <- Seq(true, false)) {
      val bytes = PdfCodec.encode(torture, compress)
      assert(PdfCodec.decodeText(bytes) == torture.toVector,
        s"compress=$compress")
    }
  }

  test("pdf output is structurally a PDF (header, xref, trailer, EOF)") {
    val doc = new String(PdfCodec.encode(Seq("hello")), "ISO-8859-1")
    assert(doc.startsWith("%PDF-1.4"))
    assert(doc.contains("/Type /Catalog") && doc.contains("/Type /Page"))
    assert(doc.contains("xref") && doc.contains("startxref"))
    assert(doc.contains("/FlateDecode"))
    assert(doc.endsWith("%%EOF\n"))
    // xref offsets must point at the "N 0 obj" headers they claim
    // (lastIndexOf("xref") would land inside "startxref")
    val xrefAt = doc.indexOf("\nxref\n") + 1
    val entries = doc.substring(xrefAt).linesIterator
      .filter(_.endsWith(" n ")).map(_.take(10).toInt).toVector
    assert(entries.length == 5)
    entries.zipWithIndex.foreach { case (off, i) =>
      assert(doc.startsWith(s"${i + 1} 0 obj", off), s"xref entry $i → $off")
    }
  }

  test("pdf decode handles octal escapes and line continuations from other writers") {
    val content = "BT (A\\101\\12B) Tj (cont\\\ninued) Tj ET"
    val pdf = ("%PDF-1.4\n1 0 obj << /Length " + content.length +
      " >>\nstream\n" + content + "\nendstream\nendobj\n%%EOF").getBytes("ISO-8859-1")
    assert(PdfCodec.decodeText(pdf) == Vector("AA\nB", "continued"))
  }

  test("pdf decode concatenates TJ arrays and ignores kerning numbers") {
    val content = "BT [(he) -120 (llo) 40 ( world)] TJ ET"
    val pdf = ("%PDF-1.4\n1 0 obj << /Length " + content.length +
      " >>\nstream\n" + content + "\nendstream\nendobj\n%%EOF").getBytes("ISO-8859-1")
    assert(PdfCodec.decodeText(pdf) == Vector("hello world"))
  }

  test("pdf decode without /Length falls back to endstream scan") {
    val content = "BT (fallback) Tj ET"
    val pdf = ("%PDF-1.4\n1 0 obj << >>\nstream\n" + content +
      "endstream\nendobj\n%%EOF").getBytes("ISO-8859-1")
    assert(PdfCodec.decodeText(pdf) == Vector("fallback"))
  }

  test("pdf decode treats an indirect /Length reference as unknown, not as 5 bytes") {
    val content = "BT (indirect length) Tj ET"
    val pdf = ("%PDF-1.4\n1 0 obj << /Length 5 0 R >>\nstream\n" + content +
      "endstream\nendobj\n%%EOF").getBytes("ISO-8859-1")
    assert(PdfCodec.decodeText(pdf) == Vector("indirect length"))
  }

  test("pdf decode treats a MULTI-DIGIT indirect /Length as unknown (no " +
      "backtracking a 123 into a direct length of 12)") {
    val content = "BT (multi digit indirect) Tj ET"
    val pdf = ("%PDF-1.4\n1 0 obj << /Length 123 0 R >>\nstream\n" + content +
      "endstream\nendobj\n%%EOF").getBytes("ISO-8859-1")
    assert(PdfCodec.decodeText(pdf) == Vector("multi digit indirect"))
  }

  test("ooxml parse fails loudly on a doc truncated mid-open-tag") {
    intercept[IllegalArgumentException](
      Ooxml.elementSegments("<a:p>x</a:p><a:p", "a:p"))
    intercept[IllegalArgumentException](
      Ooxml.textNodesWithOffsets("<a:t>x</a:t><a:t", "a:t"))
  }

  test("pdf decode reads hex strings, mixed with literals and dicts") {
    // <48 65 6C6C6F> = "Hello"; odd digit count pads with 0: <484> = "H@"
    val content = "BT <48 65 6C6C6F> Tj [(a) <2C20> (b)] TJ <484> Tj ET"
    val pdf = ("%PDF-1.4\n1 0 obj << >>\nstream\n" + content +
      "endstream\nendobj\n%%EOF").getBytes("ISO-8859-1")
    assert(PdfCodec.decodeText(pdf) == Vector("Hello", "a, b", "H@"))
  }

  test("pdf decode rejects garbage loudly") {
    intercept[IllegalArgumentException](PdfCodec.decodeText("not a pdf".getBytes))
    intercept[IllegalArgumentException](
      PdfCodec.decodeText("%PDF-1.4\nno streams here\n%%EOF".getBytes))
    // corrupt the deflate payload → Inflater must fail, not return junk
    val good = PdfCodec.encode(Seq("payload integrity"))
    val doc = new String(good, "ISO-8859-1")
    val at = doc.indexOf("stream\n") + 7
    val bad = good.clone()
    bad(at + 2) = (bad(at + 2) ^ 0x7f).toByte
    intercept[Exception](PdfCodec.decodeText(bad))
  }

  // ---- DOCX ----------------------------------------------------------------

  test("docx roundtrip preserves every paragraph") {
    val bytes = DocxCodec.encode(torture)
    assert(DocxCodec.decodeText(bytes) == torture.toVector)
  }

  test("docx package has the required OOXML parts") {
    val zip = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(DocxCodec.encode(Seq("x"))))
    val names = Iterator.continually(zip.getNextEntry).takeWhile(_ != null)
      .map(_.getName).toSet
    assert(names == Set("[Content_Types].xml", "_rels/.rels", "word/document.xml"))
  }

  test("docx decode concatenates multiple runs and handles foreign markup") {
    val xml = """<?xml version="1.0"?><w:document><w:body>""" +
      """<w:p w:rsidR="0"><w:pPr><w:jc w:val="left"/></w:pPr>""" +
      """<w:r><w:rPr><w:b/></w:rPr><w:t>bold </w:t></w:r>""" +
      """<w:r><w:t xml:space="preserve">and &lt;i&gt; &#65;&#x42;</w:t></w:r></w:p>""" +
      """<w:p/><w:p><w:r><w:t/></w:r></w:p>""" +
      """</w:body></w:document>"""
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    z.putNextEntry(new java.util.zip.ZipEntry("word/junk.xml"))
    z.write("<ignored/>".getBytes("UTF-8")); z.closeEntry()
    z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    z.write(xml.getBytes("UTF-8")); z.closeEntry()
    z.close()
    assert(DocxCodec.decodeText(out.toByteArray) ==
      Vector("bold and <i> AB", "", ""))
  }

  test("docx decode rejects non-docx zips and unknown entities loudly") {
    intercept[Exception](DocxCodec.decodeText("PK not a zip".getBytes))
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    z.putNextEntry(new java.util.zip.ZipEntry("other.xml"))
    z.write("<x/>".getBytes); z.closeEntry(); z.close()
    intercept[IllegalArgumentException](DocxCodec.decodeText(out.toByteArray))
    val out2 = new java.io.ByteArrayOutputStream()
    val z2 = new java.util.zip.ZipOutputStream(out2)
    z2.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    z2.write("<w:p><w:t>&bogus;</w:t></w:p>".getBytes("UTF-8"))
    z2.closeEntry(); z2.close()
    intercept[IllegalArgumentException](DocxCodec.decodeText(out2.toByteArray))
  }

  // ---- XLSX ----------------------------------------------------------------

  test("xlsx roundtrip preserves strings, numbers, and row structure") {
    import XlsxCodec.{NumCell, StrCell}
    val rows = Vector(
      Vector[XlsxCodec.Cell](StrCell("hello & <world>"), NumCell(42.25), NumCell(-3.0)),
      Vector[XlsxCodec.Cell](NumCell(0.0), StrCell("hello & <world>"), StrCell("")),
      Vector[XlsxCodec.Cell](StrCell(MediaQueries.DocAlphabet)))
    assert(XlsxCodec.decode(XlsxCodec.encode(rows)) == rows)
  }

  test("xlsx shared strings are deduplicated in the package") {
    import XlsxCodec.StrCell
    val rows = Vector.fill(5)(Vector[XlsxCodec.Cell](StrCell("same"), StrCell("same")))
    val xml = new String(Ooxml.readPart(XlsxCodec.encode(rows), "xl/sharedStrings.xml"))
    assert(xml.contains("""uniqueCount="1""""))
  }

  test("xlsx decode handles inline strings, rich-text runs, and empty cells") {
    val sheet = """<worksheet><sheetData>""" +
      """<row r="1"><c r="A1" t="inlineStr"><is><t>in</t><t>line</t></is></c>""" +
      """<c r="B1"/><c r="C1"><v>7.5</v></c></row>""" +
      """</sheetData></worksheet>"""
    val pkg = Ooxml.writePackage(Seq("xl/worksheets/sheet1.xml" -> sheet))
    assert(XlsxCodec.decode(pkg) ==
      Vector(Vector(XlsxCodec.StrCell("inline"), XlsxCodec.NumCell(7.5))))
  }

  test("xlsx decode rejects bad shared-string indexes and unknown cell types") {
    val mk = (cell: String) => Ooxml.writePackage(Seq(
      "xl/sharedStrings.xml" -> "<sst><si><t>x</t></si></sst>",
      "xl/worksheets/sheet1.xml" ->
        s"""<worksheet><sheetData><row r="1">$cell</row></sheetData></worksheet>"""))
    assert(XlsxCodec.decode(mk("""<c r="A1" t="s"><v>0</v></c>""")) ==
      Vector(Vector(XlsxCodec.StrCell("x"))))
    intercept[IllegalArgumentException](
      XlsxCodec.decode(mk("""<c r="A1" t="s"><v>9</v></c>""")))
    intercept[IllegalArgumentException](
      XlsxCodec.decode(mk("""<c r="A1" t="e"><v>#REF!</v></c>""")))
  }

  test("xlsx column refs follow A1 notation") {
    assert(Seq(0, 25, 26, 27, 51, 52, 701, 702).map(XlsxCodec.colRef) ==
      Seq("A", "Z", "AA", "AB", "AZ", "BA", "ZZ", "AAA"))
  }

  // ---- PPTX ----------------------------------------------------------------

  test("pptx roundtrip preserves slides, paragraphs, and run order") {
    val slides = Vector(
      Vector("title & <sub>", ""),
      Vector("a", "second (slide) \\ line", MediaQueries.DocAlphabet * 2))
    assert(PptxCodec.decodeText(PptxCodec.encode(slides)) == slides)
  }

  test("pptx decode orders slides numerically, not lexically") {
    // 11 slides: lexical part order would put slide10/slide11 before slide2
    val slides = Vector.tabulate(11)(i => Vector(s"slide $i"))
    assert(PptxCodec.decodeText(PptxCodec.encode(slides)) == slides)
  }

  test("pptx decode rejects non-deck packages loudly") {
    intercept[IllegalArgumentException](PptxCodec.decodeText(
      Ooxml.writePackage(Seq("other/part.xml" -> "<x/>"))))
  }

  // ---- synthetic-line generators match their oracle formulas ----------------

  test("pdf/docx synthetic lines follow the documented arithmetic") {
    val id = 137L
    val pl = MediaQueries.pdfLines(id)
    assert(pl.length == (3 + id % 8).toInt)
    assert(pl(2).length == (20 + (id + 2 * 7) % 40).toInt)
    assert(pl(2).charAt(3) ==
      MediaQueries.DocAlphabet.charAt(((id * 31 + 2 * 13 + 3 * 7) % 32).toInt))
    val dl = MediaQueries.docxLines(id)
    assert(dl.length == (2 + id % 9).toInt)
    assert(dl(1).length == (15 + (id * 3 + 1 * 5) % 50).toInt)
    assert(dl(1).charAt(4) ==
      MediaQueries.DocAlphabet.charAt(((id * 13 + 1 * 17 + 4 * 11) % 32).toInt))
    // the alphabet really contains the metachars both escapers must handle
    assert(Seq('(', ')', '\\', '&', '<', '>').forall(MediaQueries.DocAlphabet.contains(_)))
  }
}
