package graft.operators.multimodal

/** Real, dependency-free DOCX text codec — the docx half of the reference's
  * document-conversion zoo (analisis-informe.ipynb converts docx→text with
  * python-docx before chunking). OOXML is a zip of XML parts; text lives in
  * `word/document.xml` as `<w:p>` paragraphs of `<w:r>` runs holding
  * `<w:t>` text nodes. Container and text layer both parse with the shared
  * [[Ooxml]] plumbing — no native libs, no XML dependency.
  *
  * encode() writes a minimal valid package ([Content_Types].xml, _rels,
  * document.xml), splitting each paragraph into two runs so decode
  * exercises run concatenation; decode() walks the zip to document.xml,
  * joins all `<w:t>` nodes inside each `<w:p>`, and unescapes the five
  * named XML entities plus decimal/hex character references.
  */
object DocxCodec {

  private val ContentTypes =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
      |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
      |<Default Extension="xml" ContentType="application/xml"/>
      |<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
      |</Types>""".stripMargin

  private val Rels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>
      |</Relationships>""".stripMargin

  /** One `<w:p>` per line; lines of length >= 2 are split into two runs. */
  def encode(lines: Seq[String]): Array[Byte] = {
    val body = new java.lang.StringBuilder()
    body.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      .append("""<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body>""")
    lines.foreach { line =>
      body.append("<w:p>")
      if (line.length >= 2) {
        val mid = line.length / 2
        body.append("""<w:r><w:t xml:space="preserve">""")
          .append(Ooxml.xmlEscape(line.substring(0, mid))).append("</w:t></w:r>")
          .append("""<w:r><w:t xml:space="preserve">""")
          .append(Ooxml.xmlEscape(line.substring(mid))).append("</w:t></w:r>")
      } else if (line.nonEmpty) {
        body.append("""<w:r><w:t xml:space="preserve">""")
          .append(Ooxml.xmlEscape(line)).append("</w:t></w:r>")
      } else {
        body.append("<w:r><w:t/></w:r>")
      }
      body.append("</w:p>")
    }
    body.append("<w:sectPr/></w:body></w:document>")
    Ooxml.writePackage(Seq(
      "[Content_Types].xml" -> ContentTypes,
      "_rels/.rels" -> Rels,
      "word/document.xml" -> body.toString))
  }

  /** Paragraph texts, in document order. ("<w:p" is prefix-safe against
    * "<w:pPr"; self-closing "<w:p/>" is an empty paragraph.) */
  def decodeText(bytes: Array[Byte]): Vector[String] =
    Ooxml.groupText(Ooxml.readPart(bytes, "word/document.xml"), "w:p", "w:t")
}
