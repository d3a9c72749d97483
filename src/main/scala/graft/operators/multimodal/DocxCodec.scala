package graft.operators.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

/** Real, dependency-free DOCX text codec — the docx half of the reference's
  * document-conversion zoo (analisis-informe.ipynb converts docx→text with
  * python-docx before chunking). OOXML is a zip of XML parts; text lives in
  * `word/document.xml` as `<w:p>` paragraphs of `<w:r>` runs holding
  * `<w:t>` text nodes. `java.util.zip` reads the container and the text
  * layer needs only entity-aware tag scanning — no native libs, no XML
  * dependency.
  *
  * encode() writes a minimal valid package ([Content_Types].xml, _rels,
  * document.xml), splitting each paragraph into two runs so decode
  * exercises run concatenation; decode() walks the zip to document.xml,
  * joins all `<w:t>` nodes inside each `<w:p>`, and unescapes the five
  * named XML entities plus decimal/hex character references.
  */
object DocxCodec {

  private def xmlEscape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case c   => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

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
          .append(xmlEscape(line.substring(0, mid))).append("</w:t></w:r>")
          .append("""<w:r><w:t xml:space="preserve">""")
          .append(xmlEscape(line.substring(mid))).append("</w:t></w:r>")
      } else if (line.nonEmpty) {
        body.append("""<w:r><w:t xml:space="preserve">""")
          .append(xmlEscape(line)).append("</w:t></w:r>")
      } else {
        body.append("<w:r><w:t/></w:r>")
      }
      body.append("</w:p>")
    }
    body.append("<w:sectPr/></w:body></w:document>")

    val out = new ByteArrayOutputStream(body.length + 2048)
    val zip = new ZipOutputStream(out)
    def part(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes(UTF_8))
      zip.closeEntry()
    }
    part("[Content_Types].xml", ContentTypes)
    part("_rels/.rels", Rels)
    part("word/document.xml", body.toString)
    zip.close()
    out.toByteArray
  }

  /** Paragraph texts, in document order. */
  def decodeText(bytes: Array[Byte]): Vector[String] = {
    val zip = new ZipInputStream(new ByteArrayInputStream(bytes))
    var xml: String = null
    try {
      var entry = zip.getNextEntry
      while (entry != null && xml == null) {
        if (entry.getName == "word/document.xml") {
          val buf = new ByteArrayOutputStream(8192)
          val chunk = new Array[Byte](4096)
          var n = zip.read(chunk)
          while (n >= 0) { buf.write(chunk, 0, n); n = zip.read(chunk) }
          xml = new String(buf.toByteArray, UTF_8)
        }
        zip.closeEntry()
        entry = zip.getNextEntry
      }
    } finally zip.close()
    require(xml != null, "not a DOCX package: no word/document.xml entry")

    val out = Vector.newBuilder[String]
    var i = 0
    while ({ val p = xml.indexOf("<w:p", i); p >= 0 && {
      val afterTag = xml.charAt(p + 4)
      // "<w:p>", "<w:p attr…>", "<w:p/>" are paragraphs; "<w:pPr" etc. are not
      if (afterTag == '>' || afterTag == ' ' || afterTag == '/') {
        val openEnd = xml.indexOf('>', p)
        require(openEnd >= 0, "unterminated <w:p> tag")
        if (xml.charAt(openEnd - 1) == '/') { // self-closing: empty paragraph
          out += ""
          i = openEnd + 1
        } else {
          val end = xml.indexOf("</w:p>", openEnd)
          val paraEnd = if (end >= 0) end else xml.length
          out += paragraphText(xml.substring(openEnd, paraEnd))
          i = if (end >= 0) end + 6 else xml.length
        }
        true
      } else { i = p + 4; true }
    }}) ()
    out.result()
  }

  /** Concatenate every <w:t> node's unescaped content within a paragraph. */
  private def paragraphText(para: String): String = {
    val sb = new java.lang.StringBuilder()
    var i = 0
    while ({ val t = para.indexOf("<w:t", i); t >= 0 && {
      val after = para.charAt(t + 4)
      // "<w:t>", "<w:t attr…>", "<w:t/>" only — not <w:tbl>/<w:tab/>
      if (after == '>' || after == ' ' || after == '/') {
        val close = para.indexOf('>', t)
        require(close >= 0, "unterminated <w:t> tag")
        if (para.charAt(close - 1) == '/') i = close + 1 // <w:t/>
        else {
          val end = para.indexOf("</w:t>", close)
          require(end >= 0, "missing </w:t>")
          sb.append(unescape(para.substring(close + 1, end)))
          i = end + 6
        }
      } else i = t + 4
      true
    }}) ()
    sb.toString
  }

  private def unescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i)
        require(semi > i, s"unterminated entity at $i")
        val ent = s.substring(i + 1, semi)
        ent match {
          case "amp"  => sb.append('&')
          case "lt"   => sb.append('<')
          case "gt"   => sb.append('>')
          case "quot" => sb.append('"')
          case "apos" => sb.append('\'')
          case _ if ent.startsWith("#x") || ent.startsWith("#X") =>
            sb.appendCodePoint(Integer.parseInt(ent.substring(2), 16))
          case _ if ent.startsWith("#") =>
            sb.appendCodePoint(Integer.parseInt(ent.substring(1)))
          case other => throw new IllegalArgumentException(s"unknown entity &$other;")
        }
        i = semi + 1
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
