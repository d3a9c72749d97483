package graft.operators.multimodal

/** Real, dependency-free PPTX text codec — the presentation entry of the
  * reference's document-conversion zoo (analisis-informe.ipynb converts
  * pptx→text with python-pptx before chunking). PresentationML slides are
  * zip parts `ppt/slides/slideN.xml`; text lives in `<a:t>` runs inside
  * `<a:p>` paragraphs inside shape text bodies.
  *
  * encode() writes a structurally valid deck (content types, package +
  * presentation rels, slide-id list, one slide part per slide), splitting
  * each line into two runs so decode exercises run concatenation;
  * decode() walks slides in slide-number order and joins each
  * paragraph's runs.
  */
object PptxCodec {

  private def slideXml(lines: Seq[String]): String = {
    val sb = new java.lang.StringBuilder()
    sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      .append("""<p:sld xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main" xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main">""")
      .append("""<p:cSld><p:spTree><p:sp><p:txBody><a:bodyPr/>""")
    lines.foreach { line =>
      sb.append("<a:p>")
      if (line.length >= 2) {
        val mid = line.length / 2
        sb.append("<a:r><a:t>").append(Ooxml.xmlEscape(line.substring(0, mid)))
          .append("</a:t></a:r>")
          .append("<a:r><a:t>").append(Ooxml.xmlEscape(line.substring(mid)))
          .append("</a:t></a:r>")
      } else if (line.nonEmpty) {
        sb.append("<a:r><a:t>").append(Ooxml.xmlEscape(line)).append("</a:t></a:r>")
      } else {
        sb.append("<a:r><a:t/></a:r>")
      }
      sb.append("</a:p>")
    }
    sb.append("</p:txBody></p:sp></p:spTree></p:cSld></p:sld>")
    sb.toString
  }

  def encode(slides: Seq[Seq[String]]): Array[Byte] = {
    val n = slides.length
    val overrides = (1 to n).map(i =>
      s"""<Override PartName="/ppt/slides/slide$i.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.slide+xml"/>""")
      .mkString("\n")
    val sldIds = (1 to n).map(i =>
      s"""<p:sldId id="${255 + i}" r:id="rId$i"/>""").mkString
    val rels = (1 to n).map(i =>
      s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/slide" Target="slides/slide$i.xml"/>""")
      .mkString("\n")
    Ooxml.writePackage(Seq(
      "[Content_Types].xml" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
           |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
           |<Default Extension="xml" ContentType="application/xml"/>
           |<Override PartName="/ppt/presentation.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/>
           |$overrides
           |</Types>""".stripMargin,
      "_rels/.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="ppt/presentation.xml"/>
          |</Relationships>""".stripMargin,
      "ppt/presentation.xml" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<p:presentation xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
           |<p:sldIdLst>$sldIds</p:sldIdLst>
           |</p:presentation>""".stripMargin,
      "ppt/_rels/presentation.xml.rels" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
           |$rels
           |</Relationships>""".stripMargin) ++
      slides.zipWithIndex.map { case (lines, i) =>
        s"ppt/slides/slide${i + 1}.xml" -> slideXml(lines)
      })
  }

  private val SlideName = """ppt/slides/slide(\d+)\.xml""".r

  /** Slide texts in deck order; each slide is its paragraphs in order,
    * each paragraph its concatenated `<a:t>` runs. */
  def decodeText(bytes: Array[Byte]): Vector[Vector[String]] = {
    val slides = Ooxml.readParts(bytes,
      n => SlideName.pattern.matcher(n).matches())
    require(slides.nonEmpty, "not a PPTX package: no ppt/slides/slideN.xml entries")
    slides
      .map { case (name, xml) =>
        name.stripPrefix("ppt/slides/slide").stripSuffix(".xml").toInt -> xml
      }
      .sortBy(_._1)
      .map { case (_, xml) => slideParagraphs(xml) }
  }

  /** Group `<a:t>` runs by their enclosing `<a:p>` paragraph. */
  private def slideParagraphs(xml: String): Vector[String] =
    Ooxml.groupText(xml, "a:p", "a:t")
}
