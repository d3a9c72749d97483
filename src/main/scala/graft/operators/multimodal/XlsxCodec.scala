package graft.operators.multimodal

/** Real, dependency-free XLSX cell codec — the spreadsheet entry of the
  * reference's document-conversion zoo (analisis-informe.ipynb converts
  * xlsx→text with pandas/openpyxl before chunking). SpreadsheetML is a zip
  * of XML parts: cell values live in `xl/worksheets/sheet1.xml`, with
  * string cells indirected through the `xl/sharedStrings.xml` table.
  *
  * encode() writes a structurally valid single-sheet package (content
  * types, package + workbook rels, workbook, deduplicated shared-string
  * table); decode() resolves shared (`t="s"`), inline (`t="inlineStr"`,
  * rich-text runs concatenated), literal (`t="str"`) and numeric cells
  * back into the row grid.
  */
object XlsxCodec {

  sealed trait Cell
  final case class NumCell(v: Double) extends Cell
  final case class StrCell(s: String) extends Cell

  /** A1-style column reference (0 → A, 25 → Z, 26 → AA …). */
  def colRef(i: Int): String = {
    var n = i
    val sb = new java.lang.StringBuilder()
    while ({ sb.insert(0, ('A' + n % 26).toChar); n = n / 26 - 1; n >= 0 }) ()
    sb.toString
  }

  def encode(rows: Seq[Seq[Cell]]): Array[Byte] = {
    // deduplicated shared-string table, in first-appearance order
    val sstIndex = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    rows.flatten.foreach {
      case StrCell(s) => sstIndex.getOrElseUpdate(s, sstIndex.size)
      case _          =>
    }
    val sheet = {
      val sb = new java.lang.StringBuilder()
      sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
        .append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      rows.zipWithIndex.foreach { case (row, r) =>
        sb.append(s"""<row r="${r + 1}">""")
        row.zipWithIndex.foreach { case (cell, c) =>
          val ref = s"${colRef(c)}${r + 1}"
          cell match {
            case StrCell(s) =>
              sb.append(s"""<c r="$ref" t="s"><v>${sstIndex(s)}</v></c>""")
            case NumCell(v) =>
              val lit = if (v == v.toLong.toDouble) v.toLong.toString else v.toString
              sb.append(s"""<c r="$ref"><v>$lit</v></c>""")
          }
        }
        sb.append("</row>")
      }
      sb.append("</sheetData></worksheet>")
      sb.toString
    }
    val sst = {
      val sb = new java.lang.StringBuilder()
      sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
        .append(s"""<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${sstIndex.size}" uniqueCount="${sstIndex.size}">""")
      sstIndex.keysIterator.foreach(s =>
        sb.append(s"""<si><t xml:space="preserve">${Ooxml.xmlEscape(s)}</t></si>"""))
      sb.append("</sst>")
      sb.toString
    }
    Ooxml.writePackage(Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
          |</Types>""".stripMargin,
      "_rels/.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin,
      "xl/workbook.xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
          |</workbook>""".stripMargin,
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>
          |</Relationships>""".stripMargin,
      "xl/worksheets/sheet1.xml" -> sheet,
      "xl/sharedStrings.xml" -> sst))
  }

  /** Shared-string table: one entry per `<si>`, rich-text runs (multiple
    * `<t>` per `<si>`) concatenated. */
  private def sharedStrings(bytes: Array[Byte]): Vector[String] = {
    val xml = Ooxml.readParts(bytes, _ == "xl/sharedStrings.xml")
      .headOption.map(_._2).getOrElse(return Vector.empty)
    Ooxml.groupText(xml, "si", "t")
  }

  def decode(bytes: Array[Byte]): Vector[Vector[Cell]] = {
    val shared = sharedStrings(bytes)
    val sheet = Ooxml.readPart(bytes, "xl/worksheets/sheet1.xml")
    Ooxml.elementSegments(sheet, "row").map { case (start, end) =>
      parseCells(sheet.substring(start, end), shared)
    }
  }

  private val TypeAttr = """t="([^"]+)"""".r

  private def parseCells(row: String, shared: Vector[String]): Vector[Cell] = {
    val out = Vector.newBuilder[Cell]
    var i = 0
    while ({ val t = row.indexOf("<c", i); t >= 0 && {
      require(t + 2 < row.length, "unterminated <c> tag")
      val after = row.charAt(t + 2)
      if (after == '>' || after == ' ' || after == '/') {
        val openEnd = row.indexOf('>', t)
        require(openEnd >= 0, "unterminated <c> tag")
        if (row.charAt(openEnd - 1) == '/') i = openEnd + 1 // empty cell: skip
        else {
          val end = row.indexOf("</c>", openEnd)
          require(end >= 0, "missing </c>")
          val openTag = row.substring(t, openEnd)
          val body = row.substring(openEnd + 1, end)
          val cellType = TypeAttr.findFirstMatchIn(openTag).map(_.group(1))
          out += (cellType match {
            case Some("s") =>
              val idx = Ooxml.textNodes(body, "v").headOption
                .getOrElse(throw new IllegalArgumentException("shared cell without <v>"))
                .trim.toInt
              require(idx >= 0 && idx < shared.length, s"shared-string index $idx out of range")
              StrCell(shared(idx))
            case Some("inlineStr") => StrCell(Ooxml.textNodes(body, "t").mkString)
            case Some("str")       => StrCell(Ooxml.textNodes(body, "v").headOption.getOrElse(""))
            case Some("b")         => NumCell(Ooxml.textNodes(body, "v").head.trim.toDouble)
            case Some(other) if other != "n" =>
              throw new IllegalArgumentException(s"unsupported cell type $other")
            case _ => // t="n" is the explicit form of the implicit numeric default
              NumCell(Ooxml.textNodes(body, "v").headOption
                .getOrElse(throw new IllegalArgumentException("numeric cell without <v>"))
                .trim.toDouble)
          })
          i = end + 4
        }
      } else i = t + 2
      true
    }}) ()
    out.result()
  }
}
