package graft.operators.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

/** Shared plumbing for the OOXML family (docx/xlsx/pptx are all zip
  * packages of XML parts): zip part IO, XML text escaping, and
  * entity-aware unescaping. No XML library — the text layers these codecs
  * read are regular enough for tag scanning, and the container needs only
  * `java.util.zip`. */
private[multimodal] object Ooxml {

  def xmlEscape(s: String): String = {
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

  def unescape(s: String): String = {
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

  /** Write a zip package from (name → XML content) parts, in order. */
  def writePackage(parts: Seq[(String, String)]): Array[Byte] = {
    val out = new ByteArrayOutputStream(parts.map(_._2.length).sum + 2048)
    val zip = new ZipOutputStream(out)
    parts.foreach { case (name, content) =>
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes(UTF_8))
      zip.closeEntry()
    }
    zip.close()
    out.toByteArray
  }

  /** All entries whose name satisfies `want`, as (name → content). */
  def readParts(bytes: Array[Byte], want: String => Boolean): Vector[(String, String)] = {
    val zip = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Vector.newBuilder[(String, String)]
    try {
      var entry = zip.getNextEntry
      while (entry != null) {
        if (want(entry.getName)) {
          val buf = new ByteArrayOutputStream(8192)
          val chunk = new Array[Byte](4096)
          var n = zip.read(chunk)
          while (n >= 0) { buf.write(chunk, 0, n); n = zip.read(chunk) }
          out += entry.getName -> new String(buf.toByteArray, UTF_8)
        }
        zip.closeEntry()
        entry = zip.getNextEntry
      }
    } finally zip.close()
    out.result()
  }

  /** The single entry named `name`, or fail loudly. */
  def readPart(bytes: Array[Byte], name: String): String =
    readParts(bytes, _ == name).headOption.map(_._2)
      .getOrElse(throw new IllegalArgumentException(
        s"not the expected OOXML package: no $name entry"))

  /** Scan `xml` for element `tag` (e.g. "w:t"); returns the unescaped text
    * content of each occurrence, in order. Attributes on the open tag are
    * allowed; self-closing occurrences yield "". Prefix-safe: `<w:t` does
    * not match `<w:tbl`. */
  def textNodes(xml: String, tag: String): Vector[String] =
    textNodesWithOffsets(xml, tag).map(_._2)

  /** Concatenated text of `textTag` nodes grouped by their enclosing
    * `containerTag` (rows, paragraphs, shared-string items): one merge
    * pass over the two offset-ordered lists, not a rescan per container. */
  def groupText(xml: String, containerTag: String, textTag: String): Vector[String] = {
    val ts = textNodesWithOffsets(xml, textTag)
    var ti = 0
    elementSegments(xml, containerTag).map { case (start, end) =>
      while (ti < ts.length && ts(ti)._1 < start) ti += 1
      val sb = new java.lang.StringBuilder()
      while (ti < ts.length && ts(ti)._1 < end) { sb.append(ts(ti)._2); ti += 1 }
      sb.toString
    }
  }

  /** (start, end) offsets of each occurrence of container element `tag`
    * (prefix-safe), for grouping child text nodes: a self-closing
    * occurrence ends at its own `>` (empty segment); a normal one at its
    * close tag, falling back to the next occurrence / end of document for
    * unterminated foreign markup. */
  def elementSegments(xml: String, tag: String): Vector[(Int, Int)] = {
    val open = s"<$tag"
    val close = s"</$tag>"
    val out = Vector.newBuilder[(Int, Int)]
    var i = 0
    while ({ val t = xml.indexOf(open, i); t >= 0 && {
      require(t + open.length < xml.length, s"unterminated <$tag> tag")
      val after = xml.charAt(t + open.length)
      if (after == '>' || after == ' ' || after == '/') {
        val openEnd = xml.indexOf('>', t)
        require(openEnd >= 0, s"unterminated <$tag> tag")
        if (xml.charAt(openEnd - 1) == '/') out += t -> openEnd
        else out += t -> (xml.indexOf(close, openEnd) match {
          case -1 => xml.length
          case e  => e
        })
      }
      i = t + open.length
      true
    }}) ()
    // clamp unterminated segments at the next sibling's start
    val segs = out.result()
    segs.zipWithIndex.map { case ((s, e), idx) =>
      if (idx + 1 < segs.length && e > segs(idx + 1)._1) (s, segs(idx + 1)._1)
      else (s, e)
    }
  }

  /** Like [[textNodes]] but returns (start offset, text) so callers can
    * group nodes by enclosing structure (rows, paragraphs, slides). */
  def textNodesWithOffsets(xml: String, tag: String): Vector[(Int, String)] = {
    val open = s"<$tag"
    val close = s"</$tag>"
    val out = Vector.newBuilder[(Int, String)]
    var i = 0
    while ({ val t = xml.indexOf(open, i); t >= 0 && {
      require(t + open.length < xml.length, s"unterminated <$tag> tag")
      val after = xml.charAt(t + open.length)
      if (after == '>' || after == ' ' || after == '/') {
        val closeAt = xml.indexOf('>', t)
        require(closeAt >= 0, s"unterminated <$tag> tag")
        if (xml.charAt(closeAt - 1) == '/') { out += t -> ""; i = closeAt + 1 }
        else {
          val end = xml.indexOf(close, closeAt)
          require(end >= 0, s"missing $close")
          out += t -> unescape(xml.substring(closeAt + 1, end))
          i = end + close.length
        }
      } else i = t + open.length
      true
    }}) ()
    out.result()
  }
}
