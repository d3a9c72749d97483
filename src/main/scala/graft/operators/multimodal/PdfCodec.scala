package graft.operators.multimodal

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.{Deflater, Inflater}

/** Real, dependency-free PDF text codec — the pdf half of the reference's
  * document-conversion zoo (analisis-informe.ipynb converts pdf→text before
  * chunking; ocr.py ingests scanned PDFs). A full PDF renderer needs native
  * libs this container lacks, but the TEXT layer of a PDF is pure structure:
  * Flate-compressed content streams of `(string) Tj` / `[...] TJ` show
  * operators. Parsing that needs only `java.util.zip.Inflater`.
  *
  * encode() writes a complete, spec-valid single-page PDF 1.4 (catalog /
  * pages / page / Flate content stream / Type1 font, correct xref byte
  * offsets + trailer); decode() walks every `stream` object, inflates
  * FlateDecode payloads (raw passthrough otherwise), and tokenizes the
  * content stream — literal strings with all escape forms (\\ \( \) \n \r
  * \t \b \f, octal \ddd, line continuations) and balanced nested parens,
  * emitted at `Tj` / `'` / `"` and concatenated inside `[...] TJ` arrays.
  * The decoder is deliberately stricter-than-needed for its own writer so
  * it also reads simple files from other producers.
  */
object PdfCodec {

  /** PDF literal-string escape: backslash, parens, and the two EOL chars
    * (raw CR/LF inside a literal would be read back as content). PDF
    * strings are byte strings — chars above 0xFF have no single-byte
    * encoding and would be silently mangled by the ISO-8859-1 write, so
    * fail loudly instead (full-Unicode text belongs in the UTF-16BE form
    * this minimal writer doesn't emit). */
  private def escape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' => sb.append("\\\\")
        case '('  => sb.append("\\(")
        case ')'  => sb.append("\\)")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case c if c > 0xFF =>
          throw new IllegalArgumentException(
            f"char U+${c.toInt}%04X is not Latin-1; this writer emits byte strings only")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new ByteArrayOutputStream(data.length * 3 + 64)
    val buf = new Array[Byte](4096)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        // n == 0 without finished() means needsInput (truncated) or a
        // preset-dictionary stream — both must fail loudly, not spin
        require(n > 0 || inf.finished(), if (inf.needsDictionary())
          "FlateDecode stream requires a preset dictionary (unsupported)"
        else "truncated FlateDecode stream")
        out.write(buf, 0, n)
      }
    } finally inf.end()
    out.toByteArray
  }

  /** One text line per `(...) Tj`, moved down 14pt per line via `TL`/`T*`.
    * Every other line is emitted as a kerned `[(..) -120 (..)] TJ` split at
    * the midpoint so decode exercises the array form too. */
  def encode(lines: Seq[String], compress: Boolean = true): Array[Byte] = {
    val content = {
      val sb = new java.lang.StringBuilder()
      sb.append("BT\n/F1 12 Tf\n14 TL\n72 720 Td\n")
      lines.zipWithIndex.foreach { case (line, i) =>
        if (i % 2 == 1 && line.length >= 2) {
          val mid = line.length / 2
          sb.append('[').append('(').append(escape(line.substring(0, mid)))
            .append(") -120 (").append(escape(line.substring(mid)))
            .append(")] TJ\nT*\n")
        } else {
          sb.append('(').append(escape(line)).append(") Tj\nT*\n")
        }
      }
      sb.append("ET\n")
      sb.toString.getBytes(ISO_8859_1)
    }
    val payload = if (compress) deflate(content) else content
    val filter = if (compress) " /Filter /FlateDecode" else ""

    val objs = Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
      s"<< /Length ${payload.length}$filter >>",
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    val out = new ByteArrayOutputStream(payload.length + 1024)
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.4\n")
    // binary-comment line so transfer tools treat the file as binary
    out.write(Array[Byte]('%', 0xE2.toByte, 0xE3.toByte, 0xCF.toByte, 0xD3.toByte, '\n'))
    val offsets = new Array[Int](objs.length)
    objs.zipWithIndex.foreach { case (dict, i) =>
      offsets(i) = out.size()
      w(s"${i + 1} 0 obj\n$dict\n")
      if (i == 3) { // the content-stream object
        w("stream\n")
        out.write(payload)
        w("\nendstream\n")
      }
      w("endobj\n")
    }
    val xref = out.size()
    w(s"xref\n0 ${objs.length + 1}\n")
    w("0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    out.toByteArray
  }

  /** All text runs shown by the content streams, in stream order (one
    * entry per Tj/'/" and one per whole TJ array). */
  def decodeText(bytes: Array[Byte]): Vector[String] = {
    val doc = new String(bytes, ISO_8859_1)
    require(doc.startsWith("%PDF-"), "missing %PDF- header")
    val runs = Vector.newBuilder[String]
    var from = 0
    var sawStream = false
    while ({ val at = doc.indexOf("stream", from); at >= 0 && {
      // "endstream" also contains "stream" — require keyword start
      val kwStart = at == 0 || !doc.charAt(at - 1).isLetter
      if (kwStart) {
        sawStream = true
        val objStart = doc.lastIndexOf(" obj", at)
        require(objStart >= 0, "stream keyword outside any object")
        val dict = doc.substring(objStart, at)
        var dataStart = at + "stream".length
        if (dataStart < doc.length && doc.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < doc.length && doc.charAt(dataStart) == '\n') dataStart += 1
        // direct integer lengths only — "/Length 5 0 R" is an indirect
        // object reference whose "5" is NOT a byte count; fall through to
        // the endstream scan for those
        // (?!\d) blocks backtracking INTO the capture: without it,
        // "/Length 123 0 R" backtracks the group to "12" so the lookahead
        // stops matching, yielding a bogus direct length of 12
        val lenRe = """/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)""".r
        val end = lenRe.findFirstMatchIn(dict) match {
          case Some(m) => dataStart + m.group(1).toInt
          case None =>
            val e = doc.indexOf("endstream", dataStart)
            require(e >= 0, "unterminated stream (no /Length, no endstream)")
            e
        }
        require(end <= bytes.length, s"stream declares bytes past EOF ($end > ${bytes.length})")
        val raw = java.util.Arrays.copyOfRange(bytes, dataStart, end)
        val content =
          if (dict.contains("/FlateDecode")) new String(inflate(raw), ISO_8859_1)
          else new String(raw, ISO_8859_1)
        runs ++= extractRuns(content)
        from = doc.indexOf("endstream", end) match {
          case -1 => end
          case e  => e + "endstream".length
        }
      } else from = at + 6
      true
    }}) ()
    require(sawStream, "no stream objects found")
    runs.result()
  }

  /** Tokenize a content stream: literal strings + the Tj/TJ/'/" show ops. */
  private def extractRuns(content: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var pending: List[String] = Nil // strings parsed since the last [ or op
    var inArray = false
    var i = 0
    val n = content.length
    while (i < n) {
      content.charAt(i) match {
        case '(' =>
          val (s, next) = parseLiteral(content, i)
          pending = s :: pending
          i = next
        case '<' if i + 1 < n && content.charAt(i + 1) == '<' =>
          i += 2 // dictionary open — not a string
        case '<' =>
          val (s, next) = parseHex(content, i)
          pending = s :: pending
          i = next
        case '[' => inArray = true; pending = Nil; i += 1
        case ']' => i += 1 // TJ op follows; keep pending
        case '%' => // comment to EOL
          while (i < n && content.charAt(i) != '\n') i += 1
        case c if c.isLetter || c == '\'' || c == '"' =>
          val start = i
          while (i < n && { val ch = content.charAt(i)
            ch.isLetterOrDigit || ch == '*' || ch == '\'' || ch == '"' }) i += 1
          content.substring(start, i) match {
            case "Tj" | "'" | "\"" =>
              pending.headOption.foreach(out += _)
              pending = Nil; inArray = false
            case "TJ" =>
              out += pending.reverse.mkString
              pending = Nil; inArray = false
            case _ =>
              if (!inArray) pending = Nil // any other op clears loose strings
          }
        case _ => i += 1
      }
    }
    out.result()
  }

  /** PDF hex string `<48656C6C6F>`: whitespace allowed between digits, an
    * odd final digit is padded with 0 (spec 7.3.4.3). Returns (decoded,
    * index after the closing `>`). */
  private def parseHex(s: String, open: Int): (String, Int) = {
    val sb = new java.lang.StringBuilder()
    var hi = -1
    var i = open + 1
    while (i < s.length && s.charAt(i) != '>') {
      val c = s.charAt(i)
      if (!c.isWhitespace) {
        val d = Character.digit(c, 16)
        require(d >= 0, s"invalid hex-string digit '$c'")
        if (hi < 0) hi = d
        else { sb.append(((hi << 4) | d).toChar); hi = -1 }
      }
      i += 1
    }
    require(i < s.length, "unterminated hex string")
    if (hi >= 0) sb.append((hi << 4).toChar) // odd digit count: pad with 0
    (sb.toString, i + 1)
  }

  /** PDF literal string: balanced unescaped parens, \-escapes incl. octal
    * and line continuation. Returns (decoded, index after closing paren). */
  private def parseLiteral(s: String, open: Int): (String, Int) = {
    val sb = new java.lang.StringBuilder()
    var depth = 1
    var i = open + 1
    while (depth > 0) {
      require(i < s.length, "unterminated literal string")
      s.charAt(i) match {
        case '\\' =>
          require(i + 1 < s.length, "dangling backslash")
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case '\n' => i += 2 // line continuation
            case '\r' => i += (if (i + 2 < s.length && s.charAt(i + 2) == '\n') 3 else 2)
            case d if d >= '0' && d <= '7' =>
              var v = 0; var j = i + 1
              while (j < s.length && j < i + 4 && s.charAt(j) >= '0' && s.charAt(j) <= '7') {
                v = v * 8 + (s.charAt(j) - '0'); j += 1
              }
              sb.append((v & 0xFF).toChar); i = j
            case other => sb.append(other); i += 2 // \( \) \\ and any escaped char
          }
        case '(' => depth += 1; sb.append('('); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) sb.append(')')
          i += 1
        case c => sb.append(c); i += 1
      }
    }
    (sb.toString, i)
  }
}
