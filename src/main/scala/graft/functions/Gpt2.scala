package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.unsafe.types.UTF8String

/** The two public GPT-2 tokenizer stages the Ġ-convention encoder
  * (the r12 `MarkedBpeTokens` encoder's role) previously approximated — now exact
  * (the r12 verdict's stated fidelity gaps, closed):
  *
  *  1. '''Pre-tokenization''' — GPT-2 splits text with the published
  *     regex `'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+|
  *     ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+`. The negative lookahead is not
  *     runnable on RE2 engines (DuckDB), so [[pretokenize]] implements
  *     the provably-equivalent LOOKAHEAD-FREE character-class scan: at
  *     each position the first matching rule wins, exactly the regex's
  *     alternation order, and the lookahead branch reduces to "a
  *     whitespace run followed by non-whitespace emits its first
  *     len−1 chars, leaving the last to attach as the ` ?` of the next
  *     token; a trailing run emits whole". The scan is replayed
  *     token-for-token in DuckDB as anchored RE2 regexes over a
  *     recursive CTE ([[graft.operators.text.PretrainedBpe]]).
  *  2. '''Byte-unicode remap''' — GPT-2's `bytes_to_unicode()`: BPE
  *     runs over a 256-symbol alphabet of REMAPPED UTF-8 bytes, where
  *     printable/latin bytes keep their code point and the other 68
  *     map to 256+n in ascending byte order ([[ByteChar]]). The Ġ
  *     space marker is not a convention bolted on top — it IS this
  *     table's image of byte 0x20 (U+0120), falling out of the ` ?`
  *     the pre-tokenizer attaches. Multi-byte UTF-8 ("é" → Ã©) becomes
  *     multiple initial symbols, exactly as tiktoken/GPT-2 sees them.
  *
  * Equivalence note for the scan (why per-segment replay is sound):
  * every pre-token is either all-whitespace or ` ?`+non-whitespace-run,
  * so a non-ws→ws boundary always ends a token — the oracle may
  * therefore split text into `[ws]*[non-ws]+` segments (plus one
  * trailing all-ws segment), scan each DISTINCT segment once, and sum
  * counts, landing on the same tokens as this full-text scan.
  *
  * Class parity with Python's `regex` module: the whitespace class is
  * the EXACT 25-code-point Unicode White_Space set in both engines
  * ([[WsChars]] on the JVM, [[WsClassRe2]] in RE2 — enumerated against
  * the regex module itself and verified code-point-identical, closing
  * the r12 "ASCII \s" residue); letter and number classes are full
  * Unicode (\p{L}, \p{N}) in both engines.
  *
  * Reference: the tiktoken/cl100k token-budget cells in
  * nuevo-kmeans-pre.ipynb and update-etiquetas.ipynb.
  */
object Gpt2 {

  /** bytes_to_unicode(): byte b → the char BPE sees. Printable ASCII
    * (0x21–0x7E) and the latin-1 blocks 0xA1–0xAC / 0xAE–0xFF keep
    * their code point; the remaining 68 bytes map to 256+n in
    * ascending byte order (so 0x20 → U+0120 'Ġ', 0x0A → U+010A 'Ċ'). */
  val ByteChar: Array[Char] = {
    val keep = ((0x21 to 0x7e) ++ (0xa1 to 0xac) ++ (0xae to 0xff)).toSet
    var n = 0
    (0 until 256).map { b =>
      if (keep(b)) b.toChar
      else { val c = (256 + n).toChar; n += 1; c }
    }.toArray
  }

  /** UTF-8 bytes of `s`, each remapped through [[ByteChar]] — the
    * string whose CHARS are the initial BPE symbols. */
  def remap(s: String): String = {
    val bs = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[Char](bs.length)
    var i = 0
    while (i < bs.length) { out(i) = ByteChar(bs(i) & 0xff); i += 1 }
    new String(out)
  }

  /** Python `regex` \\s exactly: the 25 Unicode White_Space code points
    * (enumerated against the regex module itself — the r13 closure of
    * the "ASCII \\s" residue). All BMP chars, so a Char test suffices. */
  private val WsChars: Set[Char] =
    ((Seq(0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x20, 0x85, 0xA0, 0x1680,
      0x2028, 0x2029, 0x202F, 0x205F, 0x3000) ++ (0x2000 to 0x200A))
      .map(_.toChar)).toSet

  /** The same class in RE2 (DuckDB) syntax — \\p{Zs} plus the
    * non-separator whitespace controls; verified code-point-identical
    * to the Python set over the BMP prefix. */
  val WsClassRe2: String = " \\t\\n\\x0B\\f\\r\\x{0085}\\x{2028}\\x{2029}\\p{Zs}"

  private def isWs(c: Char): Boolean = WsChars(c)

  private def isLetter(cp: Int): Boolean = Character.isLetter(cp)

  private def isNumber(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
      t == Character.OTHER_NUMBER
  }

  /** `'s|'t|'re|'ve|'m|'ll|'d` at position i — the matched length or 0.
    * Case-sensitive and lookahead-free, like the published pattern
    * ("'street" pre-tokenizes as ["'s","treet"], exactly as GPT-2 does). */
  private def contractionLen(t: String, i: Int): Int = {
    if (t.charAt(i) != '\'' || i + 1 >= t.length) return 0
    val c1 = t.charAt(i + 1)
    if (c1 == 's' || c1 == 't' || c1 == 'm' || c1 == 'd') 2
    else if (i + 2 < t.length) {
      val c2 = t.charAt(i + 2)
      if ((c1 == 'r' && c2 == 'e') || (c1 == 'v' && c2 == 'e') ||
          (c1 == 'l' && c2 == 'l')) 3
      else 0
    } else 0
  }

  /** End (exclusive) of the maximal run of one class from `start`:
    * letters, numbers, or other-non-whitespace. Advances by code point
    * so surrogate pairs classify as their real code point. */
  private def runEnd(t: String, start: Int, cls: Int => Boolean,
                     wantOther: Boolean): Int = {
    var j = start
    while (j < t.length && !isWs(t.charAt(j))) {
      val cp = t.codePointAt(j)
      val in = if (wantOther) !isLetter(cp) && !isNumber(cp) else cls(cp)
      if (!in) return j
      j += Character.charCount(cp)
    }
    j
  }

  /** End of the ` ?X+` token starting at `from` (which is either the
    * run start or the single attached space before it). */
  private def classRunEnd(t: String, p: Int): Int = {
    val cp = t.codePointAt(p)
    if (isLetter(cp)) runEnd(t, p, isLetter, wantOther = false)
    else if (isNumber(cp)) runEnd(t, p, isNumber, wantOther = false)
    else runEnd(t, p, _ => true, wantOther = true)
  }

  /** The GPT-2 pre-tokenizer as a deterministic scan — one token per
    * `re.findall` match of the published pattern, no lookahead. */
  def pretokenize(text: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val n = text.length
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      val cl = contractionLen(text, i)
      if (cl > 0) {
        out += text.substring(i, i + cl); i += cl
      } else if (!isWs(c)) {
        val e = classRunEnd(text, i)
        out += text.substring(i, e); i = e
      } else {
        var j = i
        while (j < n && isWs(text.charAt(j))) j += 1
        if (j == n) {                       // trailing run: \s+(?!\S) whole
          out += text.substring(i, j); i = j
        } else if (j - i == 1) {
          if (c == ' ') {                   // the ` ?` of the next token
            val e = classRunEnd(text, i + 1)
            out += text.substring(i, e); i = e
          } else {                          // lone tab/newline: bare \s+
            out += text.substring(i, i + 1); i += 1
          }
        } else {                            // run minus its last char
          out += text.substring(i, j - 1); i = j - 1
        }
      }
    }
    out.toSeq
  }

  /** Pre-token → BPE tokens in the remapped alphabet: remap bytes,
    * then the greedy lowest-rank merge loop (no `</w>`). */
  def encodePretoken(tok: String, ranks: Map[(String, String), Int]): Array[String] =
    Bpe.encodeMarked(remap(tok), ranks)
}

/** Document → GPT-2-pipeline subword tokens under a frozen published
  * vocabulary: [[Gpt2.pretokenize]] → [[Gpt2.remap]] → greedy
  * lowest-rank merges. Replaces the Ġ-convention approximation
  * ([[graft.operators.text.PretrainedBpe]] r12): no trim, no
  * first-word special case — the Ġ marker falls out of the byte table,
  * leading/trailing whitespace becomes real tokens, contractions and
  * digit/punctuation runs split exactly as the published regex does.
  * Same codegen-by-reference shape and per-partition Zipf cache as
  * [[BpeTokens]] (via [[BpeTokensBase]]; the cache key is the RAW
  * pre-token, remap+merge both cached behind it). */
case class Gpt2BpeTokens(child: Expression, merges: Seq[(String, String)])
    extends BpeTokensBase {

  override def prettyName: String = "gpt2_bpe_tokens"

  override def nullSafeEval(v: Any): Any = {
    val out = mutable.ArrayBuffer.empty[UTF8String]
    Gpt2.pretokenize(v.asInstanceOf[UTF8String].toString).foreach { pt =>
      cachedEncode(pt, Gpt2.encodePretoken(_, ranks))
        .foreach(t => out += UTF8String.fromString(t))
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Gpt2BpeTokens {
  def apply(text: Column, merges: Seq[(String, String)]): Column =
    Shim.column(Gpt2BpeTokens(Shim.expression(text), merges))
}
