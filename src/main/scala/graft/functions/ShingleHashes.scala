package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hashed word n-gram shingles in one pass over the raw bytes.
  *
  * The Column-API formulation (`split` → `sequence` → `transform(slice +
  * concat_ws)` → hash) materializes every shingle as a new string:
  * O(words · n) bytes of garbage per document. This expression tokenizes
  * the UTF8String's bytes directly (ASCII whitespace separators), hashes
  * each word in place over its Unicode code points (decoded inline from
  * UTF-8; ASCII is a one-byte fast path), and mixes each window of `n`
  * consecutive word hashes into one value — zero intermediate strings,
  * one allocation for the output array.
  *
  * The hash is a Karp–Rabin polynomial fingerprint mod the Mersenne prime
  * M = 2³¹−1 (word: h = (h·127 + byte) mod M; window: acc = (acc·1000003 +
  * wordHash) mod M). Chosen over xxhash/FNV deliberately: every
  * intermediate stays below 2⁵², so the exact pipeline — tokenize → word
  * hash → window mix → MinHash permutations — can be replayed in plain
  * 64-bit SQL arithmetic by an independent engine (the DuckDB oracle
  * replays it with list_reduce/list_transform; overflow-wrapping hashes
  * cannot be, since standard SQL integer ops error on overflow rather than
  * wrap). Outputs lie in [0, 2³¹): MinHash permutations `(a·x + b) mod p`
  * (a, b < 2³¹, p > 2³²) stay overflow-free in long arithmetic.
  *
  * `wide = true` (requires n = 1): per-word 62-bit fingerprint `rk₁₂₇ |
  * (rk₁₃₁ << 31)` from two base-independent Karp–Rabin hashes — the word
  * hash domain SimHash votes over (bits 62-63 always 0, consistently in
  * both engines).
  */
case class ShingleHashes(child: Expression, n: Int, wide: Boolean = false)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")
  require(!wide || n == 1, "wide (62-bit) hashes are per-word only (n = 1)")

  import ShingleHashes.{M, WordBase, WordBase2, WindowBase}

  override def prettyName: String = "shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val len = bytes.length
    // First pass: Karp-Rabin hash of each whitespace-separated token. The
    // polynomial runs over Unicode CODE POINTS (decoded inline from the
    // UTF-8 bytes — ASCII stays a one-byte fast path), matching the SQL
    // oracle's ord(substr(w, i, 1)) semantics on any corpus, not only
    // ASCII. Separators are ASCII, so multi-byte sequences (all bytes
    // >= 0x80) can never be mistaken for them.
    var wordCount = 0
    var wordHashes = new Array[Long](math.max(8, len / 6))
    var i = 0
    while (i < len) {
      // skip separators
      while (i < len && isSpace(bytes(i))) i += 1
      if (i < len) {
        var h = 0L
        var h2 = 0L
        while (i < len && !isSpace(bytes(i))) {
          val b0 = bytes(i) & 0xff
          var cp = 0L
          var nB = 1
          if (b0 < 0x80) cp = b0
          else if ((b0 & 0xE0) == 0xC0) { cp = b0 & 0x1F; nB = 2 }
          else if ((b0 & 0xF0) == 0xE0) { cp = b0 & 0x0F; nB = 3 }
          else { cp = b0 & 0x07; nB = 4 }
          var k = 1
          while (k < nB && i + k < len) {
            cp = (cp << 6) | (bytes(i + k) & 0x3F)
            k += 1
          }
          h = (h * WordBase + cp) % M
          if (wide) h2 = (h2 * WordBase2 + cp) % M
          i += nB
        }
        if (wordCount == wordHashes.length) {
          val bigger = new Array[Long](wordHashes.length * 2)
          System.arraycopy(wordHashes, 0, bigger, 0, wordCount)
          wordHashes = bigger
        }
        wordHashes(wordCount) = if (wide) h | (h2 << 31) else h
        wordCount += 1
      }
    }
    if (wordCount < n) return new GenericArrayData(Array.empty[Long])
    if (n == 1) return new GenericArrayData(
      java.util.Arrays.copyOf(wordHashes, wordCount))
    // Second pass: mix each window of n word hashes into one shingle hash.
    val m = wordCount - n + 1
    val out = new Array[Long](m)
    var s = 0
    while (s < m) {
      var acc = 0L
      var j = 0
      while (j < n) {
        acc = (acc * WindowBase + wordHashes(s + j)) % M
        j += 1
      }
      out(s) = acc
      s += 1
    }
    new GenericArrayData(out)
  }

  @inline private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\t' || b == '\r' || b == '\f' || b == 0x0B

  // ---- whole-stage codegen -------------------------------------------------
  // The hottest LLM-pipeline kernel (MinHash, SimHash, n-gram Jaccard all
  // shingle every document) must not run through CodegenFallback: that path
  // materializes an InternalRow per call and evaluates interpreted with
  // boxing. Instead we emit the SAME byte loop as nullSafeEval into the
  // generated class (ctx.addNewFunction) — a statement-for-statement Java
  // translation, all-long modular arithmetic in identical order, so compiled
  // and interpreted results are bit-identical (asserted by ShingleCodegenSpec
  // over random unicode inputs). n/wide are plan constants, so only the
  // relevant branch is generated.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val gad = "org.apache.spark.sql.catalyst.util.GenericArrayData"
      val isSp = (b: String) =>
        s"($b == 32 || $b == 10 || $b == 9 || $b == 13 || $b == 12 || $b == 11)"
      val tail =
        if (n == 1)
          s"return new $gad(java.util.Arrays.copyOf(wordHashes, wordCount));"
        else
          s"""int m = wordCount - $n + 1;
             |  long[] out = new long[m];
             |  for (int s = 0; s < m; s++) {
             |    long acc = 0L;
             |    for (int j = 0; j < $n; j++) {
             |      acc = (acc * ${WindowBase}L + wordHashes[s + j]) % ${M}L;
             |    }
             |    out[s] = acc;
             |  }
             |  return new $gad(out);""".stripMargin
      val fn = ctx.freshName("shingleHashes")
      val funcName = ctx.addNewFunction(fn,
        s"""
           |private ArrayData $fn(UTF8String str) {
           |  byte[] bytes = str.getBytes();
           |  int len = bytes.length;
           |  int wordCount = 0;
           |  long[] wordHashes = new long[Math.max(8, len / 6)];
           |  int i = 0;
           |  while (i < len) {
           |    while (i < len && ${isSp("bytes[i]")}) i++;
           |    if (i < len) {
           |      long h = 0L;
           |      long h2 = 0L;
           |      while (i < len && !${isSp("bytes[i]")}) {
           |        int b0 = bytes[i] & 0xff;
           |        long cp;
           |        int nB = 1;
           |        if (b0 < 0x80) { cp = b0; }
           |        else if ((b0 & 0xE0) == 0xC0) { cp = b0 & 0x1F; nB = 2; }
           |        else if ((b0 & 0xF0) == 0xE0) { cp = b0 & 0x0F; nB = 3; }
           |        else { cp = b0 & 0x07; nB = 4; }
           |        for (int k = 1; k < nB && i + k < len; k++) {
           |          cp = (cp << 6) | (bytes[i + k] & 0x3F);
           |        }
           |        h = (h * ${WordBase}L + cp) % ${M}L;
           |        ${if (wide) s"h2 = (h2 * ${WordBase2}L + cp) % ${M}L;" else ""}
           |        i += nB;
           |      }
           |      if (wordCount == wordHashes.length) {
           |        wordHashes = java.util.Arrays.copyOf(wordHashes, wordHashes.length * 2);
           |      }
           |      wordHashes[wordCount++] = ${if (wide) "h | (h2 << 31)" else "h"};
           |    }
           |  }
           |  if (wordCount < $n) return new $gad(new long[0]);
           |  $tail
           |}
         """.stripMargin)
      s"${ev.value} = $funcName($c);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ShingleHashes {
  /** Mersenne prime 2³¹−1: hash domain AND modulus. acc·base + byte ≤
    * (M−1)·1000003 + M < 2⁵² — overflow-free in long AND in any SQL
    * engine's 64-bit integers (the oracle replays this arithmetic). */
  val M = 2147483647L
  val WordBase = 127L
  val WordBase2 = 131L
  val WindowBase = 1000003L

  def apply(text: Column, n: Int): Column =
    Shim.column(ShingleHashes(Shim.expression(text), n))

  /** Per-word 62-bit fingerprints (SimHash's vote domain). */
  def wideWordHashes(text: Column): Column =
    Shim.column(ShingleHashes(Shim.expression(text), 1, wide = true))
}
