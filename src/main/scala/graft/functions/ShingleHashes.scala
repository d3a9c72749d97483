package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hashed word n-gram shingles in one pass over the raw bytes.
  *
  * The Column-API formulation (`split` → `sequence` → `transform(slice +
  * concat_ws)` → `xxhash64`) materializes every shingle as a new string:
  * O(words · n) bytes of garbage per document. This expression tokenizes
  * the UTF8String's bytes directly (ASCII whitespace separators), FNV-1a
  * hashes each word in place, and mixes each window of `n` consecutive
  * word hashes into one 64-bit value — zero intermediate strings, one
  * allocation for the output array.
  *
  * Output values are masked to 32 bits so downstream MinHash permutations
  * `(a·x + b) mod p` (p > 2^32) stay overflow-free in long arithmetic —
  * same contract as the previous `xxhash64 & 0xFFFFFFFF` form. Values are
  * a different hash family than the string form; MinHash/Jaccard consumers
  * only need consistency, not a particular family.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")

  override def prettyName: String = "shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val len = bytes.length
    // First pass: FNV-1a hash of each whitespace-separated token.
    var wordCount = 0
    var wordHashes = new Array[Long](math.max(8, len / 6))
    var i = 0
    while (i < len) {
      // skip separators
      while (i < len && isSpace(bytes(i))) i += 1
      if (i < len) {
        var h = 0xcbf29ce484222325L
        while (i < len && !isSpace(bytes(i))) {
          h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
          i += 1
        }
        if (wordCount == wordHashes.length) {
          val bigger = new Array[Long](wordHashes.length * 2)
          System.arraycopy(wordHashes, 0, bigger, 0, wordCount)
          wordHashes = bigger
        }
        wordHashes(wordCount) = h
        wordCount += 1
      }
    }
    if (wordCount < n) return new GenericArrayData(Array.empty[Long])
    // Second pass: mix each window of n word hashes into one shingle hash.
    val m = wordCount - n + 1
    val out = new Array[Long](m)
    var s = 0
    while (s < m) {
      var acc = 0x9e3779b97f4a7c15L
      var j = 0
      while (j < n) {
        acc = java.lang.Long.rotateLeft(acc ^ wordHashes(s + j), 27) * 0x94d049bb133111ebL
        j += 1
      }
      // finalize (splitmix64 tail) then mask to the 32-bit MinHash domain
      acc ^= (acc >>> 31)
      acc *= 0xbf58476d1ce4e5b9L
      acc ^= (acc >>> 33)
      out(s) = acc & 0xFFFFFFFFL
      s += 1
    }
    new GenericArrayData(out)
  }

  @inline private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\t' || b == '\r' || b == '\f' || b == 0x0B

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ShingleHashes {
  def apply(text: Column, n: Int = 3): Column =
    Shim.column(ShingleHashes(Shim.expression(text), n))
}
