package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair encoding (Sennrich et al. 2016 — the public subword
  * algorithm behind GPT-2/tiktoken vocabularies). Replaces the BPE-ish
  * regex heuristic with the real thing:
  *
  *  - [[Bpe.learn]] — classic trainer over a word-frequency table: start
  *    from characters (+ the `</w>` word-end marker), repeatedly merge
  *    the most frequent adjacent symbol pair (ties broken
  *    lexicographically — deterministic), record the merge order. BPE
  *    trains on word→freq tables, never the raw corpus, so the
  *    distributed part is ONE groupBy(word).count() capped at the top-K
  *    words — driver work is O(merges · vocab · wordLen), independent
  *    of corpus size.
  *  - [[BpeTokens]] — encoder expression: greedy lowest-rank merging per
  *    word (the standard bpe() loop), per-partition word→tokens cache
  *    (Zipf reuse makes the cache hit rate high), emitting the document's
  *    subword tokens.
  */
object Bpe {

  val EndMark = "</w>"

  /** Ordered merge rules from a word-frequency table. `endMark = false`
    * trains in the GPT-2/tiktoken convention (no `</w>` terminator —
    * published merges.txt vocabularies mark word starts with Ġ instead;
    * see [[graft.operators.text.PretrainedBpe]]). */
  def learn(wordFreqs: Seq[(String, Long)], numMerges: Int,
            endMark: Boolean = true): Seq[(String, String)] = {
    var seqs: Array[(Array[String], Long)] = wordFreqs
      .filter(_._1.nonEmpty)
      .map { case (w, c) =>
        val chars = w.map(_.toString).toArray
        (if (endMark) chars :+ EndMark else chars, c)
      }
      .toArray
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      seqs.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // max count, ties by lexicographic pair: deterministic
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        seqs = seqs.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = new mutable.ArrayBuffer[String](syms.length)
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
                out += joined
                i += 2
              } else {
                out += syms(i)
                i += 1
              }
            }
            (out.toArray, c)
          }
        }
      }
      round += 1
    }
    merges.toSeq
  }

  /** Greedy encode of one word: repeatedly apply the lowest-rank merge
    * present (the standard bpe() loop). */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    if (word.isEmpty) return Array.empty
    encodeSyms(word.map(_.toString).toArray :+ EndMark, ranks)
  }

  /** The GPT-2-convention variant: the caller supplies the initial
    * symbol sequence (characters of the byte-remapped pre-token —
    * [[Gpt2.encodePretoken]] — no `</w>`). */
  def encodeMarked(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    if (word.isEmpty) return Array.empty
    encodeSyms(word.map(_.toString).toArray, ranks)
  }

  /** The greedy lowest-rank merge loop over an initial symbol array —
    * the one kernel behind both encoders. */
  private def encodeSyms(syms0: Array[String],
                         ranks: Map[(String, String), Int]): Array[String] = {
    var syms = syms0
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        val out = new Array[String](syms.length - 1)
        System.arraycopy(syms, 0, out, 0, bestIdx)
        out(bestIdx) = syms(bestIdx) + syms(bestIdx + 1)
        System.arraycopy(syms, bestIdx + 2, out, bestIdx + 1,
          syms.length - bestIdx - 2)
        syms = out
      }
    }
    syms
  }
}

/** Shared scaffolding of the BPE encoder expressions: merge-rank map,
  * per-partition Zipf LRU cache, output type, and the
  * codegen-by-reference shape — subclasses supply only the
  * per-document word loop ([[nullSafeEval]]). ONE copy (r12 review:
  * the cache sizing and codegen shape were hand-mirrored between the
  * two encoders).
  *
  * Codegen calls [[nullSafeEval]] through a reference object rather
  * than CodegenFallback: the cached greedy-merge kernel stays one
  * JIT'd JVM method (identical both paths), but the generated call
  * operates on the child's in-register UTF8String — no InternalRow
  * materialization — and the surrounding stage stays fused. */
abstract class BpeTokensBase extends UnaryExpression {
  def merges: Seq[(String, String)]

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient protected lazy val ranks: Map[(String, String), Int] =
    merges.zipWithIndex.toMap
  @transient private lazy val cache =
    new java.util.LinkedHashMap[String, Array[String]](4096, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Array[String]]): Boolean = size() > 65536
    }

  /** Encode-with-memo: the per-partition LRU keyed by the (possibly
    * marked) word. */
  protected def cachedEncode(w: String, enc: String => Array[String]): Array[String] = {
    var toks = cache.get(w)
    if (toks == null) {
      toks = enc(w)
      cache.put(w, toks)
    }
    toks
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val expr = ctx.addReferenceObj("bpeExpr", this, getClass.getName)
      s"${ev.value} = (ArrayData) $expr.nullSafeEval($c);"
    })
}

/** Document → BPE subword tokens (array<string>): whitespace words each
  * greedy-encoded against the merge ranks (`</w>`-terminated — the
  * corpus-trained [[Bpe.learn]] convention). */
case class BpeTokens(child: Expression, merges: Seq[(String, String)])
    extends BpeTokensBase {

  override def prettyName: String = "bpe_tokens"

  override def nullSafeEval(v: Any): Any = {
    val words = v.asInstanceOf[UTF8String].toString.trim.split(graft.operators.text.TextQueries.WsRe)
    val out = mutable.ArrayBuffer.empty[UTF8String]
    words.foreach { w =>
      if (w.nonEmpty)
        cachedEncode(w, Bpe.encodeWord(_, ranks))
          .foreach(t => out += UTF8String.fromString(t))
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BpeTokens {
  def apply(text: Column, merges: Seq[(String, String)]): Column =
    Shim.column(BpeTokens(Shim.expression(text), merges))
}

// (The r12 Ġ-convention encoder `MarkedBpeTokens` — Java-trimmed words,
// first word unmarked — is superseded by the full-pipeline
// [[Gpt2BpeTokens]]: the Ġ marker now falls out of the byte-unicode
// table instead of being bolted on per word.)
