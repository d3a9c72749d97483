package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** The generated (Janino) paths of [[ShingleHashes]] and
  * [[RollingFingerprint]] must be bit-identical to the interpreted
  * nullSafeEval — the DuckDB oracles replay the interpreted arithmetic, so
  * any compiled/interpreted divergence would surface as a driver hash
  * mismatch. Exercised over ASCII, multi-byte UTF-8 (2/3/4-byte sequences),
  * and degenerate inputs, with duplicate instances sharing one codegen
  * scope (the Janino duplicate-local regression class).
  */
class ShingleCodegenSpec extends SparkSpec {

  private val corpus: Seq[String] = Seq(
    "",
    " ",
    "a",
    "hello world rolling hash fingerprints here",
    "one\ttwo\nthree\rfour\ffive six   seven",
    "único über ñandú — ¡mañana! ασδφ κόσμος", // 2-byte seqs + punctuation
    "日本語のテキスト 中文文本 한국어 텍스트",      // 3-byte seqs
    "emoji 😀😁 mixed 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 words",          // 4-byte seqs (surrogate pairs)
    "x " * 200,                                  // many tiny words
    ("lorem ipsum dolor sit amet " * 40).trim    // long doc
  )

  private def rows: Seq[InternalRow] =
    corpus.map(s => InternalRow(UTF8String.fromString(s)))

  private def arr(a: Any): Seq[Long] = {
    val ad = a.asInstanceOf[ArrayData]
    (0 until ad.numElements()).map(ad.getLong)
  }

  test("ShingleHashes codegen == interpreted (n=1, n=3, wide) on unicode corpus") {
    val ref = BoundReference(0, StringType, nullable = true)
    val exprs = Seq(
      ShingleHashes(ref, 1),
      ShingleHashes(ref, 3),
      ShingleHashes(ref, 1, wide = true),
      ShingleHashes(ref, 3), // duplicate instance in the same codegen scope
      ShingleHashes(ref, 5))
    val proj = GenerateUnsafeProjection.generate(exprs)
    rows.foreach { row =>
      val out = proj(row)
      exprs.zipWithIndex.foreach { case (e, i) =>
        val interp = arr(e.eval(row))
        val gen = (0 until out.getArray(i).numElements()).map(out.getArray(i).getLong)
        assert(gen == interp, s"expr $i diverged on ${row.getUTF8String(0)}")
      }
    }
  }

  test("RollingFingerprint codegen == interpreted (several k/w) on unicode corpus") {
    val ref = BoundReference(0, StringType, nullable = true)
    val exprs = Seq(
      RollingFingerprint(ref, 8, 4),
      RollingFingerprint(ref, 40, 8), // the q_decontaminate configuration
      RollingFingerprint(ref, 8, 4),  // duplicate instance, same scope
      RollingFingerprint(ref, 3, 2))
    val proj = GenerateUnsafeProjection.generate(exprs)
    rows.foreach { row =>
      val out = proj(row)
      exprs.zipWithIndex.foreach { case (e, i) =>
        val interp = arr(e.eval(row))
        val gen = (0 until out.getArray(i).numElements()).map(out.getArray(i).getLong)
        assert(gen == interp, s"expr $i diverged on ${row.getUTF8String(0)}")
      }
    }
  }

  test("null input stays null through the generated path") {
    val ref = BoundReference(0, StringType, nullable = true)
    val proj = GenerateUnsafeProjection.generate(
      Seq(ShingleHashes(ref, 2), RollingFingerprint(ref, 8, 4)))
    val out = proj(InternalRow(null))
    assert(out.isNullAt(0) && out.isNullAt(1))
  }
}
