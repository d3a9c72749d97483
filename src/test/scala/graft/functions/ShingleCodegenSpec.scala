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

  test("HyperplaneSig codegen == interpreted, dual instances, float + double") {
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    val planes = HyperplaneSig.randomPlanes(16, 8)
    val rnd = new scala.util.Random(5)
    for (t <- Seq(ArrayType(FloatType, containsNull = false),
      ArrayType(DoubleType, containsNull = false))) {
      val ref = BoundReference(0, t, nullable = false) // worst case: no if-block
      val exprs = Seq(HyperplaneSig(ref, planes), HyperplaneSig(ref, planes))
      val proj = GenerateUnsafeProjection.generate(exprs)
      for (_ <- 0 until 20) {
        val xs = Array.fill(8)(rnd.nextDouble() * 2 - 1)
        val row = InternalRow(t.elementType match {
          case FloatType => ArrayData.toArrayData(xs.map(_.toFloat))
          case _ => ArrayData.toArrayData(xs)
        })
        val out = proj(row)
        assert(out.getLong(0) == exprs.head.eval(row).asInstanceOf[Long])
        assert(out.getLong(1) == out.getLong(0))
      }
    }
  }

  test("BpeTokens generated call == interpreted eval") {
    val merges = Seq(("t", "h"), ("th", "e</w>"), ("a", "n"))
    val ref = BoundReference(0, StringType, nullable = true)
    val exprs = Seq(BpeTokens(ref, merges), BpeTokens(ref, merges))
    val proj = GenerateUnsafeProjection.generate(exprs)
    for (s <- Seq("the anthem then", "", "a", "  the  ")) {
      val row = InternalRow(UTF8String.fromString(s))
      val out = proj(row)
      val interp = arr2(exprs.head.eval(row))
      assert((0 until out.getArray(0).numElements())
        .map(i => out.getArray(0).getUTF8String(i).toString) == interp)
    }
  }

  private def arr2(a: Any): Seq[String] = {
    val ad = a.asInstanceOf[ArrayData]
    (0 until ad.numElements()).map(i => ad.getUTF8String(i).toString)
  }
}
