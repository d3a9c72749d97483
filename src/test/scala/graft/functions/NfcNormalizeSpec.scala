package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  // decomposed (base + combining mark) and precomposed forms, written as
  // explicit escapes so the source encoding can't silently change them
  private val eAcuteD = "café"   // e + U+0301
  private val eAcuteC = "caf\u00e9"    // precomposed
  private val ringD = "Å"        // A + U+030A
  private val ringC = "\u00c5"         // precomposed
  private val tildeD = "ñ"       // n + U+0303
  private val tildeC = "\u00f1"        // precomposed

  private val cases = Seq(eAcuteD, eAcuteC, ringD, ringC, tildeD, tildeC,
    "plain ascii", "", s"mixed $eAcuteD and $ringD")

  test("matches java.text.Normalizer through the DataFrame (codegen) path") {
    val got = cases.toDF("s")
      .select(col("s"), NfcNormalize(col("s")).as("n"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { c =>
      val expect = java.text.Normalizer.normalize(c, java.text.Normalizer.Form.NFC)
      assert(got(c) == expect, s"NFC mismatch for ${c.codePoints().toArray.toSeq}")
    }
    // the decomposed cases really compose (combining mark merged away)
    assert(got(eAcuteD) == eAcuteC && got(ringD) == ringC && got(tildeD) == tildeC)
    // precomposed input is untouched
    assert(got(eAcuteC) == eAcuteC)
  }

  test("idempotent and null-safe") {
    val df = (cases.map(Option(_)) :+ None).toDF("s")
      .select(NfcNormalize(NfcNormalize(col("s"))).as("twice"),
        NfcNormalize(col("s")).as("once"))
    df.collect().foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getString(0) == r.getString(1))
    }
  }
}
