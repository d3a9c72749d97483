package graft.operators.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  test("fitMinMax finds exact per-dimension bounds") {
    val df = Seq(Array(1.0f, -5.0f), Array(3.0f, 2.0f), Array(-2.0f, 0.0f)).toDF("v")
    val (mn, mx) = Quantization.fitMinMax(df, "v")
    assert(mn.toSeq == Seq(-2.0, -5.0) && mx.toSeq == Seq(3.0, 2.0))
  }

  test("quantize produces 0..255 codes; round-trip error bounded by half a step") {
    val df = Seq(Array(1.0f, -5.0f), Array(3.0f, 2.0f), Array(-2.0f, 0.0f)).toDF("v")
    val (mn, mx) = Quantization.fitMinMax(df, "v")
    val codes = df.select(Quantization.quantize(col("v").cast("array<double>"), mn, mx).as("q"))
      .as[Array[Double]].collect()
    assert(codes.flatten.forall(c => c >= 0 && c <= 255 && c == math.floor(c)))
    val rt = df.select(col("v"),
      Quantization.dequantize(
        Quantization.quantize(col("v").cast("array<double>"), mn, mx), mn, mx).as("dq"))
      .as[(Array[Float], Array[Double])].collect()
    rt.foreach { case (orig, dq) =>
      orig.zip(dq).zipWithIndex.foreach { case ((o, d), i) =>
        val step = (mx(i) - mn(i)) / 255.0
        assert(math.abs(o - d) <= step / 2 + 1e-12,
          s"dim $i: |$o - $d| > ${step / 2}")
      }
    }
  }

  test("quantized recall on the embeddings corpus is high but the metric is honest") {
    val r = Quantization.qQuantizedRecall(spark, SfDir).head()
    val recall = r.getDouble(1)
    assert(r.getInt(0) == 10 && recall >= 0.0 && recall <= 1.0)
    // SQ8 on 64-dim loses little: expect most of the exact top-10 back
    assert(recall >= 0.7, s"suspiciously low SQ8 recall: $recall")
  }

  test("binary quantization: candidates beat random, rerank recovers most of top-10") {
    val r = Quantization.qBqRecall(spark, SfDir).head()
    assert(r.getInt(0) == 10 && r.getInt(1) == 100)
    val recall = r.getDouble(2)
    assert(recall >= 0.0 && recall <= 1.0)
    // 100 Hamming candidates out of ~500 vectors: a random 20% subset would
    // keep ~2 of the exact top-10; sign codes must do clearly better
    assert(recall >= 0.5, s"BQ candidates no better than random: recall=$recall")
  }

  test("matryoshka sweep is monotone-ish and exact at full dim") {
    val rows = Quantization.qMatryoshkaRecall(spark, SfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq == Quantization.MatryoshkaDims)
    val byDim = rows.map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(byDim(64) == 1.0, "full-dim arm must reproduce the exact top-10")
    assert(byDim.values.forall(r => r >= 0.0 && r <= 1.0))
    // the synthetic gaussian corpus is not Matryoshka-trained, so no floor
    // on prefix recall — but some prefix arm must retain some signal
    assert(byDim.filterKeys(_ < 64).values.sum > 0.0,
      s"every truncated arm lost the entire top-10: $byDim")
  }
}
