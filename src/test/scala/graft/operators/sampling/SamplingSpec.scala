package graft.operators.sampling

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  test("hash split partitions every doc exactly once, roughly 80/10/10") {
    val out = SamplingQueries.qSampleSplit(spark, SfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = Tables.documents(spark, SfDir).count()
    assert(out.values.sum == total, "splits must cover every doc exactly once")
    assert(out.keySet == Set("train", "val", "test"))
    val trainFrac = out("train").toDouble / total
    assert(trainFrac > 0.6 && trainFrac < 0.95,
      s"hash split badly skewed: train fraction $trainFrac")
  }

  test("hash split is deterministic across runs") {
    val a = SamplingQueries.qSampleSplit(spark, SfDir).collect().toSeq
    val b = SamplingQueries.qSampleSplit(spark, SfDir).collect().toSeq
    assert(a == b)
  }

  test("quota sample keeps at most Quota docs per source, from that source") {
    val rows = SamplingQueries.qQuotaSample(spark, SfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= SamplingQueries.Quota,
        s"source ${r.getString(0)} kept ${r.getLong(1)} > quota")
    }
    // sources with ≥ quota docs keep exactly quota
    val counts = Tables.documents(spark, SfDir)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val avail = counts(r.getString(0))
      val expected = math.min(avail, SamplingQueries.Quota.toLong)
      assert(r.getLong(1) == expected,
        s"source ${r.getString(0)}: kept ${r.getLong(1)}, expected $expected")
    }
  }

  test("token packing conserves tokens and respects the per-bin shape") {
    val docs = Tables.documents(spark, SfDir)
      .select(col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
    val totals = docs.groupBy("source").agg(sum("n_tok").as("tot"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val maxDocTok = docs.agg(max("n_tok")).head().getLong(0)
    val rows = SamplingQueries.qTokenPacking(spark, SfDir).collect()
    assert(rows.nonEmpty)
    val budget = SamplingQueries.BinBudget
    rows.foreach { r =>
      val (src, nBins, maxBin, total) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(total == totals(src), s"$src: packed $total of ${totals(src)} tokens")
      assert(maxBin <= total)
      // bin ids are floor(tokens-before/budget) over [0, total), so at most
      // ceil(total/budget) distinct bins; since no bin can exceed
      // budget + one straddling doc, at least total/(budget + maxDocTok)
      val maxBins = (total + budget - 1) / budget
      val minBins = (total + budget + maxDocTok - 1) / (budget + maxDocTok)
      assert(nBins >= minBins && nBins <= maxBins,
        s"$src: $nBins bins for $total tokens (bounds [$minBins, $maxBins])")
    }
  }

  test("packing bins never exceed budget plus one straddling doc") {
    // re-derive per-bin totals: each bin holds ≤ budget tokens of "starts
    // before the boundary" plus the tail of its last doc
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val maxDocTok = Tables.documents(spark, SfDir)
      .select(size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
      .agg(max("n_tok")).head().getLong(0)
    val binTotals = Tables.documents(spark, SfDir)
      .select(col("source"), col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("bin", expr(s"(cum - n_tok) div ${SamplingQueries.BinBudget}"))
      .groupBy("source", "bin").agg(sum("n_tok").as("bin_tokens"))
      .agg(max("bin_tokens")).head().getLong(0)
    assert(binTotals <= SamplingQueries.BinBudget + maxDocTok,
      s"a bin holds $binTotals tokens > budget + one max doc ($maxDocTok)")
  }
}
