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

  test("mixture sampling halves the dominant language, keeps the rest") {
    val rows = SamplingQueries.qMixtureSample(spark, SfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { case (lang, (before, after)) =>
      assert(after <= before)
      if (lang == "en") {
        val frac = after.toDouble / before
        assert(frac > 0.3 && frac < 0.7, s"en kept $frac, expected ~0.5")
      } else assert(after == before, s"$lang should be kept whole")
    }
  }

  test("decontamination summary is consistent with the split and bounded") {
    val r = SamplingQueries.qDecontaminate(spark, SfDir).head()
    val (nTrain, nEval, nContam, rate) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    val split = SamplingQueries.qSampleSplit(spark, SfDir).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(nTrain == split("train") && nEval == split("test"))
    assert(nContam >= 0 && nContam <= nTrain)
    assert(rate >= 0.0 && rate <= 1.0)
  }

  test("a train doc sharing a long span with an eval doc is flagged") {
    // the winnowing guarantee: a shared span of >= k + w - 1 chars yields
    // a shared fingerprint — verify on the expression the query uses
    import graft.functions.RollingFingerprint
    import spark.implicits._
    val span = "x" * (SamplingQueries.DecontamK + SamplingQueries.DecontamW - 1)
    val df = Seq(
      ("train prefix words before the span " + span),
      (span + " eval suffix words after the span")).toDF("text")
      .select(RollingFingerprint(col("text"),
        SamplingQueries.DecontamK, SamplingQueries.DecontamW).as("fps"))
    val Array(a, b) = df.collect().map(_.getSeq[Long](0).toSet)
    assert(a.intersect(b).nonEmpty,
      "shared >= k+w-1 span must produce a shared fingerprint")
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

  test("temperature mixture: √n weights upweight small domains, fracs " +
      "normalize, acceptance tracks the target rate") {
    val rows = SamplingQueries.qTemperatureMix(spark, SfDir).collect()
    assert(rows.nonEmpty)
    // fracs sum to ~1 across domains
    val fracSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(fracSum - 1.0) < 1e-4, s"fracs sum to $fracSum")
    // temperature flattening: the TARGET acceptance rate
    // min(1, (N/2)·frac/n) falls as the domain grows — smaller domains
    // keep proportionally more
    val bySize = rows.sortBy(_.getLong(1))
    val sizes = bySize.map(_.getLong(1))
    val target = bySize.map(r => math.min(1.0,
      sizes.sum / 2.0 * r.getDouble(3) / r.getLong(1)))
    target.sliding(2).foreach { case Array(a, b) =>
      assert(a >= b - 1e-12, "target acceptance must fall as domain grows")
    }
    // realized rate within hash noise of target (binomial-ish bound)
    bySize.zip(target).foreach { case (r, t) =>
      val n = r.getLong(1)
      val realized = r.getLong(4).toDouble / n
      val tol = 4 * math.sqrt(math.min(t, 1.0) / n) + 4.0 / n
      assert(math.abs(realized - math.min(t, 1.0)) <= tol,
        s"${r.getString(0)}: realized $realized vs target $t (n=$n)")
    }
  }

  test("DSIR bucket hash: char-Horner fold matches the cross-engine constant") {
    import spark.implicits._
    // DuckDB replay of the same fold over 'hello wo' yields bucket 33
    val b = Seq("hello wo").toDF("f").selectExpr(
      "aggregate(sequence(1, length(f)), 0L, (acc, i) -> (acc * 31 + ascii(substring(f, i, 1))) % 1000003) % 64")
      .head().getLong(0)
    assert(b == 33L, s"bucket hash drifted from the oracle arithmetic: $b")
  }

  test("DSIR weights: fused single-pass counts are row-identical to the " +
      "three-pass formulation (DsirEquivalence)") {
    // Independent reimplementation of the pre-r16 pipeline (separate
    // totals agg + raw groupBy + filtered tgt groupBy, bucket hash via
    // the oracle's SQL HOF instead of HornerBucket) — the fused query
    // must reproduce it cell for cell.
    val B = SamplingQueries.DsirBuckets
    val ws = filter(split(trim(lower(col("text"))),
      graft.operators.text.TextQueries.WsRe), w => length(w) > 0)
    val base = Tables.documents(spark, SfDir)
      .select(col("doc_id"), col("lang"), ws.as("ws"))
    val uni = base.select(col("doc_id"), col("lang"), explode(col("ws")).as("f"))
    val bi = base.filter(size(col("ws")) > 1)
      .select(col("doc_id"), col("lang"), explode(expr(
        "transform(sequence(1, size(ws) - 1), i -> concat(ws[i-1], ' ', ws[i]))")).as("f"))
    val feats = uni.unionByName(bi).withColumn("bkt", expr(
      s"aggregate(sequence(1, length(f)), 0L, (acc, i) -> (acc * 31 + ascii(substring(f, i, 1))) % 1000003) % $B"))
      .cache()
    val totRow = feats
      .agg(count(lit(1)), count(when(col("lang") === "en", 1))).head()
    val (tr, tt) = (totRow.getLong(0), totRow.getLong(1))
    val raw = feats.groupBy("bkt").agg(count(lit(1)).as("cr"))
    val tgt = feats.filter(col("lang") === "en")
      .groupBy("bkt").agg(count(lit(1)).as("ct"))
    val lrs = spark.range(B).select(col("id").as("bkt"))
      .join(raw, Seq("bkt"), "left").join(tgt, Seq("bkt"), "left")
      .select(col("bkt"),
        round(log((coalesce(col("ct"), lit(0L)) + 1).cast("double") * lit(tr + B)
          / ((coalesce(col("cr"), lit(0L)) + 1) * lit(tt + B))), 6)
          .cast("decimal(9,6)").as("lr6"))
    val expected = feats.join(broadcast(lrs), Seq("bkt"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_feats"),
        round(sum(col("lr6")).cast("double"), 6).as("logw"))
      .orderBy(col("logw").desc, col("doc_id"))
      .limit(25).collect().toSeq
    val actual = SamplingQueries.qDsirWeights(spark, SfDir).collect().toSeq
    feats.unpersist()
    assert(actual == expected,
      s"fused DSIR diverged from the three-pass formulation:\n" +
        s"  fused:     ${actual.take(3)}\n  three-pass: ${expected.take(3)}")
  }

  test("DSIR weights: ranked output favors the target (English) slice") {
    val rows = SamplingQueries.qDsirWeights(spark, SfDir).collect()
    assert(rows.length == 25)
    val ws = rows.map(_.getDouble(3))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b }, "logw not descending")
    val enShare = rows.count(_.getString(1) == "en").toDouble / rows.length
    val corpus = Tables.documents(spark, SfDir)
    val corpusEn = corpus.filter(org.apache.spark.sql.functions.col("lang") === "en").count().toDouble / corpus.count()
    assert(enShare > corpusEn,
      s"top-25 en share $enShare not above corpus share $corpusEn — importance weights carry no signal")
  }
}
