package graft.operators.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of and range join semantics: handcrafted tie/boundary cases, then
  * brute-force twins over the real events table. */
class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asOfJoin: at-or-before picks the latest state, ties included") {
    val build = Seq((1L, 10L, "s10"), (1L, 20L, "s20"), (2L, 5L, "x5"))
      .toDF("k", "t", "s")
    val probe = Seq((1L, 9L, "a"), (1L, 10L, "b"), (1L, 25L, "c"),
      (2L, 4L, "d"), (3L, 99L, "e")).toDF("k", "t", "tag")
    val out = TemporalJoins.asOfJoin(probe, build, "k", "t", Seq("s"))
      .orderBy("k", "t")
      .select($"tag", $"state_t", $"state_s").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getString(2)))
    assert(out.toSeq == Seq(
      ("a", -1L, null),   // before any state
      ("b", 10L, "s10"),  // state at EXACTLY probe ts is taken
      ("c", 20L, "s20"),  // latest of several
      ("d", -1L, null),   // other key's state invisible
      ("e", -1L, null)))  // key with no states at all
  }

  test("asOfJoin plans one shuffle and no join operator") {
    val e = TemporalJoins.qAsofJoin(spark, SfDir)
    val plan = e.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected join-free plan:\n$plan")
  }

  test("qAsofJoin matches a brute-force driver twin on real events") {
    val rows = graft.Tables.eventsNanos(spark, SfDir)
      .select($"event_id", $"user_id", $"event_type", expr("ts DIV 1000"), $"value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    val states = rows.filter(_._3 == "purchase")
      .groupBy(e => (e._2, e._4))
      .map { case ((u, t), es) => (u, t, es.maxBy(_._1)._5) }.toArray
    val expected = rows.filter(_._3 != "purchase").sortBy(_._1).map { e =>
      val prior = states.filter(s => s._1 == e._2 && s._2 <= e._4)
      if (prior.isEmpty) (e._1, None, None)
      else { val best = prior.maxBy(_._2); (e._1, Some(best._2), Some(best._3)) }
    }
    val got = TemporalJoins.qAsofJoin(spark, SfDir).collect().map { r =>
      (r.getLong(0),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        if (r.isNullAt(6)) None else Some(r.getDouble(6)))
    }
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) => assert(g == e, s"got $g want $e") }
  }

  test("rangeJoin: start inclusive, end exclusive, multi-bin window matched once") {
    val w = Seq((0L, 100L, 400L), (1L, 350L, 380L)).toDF("w_id", "s", "e")
    val p = Seq(99L, 100L, 399L, 400L, 360L).toDF("t")
    // bin width 50 → window 0 spans bins 2..7 (6 bins)
    val out = TemporalJoins.rangeJoin(p, w, "t", "s", "e", 50L)
      .groupBy($"w_id", $"t").count().collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(out.values.forall(_ == 1L), s"duplicate containment rows: $out")
    assert(out.keySet == Set((0L, 100L), (0L, 399L), (0L, 360L), (1L, 360L)))
  }

  test("rangeJoin drops empty windows instead of descending sequences") {
    val w = Seq((0L, 100L, 100L)).toDF("w_id", "s", "e")
    val p = Seq(100L).toDF("t")
    assert(TemporalJoins.rangeJoin(p, w, "t", "s", "e", 50L).count() == 0)
  }

  test("q_asof_stream equals the batch as-of join across microbatches") {
    val stream = graft.streaming.StreamingQueries.qAsofStream(spark, SfDir)
    val batch = TemporalJoins.qAsofJoin(spark, SfDir)
    assert(stream.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(stream).count() == 0)
    // the state store genuinely crosses batch boundaries: some probe in a
    // later microbatch is enriched by a purchase from batch 1 (the staging
    // splits at row terciles of the (ts, event_id) order)
    val ts = graft.Tables.eventsNanos(spark, SfDir)
      .select(expr("ts DIV 1000")).as[Long].collect().sorted
    val b1max = ts(ts.length / 3) // the staging's value-based batch-1 cut
    assert(stream.filter($"ts_us" > b1max && $"state_ts_us" <= b1max).count() > 0)
  }

  test("qRangeJoin matches a brute-force driver twin on real events") {
    val pts = graft.Tables.eventsNanos(spark, SfDir)
      .select($"user_id", $"value", expr("ts DIV 1000").as("ts_us")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val expected = (0L until TemporalJoins.GridWindows.toLong).flatMap { k =>
      val s = TemporalJoins.GridBaseUs + k * TemporalJoins.GridStepUs
      val e = s + (k % 3 + 1) * TemporalJoins.GridBinUs
      val in = pts.filter(p => p._3 >= s && p._3 < e)
      if (in.isEmpty) None
      else Some((k, in.length.toLong, in.map(_._1).distinct.length.toLong,
        BigDecimal(in.map(p => BigDecimal(p._2)).sum.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val got = TemporalJoins.qRangeJoin(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == expected,
      s"first diff: ${got.toSeq.zip(expected).find(x => x._1 != x._2)}")
  }
}
