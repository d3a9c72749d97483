package graft.operators.analytics

import graft.SparkSpec

class EventAnalyticsSpec extends SparkSpec {

  test("funnel: stage counts never increase, ratios consistent") {
    val rows = AnalyticsQueries.qEventFunnel(spark, SfDir).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("1_view", "2_click_within_1h", "3_purchase_within_24h"))
    val ns = rows.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => b <= a },
      s"a funnel stage cannot gain users: ${ns.toSeq}")
    assert(rows.head.getDouble(2) == 1.0, "first stage converts from itself")
    rows.foreach(r => assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
  }

  test("retention: offset-0 is 1.0, every cell bounded by cohort size") {
    val rows = AnalyticsQueries.qRetentionCohorts(spark, SfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (off, nActive, size, ret) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nActive <= size, "active users cannot exceed the cohort")
      assert(ret >= 0.0 && ret <= 1.0)
      if (off == 0) assert(ret == 1.0,
        "every cohort member is by definition active in their first week")
    }
    // cohort sizes must cover every first-time high-value purchaser once
    val firstWeeks = rows.filter(_.getLong(1) == 0)
    assert(firstWeeks.map(_.getLong(3)).sum ==
      firstWeeks.map(_.getLong(2)).sum)
  }

  test("event anomaly: every flagged row really exceeds 2 sigma, both tails present") {
    val rows = AnalyticsQueries.qEventAnomaly(spark, SfDir).collect()
    assert(rows.nonEmpty, "the synthetic stream has hourly bursts — expect alerts")
    rows.foreach { r =>
      val (n, mean, std, z) =
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(math.abs(z) > 2, s"unflagged-magnitude row leaked: z=$z")
      // z must re-derive from the reported stats (which are themselves
      // rounded to 1e-6, so the re-derivation matches only to ~1e-3)
      assert(approx(z, (n - mean) / std, 1e-3),
        s"z=$z inconsistent with (n=$n, mean=$mean, std=$std)")
    }
  }
}
