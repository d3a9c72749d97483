package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  test("streaming window agg equals batch date_trunc agg") {
    val stream = StreamingQueries.qEventsWindowStream(spark, SfDir)
      .select("hour_ts", "event_type", "n_events").collect().toSet
    val batch = graft.operators.analytics.AnalyticsQueries.qEventsWindow(spark, SfDir)
      .select("hour_ts", "event_type", "n_events").collect().toSet
    assert(stream == batch)
  }

  test("sessions: gaps within a session ≤ 30 min, counts sum to event count") {
    val s = StreamingQueries.qSessionize(spark, SfDir)
    val nEvents = graft.Tables.events(spark, SfDir).count()
    assert(s.agg(sum("n_events")).head().getLong(0) == nEvents)
    assert(s.filter(col("end_sec") < col("start_sec")).count() == 0)
    // consecutive sessions of the same user must be > gap apart
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("session_id")
    val bad = s.withColumn("prev_end", lag("end_sec", 1).over(w))
      .filter(col("prev_end").isNotNull &&
        col("start_sec") - col("prev_end") <= StreamingQueries.SessionGapSec)
      .count()
    assert(bad == 0, "sessions closer than the gap must have been merged")
  }

  test("streaming dedup collapses the doubled stream to batch counts") {
    val dedup = StreamingQueries.qStreamDedup(spark, SfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = graft.Tables.events(spark, SfDir)
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dedup == batch)
  }

  test("streaming quota leaderboard converges to the batch quota sample") {
    val streamed = StreamingQueries.qQuotaStream(spark, SfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val batch = graft.operators.sampling.SamplingQueries
      .qQuotaSample(spark, SfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(streamed == batch,
      "2-batch leaderboard must equal the batch top-k (prefix-mergeable)")
    // bounded state: never more than Quota kept per source
    assert(streamed.forall(_._2 <= graft.operators.sampling.SamplingQueries.Quota))
  }

  test("streaming funnel equals the batch funnel row-for-row") {
    val stream = StreamingQueries.qFunnelStream(spark, SfDir).collect()
    val batch = graft.operators.analytics.AnalyticsQueries
      .qEventFunnel(spark, SfDir).collect()
    assert(stream.length == 3 && batch.length == 3)
    stream.zip(batch).foreach { case (s, b) =>
      assert(s.getString(0) == b.getString(0))
      assert(s.getLong(1) == b.getLong(1),
        s"${s.getString(0)}: stream ${s.getLong(1)} != batch ${b.getLong(1)}")
      assert(s.getDouble(2) == b.getDouble(2))
    }
  }

  test("streaming drift monitor equals the batch PSI row-for-row") {
    val stream = StreamingQueries.qDriftStream(spark, SfDir).collect()
    val batch = graft.operators.analytics.AnalyticsQueries
      .qEmbeddingDrift(spark, SfDir).collect()
    assert(stream.length == 10 && batch.length == 10)
    stream.zip(batch).foreach { case (s, b) =>
      assert(s.getInt(0) == b.getInt(0))
      assert(s.getLong(1) == b.getLong(1) && s.getLong(2) == b.getLong(2),
        s"bin ${s.getInt(0)}: stream counts != batch counts")
      assert(s.getDouble(3) == b.getDouble(3) && s.getDouble(4) == b.getDouble(4))
    }
  }
}
