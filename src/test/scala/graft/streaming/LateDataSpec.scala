package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, TestGroupState}

/** Late/out-of-order streaming semantics, pinned explicitly. The staged
  * corpora every streaming query reads are ts-ordered by construction,
  * so watermark behavior was never exercised by the oracles — this spec
  * injects late rows into hand-staged microbatches and pins the
  * drop/keep matrix:
  *
  *  - Update mode + watermark: dropping lags ONE batch — Spark's
  *    two-watermark design (SPARK-40025) filters late events with the
  *    PREVIOUS batch's watermark while evicting state with the current
  *    one, so a late row arriving in the batch right after the
  *    watermark advanced is still accepted; a row arriving once the
  *    late-events watermark has passed its window is dropped silently
  *    (and its evicted window is never resurrected).
  *  - Complete mode (the production q_events_window_stream /
  *    q_props_stream contract): nothing is ever dropped — which is WHY
  *    those queries match their batch oracles regardless of arrival
  *    order.
  *  - Sessionize: in-batch disorder is invisible (in-memory event-time
  *    sort); across batches the per-batch flush contract applies (see
  *    the sessionize scaladoc).
  */
class LateDataSpec extends SparkSpec {
  import spark.implicits._

  private val UsPerSec = 1000000L
  private val Hour = 3600L * UsPerSec
  /** Hour-aligned epoch µs (1700002800 s is divisible by 3600). */
  private val H0 = 1700002800L * UsPerSec

  private def evDf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("us", "event_type")
      .select(timestamp_micros(col("us")).as("ts"), col("event_type"))

  private def stageBatches(name: String, batches: Seq[DataFrame]): String = {
    val stage = java.nio.file.Files.createTempDirectory(s"graft_late_$name")
    graft.Fs.deleteAtExit(stage)
    graft.Fs.stageParts(stage, batches)
    stage.toString
  }

  /** Hourly count windows over a staged one-file-per-batch stream (the
    * q_events_window_stream shape with the batch boundary under test
    * control via maxFilesPerTrigger=1). */
  /** Every (window-start, n) row the sink saw — Update mode re-emits a
    * window's row on change, so the full multiset exposes both the final
    * count (max) and any resurrection of an evicted window. */
  private def runWindowedRows(stageDir: String, name: String, mode: OutputMode,
                              watermark: Option[String]): Seq[(Long, Long)] = {
    val schema = spark.read.parquet(stageDir).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stageDir)
    val wm = watermark.fold(src)(d => src.withWatermark("ts", d))
    val agg = wm.groupBy(window(col("ts"), "1 hour")).agg(count(lit(1)).as("n"))
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q = agg.writeStream.outputMode(mode).format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.table(name)
      .select(col("window.start").cast("long").as("win_start_sec"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  private def runWindowed(stageDir: String, name: String, mode: OutputMode,
                          watermark: Option[String]): Map[Long, Long] =
    runWindowedRows(stageDir, name, mode, watermark)
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap

  /** Batch 0 fills hour 0 with 3 rows, then advances event time to
    * hour 3 — with a 1 h watermark delay the watermark lands at
    * H0+2h+60s, closing the hour-0 window before batch 1 arrives. */
  private lazy val batch0 = evDf(Seq(
    (H0 + 60 * UsPerSec, "view"), (H0 + 120 * UsPerSec, "view"),
    (H0 + 180 * UsPerSec, "view"),
    (H0 + 3 * Hour + 60 * UsPerSec, "view")))

  /** Batch 1 injects one row behind the just-advanced watermark (hour-0
    * window — accepted: the late-events filter still carries the
    * previous, 1970 watermark) and one late-but-open row (hour-2
    * window). Batch 2 injects another hour-0 row — by now the
    * late-events watermark HAS advanced past the window: dropped. */
  private lazy val batch1 = evDf(Seq(
    (H0 + 300 * UsPerSec, "late_next_batch"),
    (H0 + 2 * Hour + 90 * UsPerSec, "late_within")))
  private lazy val batch2 = evDf(Seq(
    (H0 + 400 * UsPerSec, "late_two_batches")))

  test("Update + watermark: drop lags one batch, then is silent and final") {
    val stage = stageBatches("wm", Seq(batch0, batch1, batch2))
    val rows = {
      val m = runWindowedRows(stage, "late_update", OutputMode.Update(), Some("1 hour"))
      m.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    }
    val h0 = H0 / UsPerSec
    // batch-1 late row ACCEPTED (filter used the previous watermark)...
    assert(rows(h0).max === 4L, s"lag-one late row was not counted: $rows")
    // ...batch-2 too-late row DROPPED: the evicted window never re-emits
    // (no resurrected 1-count row, no count 5)
    assert(rows(h0).toSet === Set(3L, 4L), s"too-late row resurfaced: $rows")
    assert(rows(h0 + 2 * 3600).max === 1L)
    assert(rows(h0 + 3 * 3600).max === 1L)
  }

  test("Complete mode (production windowed-agg contract): ALL late rows kept") {
    val out = runWindowed(stageBatches("complete", Seq(batch0, batch1, batch2)),
      "late_complete", OutputMode.Complete(), None)
    val h0 = H0 / UsPerSec
    assert(out(h0) === 5L, s"late rows dropped in Complete mode: $out")
    assert(out(h0 + 2 * 3600) === 1L)
    assert(out(h0 + 3 * 3600) === 1L)
  }

  // ---- sessionize order/lateness contract --------------------------------

  private def runSessionize(evs: Seq[StreamingQueries.Ev]): Seq[StreamingQueries.Session] = {
    val st = TestGroupState.create[StreamingQueries.Session](
      org.apache.spark.api.java.Optional.empty(), GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(),
      hasTimedOut = false)
    StreamingQueries.sessionize(1L, evs.iterator, st).toSeq
  }

  test("sessionize: in-batch disorder is invisible (event-time sort restores order)") {
    val ordered = Seq(
      StreamingQueries.Ev(1L, 1000L, 1L, 1.0),
      StreamingQueries.Ev(1L, 1200L, 2L, 2.5),
      StreamingQueries.Ev(1L, 1300L, 3L, 0.5),
      StreamingQueries.Ev(1L, 5000L, 4L, 1.0), // > 1800 s gap → new session
      StreamingQueries.Ev(1L, 5100L, 5L, 3.0))
    val shuffled = Seq(ordered(3), ordered(0), ordered(4), ordered(2), ordered(1))
    val a = runSessionize(ordered)
    val b = runSessionize(shuffled)
    assert(a === b)
    assert(a.map(_.session_id) === Seq(1L, 2L))
    assert(a.head.n_events === 3L && a.last.n_events === 2L)
  }

  test("sessionize: per-batch flush — a later batch's late event starts a fresh session") {
    val first = runSessionize(Seq(
      StreamingQueries.Ev(1L, 1000L, 1L, 1.0),
      StreamingQueries.Ev(1L, 1200L, 2L, 1.0)))
    assert(first.map(_.session_id) === Seq(1L))
    // the state was flushed+removed at batch end; a late event arriving in
    // the next batch does NOT merge backwards — it opens session 1 anew
    // (the explicit single-batch staging contract)
    val late = runSessionize(Seq(StreamingQueries.Ev(1L, 1100L, 3L, 1.0)))
    assert(late.map(_.session_id) === Seq(1L))
    assert(late.head.start_sec === 1100L && late.head.n_events === 1L)
  }
}
