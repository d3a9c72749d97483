package graft.operators.analytics

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark's API lacks as primitives — the as-of
  * join (each probe row ↔ latest build row at-or-before its time, per key)
  * and the interval/range join (points ↔ overlapping windows) — expressed
  * as shuffle-minimal compositions rather than custom physical plans,
  * because the right distributed shapes ARE compositions:
  *
  *  - as-of: union the two streams and take one ordered window pass per
  *    key — ONE shuffle on the key, NO join operator at all. A join-based
  *    plan (point < point range join) devolves to per-key quadratic work;
  *    the union-window form is linear after the sort and is how
  *    kdb/Flink/QuestDB implement it distributed.
  *  - range: explode each window into the fixed-width bins it covers and
  *    equi-join on the bin — the shuffle key is the bin, never a
  *    cross-product; each point lives in exactly one bin so no dedup pass
  *    is needed. Bin width trades explode fan-out (len/width per window)
  *    against per-bin candidate count.
  *
  * Both oracle-checked: DuckDB has native ASOF JOIN and inequality joins,
  * so the driver replays genuine reference semantics, not our plan.
  */
object TemporalJoins extends QueryModule {

  /** Distributed as-of join. For each `probe` row: the latest `build` row
    * with `build.tsCol <= probe.tsCol` and equal `keyCol`, or nulls if no
    * such row. `stateCols` are the build columns carried onto the probe
    * (emitted as `state_<name>`). Build rows must be unique per
    * (key, ts) — pre-aggregate otherwise (ties would be
    * nondeterministic in any engine).
    *
    * Plan: one shuffle on `keyCol`, one in-partition sort, a single
    * running `last(ignoreNulls)` window — no join node. */
  def asOfJoin(probe: DataFrame, build: DataFrame, keyCol: String,
               tsCol: String, stateCols: Seq[String]): DataFrame = {
    val payloadCols = probe.columns.toSeq
    val b = build.select(
      col(keyCol), col(tsCol),
      lit(0).as("_side"), // build sorts BEFORE probe at equal ts: at-or-before
      struct((tsCol +: stateCols).map(col): _*).as("_state"),
      lit(null).cast(probe.schema).as("_payload"))
    val p = probe.select(
      col(keyCol), col(tsCol),
      lit(1).as("_side"),
      lit(null).cast(b.schema("_state").dataType).as("_state"),
      struct(payloadCols.map(col): _*).as("_payload"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = b.unionByName(p)
      .withColumn("_asof", last(col("_state"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val stateOut = col("_asof").getField(tsCol).as(s"state_$tsCol") +:
      stateCols.map(c => col("_asof").getField(c).as(s"state_$c"))
    joined.select(payloadCols.map(c => col(s"_payload.$c").as(c)) ++ stateOut: _*)
  }

  /** Distributed interval join: `points` (with a `ptCol` long) against
    * `windows` (with `startCol` inclusive, `endCol` exclusive, both longs),
    * returning every (point, window) containment pair. `binWidth` must be
    * > 0; windows explode into ceil(len/binWidth)(+1) bins. */
  def rangeJoin(points: DataFrame, windows: DataFrame, ptCol: String,
                startCol: String, endCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // empty windows contain nothing — and would make sequence() descend
    val wb = windows.filter(col(endCol) > col(startCol)).withColumn("_bin",
      explode(sequence(expr(s"$startCol DIV $binWidth"),
        expr(s"($endCol - 1) DIV $binWidth"))))
    val pb = points.withColumn("_bin", expr(s"$ptCol DIV $binWidth"))
    pb.join(wb, pb("_bin") === wb("_bin") &&
        pb(ptCol) >= wb(startCol) && pb(ptCol) < wb(endCol))
      .drop("_bin")
  }

  /** Events with exact integer epoch-µs time (see Tables.eventsNanos). */
  private def eventsUs(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsNanos(spark, dir).withColumn("ts_us", expr("ts DIV 1000"))

  /** As-of join on the event stream: every non-purchase event enriched
    * with the user's latest purchase at-or-before it (the "state of the
    * account when this happened" query). States are pre-aggregated per
    * (user, ts) so the at-or-before winner is well-defined. */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = eventsUs(spark, dir)
    val states = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts_us"))
      .agg(max_by(col("value"), col("event_id")).as("purchase_value"))
    val probes = e.filter(col("event_type") =!= "purchase")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts_us"), col("value"))
    asOfJoin(probes, states, "user_id", "ts_us", Seq("purchase_value"))
      .orderBy("event_id")
  }

  /** 2024-01-01T00:00:00Z in epoch µs — the window grid anchor. */
  val GridBaseUs: Long = 1704067200000000L
  val GridStepUs: Long = 3600L * 1000000L        // a window starts hourly
  val GridBinUs: Long = 1800L * 1000000L         // 30-min blocking bins
  val GridWindows: Int = 1024                    // covers the 30-day corpus

  /** Interval-join rollup: 1024 overlapping maintenance windows (start =
    * base + k·1h, length = (k%3+1)·30min — adjacent windows overlap, so
    * events match up to 2) × the event stream; per-window traffic stats. */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val w = spark.range(GridWindows.toLong).select(
      col("id").as("w_id"),
      (lit(GridBaseUs) + col("id") * GridStepUs).as("w_start"),
      (lit(GridBaseUs) + col("id") * GridStepUs +
        (col("id") % 3 + 1) * GridBinUs).as("w_end"))
    val pts = eventsUs(spark, dir)
      .select(col("user_id"), col("value"), col("ts_us"))
    rangeJoin(pts, w, "ts_us", "w_start", "w_end", GridBinUs)
      .groupBy(col("w_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("value").cast("decimal(25,6)")).cast("double"), 6)
          .as("sum_value"))
      .orderBy("w_id")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> (qAsofJoin _),
    "q_range_join" -> (qRangeJoin _))

  override def oracles: Map[String, String] = Map(
    // DuckDB's native ASOF JOIN replays the reference semantics directly —
    // it never sees our union-window plan
    "q_asof_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, value, epoch_ns(ts) // 1000 AS ts_us
        |  FROM events),
        |st AS (
        |  SELECT user_id, ts_us, arg_max(value, event_id) AS purchase_value
        |  FROM e WHERE event_type = 'purchase' GROUP BY 1, 2),
        |pr AS (SELECT * FROM e WHERE event_type <> 'purchase')
        |SELECT pr.event_id, pr.user_id, pr.event_type, pr.ts_us, pr.value,
        |  st.ts_us AS state_ts_us, st.purchase_value AS state_purchase_value
        |FROM pr ASOF LEFT JOIN st
        |  ON pr.user_id = st.user_id AND pr.ts_us >= st.ts_us
        |ORDER BY pr.event_id""".stripMargin,
    // plain inequality containment join — the semantics, not the binning
    "q_range_join" ->
      s"""WITH e AS (
         |  SELECT user_id, value, epoch_ns(ts) // 1000 AS ts_us FROM events),
         |w AS (
         |  SELECT k AS w_id, $GridBaseUs + k * $GridStepUs AS w_start,
         |    $GridBaseUs + k * $GridStepUs + (k % 3 + 1) * $GridBinUs AS w_end
         |  FROM (SELECT unnest(range(0, $GridWindows)) AS k))
         |SELECT w.w_id, count(*) AS n_events,
         |  count(DISTINCT e.user_id) AS n_users,
         |  round(CAST(sum(CAST(e.value AS DECIMAL(25,6))) AS DOUBLE), 6) AS sum_value
         |FROM w JOIN e ON e.ts_us >= w.w_start AND e.ts_us < w.w_end
         |GROUP BY w.w_id ORDER BY w.w_id""".stripMargin)
}
