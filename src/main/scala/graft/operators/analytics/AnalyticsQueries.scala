package graft.operators.analytics

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Descriptive-analytics operators re-expressing the reference notebooks'
  * pandas groupby/merge patterns (SURVEY §2 "Descriptive analytics") as
  * declarative Spark plans: partial-aggregate-friendly groupBys, broadcast
  * joins to dim tables, window functions instead of driver-side loops.
  *
  * Scale notes: every query here is a single shuffle on its natural grouping
  * key (Catalyst map-side partial aggregation), or a window over a
  * partitionable key — no driver-side iteration, no collect.
  */
object AnalyticsQueries extends QueryModule {

  /** Exact integer micro-unit output cast, failing LOUDLY on overflow.
    * The decimal sum itself holds ~1e38, but the BIGINT output column
    * tops out at ~9.2e18 micro-units — and the largest q1_agg group is
    * already ~1.1e17 at sf1, so Long.MaxValue is reached near sf≈80: a
    * REAL boundary for a 100 TB corpus, not a theoretical one (r9 advice
    * corrected the earlier "~1e7 TB" headroom estimate). With ANSI off,
    * Spark's overflowing decimal→long cast yields NULL while DuckDB
    * errors — a silent engine divergence — so the guard turns overflow
    * into a loud Spark-side failure; past that scale, emit the
    * decimal(38,0) itself instead of a BIGINT. */
  private def microLong(s: Column): Column =
    when(assert_true(abs(s) <= lit(Long.MaxValue),
      lit("micro-unit sum overflows BIGINT — emit the decimal instead")).isNull,
      s.cast("long"))

  /** TPC-H Q1-style rollup — flagship scan+agg (maps the reference's global
    * chunk statistics, analisis-informe.ipynb:130-240). */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        microLong(sum((col("l_quantity").cast("decimal(18,2)") * lit(1000000)).cast("decimal(20,0)")))
          .as("sum_qty_micro"),
        microLong(sum((col("l_extendedprice").cast("decimal(18,2)") * lit(1000000)).cast("decimal(20,0)")))
          .as("sum_base_price_micro"),
        microLong(sum(((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)") * lit(1000000)).cast("decimal(20,0)")))
          .as("sum_disc_price_micro"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Revenue/discount profile per (returnflag, linestatus) with averages —
    * the avg/ratio flavor of the notebook stats. */
  // sum_charge is reported in exact integer MICRO-units (the
  // q_covariance discipline): at sf1 magnitude (~1e11) a double's ulp
  // (1.5e-5) exceeds the 6-decimal grain, and the final DECIMAL→DOUBLE
  // cast of the (identical) decimal sums rounded to ADJACENT doubles in
  // the two engines — found by the round-9 sf1 oracle pass. Per-row
  // quantization is unchanged; only the output representation is exact
  // now. Overflow headroom: see [[microLong]] — BIGINT output saturates
  // near sf≈80, and the guard makes that loud instead of silently null.
  def qRevenueAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        microLong(sum(((col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
          .cast("decimal(18,6)") * lit(1000000)).cast("decimal(20,0)")))
          .as("sum_charge_micro"),
        (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") / count(lit(1)))
          .as("avg_qty"),
        count(lit(1)).as("n_lines"))
      .orderBy("l_returnflag")

  /** Multi-level ROLLUP totals — the OLAP subtotal/grand-total shape
    * (detail → per-flag → grand) in ONE pass: Spark's rollup is an
    * Expand (3 rows per input here) into a single partial-agg shuffle,
    * not three scans; DuckDB replays it with GROUP BY ROLLUP. Group
    * levels are disambiguated by grouping_id (bit conventions match) and
    * null group keys are coalesced to 'ALL' so the hash compare never
    * sees engine null-ordering. Money sums are exact integer micro-units
    * (see the [[qRevenueAgg]] note — the final DECIMAL→DOUBLE cast is
    * 1-ulp engine-divergent once sums reach 1e11). */
  def qRollupRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("n_lines"),
        microLong(sum(((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)") * lit(1000000)).cast("decimal(20,0)")))
          .as("revenue_micro"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
        col("gid").cast("long").as("gid"), col("n_lines"), col("revenue_micro"))
      .orderBy("gid", "rflag", "lstatus")

  /** Half-life (hours) of the decayed-mass monitor. */
  val DecayHalfLifeH = 24.0

  /** Exponentially TIME-DECAYED event mass per type — the recency-weighted
    * rollup freshness-sensitive monitors keep (EWMA-style: yesterday's
    * events count half as much as now's at a 24 h half-life). Per row the
    * weight is value·exp(−λ·Δh) with Δh hours to the corpus's newest
    * event: Δµs is exact integer arithmetic (the reference instant is a
    * driver-read 8-byte max, embedded as a literal; the oracle recomputes
    * the same exact max), the transcendental is per-row double (identical
    * both engines at the rounded scale — the q_unigram_logprob ln
    * precedent), and the mass is a round-then-DECIMAL(25,6) sum. One
    * map-side pass + one partial-agg shuffle on event_type. */
  def qDecayedMass(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_type"), col("value"), unix_micros(col("ts")).as("us"))
    val tmaxRow = e.agg(max(col("us"))).head()
    if (tmaxRow.isNullAt(0)) {
      // empty events table: max is NULL; return the (empty) grouped frame
      // instead of NPE-ing on the driver read
      return e.groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), lit(0.0).as("decayed_mass"))
        .orderBy("event_type")
    }
    val tmax = tmaxRow.getLong(0)
    val lambda = math.log(2.0) / DecayHalfLifeH
    val dh = (lit(tmax) - col("us")).cast("double") / lit(3600000000.0)
    val w6 = round(col("value") * exp(lit(-lambda) * dh), 6)
    e.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(w6.cast("decimal(25,6)")).cast("double").as("decayed_mass"))
      .orderBy("event_type")
  }

  /** Join+group across fact and dims (customer→orders→lineitem→nation) —
    * revenue per nation. Nation/region are broadcast (dim-sized at any SF). */
  def qJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        microLong(sum(((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)") * lit(1000000)).cast("decimal(20,0)")))
          .as("revenue_micro"),
        count(lit(1)).as("n_lines"))
      .orderBy("n_name")
  }

  /** Top-3 orders per market segment — window/top-n per group (the
    * notebook's "top documents per cluster" pattern). */
  def qWindowTopn(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.join(c, o("o_custkey") === c("c_custkey"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("c_mktsegment"), col("rk"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("c_mktsegment", "rk")
  }

  /** q_window_topn's semantics through the custom TopKPerGroup physical
    * operator (graft.plans) — bounded per-group heaps instead of a full
    * window sort; identical oracle proves the operator's row_number
    * contract. Descending order is expressed by negating the sort key. */
  def qTopkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val joined = o.join(c, o("o_custkey") === c("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("neg_price", negate(col("o_totalprice")))
    graft.plans.TopKPerGroup(joined,
      groupCols = Seq("c_mktsegment"),
      orderCols = Seq("neg_price", "o_orderkey"),
      k = 3)
      .select(col("c_mktsegment"), col("rk"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("c_mktsegment", "rk")
  }

  /** 3σ envelopes for the sketch grading booleans. HLL register layouts
    * are engine-internal, so the raw estimates can never hash-match a
    * DuckDB replay — but their ERROR BOUND is a contract, and a
    * within-envelope BOOLEAN is deterministic and oracle-assertable
    * (the oracle emits literal TRUE — r14 verdict #7). 3σ of the
    * declared rsd (≈0.3% breach odds per group on a fresh corpus, vs
    * the 2σ band SketchSpec measures at the gate corpora): a failed
    * hash on these rows now means the sketch broke its bound. */
  private val HllGroupBand = 0.15  // approx_count_distinct rsd 0.05 × 3
  private val HllUnionBand = 0.05  // datasketches lgK=12 rsd ≈1.6% × 3

  /** Sketch aggregates — the approximate statistics an OLAP engine leans
    * on at 100 TB (HLL++ distinct counts, t-digest-style quantiles via
    * approx_percentile). Oracle-checked since r15 via twin substitution
    * (r14 verdict #7): the row carries the EXACT distincts plus the
    * deterministic KMV estimate (the [[KmvSketch]] kernel — replayed
    * hash-exact in SQL), while the engine-specific HLL++ /
    * percentile_approx estimates are graded as within-envelope booleans
    * the oracle asserts TRUE: HLL inside 3σ of its declared rsd, the
    * GK quantile inside its rank-error band (accuracy 10000 ⇒ rank
    * error ≤ 1e-4·n, graded against the exact disc quantiles at
    * p±0.01 — two orders of magnitude of slack). */
  def qSketchStats(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val kmv = KmvSketch.kmvDistinctFrom(
        li.select(col("l_returnflag").as("grp"), col("l_partkey").as("v")))
      .filter(col("grp") =!= "ALL")
      .select(col("grp"), col("est_distinct").as("kmv_parts_est"),
        col("exact_distinct").as("exact_parts"))
    // countDistinct is kept OUT of the sketch aggregation: a DISTINCT
    // aggregate beside TypedImperative ones forces the multi-phase
    // distinct rewrite, and the O(values)-sized percentile state then
    // serializes/merges through every extra phase (measured 22x on the
    // sf0.1 sweep). Split aggs, 3-row equi-joins.
    val exactOrders = li.groupBy(col("l_returnflag").as("grp"))
      .agg(countDistinct(col("l_orderkey")).as("exact_orders"))
    val hll = li.groupBy(col("l_returnflag").as("grp"))
      .agg(
        // rank base counts NON-NULL prices, matching percentile_approx's
        // null handling — count(1) would shift the disc-bound ranks on a
        // corpus with null prices (r15 advice #3)
        count(col("l_extendedprice")).as("n"),
        approx_count_distinct(col("l_partkey")).as("ap"),
        approx_count_distinct(col("l_orderkey")).as("ao"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50a"),
        percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("p95a"))
    // exact disc bounds WITHOUT percentile_disc's per-instance
    // value->count map (4 instances each buffering every distinct price
    // cost ~6 s at sf0.1): one (grp, value) frequency agg + a window
    // cumsum + one conditional-min pass computes all four order
    // statistics — disc(p) = min{v : cum_count(v) >= p*n}. Spark-side
    // only (the oracle asserts the booleans as TRUE), so the fast plan
    // needs no SQL replay.
    val freq = li.filter(col("l_extendedprice").isNotNull)
      .groupBy(col("l_returnflag").as("grp"), col("l_extendedprice").as("v"))
      .agg(count(lit(1)).as("c"))
    val cum = freq.withColumn("cum",
      sum(col("c")).over(Window.partitionBy("grp").orderBy("v")))
    val bounds = cum.join(hll.select(col("grp"), col("n")), Seq("grp"))
      .groupBy("grp")
      .agg(
        min(when(col("cum") >= col("n") * 0.49, col("v"))).as("p49"),
        min(when(col("cum") >= col("n") * 0.51, col("v"))).as("p51"),
        min(when(col("cum") >= col("n") * 0.94, col("v"))).as("p94"),
        min(when(col("cum") >= col("n") * 0.96, col("v"))).as("p96"))
    hll.join(bounds, Seq("grp")).join(exactOrders, Seq("grp")).join(kmv, Seq("grp"))
      .select(col("grp").as("l_returnflag"),
        col("exact_parts"), col("kmv_parts_est"), col("exact_orders"),
        (abs(col("ap").cast("double") / col("exact_parts") - 1) <= HllGroupBand)
          .as("hll_parts_in_band"),
        (abs(col("ao").cast("double") / col("exact_orders") - 1) <= HllGroupBand)
          .as("hll_orders_in_band"),
        col("p50a").between(col("p49"), col("p51")).as("p50_in_rank_band"),
        col("p95a").between(col("p94"), col("p96")).as("p95_in_rank_band"))
      .orderBy("l_returnflag")
  }

  /** MERGEABLE HLL sketches — the half of the sketch story that matters at
    * 100 TB: per-group partial sketches (here per source) are persistable
    * state that later UNIONS into coarser rollups without rescanning the
    * data (per-day sketches → monthly distincts; per-partition → global).
    * Datasketches HLL via hll_sketch_agg/hll_union_agg; oracle-checked
    * since r15 via twin substitution: exact per-source rollup replayed
    * in SQL, the union estimate graded as a 3σ within-envelope boolean
    * the oracle asserts TRUE (raw estimate stays spec-graded in
    * SketchSpec). */
  def qHllMerge(spark: SparkSession, dir: String): DataFrame = {
    val perSource = Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(expr("hll_sketch_agg(doc_id)").as("sk"),
        countDistinct(col("doc_id")).as("exact_docs"))
    perSource
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_total"),
        sum(col("exact_docs")).as("exact_total"),
        count(lit(1)).as("n_sources"))
      .select(col("n_sources"), col("exact_total"),
        (abs(col("est_total").cast("double") / col("exact_total") - 1)
          <= HllUnionBand).as("est_in_band"))
  }

  /** EXACT distributed percentiles — the oracle-checkable counterpart of
    * qSketchStats' approximate quantiles: percentile_disc is an order
    * statistic (no interpolation), so Spark and DuckDB's quantile_disc
    * agree bit-exactly on the same doubles. Exact quantiles shuffle the
    * full column per group (why the sketch exists at 100 TB) — this is
    * the small-group/diagnostic path. */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY value)").as("p25"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("p50"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY value)").as("p75"),
        expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY value)").as("p99"))
      .orderBy("event_type")

  /** Documents per source — chunks-per-content_type analog
    * (main-script1.ipynb:120-124). */
  def qChunksPerType(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy("source")

  /** Orders-per-customer ratio per segment — the chunk/doc ratio pattern
    * (main-script1.ipynb:219-232: merge of two aggregates + ratio). */
  def qDocRatio(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"))
      .withColumn("ratio", round(col("n_orders").cast("double") / col("n_customers"), 6))
      .orderBy("c_mktsegment")
  }

  /** Mean/std of lines-per-order per returnflag — chunks-per-doc mean/std
    * (analisis-informe.ipynb:229-240). Two-level aggregation; stddev is the
    * only order-sensitive float here → round(6). */
  def qChunksStats(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"))
      .groupBy(col("l_returnflag"))
      .agg(
        round(avg(col("n_lines")), 6).as("mean_lines"),
        round(stddev_samp(col("n_lines")), 6).as("std_lines"),
        count(lit(1)).as("n_orders"))
      .orderBy("l_returnflag")

  /** Run-length ranges of consecutive equal classes per user over time —
    * re-expression of ocr.py `_get_prediction_ranges` as windows (lag +
    * running change-count), distributed over user_id. */
  def qPredictionRanges(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(w) === col("event_type"), lit(0L)).otherwise(lit(1L)))
      .withColumn("grp", sum(col("chg")).over(w))
      .groupBy(col("user_id"), col("grp"), col("event_type"))
      .agg((min(col("rn")) - 1).cast("long").as("start_idx"),
        (max(col("rn")) - 1).cast("long").as("end_idx"))
      .select(col("user_id"), col("event_type"), col("start_idx"), col("end_idx"))
      .orderBy(col("user_id"), col("start_idx"))
  }

  /** Hourly tumbling-window event aggregation (batch twin of the streaming
    * operator in graft.streaming; oracle-checkable via date_trunc). */
  def qEventsWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).cast("string").as("hour_ts"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(25,6)")).cast("double").as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("hour_ts", "event_type")

  /** Cluster × category contingency with within-cluster proportions
    * (analisis-informe.ipynb:413-414: groupby(etiqueta, category) + share
    * of cluster total). Chunks join the doc dim on document_id; label plays
    * etiqueta, the doc source plays category. */
  def qClusterCategory(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.chunks(spark, dir)
    val d = Tables.documents(spark, dir)
    val grouped = c.join(broadcast(d), c("document_id") === d("doc_id"))
      .groupBy(col("label"), col("source"))
      .agg(count(lit(1)).as("n_chunks"))
    grouped
      .withColumn("share", round(col("n_chunks") /
        sum(col("n_chunks")).over(Window.partitionBy(col("label"))), 6))
      .orderBy("label", "source")
  }

  /** Per-document "all chunks in the same cluster" rollup
    * (analisis-informe.ipynb:527-537: nunique per doc → flag → counts). */
  def qSameClusterDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.chunks(spark, dir)
      .groupBy(col("document_id"))
      .agg(countDistinct(col("label")).as("n_labels"))
      .withColumn("all_same", col("n_labels") === 1)
      .groupBy(col("all_same"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("all_same")

  /** Embedding-distribution drift monitor: Population Stability Index of
    * a dimension marginal (dim 0 — the corpus is pre-normalized, so norms
    * carry no signal; production monitors one PSI per tracked dimension)
    * between a reference slice (even vec_ids, standing in for "last
    * snapshot") and the current slice (odd vec_ids). Bins are DECILES OF THE REFERENCE via exact
    * percentile_disc order statistics, so bin edges — and therefore
    * every bin count — are engine-exact; PSI terms use add-1-smoothed
    * exact-integer fractions, rounded then decimal-summed. PSI > 0.2 is
    * the classic "retrain/reindex" alarm an embedding pipeline watches.
    *
    * Scale shape: one scan computes norms map-side; the reference
    * quantile pass is one order-statistic aggregate; binning is a 9-way
    * literal comparison (no join); counts collapse to 10 rows. */
  def qEmbeddingDrift(spark: SparkSession, dir: String): DataFrame =
    driftPsiFrame(driftCache.persist(driftBase(spark, dir)))

  /** The whole PSI assembly over any (x, is_ref) frame — reference-era
    * decile edges, per-bin counts, smoothed terms, decimal-summed psi.
    * ONE implementation shared by [[qEmbeddingDrift]] and the
    * drift→rebalance loop's monitor
    * ([[graft.operators.search.DriftRebalance]]) so the two drift
    * monitors can never diverge (r12 review). The caller owns `base`'s
    * caching — this runs three passes over it (edges, totals, counts). */
  private[graft] def driftPsiFrame(base: DataFrame): DataFrame = {
    val spark = base.sparkSession
    val edges = driftEdges(base)
    val totRow = base.agg(
      sum(when(col("is_ref"), 1L).otherwise(0L)),
      sum(when(!col("is_ref"), 1L).otherwise(0L))).head()
    val (nr, nc) = (totRow.getLong(0), totRow.getLong(1))
    val bin = driftBin(edges, col("x"))
    val counts = spark.range(DriftBins).select(col("id").cast("int").as("bin"))
      .join(base.groupBy(bin.as("bin")).agg(
        sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_cur")),
        Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    driftAssemble(counts, nr, nc)
  }
  private val driftCache = new graft.RollingCache

  /** Shared drift plumbing (the streaming twin reuses every piece). */
  private[graft] val DriftBins = 10
  private[graft] def driftBase(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        round(element_at(col("embedding"), 1).cast("double"), 6).as("x"),
        (col("vec_id") % 2 === 0).as("is_ref"))
  private[graft] def driftEdges(base: DataFrame): Seq[Double] = {
    val qs = (1 until DriftBins).map(i => i.toDouble / DriftBins)
    val edgeRow = base.filter(col("is_ref"))
      .agg(expr(s"percentile_disc(${qs.head}) WITHIN GROUP (ORDER BY x)"),
        qs.tail.map(q => expr(s"percentile_disc($q) WITHIN GROUP (ORDER BY x)")): _*)
      .head()
    (0 until DriftBins - 1).map(edgeRow.getDouble)
  }
  private[graft] def driftBin(edges: Seq[Double], x: Column): Column =
    edges.map(e => when(x > lit(e), 1).otherwise(0)).reduce(_ + _)
  private[graft] def driftAssemble(counts: DataFrame, nr: Long, nc: Long): DataFrame = {
    val pr = (col("n_ref") + lit(1.0)) / lit(nr + DriftBins)
    val pc = (col("n_cur") + lit(1.0)) / lit(nc + DriftBins)
    counts
      .withColumn("term", round((pc - pr) * log(pc / pr), 6))
      .withColumn("psi", round(
        sum(col("term").cast("decimal(9,6)")).over(Window.partitionBy())
          .cast("double"), 6))
      .orderBy("bin")
  }

  /** Ordered, WINDOWED funnel conversion over the event stream: users
    * who viewed, then clicked within 1 h of their first view, then
    * purchased within 24 h of that first qualifying click — strict
    * ordering plus per-step conversion windows, the semantics product
    * analytics means by "funnel". Timestamps stay exact epoch-NANOS longs
    * end to end (integer comparisons, no float time). Each stage is one
    * groupBy(user) min + one equi-join on user_id — shuffle-partitioned
    * by user, no window over global order, user cardinality never on the
    * driver. */
  def qEventFunnel(spark: SparkSession, dir: String): DataFrame = {
    val HourNs = 3600L * 1000000000L
    graft.Graft.funnel(
      Tables.eventsNanos(spark, dir)
        .select(col("user_id"), col("event_type"), col("ts").as("ts_ns")),
      "user_id", "event_type", "ts_ns",
      Seq(("1_view", "view", 0L),
        ("2_click_within_1h", "click", HourNs),
        ("3_purchase_within_24h", "purchase", 24L * HourNs)))
  }

  /** Weekly cohort retention over HIGH-VALUE purchases (value > 75 —
    * P80-ish; the raw event stream is dense enough that every user is
    * active every week, which measures nothing): users grouped by the
    * week of their first qualifying purchase; retention(c, o) = distinct
    * users of cohort c purchasing again in week c+o over the cohort size.
    * Day/week indices are exact integer divisions of epoch-nanos; the
    * only float is the final rounded ratio. Plan: one distinct
    * (user, week) shuffle + one groupBy(user) for the cohort assignment +
    * a user-keyed equi-join — the 100 TB shape (everything keyed by
    * user/cohort, nothing driver-side). */
  def qRetentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val WeekNs = 7L * 86400L * 1000000000L
    graft.Graft.cohortRetention(
      Tables.eventsNanos(spark, dir)
        .filter(col("event_type") === "purchase" && col("value") > 75.0)
        .select(col("user_id"), col("ts")),
      "user_id", "ts", WeekNs)
      .withColumnsRenamed(Map("cohort" -> "cohort_week",
        "period_offset" -> "week_offset"))
  }

  /** The salted-join utility under the driver hash: orders⋈customer on
    * custkey through [[Skew.saltedJoin]] (salt 8 — the hot-key spread a
    * broadcast-ineligible dim join needs), rolled up per market segment.
    * Salting is pure plan shape for a 1:N join, so the oracle replays the
    * PLAIN join — any salting bug (dropped salt row, wrong replication)
    * breaks the hash. */
  def qSaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey").as("c_custkey"), col("o_totalprice"))
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment"))
    graft.operators.analytics.Skew.saltedJoin(o, c, Seq("c_custkey"), 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
      .orderBy("c_mktsegment")
  }

  /** The skew-aware exact distinct under the driver hash: distinct
    * suppliers per returnflag via the two-stage (key, value) spread —
    * equivalent to countDistinct but without the single-reducer hot
    * group; the oracle replays plain COUNT(DISTINCT). */
  def qSkewDistinct(spark: SparkSession, dir: String): DataFrame =
    graft.operators.analytics.Skew.skewAwareDistinctCount(
      Tables.lineitem(spark, dir), "l_returnflag", "l_suppkey")
      .orderBy("l_returnflag")

  /** The bucketed co-located join under the driver hash: both sides
    * written bucketed by custkey (the write-once shuffle), then joined
    * exchange-free (BucketingSpec asserts the plan; THIS query checks the
    * results). Oracle replays the plain join. */
  def qBucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.analytics.Bucketing
    Bucketing.saveBucketed(Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_totalprice")),
      "graft_q_orders_b", "o_custkey", 8)
    Bucketing.saveBucketed(Tables.customer(spark, dir)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
      "graft_q_customer_b", "o_custkey", 8)
    Bucketing.bucketedJoin(spark, "graft_q_orders_b", "graft_q_customer_b", "o_custkey")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
      .orderBy("c_mktsegment")
  }

  /** Hourly event-rate anomaly detection: per (hour, type) counts scored
    * against their type's mean/σ over all observed hours; |z| > 2 rows
    * are the alert set (the ingestion-volume monitor every pipeline
    * runs). Counts are exact BIGINTs, so the moment sums need no decimal
    * casts; the variance algebra and the round-then-filter boundary are
    * token-identical in the oracle. One groupBy + a type-row broadcast. */
  def qEventAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val mean = col("s1").cast("double") / col("k")
    val stats = hourly.groupBy("event_type").agg(
      count(lit(1)).as("k"),
      sum(col("n")).as("s1"),
      sum(col("n") * col("n")).as("s2"))
      .select(col("event_type"), col("k"),
        mean.as("mean_n"),
        sqrt((col("s2").cast("double") - col("k") * mean * mean) / (col("k") - 1))
          .as("std_n"))
    hourly.join(broadcast(stats), Seq("event_type"))
      .withColumn("z", round((col("n") - col("mean_n")) / col("std_n"), 6))
      .filter(abs(col("z")) > 2)
      .select(col("hour").cast("string").as("hour_ts"), col("event_type"), col("n"),
        round(col("mean_n"), 6).as("mean_n"), round(col("std_n"), 6).as("std_n"),
        col("z"))
      .orderBy("hour_ts", "event_type")
  }

  /** Typed JSON property extraction + aggregation — the events table
    * carries a `props` JSON string (semi-structured sidecar metadata, the
    * shape of the reference's chunk-metadata fields the notebooks group
    * by, analisis-informe.ipynb's content_type/category counts).
    * `from_json` with an explicit schema (codegen'd, no UDF) pulls the
    * typed `k` field once; aggregation is one shuffle on (event_type,
    * k_bucket) plus a broadcast-sized window for the per-type share. At
    * scale: from_json runs map-side in whole-stage codegen; a malformed
    * JSON row degrades to null rather than failing the pipeline.
    *
    * Oracle contract: props.k is a clean JSON INTEGER (the corpus
    * guarantees it). Lenient-parse edge cases diverge BY ENGINE DESIGN
    * and are out of oracle scope: Spark's from_json nulls a float or
    * string-encoded k where DuckDB's CAST rounds/coerces it, and DuckDB's
    * json_extract raises on malformed JSON where Spark nulls. The Spark
    * side stays robust either way; the hash compare is only meaningful on
    * the clean-integer regime. Null k (malformed/missing props) is
    * EXPLICITLY excluded before grouping/ranking in both engines — the
    * engines disagree on null ORDER (Spark ascending puts nulls first,
    * DuckDB defaults NULLS LAST), so leaving nulls in would make row
    * order corpus-dependent rather than contractual. */
  def qPropsAgg(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("k", from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k"))
      .filter(col("k").isNotNull)
    e.groupBy(col("event_type"), floor(col("k") / 10).cast("long").as("k_bucket"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(25,6)")).cast("double").as("sum_value"),
        min(col("k")).as("k_min"), max(col("k")).as("k_max"))
      .withColumn("share", round(col("n_events").cast("double") /
        sum(col("n_events")).over(Window.partitionBy("event_type")), 6))
      .orderBy("event_type", "k_bucket")
  }

  /** Per-type top-3 JSON property values by frequency — the "which
    * metadata values dominate each type" drill-down, via the scalar-path
    * extractor (`get_json_object`) and a ranking window. Ties broken by
    * k for a deterministic total order; null k excluded before ranking
    * (see the null-order note on [[qPropsAgg]]). */
  def qPropsTopk(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .filter(col("k").isNotNull)
      .groupBy(col("event_type"), col("k"))
      .agg(count(lit(1)).as("n_events"))
    counts
      .withColumn("rk", row_number().over(
        Window.partitionBy("event_type").orderBy(col("n_events").desc, col("k"))))
      .filter(col("rk") <= 3)
      .select(col("event_type"), col("rk"), col("k"), col("n_events"))
      .orderBy("event_type", "rk")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_event_anomaly" -> (qEventAnomaly _),
    "q_props_agg" -> (qPropsAgg _),
    "q_props_topk" -> (qPropsTopk _),
    "q_salted_join" -> (qSaltedJoin _),
    "q_skew_distinct" -> (qSkewDistinct _),
    "q_bucketed_join" -> (qBucketedJoin _),
    "q_event_funnel" -> (qEventFunnel _),
    "q_retention_cohorts" -> (qRetentionCohorts _),
    "q_embedding_drift" -> (qEmbeddingDrift _),
    "q_cluster_category" -> (qClusterCategory _),
    "q_same_cluster_docs" -> (qSameClusterDocs _),
    "q_topk_per_group" -> (qTopkPerGroup _),
    "q_sketch_stats" -> (qSketchStats _),
    "q_hll_merge" -> (qHllMerge _),
    "q_percentiles" -> (qPercentiles _),
    "q1_agg" -> (q1Agg _),
    "q_revenue_agg" -> (qRevenueAgg _),
    "q_rollup_revenue" -> (qRollupRevenue _),
    "q_decayed_mass" -> (qDecayedMass _),
    "q_join_agg" -> (qJoinAgg _),
    "q_window_topn" -> (qWindowTopn _),
    "q_chunks_per_type" -> (qChunksPerType _),
    "q_doc_ratio" -> (qDocRatio _),
    "q_chunks_stats" -> (qChunksStats _),
    "q_prediction_ranges" -> (qPredictionRanges _),
    "q_events_window" -> (qEventsWindow _))

  override def oracles: Map[String, String] = Map(
    "q_sketch_stats" ->
      // twin-substitution row (r14 verdict #7): exact distincts + the
      // deterministic KMV estimate replay hash-exact; the HLL/GK
      // estimates are graded as within-envelope booleans the oracle
      // asserts TRUE — a hash mismatch here means a broken error bound
      s"""WITH vals AS (SELECT DISTINCT l_returnflag AS grp, l_partkey AS v FROM lineitem),
        |hd AS (SELECT DISTINCT grp, ${graft.operators.sampling.SamplingQueries.prioSql("v")} AS h FROM vals),
        |sk AS (SELECT grp, h FROM (
        |    SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
        |    FROM hd) WHERE rn <= ${KmvSketch.K}),
        |per AS (SELECT grp, count(*) AS n_sketch, max(h) AS kth_hash
        |  FROM sk GROUP BY grp),
        |ex AS (SELECT grp, count(*) AS exact_parts FROM vals GROUP BY grp),
        |eo AS (SELECT l_returnflag AS grp, count(DISTINCT l_orderkey) AS exact_orders
        |  FROM lineitem GROUP BY 1)
        |SELECT per.grp AS l_returnflag, ex.exact_parts,
        |  ${KmvSketch.estSql} AS kmv_parts_est, eo.exact_orders,
        |  TRUE AS hll_parts_in_band, TRUE AS hll_orders_in_band,
        |  TRUE AS p50_in_rank_band, TRUE AS p95_in_rank_band
        |FROM per JOIN ex USING (grp) JOIN eo ON eo.grp = per.grp
        |ORDER BY l_returnflag""".stripMargin,
    "q_hll_merge" ->
      """WITH per AS (
        |  SELECT source, count(DISTINCT doc_id) AS cd FROM documents GROUP BY source)
        |SELECT CAST(count(*) AS BIGINT) AS n_sources,
        |  CAST(sum(cd) AS BIGINT) AS exact_total,
        |  TRUE AS est_in_band
        |FROM per""".stripMargin,
    "q_props_agg" ->
      """WITH e AS (
        |  SELECT event_type, user_id, value,
        |    CAST(json_extract(props, '$.k') AS INT) AS k
        |  FROM events),
        |b AS (
        |  -- floor division (matches Spark floor(k/10)): DuckDB's integer
        |  -- // truncates toward zero, diverging on negative k
        |  SELECT event_type, CAST(floor(k / 10.0) AS BIGINT) AS k_bucket,
        |    count(*) AS n_events, count(DISTINCT user_id) AS n_users,
        |    CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value,
        |    min(k) AS k_min, max(k) AS k_max
        |  FROM e WHERE k IS NOT NULL GROUP BY 1, 2)
        |SELECT event_type, k_bucket, n_events, n_users, sum_value, k_min, k_max,
        |  round(CAST(n_events AS DOUBLE) /
        |    CAST(sum(n_events) OVER (PARTITION BY event_type) AS DOUBLE), 6) AS share
        |FROM b ORDER BY event_type, k_bucket""".stripMargin,
    "q_props_topk" ->
      """SELECT event_type, rk, k, n_events FROM (
        |  SELECT event_type, k, n_events,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY n_events DESC, k) AS INT) AS rk
        |  FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS INT) AS k,
        |          count(*) AS n_events
        |        FROM events GROUP BY 1, 2)
        |  WHERE k IS NOT NULL)
        |WHERE rk <= 3 ORDER BY event_type, rk""".stripMargin,
    "q_topk_per_group" ->
      """SELECT c_mktsegment, rk, o_orderkey, o_totalprice FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |WHERE rk <= 3 ORDER BY c_mktsegment, rk""".stripMargin,
    "q_cluster_category" ->
      """SELECT label, source, n_chunks,
        |  round(CAST(n_chunks AS DOUBLE) / sum(n_chunks) OVER (PARTITION BY label), 6) AS share
        |FROM (
        |  SELECT e.label, d.source, count(*) AS n_chunks
        |  FROM embeddings e JOIN documents d ON e.vec_id // 8 = d.doc_id
        |  GROUP BY e.label, d.source)
        |ORDER BY label, source""".stripMargin,
    "q_same_cluster_docs" ->
      """SELECT n_labels = 1 AS all_same, count(*) AS n_docs
        |FROM (SELECT vec_id // 8 AS document_id, count(DISTINCT label) AS n_labels
        |      FROM embeddings GROUP BY 1)
        |GROUP BY 1 ORDER BY all_same""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 1000000 AS DECIMAL(20,0))) AS BIGINT) AS sum_qty_micro,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 1000000 AS DECIMAL(20,0))) AS BIGINT) AS sum_base_price_micro,
        |  CAST(sum(CAST(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) * 1000000 AS DECIMAL(20,0))) AS BIGINT) AS sum_disc_price_micro,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    // the decay constant is the SAME Scala-computed double embedded as a
    // literal (shortest-repr round-trips to identical bits in DuckDB);
    // tmax is recomputed in SQL -- an exact integer max equals the
    // driver-read literal the Spark side embeds
    "q_decayed_mass" ->
      s"""WITH e AS (SELECT event_type, value, epoch_ns(ts) // 1000 AS us FROM events),
         |t AS (SELECT max(us) AS tmax FROM e)
         |SELECT event_type, count(*) AS n_events,
         |  CAST(sum(CAST(round(value * exp((-${math.log(2.0) / DecayHalfLifeH}) *
         |        (CAST(t.tmax - us AS DOUBLE) / 3600000000.0)), 6)
         |      AS DECIMAL(25,6))) AS DOUBLE) AS decayed_mass
         |FROM e CROSS JOIN t GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_rollup_revenue" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
        |  coalesce(l_linestatus, 'ALL') AS lstatus,
        |  CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  count(*) AS n_lines,
        |  CAST(sum(CAST(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) * 1000000 AS DECIMAL(20,0))) AS BIGINT) AS revenue_micro
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, rflag, lstatus""".stripMargin,
    "q_revenue_agg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6)) * 1000000 AS DECIMAL(20,0))) AS BIGINT) AS sum_charge_micro,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS n_lines
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_join_agg" ->
      """SELECT n_name,
        |  CAST(sum(CAST(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) * 1000000 AS DECIMAL(20,0))) AS BIGINT) AS revenue_micro,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_event_anomaly" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, count(*) AS k,
        |    CAST(sum(n) AS DOUBLE) / count(*) AS mean_n,
        |    sqrt((CAST(sum(n * n) AS DOUBLE)
        |      - count(*) * (CAST(sum(n) AS DOUBLE) / count(*)) * (CAST(sum(n) AS DOUBLE) / count(*)))
        |      / (count(*) - 1)) AS std_n
        |  FROM hourly GROUP BY event_type)
        |SELECT CAST(h.hour AS VARCHAR) AS hour_ts, h.event_type, h.n,
        |  round(st.mean_n, 6) AS mean_n, round(st.std_n, 6) AS std_n,
        |  round((h.n - st.mean_n) / st.std_n, 6) AS z
        |FROM hourly h JOIN st USING (event_type)
        |WHERE abs(round((h.n - st.mean_n) / st.std_n, 6)) > 2
        |ORDER BY hour_ts, event_type""".stripMargin,
    "q_salted_join" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_skew_distinct" ->
      """SELECT l_returnflag, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_distinct_l_suppkey
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_bucketed_join" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_event_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS ts_ns FROM events),
        |s1 AS (SELECT user_id, min(ts_ns) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(ts_ns) AS t2 FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND ts_ns > t1
        |         AND ts_ns <= t1 + 3600000000000 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(ts_ns) AS t3 FROM e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND ts_ns > t2
        |         AND ts_ns <= t2 + 86400000000000 GROUP BY e.user_id),
        |u AS (
        |  SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM s1
        |  UNION ALL SELECT '2_click_within_1h', CAST(count(*) AS BIGINT) FROM s2
        |  UNION ALL SELECT '3_purchase_within_24h', CAST(count(*) AS BIGINT) FROM s3)
        |SELECT stage, n_users,
        |  round(n_users / coalesce(lag(n_users) OVER (ORDER BY stage), n_users), 6) AS pct_of_prev
        |FROM u ORDER BY stage""".stripMargin,
    "q_retention_cohorts" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events
        |  WHERE event_type = 'purchase' AND value > 75.0),
        |first AS (SELECT user_id, min(day) AS d0 FROM e GROUP BY user_id),
        |active AS (SELECT DISTINCT user_id, day FROM e),
        |joined AS (
        |  SELECT a.user_id, f.d0 // 7 AS cohort_week,
        |    (a.day // 7) - (f.d0 // 7) AS week_offset
        |  FROM active a JOIN first f USING (user_id)),
        |ret AS (SELECT cohort_week, week_offset,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
        |  FROM joined GROUP BY cohort_week, week_offset),
        |sizes AS (SELECT d0 // 7 AS cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
        |  FROM first GROUP BY 1)
        |SELECT r.cohort_week, r.week_offset, r.n_active, s.cohort_size,
        |  round(r.n_active / s.cohort_size, 6) AS retention
        |FROM ret r JOIN sizes s USING (cohort_week)
        |ORDER BY r.cohort_week, r.week_offset""".stripMargin,
    "q_embedding_drift" ->
      """WITH nv AS (
        |  SELECT vec_id,
        |    round(CAST(embedding[1] AS DOUBLE), 6) AS x,
        |    vec_id % 2 = 0 AS is_ref
        |  FROM embeddings),
        |ed AS (SELECT quantile_disc(x, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS es
        |       FROM nv WHERE is_ref),
        |bd AS (SELECT is_ref,
        |    len(list_filter((SELECT es FROM ed), e -> x > e)) AS bin
        |  FROM nv),
        |cnt AS (
        |  SELECT g.bin,
        |    CAST(coalesce(sum(CASE WHEN bd.is_ref THEN 1 END), 0) AS BIGINT) AS n_ref,
        |    CAST(coalesce(sum(CASE WHEN NOT bd.is_ref THEN 1 END), 0) AS BIGINT) AS n_cur
        |  FROM (SELECT unnest(range(0, 10)) AS bin) g
        |  LEFT JOIN bd ON bd.bin = g.bin
        |  GROUP BY g.bin),
        |tots AS (SELECT count(*) FILTER (is_ref) AS nr,
        |                count(*) FILTER (NOT is_ref) AS nc FROM nv),
        |terms AS (
        |  SELECT CAST(bin AS INT) AS bin, n_ref, n_cur,
        |    round(((n_cur + 1.0) / (t.nc + 10) - (n_ref + 1.0) / (t.nr + 10))
        |      * ln(((n_cur + 1.0) / (t.nc + 10)) / ((n_ref + 1.0) / (t.nr + 10))), 6) AS term
        |  FROM cnt CROSS JOIN tots t)
        |SELECT bin, n_ref, n_cur, term,
        |  round(CAST(sum(CAST(term AS DECIMAL(9,6))) OVER () AS DOUBLE), 6) AS psi
        |FROM terms ORDER BY bin""".stripMargin,
    "q_percentiles" ->
      """SELECT event_type, count(*) AS n,
        |  quantile_disc(value, 0.25) AS p25, quantile_disc(value, 0.5) AS p50,
        |  quantile_disc(value, 0.75) AS p75, quantile_disc(value, 0.99) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_window_topn" ->
      """SELECT c_mktsegment, rk, o_orderkey, o_totalprice FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |WHERE rk <= 3 ORDER BY c_mktsegment, rk""".stripMargin,
    "q_chunks_per_type" ->
      """SELECT source, count(*) AS n_docs, count(DISTINCT lang) AS n_langs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_doc_ratio" ->
      """SELECT c_mktsegment, count(DISTINCT o_custkey) AS n_customers,
        |  count(*) AS n_orders,
        |  round(CAST(count(*) AS DOUBLE) / count(DISTINCT o_custkey), 6) AS ratio
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_chunks_stats" ->
      """SELECT l_returnflag, round(avg(n_lines), 6) AS mean_lines,
        |  round(stddev_samp(n_lines), 6) AS std_lines, count(*) AS n_orders
        |FROM (SELECT l_returnflag, l_orderkey, count(*) AS n_lines
        |      FROM lineitem GROUP BY l_returnflag, l_orderkey)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_prediction_ranges" ->
      """SELECT user_id, event_type, min(rn) - 1 AS start_idx, max(rn) - 1 AS end_idx
        |FROM (
        |  SELECT user_id, event_type, rn, sum(chg) OVER (PARTITION BY user_id ORDER BY rn) AS grp
        |  FROM (
        |    SELECT user_id, event_type, event_id,
        |      row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |      CASE WHEN lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) = event_type
        |           THEN 0 ELSE 1 END AS chg
        |    FROM events))
        |GROUP BY user_id, grp, event_type
        |ORDER BY user_id, start_idx""".stripMargin,
    "q_events_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour_ts, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY hour_ts, event_type""".stripMargin)
}
