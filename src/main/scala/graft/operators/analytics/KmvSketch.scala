package graft.operators.analytics

import graft.{QueryModule, Tables}
import graft.operators.sampling.SamplingQueries.{prio, prioSql, SplitMod}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DETERMINISTIC mergeable sketches with exact DuckDB replay — the
  * oracle-checkable twins of the declared engine-specific sketch rows
  * (q_sketch_stats / q_hll_merge, SURVEY §5a): HLL++ register layouts
  * and approx-quantile compression are engine-internal, so those two
  * stay rows-only partials by nature — but the SAME bounded-state,
  * merge-under-union role is served exactly by hash-order statistics,
  * and those ARE replayable:
  *
  *  - '''KMV distinct''' (k-minimum-values, Bar-Yossef et al. 2002):
  *    per group keep the K smallest values of a fixed hash of the
  *    distinct elements; |distinct| ≈ (K−1)·M / h_(K) where h_(K) is
  *    the K-th smallest hash over hash space M. Mergeable exactly like
  *    HLL: union sketches, keep the K smallest. The hash is the repo's
  *    engine-exact multiplicative prio (a BIJECTION on [0, M) — exact
  *    BIGINT in Spark and DuckDB), so the whole sketch, its merge, and
  *    the estimate replay hash-exact.
  *  - '''Hash-sample quantiles''': the S rows with the smallest
  *    prio(key) form a deterministic uniform sample (a universal-hash
  *    bottom-S is an order statistic, not a coin flip); discrete
  *    quantiles of the sample estimate corpus quantiles with the usual
  *    √S error, mergeable under union the same way. percentile_disc /
  *    quantile_disc agree bit-exact on integer micro-units (the
  *    q_percentiles pattern).
  *
  * Scale shape: both are the Misra-Gries bounded-state discipline —
  * one map-side hash projection, one [[graft.plans.TopKPerGroup]]
  * bounded heap per group (O(n log K) CPU, O(groups·K) state, no sort
  * buffer), merge = union + one more K-heap. The EXACT side-by-side
  * columns are the grading arm (a full distinct / discrete quantile —
  * fine at test scale, the sketch is the 100 TB path).
  *
  * Reference: the notebooks' pandas `nunique`/`quantile` profiling
  * cells (main-script1.ipynb corpus stats) — re-expressed as the
  * bounded-memory estimators a 100 TB profile pass actually runs.
  */
object KmvSketch extends QueryModule {

  /** Sketch size: K minimum hash values per group (σ ≈ 1/√K ≈ 12%). */
  val K = 64

  /** Quantile sample size (σ ≈ 1/√S per quantile, ~3%). */
  val S = 1000

  /** The KMV estimate column: exact count while the sketch is partial
    * (fewer than K distinct elements seen), else (K−1)·M / h_(K). */
  private def estCol = round(
    when(col("n_sketch") < K, col("n_sketch").cast("double"))
      .otherwise(lit((K - 1L) * SplitMod) / col("kth_hash").cast("double")), 4)
    .as("est_distinct")

  /** Salt width of the pre-cut: a bottom-K over ONE group would hash
    * every input row to a single reducer's heap (ClusteredDistribution
    * on a constant — the late-wave review), so the cut runs two-level:
    * bottom-K per (group, salt) first — `Salt`-way parallel, each heap
    * still O(K)/O(S) — then the exact cut over the ≤ Salt·K survivors.
    * Exact by the merge theorem (every global bottom-K member is in
    * its salt class's bottom-K), so the oracle replays the one-level
    * order statistic unchanged. */
  val Salt = 32L

  /** Two-level bottom-`k` per `grpCols` ordered by `ordCols` — the
    * salted parallel cut (identical rows to the one-level cut). */
  private def saltedBottomK(df: DataFrame, grpCols: Seq[String],
                            ordCols: Seq[String], k: Int): DataFrame = {
    val salted = df.withColumn("kmv_salt",
      pmod(xxhash64(col(ordCols.head)), lit(Salt)))
    val pre = graft.plans.TopKPerGroup(salted,
      grpCols :+ "kmv_salt", ordCols, k)
      .drop("kmv_salt", "rk")
    graft.plans.TopKPerGroup(pre, grpCols, ordCols, k)
  }

  /** The KMV pipeline over an arbitrary (grp, v) relation — factored so
    * the spec can drive it with constructed groups (the partial-sketch
    * law needs a group with fewer than K distinct values, which no
    * test-corpus group provides). */
  private[analytics] def kmvDistinctFrom(valsRaw: DataFrame): DataFrame = {
    val vals = valsRaw.select(col("grp"), col("v")).distinct()
    // ID-DOMAIN PRECONDITION (r13 advice): the sketch and the estimator
    // operate on the distinct-HASH set. prio is bijective on
    // [0, SplitMod = 2^31−1), so there distinct-hash = distinct-value
    // and the 1/√K envelope applies to exact_distinct. Values at or
    // above SplitMod fold into residue classes: on such a domain
    // est_distinct estimates the RESIDUE-CLASS count — a systematic
    // undercount of exact_distinct (a bias, not sampling error; both
    // engines agree so the oracle stays green, but the 4σ spec law is
    // scoped to in-domain corpora; the fold itself is pinned by the
    // folded-domain law in KmvSketchSpec). A 100 TB deployment with
    // ids beyond 2^31 swaps prio for a 64-bit bijection (xxhash64-
    // style) in BOTH engines; the modulus is pinned in one place
    // (SamplingQueries.SplitMod) exactly for that.
    // Dedup hashes so the order statistic is over the distinct-hash
    // set in both engines:
    val hd = vals.select(col("grp"), prio(col("v")).as("h")).distinct()
    val sk = saltedBottomK(hd, Seq("grp"), Seq("h"), K)
      .select(col("grp"), col("h"))
    val per = sk.groupBy("grp")
      .agg(count(lit(1)).as("n_sketch"), max(col("h")).as("kth_hash"))
    val exact = vals.groupBy("grp").agg(count(lit(1)).as("exact_distinct"))
    val perRows = per.join(exact, Seq("grp"))
      .select(col("grp"), col("n_sketch"), col("kth_hash"), estCol,
        col("exact_distinct"))
    // the merged cut's input is already sketch-sized (≤ groups·K rows)
    val msk = graft.plans.TopKPerGroup(
      sk.select(col("h")).distinct().withColumn("g", lit(1)),
      Seq("g"), Seq("h"), K)
    val merged = msk.agg(count(lit(1)).as("n_sketch"), max(col("h")).as("kth_hash"))
    val exactAll = vals.select(col("v")).distinct()
      .agg(count(lit(1)).as("exact_distinct"))
    val mergedRow = merged.crossJoin(broadcast(exactAll)) // 1 row × 1 row
      .select(lit("ALL").as("grp"), col("n_sketch"), col("kth_hash"), estCol,
        col("exact_distinct"))
    perRows.unionByName(mergedRow).orderBy("grp")
  }

  /** Distinct customers per order priority, estimated by a per-group
    * KMV sketch and graded against the exact distinct; the final row
    * ('ALL') is the MERGED sketch — union of the per-group sketches cut
    * back to K — graded against the global exact distinct, the
    * mergeability law HLL union serves. */
  def qKmvDistinct(spark: SparkSession, dir: String): DataFrame =
    kmvDistinctFrom(Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("grp"), col("o_custkey").as("v")))

  /** Discrete quantiles of order totals (exact integer micro-units)
    * from the deterministic bottom-[[S]] hash sample, side by side with
    * the exact corpus quantiles — one row. */
  def qKmvQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val ov = Tables.orders(spark, dir).select(col("o_orderkey").as("id"),
      (col("o_totalprice").cast("decimal(18,2)") * lit(1000000))
        .cast("decimal(20,0)").cast("long").as("v"))
    val sample = saltedBottomK(
      ov.withColumn("g", lit(1)).withColumn("h", prio(col("id"))),
      Seq("g"), Seq("h", "id"), S).select(col("id"), col("v"))
    val sAgg = sample.agg(count(lit(1)).as("n_sample"),
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)").cast("long").as("sample_p50_micro"),
      expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY v)").cast("long").as("sample_p90_micro"),
      expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY v)").cast("long").as("sample_p99_micro"))
    val eAgg = ov.agg(count(lit(1)).as("n_rows"),
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)").cast("long").as("exact_p50_micro"),
      expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY v)").cast("long").as("exact_p90_micro"),
      expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY v)").cast("long").as("exact_p99_micro"))
    sAgg.crossJoin(broadcast(eAgg)) // 1 row × 1 row
      .select(col("n_rows"), col("n_sample"),
        col("sample_p50_micro"), col("sample_p90_micro"), col("sample_p99_micro"),
        col("exact_p50_micro"), col("exact_p90_micro"), col("exact_p99_micro"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_kmv_distinct" -> (qKmvDistinct _),
    "q_kmv_quantiles" -> (qKmvQuantiles _))

  private[analytics] def estSql: String =
    s"""round(CASE WHEN n_sketch < $K THEN CAST(n_sketch AS DOUBLE)
       |  ELSE ${(K - 1L) * SplitMod} / CAST(kth_hash AS DOUBLE) END, 4)""".stripMargin

  override def oracles: Map[String, String] = Map(
    "q_kmv_distinct" ->
      s"""WITH vals AS (SELECT DISTINCT o_orderpriority AS grp, o_custkey AS v FROM orders),
         |hd AS (SELECT DISTINCT grp, ${prioSql("v")} AS h FROM vals),
         |sk AS (SELECT grp, h FROM (
         |    SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
         |    FROM hd) WHERE rn <= $K),
         |per AS (SELECT grp, count(*) AS n_sketch, max(h) AS kth_hash
         |  FROM sk GROUP BY grp),
         |ex AS (SELECT grp, count(*) AS exact_distinct FROM vals GROUP BY grp),
         |msk AS (SELECT h FROM (
         |    SELECT h, row_number() OVER (ORDER BY h) AS rn
         |    FROM (SELECT DISTINCT h FROM sk)) WHERE rn <= $K),
         |mrg AS (SELECT count(*) AS n_sketch, max(h) AS kth_hash FROM msk),
         |mex AS (SELECT count(DISTINCT v) AS exact_distinct FROM vals)
         |SELECT grp, n_sketch, kth_hash, $estSql AS est_distinct, exact_distinct
         |FROM per JOIN ex USING (grp)
         |UNION ALL
         |SELECT 'ALL' AS grp, mrg.n_sketch, mrg.kth_hash,
         |  $estSql AS est_distinct, mex.exact_distinct
         |FROM mrg, mex
         |ORDER BY grp""".stripMargin,
    "q_kmv_quantiles" ->
      s"""WITH ov AS (SELECT o_orderkey AS id,
         |    CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 1000000 AS DECIMAL(20,0)) AS BIGINT) AS v
         |  FROM orders),
         |smp AS (SELECT id, v FROM (
         |    SELECT id, v, row_number() OVER (ORDER BY ${prioSql("id")}, id) AS rn
         |    FROM ov) WHERE rn <= $S),
         |sa AS (SELECT count(*) AS n_sample,
         |    quantile_disc(v, 0.5) AS sample_p50_micro,
         |    quantile_disc(v, 0.9) AS sample_p90_micro,
         |    quantile_disc(v, 0.99) AS sample_p99_micro FROM smp),
         |ea AS (SELECT count(*) AS n_rows,
         |    quantile_disc(v, 0.5) AS exact_p50_micro,
         |    quantile_disc(v, 0.9) AS exact_p90_micro,
         |    quantile_disc(v, 0.99) AS exact_p99_micro FROM ov)
         |SELECT n_rows, n_sample, sample_p50_micro, sample_p90_micro,
         |  sample_p99_micro, exact_p50_micro, exact_p90_micro, exact_p99_micro
         |FROM sa, ea""".stripMargin)
}
