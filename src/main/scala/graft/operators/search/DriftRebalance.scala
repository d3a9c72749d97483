package graft.operators.search

import graft.{QueryModule, Tables}
import graft.operators.analytics.AnalyticsQueries
import graft.operators.clustering.ClusteringQueries
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The DRIFT → REBALANCE loop, closed end to end over the persisted IVF
  * artifact — the reference thesis's "optimization" chapter as one
  * drill (its notebooks re-cluster when the embedding distribution
  * moves; `nuevo-kmeans-pre.ipynb` retrains KMeans on the refreshed
  * corpus and `update-etiquetas.ipynb` merges the new labels back):
  *
  *  1. '''t0''': build the index on the REFERENCE-era corpus (even
  *     vec_ids) — quantizer = deterministic normalized first-K of that
  *     era ([[IvfIndex.buildFrom]]).
  *  2. '''t1''': the current era arrives with planted drift (odd
  *     vec_ids, raw coordinate 1 shifted by [[Shift]]) and is ingested
  *     through the frozen quantizer ([[IvfIndex.append]] — appends
  *     never retrain, so drifted vectors pile into the few cells whose
  *     reference-era centroids sit nearest the shifted mass).
  *  3. '''monitor''': PSI between the two eras' coordinate-1
  *     distributions (the q_embedding_drift machinery —
  *     [[AnalyticsQueries.driftEdges]] deciles over the reference era,
  *     Laplace-smoothed terms). PSI > [[PsiBar]] fires the loop.
  *  4. '''actuate''': [[IvfIndex.rebalance]] — one micro-unit-exact
  *     Lloyd step retrains the quantizer on the live (drifted) corpus
  *     and rewrites the layout under the new assignment.
  *  5. '''verify''': the q_ivf_stats skew bar (max cell load factor
  *     n·K/total) before vs after, plus the migration count.
  *
  * One summary row: (psi, psi_bar, fired, n_total, moved_rows,
  * max_imb_before, max_imb_after). Every number is deterministic
  * integer/micro-unit arithmetic, so the WHOLE loop — shift, normalize,
  * first-K quantizer, assignment, PSI, Lloyd retrain, reassignment —
  * replays token-for-token in DuckDB ([[oracles]]). The drill itself is
  * scale-shaped: two map-side assignment passes + partitioned writes,
  * one groupBy(cell, dim) retrain, one decile scan for the monitor —
  * no corpus-sized driver state (the quantizer is K×d).
  *
  * The decision is DATA-driven in both engines: `fired` comes from the
  * measured PSI, and the rebalance runs only when it fires — the
  * oracle's report CTEs are gated on the SAME `psi > bar` predicate
  * (CASE selecting the pre- vs post-rebalance assignment), so both
  * engines replay the same branch at EVERY scale: a corpus where the
  * planted shift does not breach the bar reports the quiet row
  * (moved_rows = 0, after = before) identically in both, instead of
  * diverging by construction (the r12 advice). The spec additionally
  * pins the quiet case: no planted shift → PSI under the bar → the
  * loop must NOT fire.
  */
object DriftRebalance extends QueryModule {

  /** Planted drift: +0.25 on raw coordinate 1 of the current era —
    * ~2σ of the synthetic corpus's per-coordinate spread, far above
    * [[PsiBar]] at every gate scale. */
  val Shift = 0.25

  /** The standard "significant shift" PSI bar (0.1–0.25 is the usual
    * monitoring band; 0.1 = investigate, 0.25 = act). */
  val PsiBar = 0.1

  private def K = ClusteringQueries.K

  /** Both eras in DOUBLE precision (the shift must be exact in both
    * engines: float(x)+0.25f and double(x)+0.25 differ in low bits, and
    * assignment argmins would feel it). */
  private def doubled(c: Column): Column = transform(c, _.cast("double"))

  private[search] def refCorpus(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).filter(col("vec_id") % 2 === 0)
      .select(col("vec_id"), doubled(col("embedding")).as("embedding"))

  private[search] def curCorpus(spark: SparkSession, dir: String,
                                shift: Double): DataFrame = {
    val d = doubled(col("embedding"))
    Tables.embeddings(spark, dir).filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"),
        concat(array(element_at(d, 1) + lit(shift)),
          slice(d, lit(2), size(d) - 1)).as("embedding"))
  }

  /** PSI of coordinate 1 between the eras — THE q_embedding_drift
    * assembly ([[AnalyticsQueries.driftPsiFrame]], one shared
    * implementation so the two drift monitors cannot diverge) over
    * this drill's corpus. */
  private[search] def psiOf(ref: DataFrame, cur: DataFrame): Double = {
    val base = ref
      .select(round(element_at(col("embedding"), 1), 6).as("x"),
        lit(true).as("is_ref"))
      .unionByName(cur.select(round(element_at(col("embedding"), 1), 6).as("x"),
        lit(false).as("is_ref")))
      .persist()
    val psi = AnalyticsQueries.driftPsiFrame(base)
      .select(col("psi")).head().getDouble(0)
    base.unpersist(blocking = false)
    psi
  }

  /** (psi, fired, pre-assignments, post-assignments), memoized per dir —
    * the artifact lifecycle (build → append → monitor → rebalance) runs
    * ONCE; the report aggregation is rebuilt per call (bench honesty). */
  private val memo =
    new graft.BoundedMemo[String, (Double, Boolean, DataFrame, DataFrame)](
      KnnGraph.MemoCap)

  private[search] def loopState(spark: SparkSession,
                                dir: String): (Double, Boolean, DataFrame, DataFrame) =
    memo.getOrElseUpdate(dir) {
      val ref = refCorpus(spark, dir)
      val cur = curCorpus(spark, dir, Shift)
      val cs = ref.orderBy("vec_id").limit(K)
        .select(graft.functions.VectorOps.vec_normalize(col("embedding")))
        .collect().map(_.getSeq[Double](0).toIndexedSeq).toIndexedSeq
      val idx = AnnQueries.scratch("graft_drift_rebal_loop", dir)
      IvfIndex.buildFrom(spark, ref, idx, cs)   // t0: reference era
      IvfIndex.append(spark, idx, cur)          // t1: drifted ingest, frozen quantizer
      val pre = spark.read.parquet(s"$idx/data")
        .select(col("vec_id"), col("cell").cast("int").as("cell"))
        .localCheckpoint(true)
      val psi = psiOf(ref, cur)                 // the monitor
      val fired = psi > PsiBar
      if (fired) IvfIndex.rebalance(spark, idx) // the actuator
      val post = spark.read.parquet(s"$idx/data")
        .select(col("vec_id"), col("cell").cast("int").as("cell"))
        .localCheckpoint(true)
      (psi, fired, pre, post)
    }

  /** Max cell load factor (the q_ivf_stats `imbalance` bar) of one
    * assignment frame, as a 1-row (driver-bounded) aggregate. */
  private def maxImb(asg: DataFrame, n: Long): DataFrame =
    asg.groupBy("cell").agg(count(lit(1)).as("cnt"))
      .agg(max(round(col("cnt") * lit(K) / lit(n.toDouble), 6)).as("mi"))

  def qDriftRebalance(spark: SparkSession, dir: String): DataFrame = {
    val (psi, fired, pre, post) = loopState(spark, dir)
    val n = pre.count()
    val moved = pre
      .join(post.select(col("vec_id"), col("cell").as("cell_after")), Seq("vec_id"))
      .filter(col("cell") =!= col("cell_after"))
      .agg(count(lit(1)).as("moved_rows"))
    maxImb(pre, n).crossJoin(broadcast(maxImb(post, n).select(col("mi").as("ma"))))
      .crossJoin(broadcast(moved))
      .select(
        round(lit(psi), 6).as("psi"), lit(PsiBar).as("psi_bar"),
        lit(fired).as("fired"), lit(n).as("n_total"), col("moved_rows"),
        col("mi").as("max_imb_before"), col("ma").as("max_imb_after"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_drift_rebalance" -> (qDriftRebalance _))

  /** The whole loop in SQL: era split + planted shift, normalize,
    * first-K-of-the-reference-era quantizer, frozen-quantizer
    * assignment (pre), the q_embedding_drift PSI replay, the
    * IvfRebalance micro-unit Lloyd retrain, reassignment (post), and
    * the report row. */
  override def oracles: Map[String, String] = Map(
    "q_drift_rebalance" ->
      s"""WITH ref0 AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS raw
         |  FROM embeddings WHERE vec_id % 2 = 0),
         |cur0 AS (
         |  SELECT vec_id, [r[1] + $Shift] || r[2:] AS raw
         |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS r
         |        FROM embeddings WHERE vec_id % 2 = 1)),
         |corpus AS (
         |  SELECT vec_id, raw, TRUE AS is_ref FROM ref0
         |  UNION ALL SELECT vec_id, raw, FALSE FROM cur0),
         |nrm AS (SELECT vec_id, is_ref,
         |  list_transform(raw, x -> x * (1.0 / sqrt(list_inner_product(raw, raw)))) AS v
         |  FROM corpus),
         |c AS (SELECT rn - 1 AS cid, cv FROM (
         |    SELECT row_number() OVER (ORDER BY vec_id) AS rn, v AS cv
         |    FROM nrm WHERE is_ref) WHERE rn <= $K),
         |asg AS (SELECT vec_id, cell FROM (
         |    SELECT n.vec_id, c.cid AS cell, row_number() OVER
         |      (PARTITION BY n.vec_id ORDER BY list_distance(n.v, c.cv), c.cid) AS rn
         |    FROM nrm n CROSS JOIN c) WHERE rn = 1),
         |xs AS (SELECT round(raw[1], 6) AS x, is_ref FROM corpus),
         |ed AS (SELECT quantile_disc(x, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS es
         |       FROM xs WHERE is_ref),
         |bd AS (SELECT is_ref,
         |    len(list_filter((SELECT es FROM ed), e -> x > e)) AS bin
         |  FROM xs),
         |cnt AS (
         |  SELECT g.bin,
         |    CAST(coalesce(sum(CASE WHEN bd.is_ref THEN 1 END), 0) AS BIGINT) AS n_ref,
         |    CAST(coalesce(sum(CASE WHEN NOT bd.is_ref THEN 1 END), 0) AS BIGINT) AS n_cur
         |  FROM (SELECT unnest(range(0, 10)) AS bin) g
         |  LEFT JOIN bd ON bd.bin = g.bin
         |  GROUP BY g.bin),
         |tots AS (SELECT count(*) FILTER (is_ref) AS nr,
         |                count(*) FILTER (NOT is_ref) AS nc FROM xs),
         |terms AS (
         |  SELECT round(((n_cur + 1.0) / (t.nc + 10) - (n_ref + 1.0) / (t.nr + 10))
         |      * ln(((n_cur + 1.0) / (t.nc + 10)) / ((n_ref + 1.0) / (t.nr + 10))), 6) AS term
         |  FROM cnt CROSS JOIN tots t),
         |psi AS (SELECT round(CAST(sum(CAST(term AS DECIMAL(9,6))) AS DOUBLE), 6) AS p
         |        FROM terms),
         |el2 AS (SELECT a.cell, n.v FROM asg a JOIN nrm n USING (vec_id)),
         |elems AS (SELECT cell, generate_subscripts(v, 1) AS dim, unnest(v) AS mv FROM el2),
         |means AS (SELECT cell, dim, count(*) AS n,
         |    sum(CAST(round(mv * 1000000.0) AS BIGINT)) AS sm
         |  FROM elems GROUP BY cell, dim),
         |dims AS (SELECT CAST(unnest(generate_series(1,
         |    (SELECT len(cv) FROM c LIMIT 1))) AS INT) AS dim),
         |grid AS (SELECT c.cid AS cell, d.dim, c.cv[d.dim] AS seed
         |  FROM c CROSS JOIN dims d),
         |nc0 AS (SELECT g.cell, g.dim,
         |    COALESCE(CAST(round(CAST(m.sm AS DOUBLE) / m.n) AS BIGINT),
         |             CAST(round(g.seed * 1000000.0) AS BIGINT)) / 1000000.0 AS coord
         |  FROM grid g LEFT JOIN means m ON m.cell = g.cell AND m.dim = g.dim),
         |newc AS (SELECT cell, list(coord ORDER BY dim) AS ncv FROM nc0 GROUP BY cell),
         |nasg AS (SELECT vec_id, cell FROM (
         |    SELECT n.vec_id, nc.cell,
         |      row_number() OVER (PARTITION BY n.vec_id
         |        ORDER BY list_distance(n.v, nc.ncv), nc.cell) AS rn
         |    FROM nrm n CROSS JOIN newc nc) WHERE rn = 1),
         |tot AS (SELECT count(*) AS n FROM corpus),
         |imb0 AS (SELECT max(round(cnt2 * $K / (SELECT CAST(n AS DOUBLE) FROM tot), 6)) AS mi
         |  FROM (SELECT cell, count(*) AS cnt2 FROM asg GROUP BY cell)),
         |imb1 AS (SELECT max(round(cnt2 * $K / (SELECT CAST(n AS DOUBLE) FROM tot), 6)) AS mi
         |  FROM (SELECT cell, count(*) AS cnt2 FROM nasg GROUP BY cell)),
         |mv AS (SELECT count(*) AS moved FROM asg a JOIN nasg b USING (vec_id)
         |       WHERE a.cell <> b.cell)
         |-- the rebalance branch is gated on the SAME fired predicate the
         |-- engine uses: when PSI stays under the bar the artifact is
         |-- untouched (post = pre), so the report must read the pre-frame
         |-- — an unconditional nasg replay would diverge by construction
         |-- at any corpus where the planted shift does not breach the bar
         |-- (r12 advice)
         |SELECT round((SELECT p FROM psi), 6) AS psi,
         |  $PsiBar AS psi_bar,
         |  (SELECT p FROM psi) > $PsiBar AS fired,
         |  CAST((SELECT n FROM tot) AS BIGINT) AS n_total,
         |  CAST(CASE WHEN (SELECT p FROM psi) > $PsiBar
         |       THEN (SELECT moved FROM mv) ELSE 0 END AS BIGINT) AS moved_rows,
         |  (SELECT mi FROM imb0) AS max_imb_before,
         |  CASE WHEN (SELECT p FROM psi) > $PsiBar
         |       THEN (SELECT mi FROM imb1)
         |       ELSE (SELECT mi FROM imb0) END AS max_imb_after""".stripMargin)
}
