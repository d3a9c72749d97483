package graft.operators.search

import graft.{QueryModule, Tables}
import graft.operators.clustering.ClusteringQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF REBALANCE drill — the reindex-on-drift loop end to end over the
  * PERSISTED index ([[IvfIndex.rebalance]]): build the partitioned
  * artifact with the deterministic first-K quantizer, re-train it with
  * one micro-unit-exact Lloyd step on the current corpus, rewrite every
  * cell under the new assignment, and report the before/after cell
  * populations, load factors, and migration counts — the numbers an
  * index operator watches to decide the rewrite paid off (the thesis's
  * "optimization" chapter is exactly this loop; q_embedding_drift's PSI
  * monitor supplies the trigger, q_ivf_stats' imbalance column the bar).
  *
  * Deterministic throughout (first-K seeds, micro-quantized means,
  * argmin ties by cell id), so the retrain + reassignment arithmetic
  * replays token-for-token in DuckDB; the artifact-level law — a
  * rebalanced index serves exactly what a fresh build with the
  * retrained quantizer serves — is pinned by IvfRebalanceSpec. */
object IvfRebalance extends QueryModule {

  /** Pre/post (vec_id, cell) assignments of the scratch artifact,
    * memoized per dir — the build + rebalance run ONCE; the grading
    * aggregation is rebuilt per call (bench honesty). */
  private val memo =
    new graft.BoundedMemo[String, (DataFrame, DataFrame)](KnnGraph.MemoCap)

  private[search] def prePost(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    memo.getOrElseUpdate(dir) {
      val idx = AnnQueries.scratch("graft_ivf_rebal", dir)
      IvfIndex.build(spark, dir, idx)
      val pre = spark.read.parquet(s"$idx/data")
        .select(col("vec_id"), col("cell").cast("int").as("cell"))
        .localCheckpoint(true)
      IvfIndex.rebalance(spark, idx)
      val post = spark.read.parquet(s"$idx/data")
        .select(col("vec_id"), col("cell").cast("int").as("cell"))
        .localCheckpoint(true)
      (pre, post)
    }

  /** Per-cell before/after populations, load factors (n·K/total — the
    * q_ivf_stats imbalance), and rows that migrated out of the cell. */
  def qIvfRebalance(spark: SparkSession, dir: String): DataFrame = {
    val (pre, post) = prePost(spark, dir)
    val k = ClusteringQueries.K
    val n = pre.count()
    val cells = spark.range(k).select(col("id").cast("int").as("cell"))
    val nb = pre.groupBy("cell").agg(count(lit(1)).as("n_before"))
    val na = post.groupBy("cell").agg(count(lit(1)).as("n_after"))
    val mv = pre
      .join(post.select(col("vec_id"), col("cell").as("cell_after")), Seq("vec_id"))
      .filter(col("cell") =!= col("cell_after"))
      .groupBy("cell").agg(count(lit(1)).as("moved_out"))
    cells
      .join(nb, Seq("cell"), "left")
      .join(na, Seq("cell"), "left")
      .join(mv, Seq("cell"), "left")
      .select(col("cell"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"),
        coalesce(col("moved_out"), lit(0L)).as("moved_out"),
        round(coalesce(col("n_before"), lit(0L)).cast("double") * lit(k)
          / lit(n.toDouble), 6).as("imb_before"),
        round(coalesce(col("n_after"), lit(0L)).cast("double") * lit(k)
          / lit(n.toDouble), 6).as("imb_after"))
      .orderBy("cell")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ivf_rebalance" -> (qIvfRebalance _))

  /** The retrain + reassignment replay: AsgCte supplies the old
    * assignment; means per (cell, dim) follow the q_kmeans_1step
    * micro-unit discipline (round-to-micro longs, mean re-quantized,
    * seed fallback for empty cells); the new assignment is argmin of
    * list_distance to the retrained centroid lists with ties by cell. */
  override def oracles: Map[String, String] = Map(
    "q_ivf_rebalance" ->
      s"""WITH ${AnnQueries.AsgCte},
         |dims AS (SELECT CAST(unnest(generate_series(1,
         |    (SELECT len(cv) FROM c LIMIT 1))) AS INT) AS dim),
         |el2 AS (SELECT a.cell, n.v FROM asg a JOIN nrm n USING (vec_id)),
         |elems AS (SELECT cell, generate_subscripts(v, 1) AS dim, unnest(v) AS mv FROM el2),
         |means AS (SELECT cell, dim, count(*) AS n,
         |    sum(CAST(round(mv * 1000000.0) AS BIGINT)) AS sm
         |  FROM elems GROUP BY cell, dim),
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
         |tot AS (SELECT count(*) AS n FROM asg),
         |nb AS (SELECT cell, count(*) AS n_before FROM asg GROUP BY cell),
         |na AS (SELECT cell, count(*) AS n_after FROM nasg GROUP BY cell),
         |mv AS (SELECT a.cell, count(*) AS moved_out FROM asg a
         |  JOIN nasg b USING (vec_id) WHERE a.cell <> b.cell GROUP BY a.cell),
         |cg AS (SELECT cid AS cell FROM c)
         |SELECT CAST(cg.cell AS INT) AS cell,
         |  CAST(COALESCE(nb.n_before, 0) AS BIGINT) AS n_before,
         |  CAST(COALESCE(na.n_after, 0) AS BIGINT) AS n_after,
         |  CAST(COALESCE(mv.moved_out, 0) AS BIGINT) AS moved_out,
         |  round(CAST(COALESCE(nb.n_before, 0) AS DOUBLE) * ${ClusteringQueries.K}
         |        / (SELECT n FROM tot), 6) AS imb_before,
         |  round(CAST(COALESCE(na.n_after, 0) AS DOUBLE) * ${ClusteringQueries.K}
         |        / (SELECT n FROM tot), 6) AS imb_after
         |FROM cg LEFT JOIN nb USING (cell) LEFT JOIN na USING (cell)
         |LEFT JOIN mv ON mv.cell = cg.cell
         |ORDER BY cell""".stripMargin)
}
