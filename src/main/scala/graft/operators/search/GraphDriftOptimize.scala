package graft.operators.search

import graft.QueryModule
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The graph index's DRIFT → OPTIMIZE loop, closed end to end — the
  * graph sibling of q_drift_rebalance (the IVF loop): the reference
  * periodically re-clusters and merges labels back when the corpus has
  * moved (update-etiquetas.ipynb); for an HNSW-class artifact the same
  * maintenance discipline is "run an optimize pass once enough new data
  * has been appended through the incremental path":
  *
  *  1. '''t0''': the artifact is built on the base corpus and grows by
  *     incremental appends ([[GraphIndex.halfAndAppended]] — the
  *     q_graph_append lifecycle: 4/5 build + 1/5 append).
  *  2. '''monitor''': the appended share (rows added since the last
  *     full pass / live total — derivable from the meta's n against a
  *     recorded base; the drill derives it from its own lifecycle
  *     split). This is the segment-merge policy every production index
  *     ships (Lucene merges on growth ratio): appends insert each batch
  *     well but never revisit old nodes far from the batch, so list
  *     staleness grows WITH the appended share. The share-based trigger
  *     fires at every corpus size by measurement — unlike the
  *     reciprocal-share stat, which at small corpora sits HIGHER on the
  *     appended artifact than on a fresh build (measured r13: 0.8724 vs
  *     0.8632 at sf0.001) and so cannot gate the loop scale-independently;
  *     recip_share is still REPORTED before/after as a health outcome.
  *  3. '''actuate''': share > [[ShareBar]] → [[GraphIndex.optimize]]
  *     (one full NN-descent round over the live artifact — shared with
  *     q_graph_optimize's memoized build, so the drill adds no second
  *     optimize pass).
  *  4. '''verify''': recall@[[K]] against the exact truth and the
  *     reciprocal-edge share, before vs after.
  *
  * One summary row: (app_share, share_bar, fired, n_edges_before,
  * recall_before, recip_before, n_edges_after, recall_after,
  * recip_after). The decision is DATA-driven in both engines: `fired`
  * compares the UNROUNDED share (two exact integer counts divided —
  * bit-identical IEEE doubles in both engines, no rounding boundary in
  * the predicate), and the oracle's after-stats read a branch-selected
  * frame (the gapp/gopt CASE the r12 drift-rebalance advice
  * established), so a corpus whose growth stays under the bar reports
  * the untouched artifact identically in both engines. The quiet case
  * is additionally spec-pinned: a zero-append lifecycle must not fire.
  */
object GraphDriftOptimize extends QueryModule {

  /** Graded depth (exact top-K membership). */
  val K = GraphIndex.K

  /** Fire the optimize pass when ≥ 10% of the live corpus arrived
    * through appends since the last full pass — the usual segment-merge
    * operating band; the drill's lifecycle plants 1/[[GraphIndex.AppendMod]]
    * = 20%, safely above, and the measured share still decides. */
  val ShareBar = 0.1

  /** (unrounded share, fired, before-edges, after-edges), memoized per
    * dir — the lifecycle and (when fired) the optimize pass run ONCE;
    * the report grading is rebuilt per call (bench honesty). */
  private val memo = new graft.BoundedMemo[
    String, (Double, Boolean, DataFrame, DataFrame)](KnnGraph.MemoCap)

  /** THE gate: unrounded share (exact IEEE division of two counts —
    * bit-identical in both engines) compared STRICTLY against the bar,
    * so share == bar does not fire (quiet-case boundary, spec-pinned). */
  private[search] def decide(nNew: Long, n: Long): (Double, Boolean) = {
    val share = nNew.toDouble / n
    (share, share > ShareBar)
  }

  private[search] def loopState(spark: SparkSession,
                                dir: String): (Double, Boolean, DataFrame, DataFrame) =
    memo.getOrElseUpdate(dir) {
      val emb = KnnGraph.e(spark, dir)
      val n = emb.count()
      val nNew = emb.filter(
        col("vec_id") % GraphIndex.AppendMod === GraphIndex.NewResidue).count()
      val (share, fired) = decide(nNew, n)
      val gApp = GraphIndex.halfAndAppended(spark, dir)._2
      val gAfter =
        if (fired) GraphOptimize.appendedAndOptimized(spark, dir)._2 else gApp
      (share, fired, gApp, gAfter)
    }

  def qGraphDriftOptimize(spark: SparkSession, dir: String): DataFrame = {
    val (share, fired, gB, gA) = loopState(spark, dir)
    val emb = KnnGraph.e(spark, dir)
    val n = emb.count()
    val m = KnnGraph.evalModulus(n, GraphIndex.AppendMod)
    val ev = emb.filter(col("vec_id") % m === 0)
      .select(col("vec_id").as("i"), col("embedding").as("emb_i"))
    val exact = GraphIndex.exactTopK(emb, ev).localCheckpoint(true)
    val nEv = ev.count()
    def statsOf(g: DataFrame, sfx: String): DataFrame =
      g.agg(count(lit(1)).as(s"n_edges_$sfx"))
        .crossJoin(broadcast(g.join(exact, Seq("i", "j"), "left_semi")
          .agg(count(lit(1)).as("n_hits"))))
        .crossJoin(broadcast(GraphIndex.recipCount(g)))
        .select(col(s"n_edges_$sfx"),
          round(col("n_hits").cast("double") / lit(nEv * K), 6).as(s"recall_$sfx"),
          round(col("n_recip").cast("double") / col(s"n_edges_$sfx"), 6)
            .as(s"recip_$sfx"))
    statsOf(gB, "before").crossJoin(broadcast(statsOf(gA, "after")))
      .select(
        round(lit(share), 6).as("app_share"), lit(ShareBar).as("share_bar"),
        lit(fired).as("fired"),
        col("n_edges_before"), col("recall_before"), col("recip_before"),
        col("n_edges_after"), col("recall_after"), col("recip_after"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_graph_drift_optimize" -> (qGraphDriftOptimize _))

  private def statSql(g: String, sfx: String): String =
    s"""(SELECT count(*) FROM $g) AS n_edges_$sfx,
       |  round(CAST((SELECT count(*) FROM $g JOIN exactf USING (i, j)) AS DOUBLE)
       |        / ((SELECT n_eval FROM nev) * $K), 6) AS recall_$sfx,
       |  round(CAST((SELECT count(*) FROM $g a
       |              WHERE EXISTS (SELECT 1 FROM $g b WHERE b.i = a.j AND b.j = a.i)) AS DOUBLE)
       |        / (SELECT count(*) FROM $g), 6) AS recip_$sfx""".stripMargin

  /** Full replay: the append lifecycle ([[GraphIndex.appendCtes]] →
    * gapp), one optimize descent round (gopt), the measured share, and
    * a branch-SELECTED after-frame — both engines follow the same fired
    * predicate on the unrounded share. */
  override def oracles: Map[String, String] = Map.empty

  /** Dynamic since r14: the shared [[GraphIndex.appendCtes]] chain
    * emits only the corpus's actual entry branch. */
  override def dynamicOracles(spark: SparkSession,
                              dir: String): Map[String, String] = Map(
    "q_graph_drift_optimize" ->
      s"""WITH ${KnnGraph.graphCtePrefix},
         |${GraphIndex.appendCtes(GraphIndex.buildWalkBranch(spark, dir))},
         |${KnnGraph.stepCtes("gapp", "gopt", "do1", "fe")},
         |shr AS (SELECT
         |    CAST((SELECT count(*) FROM e
         |          WHERE id % ${GraphIndex.AppendMod} = ${GraphIndex.NewResidue}) AS DOUBLE)
         |    / (SELECT n FROM prm) AS s),
         |gaft AS MATERIALIZED (
         |  SELECT i, j FROM gopt WHERE (SELECT s FROM shr) > $ShareBar
         |  UNION ALL
         |  SELECT i, j FROM gapp WHERE (SELECT s FROM shr) <= $ShareBar),
         |evm AS (SELECT CASE WHEN m % ${GraphIndex.AppendMod} = 0 THEN m + 1 ELSE m END AS m FROM prm),
         |ev AS MATERIALIZED (SELECT id, v FROM e WHERE id % (SELECT m FROM evm) = 0),
         |nev AS (SELECT count(*) AS n_eval FROM ev),
         |exactf AS MATERIALIZED ${KnnGraph.exactTopKSql("ev", "id", "v", "e", "i", "j", K)}
         |SELECT round((SELECT s FROM shr), 6) AS app_share,
         |  $ShareBar AS share_bar,
         |  (SELECT s FROM shr) > $ShareBar AS fired,
         |  ${statSql("gapp", "before")},
         |  ${statSql("gaft", "after")}""".stripMargin)
}
