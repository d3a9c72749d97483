package graft.operators.search

import graft.QueryModule
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-index OPTIMIZE drill — the maintenance pass that closes the
  * graph lifecycle the way q_ivf_rebalance closes the IVF's: incremental
  * appends ([[GraphIndex.append]]) insert each batch well but never
  * revisit old nodes far from the batch, so list quality drifts as
  * appends accumulate (the reciprocal-share stat is the trigger
  * signal); [[GraphIndex.optimize]] runs full NN-descent rounds over
  * the LIVE artifact — from its current adjacency, not from seeds — and
  * rewrites only the buckets whose lists changed.
  *
  * The drill grades recall@10 + reciprocal share of (0) the appended
  * artifact (the q_graph_append pipeline's output), (1) after ONE
  * optimize round, and (2) the from-scratch full rebuild, all on the
  * SAME exact truth. The law: optimize is monotone — an exact top-K
  * member in a list can never be evicted (at most K−1 vectors are
  * strictly closer, and lists keep Degree ≥ K edges), so optimized
  * recall ≥ appended recall, spec-asserted. Deterministic throughout →
  * the optimize round replays in DuckDB as one more descent-step CTE
  * block on top of the shared [[GraphIndex.appendCtes]] chain. */
object GraphOptimize extends QueryModule {

  /** Graded depth (exact top-K membership). */
  val K = GraphIndex.K

  /** Descent rounds one optimize call runs in the drill. */
  val Rounds = 1

  /** Appended artifact (shared with q_graph_append via the
    * halfAndAppended memo) and its optimized successor, built once per
    * dir in a separate scratch artifact so the optimize never mutates
    * the append drill's. */
  private val memo =
    new graft.BoundedMemo[String, (DataFrame, DataFrame)](KnnGraph.MemoCap)

  private[search] def appendedAndOptimized(spark: SparkSession,
                                           dir: String): (DataFrame, DataFrame) =
    memo.getOrElseUpdate(dir) {
      val emb = KnnGraph.e(spark, dir)
      val gApp = GraphIndex.halfAndAppended(spark, dir)._2
      val idx = AnnQueries.scratch(
        s"graft_graph_opt_v${GraphIndex.BuildVersion}", dir)
      GraphIndex.build(spark, idx, gApp, emb)
      GraphIndex.optimize(spark, idx, emb, Rounds)
      (gApp, GraphIndex.edges(spark, idx).localCheckpoint(true))
    }

  /** appended → optimized → full_rebuild on the shared exact truth. */
  def qGraphOptimize(spark: SparkSession, dir: String): DataFrame = {
    val emb = KnnGraph.e(spark, dir)
    val n = emb.count()
    val m = KnnGraph.evalModulus(n, GraphIndex.AppendMod)
    val ev = emb.filter(col("vec_id") % m === 0)
      .select(col("vec_id").as("i"), col("embedding").as("emb_i"))
    val exact = GraphIndex.exactTopK(emb, ev).localCheckpoint(true)
    val nEv = ev.count()
    val (gApp, gOpt) = appendedAndOptimized(spark, dir)
    val gFull = GraphIndex.finalGraph(spark, dir)
    Seq(("appended", 0, gApp), ("optimized", 1, gOpt),
        ("full_rebuild", 2, gFull)).map { case (name, ord, g) =>
      val edgesN = g.agg(count(lit(1)).as("n_edges"))
      val hits = g.join(exact, Seq("i", "j"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
      edgesN.crossJoin(broadcast(hits))
        .crossJoin(broadcast(GraphIndex.recipCount(g)))
        .select(
          lit(ord).as("phase_ord"), lit(name).as("phase"),
          col("n_edges"), lit(nEv).as("n_eval"),
          round(col("n_hits").cast("double") / lit(nEv * K), 6).as("recall"),
          round(col("n_recip").cast("double") / col("n_edges"), 6).as("recip_share"))
    }.reduce(_.unionByName(_)).orderBy("phase_ord")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_graph_optimize" -> (qGraphOptimize _))

  /** One descent step from `inG` over the full-corpus `fe` embeddings —
    * [[KnnGraph.stepCtes]], the ONE SQL replay of the step kernel
    * (pool-capped; see [[KnnGraph.PoolCap]]). */
  private def stepCtes(inG: String, outG: String, p: String): String =
    KnnGraph.stepCtes(inG, outG, p, "fe")

  private def phaseRow(ord: Int, name: String, g: String): String =
    s"""SELECT $ord AS phase_ord, '$name' AS phase,
       |  (SELECT count(*) FROM $g) AS n_edges,
       |  (SELECT n_eval FROM nev) AS n_eval,
       |  round(CAST((SELECT count(*) FROM $g JOIN exactf USING (i, j)) AS DOUBLE)
       |        / ((SELECT n_eval FROM nev) * $K), 6) AS recall,
       |  round(CAST((SELECT count(*) FROM $g a
       |              WHERE EXISTS (SELECT 1 FROM $g b WHERE b.i = a.j AND b.j = a.i)) AS DOUBLE)
       |        / (SELECT count(*) FROM $g), 6) AS recip_share""".stripMargin

  override def oracles: Map[String, String] = Map.empty

  /** Dynamic since r14: the shared [[GraphIndex.appendCtes]] chain
    * emits only the corpus's actual entry branch (see
    * [[GraphIndex.insertEntryCtes]]). */
  override def dynamicOracles(spark: SparkSession,
                              dir: String): Map[String, String] = Map(
    "q_graph_optimize" ->
      s"""WITH ${KnnGraph.graphCtePrefix},
         |${GraphIndex.appendCtes(GraphIndex.buildWalkBranch(spark, dir))},
         |${(1 to Rounds).map(r =>
              stepCtes(if (r == 1) "gapp" else s"gopt${r - 1}",
                if (r == Rounds) "gopt" else s"gopt$r", s"op$r"))
            .mkString(",\n")},
         |evm AS (SELECT CASE WHEN m % ${GraphIndex.AppendMod} = 0 THEN m + 1 ELSE m END AS m FROM prm),
         |ev AS MATERIALIZED (SELECT id, v FROM e WHERE id % (SELECT m FROM evm) = 0),
         |nev AS (SELECT count(*) AS n_eval FROM ev),
         |exactf AS MATERIALIZED ${KnnGraph.exactTopKSql("ev", "id", "v", "e", "i", "j", K)}
         |${phaseRow(0, "appended", "gapp")}
         |UNION ALL
         |${phaseRow(1, "optimized", "gopt")}
         |UNION ALL
         |${phaseRow(2, "full_rebuild", s"g${KnnGraph.Rounds}")}
         |ORDER BY phase_ord""".stripMargin)
}
