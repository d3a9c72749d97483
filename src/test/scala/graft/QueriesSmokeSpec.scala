package graft

/** Every declared query runs at sf0.001, returns rows, and every oracle key
  * points at a declared query. Also the scale audit: no query's physical
  * plan may contain a CartesianProduct, and BroadcastNestedLoopJoin is
  * allowed only where the non-equi side is bounded by construction. */
class QueriesSmokeSpec extends SparkSpec {

  /** Queries whose plans legitimately contain a BroadcastNestedLoopJoin —
    * each one joins against a frame that is bounded regardless of input
    * scale, so the nested loop never sees two large sides:
    *  - q_bm25 / q_hybrid_rrf: crossJoin with the ONE-ROW corpus-stats
    *    aggregate (N, avgdl);
    *  - q_ivf_batch: crossJoin with the driver-sized broadcast centroid
    *    table (≤ nCells rows);
    *  - q_silhouette_exact: the all-pairs diagnostic, hard-guarded to
    *    ≤ ClusteringQueries.MaxSilhouetteRows rows;
    *  - q_decontaminate: crossJoin of two ONE-ROW aggregate summaries;
    *  - q_temperature_mix: crossJoin with the ONE-ROW weight normalizer;
    *  - q_rank_metrics: crossJoin of ONE-ROW DCG and IDCG aggregates;
    *  - q_cluster_validity: crossJoin of three ONE-ROW summaries (global
    *    W/n, B, and the k-row-derived Davies-Bouldin scalar);
    *  - q_ivfpq_recall: crossJoin of the ONE-ROW recall aggregate with the
    *    ONE-ROW candidate-count aggregate;
    *  - q_kmeans_1step: crossJoin with the ONE-ROW inertia aggregate;
    *  - q_leak_safe_split: crossJoin with the ONE-ROW leak-audit aggregate;
    *  - q_ann_filtered_recall: crossJoin of the ONE-ROW hit-count
    *    aggregate with the ONE-ROW exact-match-count aggregate;
    *  - q_knn_graph: the exact-truth eval join against the DETERMINISTIC
    *    sample (≤ KnnGraph.SampleTarget broadcast rows) plus ONE-ROW
    *    recall-row assembly crossJoins — the descent itself is
    *    equi-joined;
    *  - q_graph_serve: same contract — the exact-truth grading join
    *    against the ≤ GraphServe.QueryTarget broadcast query sample plus
    *    ONE-ROW recall-row assembly; the beam rounds themselves are
    *    equi-joined on the graph's node ids;
    *  - q_graph_append / q_graph_stats / q_graph_filtered: the same
    *    graph-family grading shape — ONE-ROW summary crossJoins (edge
    *    count × hit count; degree stats × reciprocity count) and the
    *    sample-bounded exact-truth broadcast; every build/insert/serve
    *    round is equi-joined. The insertion beam's entry fan-out is a
    *    constant-key equi-join against the ≤ Entries-row broadcast
    *    entry set (the GraphServe.entryPairs pattern). */
  private val boundedBnlj = Set(
    "q_bm25", "q_hybrid_rrf", "q_ivf_batch", "q_silhouette_exact",
    "q_decontaminate", "q_temperature_mix", "q_rank_metrics",
    "q_cluster_validity", "q_ivfpq_recall", "q_kmeans_1step",
    "q_leak_safe_split", "q_ann_filtered_recall", "q_knn_graph",
    "q_graph_serve", "q_beam_sweep", "q_graph_delete",
    "q_graph_append", "q_graph_stats", "q_graph_filtered",
    "q_graph_append_stream", "q_graph_sq_serve", "q_graph_optimize",
    // 1-row broadcast report scalars (max-imbalance aggregates + the
    // moved-rows count) crossed into the single summary row
    "q_drift_rebalance",
    // same shape: 1-row before/after stats broadcasts crossed into the
    // single report row, plus the sample-bounded exact-truth broadcast
    "q_graph_drift_optimize",
    // 1-row sketch-estimate aggregates crossed with their 1-row exact
    // grading aggregates into the single report row
    "q_kmv_distinct", "q_kmv_quantiles")

  test("oracle keys ⊆ query keys") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, SfDir)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plan contains a CartesianProduct — unbounded at scale")
      if (!boundedBnlj(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plan contains a BroadcastNestedLoopJoin and is not on " +
            "the bounded whitelist — use an equi-join (band/bucket/salt) shape")
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
