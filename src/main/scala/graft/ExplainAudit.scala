package graft
import org.apache.spark.sql.SparkSession
/** Prints formatted plans for representative queries — the SURVEY §6
  * pushdown/broadcast/codegen claims are auditable from this output. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.build("8") // registers GraftExtensions (TopKPerGroup etc.)
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_agg", "q_join_agg", "q_topk_bruteforce", "q_chunk_sim_stats",
        "q_nearest_centroid", "q_dsir_weights", "q_bloom_dedup", "q_nprobe_sweep",
        "q_bucketed_join", "q_event_funnel", "q_props_agg", "q_props_topk",
        "q_ann_filtered", "q_graph_stats", "q_graph_filtered",
        // r13 surface (r14 audit extension; the load-bearing plan
        // properties are additionally spec-asserted in GraphPlanAuditSpec)
        "q_graph_serve", "q_umap_layout", "q_kmv_distinct",
        "q_graph_drift_optimize", "q_token_pretrained")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
