package graft.operators.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphOptimizeSpec extends SparkSpec {

  private lazy val out = GraphOptimize.qGraphOptimize(spark, SfDir).collect()
  private def phase(name: String) = out.find(_.getAs[String]("phase") == name).get

  test("three phases, full node coverage, degree bound, no self-loops") {
    assert(out.map(_.getAs[String]("phase")).toSeq ===
      Seq("appended", "optimized", "full_rebuild"))
    val (_, gOpt) = GraphOptimize.appendedAndOptimized(spark, SfDir)
    val rows = gOpt.collect()
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)), "self-loop after optimize")
    val deg = rows.groupBy(_.getLong(0)).map(_._2.length)
    assert(deg.max <= GraphIndex.Degree)
    val n = graft.Tables.embeddings(spark, SfDir).count()
    assert(rows.map(_.getLong(0)).toSet.size.toLong === n,
      "a node lost its out-edges during optimize")
  }

  test("the optimize law: recall is monotone non-decreasing over the optimize round") {
    // an exact top-K member in a list can never be evicted (at most K-1
    // vectors are strictly closer; lists keep Degree >= K edges), and a
    // descent round's pool is a superset of the old list
    val app = phase("appended").getAs[Double]("recall")
    val opt = phase("optimized").getAs[Double]("recall")
    assert(opt >= app, s"optimize LOWERED recall: $app -> $opt")
    val eApp = phase("appended").getAs[Long]("n_edges")
    val eOpt = phase("optimized").getAs[Long]("n_edges")
    assert(eOpt >= eApp, "optimize lost edges")
  }

  test("optimize heals health too: reciprocal share does not degrade") {
    val app = phase("appended").getAs[Double]("recip_share")
    val opt = phase("optimized").getAs[Double]("recip_share")
    assert(opt >= app - 0.05,
      s"optimize degraded reciprocal share: $app -> $opt")
  }

  test("optimize leaves no swap litter and the artifact stays readable") {
    GraphOptimize.appendedAndOptimized(spark, SfDir)
    val idx = AnnQueries.scratch(
      s"graft_graph_opt_v${GraphIndex.BuildVersion}", SfDir)
    assert(!new java.io.File(s"$idx/edges_appending").exists(), "scratch dir leaked")
    assert(!new java.io.File(s"$idx/edges_app_old").exists(), "aside dir leaked")
    assert(GraphIndex.edges(spark, idx).count() > 0)
  }
}
