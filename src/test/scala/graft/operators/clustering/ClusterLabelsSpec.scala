package graft.operators.clustering

import graft.SparkSpec

class ClusterLabelsSpec extends SparkSpec {

  test("five ranked distinctive terms per cluster, scores non-increasing") {
    val rows = ClusterLabels.qClusterLabels(spark, SfDir).collect()
    assert(rows.length == ClusteringQueries.K * 5)
    rows.groupBy(_.getInt(0)).foreach { case (cid, rs) =>
      val byRank = rs.sortBy(_.getLong(1))
      assert(byRank.map(_.getLong(1)).toSeq == (1L to 5L), s"ranks off in $cid")
      val scores = byRank.map(_.getDouble(5)).toSeq
      assert(scores == scores.sorted.reverse, s"scores not ranked in $cid")
      val terms = rs.map(_.getString(2)).toSet
      assert(terms.size == 5, s"duplicate label terms in $cid")
    }
  }

  test("labeling is deterministic across invocations") {
    val a = ClusterLabels.qClusterLabels(spark, SfDir).collect().toSeq
    val b = ClusterLabels.qClusterLabels(spark, SfDir).collect().toSeq
    assert(a == b)
  }
}
