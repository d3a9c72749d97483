package graft.operators.search

import graft.SparkSpec
import graft.operators.clustering.ClusteringQueries
import org.apache.spark.sql.functions._

/** Laws of the closed drift → rebalance loop (q_drift_rebalance). */
class DriftRebalanceSpec extends SparkSpec {

  test("the monitor is quiet without drift: same-distribution eras stay under the PSI bar") {
    // the eras are random halves of the same synthetic distribution —
    // a monitor that fires here would rebalance in a steady state
    // forever (the false-positive failure mode of the thesis's loop)
    val ref = DriftRebalance.refCorpus(spark, SfDir)
    val cur = DriftRebalance.curCorpus(spark, SfDir, shift = 0.0)
    val psi = DriftRebalance.psiOf(ref, cur)
    assert(psi < DriftRebalance.PsiBar,
      s"no-drift PSI $psi breached the bar ${DriftRebalance.PsiBar}")
  }

  test("the planted shift fires the monitor and the loop actually ran") {
    val (psi, fired, _, post) = DriftRebalance.loopState(spark, SfDir)
    assert(psi > DriftRebalance.PsiBar, s"planted drift PSI $psi under the bar")
    assert(fired, "loop did not fire on planted drift")
    // the rebalance rewrote the artifact: the post frame is readable
    // and covers the whole corpus exactly once
    val n = graft.Tables.embeddings(spark, SfDir).count()
    assert(post.count() === n)
    assert(post.select(col("vec_id")).distinct().count() === n)
  }

  test("the rebalance lowers the skew bar the monitor complained about") {
    val (_, _, pre, post) = DriftRebalance.loopState(spark, SfDir)
    val n = pre.count().toDouble
    def mi(df: org.apache.spark.sql.DataFrame): Double = df
      .groupBy("cell").agg(count(lit(1)).as("c"))
      .agg(max(col("c") * lit(ClusteringQueries.K) / lit(n))).head().getDouble(0)
    val k = ClusteringQueries.K
    val before = mi(pre)
    val after = mi(post)
    assert(after <= before,
      s"rebalance did not lower the max load factor: $before -> $after (k=$k)")
  }

  test("post-rebalance assignment equals one deterministic Lloyd step from the pre state") {
    // the actuator law: the rewritten cells are exactly what
    // retrainedCentroids + nearest-centroid reassignment produce from
    // the pre-rebalance artifact state (micro-unit arithmetic, so
    // equality is exact, not approximate)
    val (_, _, pre, post) = DriftRebalance.loopState(spark, SfDir)
    val ref = DriftRebalance.refCorpus(spark, SfDir)
    val cur = DriftRebalance.curCorpus(spark, SfDir, DriftRebalance.Shift)
    val corpus = ref.unionByName(cur)
    val cs = ref.orderBy("vec_id").limit(ClusteringQueries.K)
      .select(graft.functions.VectorOps.vec_normalize(col("embedding")))
      .collect().map(_.getSeq[Double](0).toIndexedSeq).toIndexedSeq
    val data = corpus.join(pre, Seq("vec_id")).select(col("vec_id"),
      col("embedding"), col("cell"))
    val ncs = IvfIndex.retrainedCentroids(data, cs)
    val expected = corpus.withColumn("cell",
      graft.functions.NearestCentroid(
        graft.functions.VectorOps.vec_normalize(col("embedding")), ncs)
        .getField("centroid_id").cast("int"))
      .select(col("vec_id"), col("cell"))
    assert(post.join(expected, Seq("vec_id", "cell"), "left_anti").isEmpty &&
      expected.join(post, Seq("vec_id", "cell"), "left_anti").isEmpty,
      "post-rebalance assignment diverged from the deterministic Lloyd step")
  }
}
