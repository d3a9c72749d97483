package graft.operators.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphDeleteSpec extends SparkSpec {

  private lazy val out = GraphDelete.qGraphDelete(spark, SfDir).collect()

  test("no edge of the dropped or repaired graph touches a deleted node") {
    val (dropped, repaired) = GraphDelete.droppedAndRepaired(spark, SfDir)
    Seq(dropped, repaired).foreach { g =>
      val touching = g.filter(
        col("i") % GraphDelete.DeleteMod === 0 ||
        col("j") % GraphDelete.DeleteMod === 0).count()
      assert(touching === 0)
    }
  }

  test("repair keeps at most K edges per node and only improves each node's best neighbor") {
    val (dropped, repaired) = GraphDelete.droppedAndRepaired(spark, SfDir)
    val deg = repaired.collect().groupBy(_.getLong(0)).map(_._2.length)
    assert(deg.max <= GraphDelete.Degree)
    // the top-of-pool is monotone: repair pools are supersets per node
    // (the WORST kept sim may legitimately fall when repair fills slots
    // a deleted neighbor vacated — more edges, lower tail)
    val bestBefore = dropped.groupBy("i").agg(max(col("sim")).as("b"))
    val bestAfter = repaired.groupBy("i").agg(max(col("sim")).as("ba"))
    val fell = bestBefore.join(bestAfter, Seq("i"))
      .filter(col("ba") < col("b") - lit(1e-9)).count()
    assert(fell === 0)
  }

  test("q_graph_delete reports both phases with repaired recall >= dropped recall") {
    assert(out.map(_.getAs[String]("phase")).toSeq === Seq("dropped", "repaired"))
    val Seq(droppedR, repairedR) = out.map(_.getAs[Double]("recall")).toSeq
    assert(repairedR >= droppedR,
      s"repair lowered recall: $droppedR -> $repairedR")
    val Seq(eD, eR) = out.map(_.getAs[Long]("n_edges")).toSeq
    assert(eR >= eD, "repair lost edges")
  }

  test("delete health: repair does not degrade the reciprocal-edge share") {
    val Seq(sD, sR) = out.map(_.getAs[Double]("recip_share")).toSeq
    assert(sD > 0.0 && sD <= 1.0 && sR > 0.0 && sR <= 1.0)
    assert(sR >= sD - 0.05,
      s"repair degraded reciprocal share: $sD -> $sR — repaired lists are leaking asymmetric edges")
  }
}
