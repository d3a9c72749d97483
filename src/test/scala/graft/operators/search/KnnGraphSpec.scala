package graft.operators.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KnnGraphSpec extends SparkSpec {

  private lazy val emb = graft.Tables.embeddings(spark, SfDir)
    .select(col("vec_id"), col("embedding"))

  private lazy val rounds = KnnGraph.nnDescentRounds(emb, SfDir, KnnGraph.Degree, KnnGraph.Rounds)

  test("every round keeps at most K neighbors per node, none a self-loop") {
    rounds.foreach { g =>
      val rows = g.collect()
      assert(rows.forall(r => r.getLong(0) != r.getLong(1)), "self-loop edge")
      val deg = rows.groupBy(_.getLong(0)).map(_._2.length)
      assert(deg.max <= KnnGraph.Degree)
    }
  }

  test("per-node neighbor quality is monotone: mean kept sim never decreases") {
    val means = rounds.map(g =>
      g.agg(sum(col("sim").cast("decimal(25,6)")).cast("double") / count(lit(1)))
        .head().getDouble(0))
    means.zip(means.tail).foreach { case (a, b) =>
      assert(b >= a - 1e-9, s"round sim mean fell: $means")
    }
  }

  test("an exact top-K member, once found, is never evicted across rounds") {
    // per-node kept-neighbor SETS restricted to exact members only grow
    val m = math.max(1L, math.ceil(emb.count() / KnnGraph.SampleTarget.toDouble).toLong)
    val ev = emb.filter(col("vec_id") % m === 0)
      .select(col("vec_id").as("i"), col("embedding").as("emb_i"))
    val exact = graft.plans.TopKPerGroup(
      emb.select(col("vec_id").as("j"), col("embedding").as("emb_j"))
        .crossJoin(broadcast(ev)).filter(col("i") =!= col("j"))
        .select(col("i"), col("j"),
          (-round(graft.functions.VectorOps.cosine_sim(col("emb_i"), col("emb_j")), 6))
            .as("neg_sim")),
      Seq("i"), Seq("neg_sim", "j"), KnnGraph.K)
      .select(col("i"), col("j"))
    val exactSets = exact.collect().groupBy(_.getLong(0))
      .map { case (i, rs) => i -> rs.map(_.getLong(1)).toSet }
    val foundPerRound = rounds.map { g =>
      g.select("i", "j").collect()
        .filter(r => exactSets.get(r.getLong(0)).exists(_.contains(r.getLong(1))))
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    foundPerRound.zip(foundPerRound.tail).foreach { case (prev, next) =>
      assert(prev.subsetOf(next),
        s"exact edges evicted: ${prev -- next}")
    }
  }

  test("q_knn_graph reports monotone non-decreasing recall with bounded edges") {
    val out = KnnGraph.qKnnGraph(spark, SfDir).collect()
    assert(out.map(_.getAs[Int]("round")).toSeq === (0 to KnnGraph.Rounds))
    val recalls = out.map(_.getAs[Double]("recall")).toSeq
    recalls.zip(recalls.tail).foreach { case (a, b) =>
      assert(b >= a, s"recall fell across rounds: $recalls")
    }
    val n = emb.count()
    out.foreach(r => assert(r.getAs[Long]("n_edges") <= n * KnnGraph.Degree))
  }

  test("the descent is deterministic: a fresh un-memoized build produces identical edge sets") {
    val a = rounds.last.select("i", "j").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = KnnGraph.buildRounds(emb, KnnGraph.Degree, KnnGraph.Rounds)
      .last.select("i", "j").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }

  test("a corpus with n <= Degree seeds no self-loops") {
    // ring stride s = n maps i to itself; the seed filter must drop it
    // (lockstep with the oracle's seed CTE) — before the fix a tiny
    // corpus shipped sim-1.0 self-edges that no round could evict
    import org.apache.spark.sql.expressions.Window
    val tiny = emb.limit(12)
      .withColumn("vec_id",
        row_number().over(Window.orderBy("vec_id")).cast("long") - 1L)
      .select(col("vec_id"), col("embedding"))
    val gs = KnnGraph.buildRounds(tiny, KnnGraph.Degree, 1)
    gs.foreach { g =>
      val rows = g.collect()
      assert(rows.nonEmpty)
      assert(rows.forall(r => r.getLong(0) != r.getLong(1)),
        "tiny-corpus build shipped a self-loop")
    }
  }

  test("all three scoring tiers are bit-identical (shuffle / broadcast / sliced)") {
    // The bounded-scratch tiers must produce the same scored set as the
    // plain one-shuffle plan — broadcast only changes the join strategy,
    // and slicing only partitions the pair frame (no consumer sees union
    // order). Drives the exact code paths the sf10 probe's disk-exhaust
    // finding made load-bearing.
    val pairs = emb.select(col("vec_id").as("i"))
      .crossJoin(emb.select(col("vec_id").as("j")))
      .filter(col("i") =!= col("j") && (col("i") + col("j")) % 7 === 0)
    val nPairs = pairs.count()
    val nEmb = emb.count()
    val dim = KnnGraph.dimOf(emb)
    def s(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val shuffle = s(KnnGraph.scoreSliced(pairs, emb, 1L, nEmb, dim, embBudget = 0L))
    val bcast = s(KnnGraph.scoreSliced(pairs, emb, 1L, nEmb, dim))
    val sliced = s(KnnGraph.scoreSliced(pairs, emb, nPairs, nEmb, dim,
      slicePairs = 1000L, embBudget = 0L))
    assert(shuffle === bcast && shuffle === sliced && shuffle.nonEmpty)
  }
}
