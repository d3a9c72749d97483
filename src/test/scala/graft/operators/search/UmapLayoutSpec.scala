package graft.operators.search

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Planted-structure laws for the UMAP refinement rounds — the
  * GraphEmbeddingSpec pattern, plus the law the verdict asked for:
  * refinement must INCREASE the separation the spectral init already
  * shows. */
class UmapLayoutSpec extends SparkSpec {

  import spark.implicits._

  private def undOf(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(p => (p._2, p._1))).distinct.toDF("i", "j")

  /** Between-centroid distance over mean within-cluster RMS spread in
    * the (y1, y2) plane — the separation figure of merit. */
  private def separation(y: DataFrame, a: Set[Long], b: Set[Long]): Double = {
    val rows = y.collect().map(r =>
      r.getLong(0) -> (r.getLong(1) / 1e6, r.getLong(2) / 1e6)).toMap
    def centroid(s: Set[Long]) = {
      val pts = s.toSeq.map(rows)
      (pts.map(_._1).sum / pts.size, pts.map(_._2).sum / pts.size)
    }
    def spread(s: Set[Long], c: (Double, Double)) = {
      val pts = s.toSeq.map(rows)
      math.sqrt(pts.map(p => {
        val dx = p._1 - c._1; val dy = p._2 - c._2; dx * dx + dy * dy
      }).sum / pts.size)
    }
    val ca = centroid(a); val cb = centroid(b)
    val between = math.sqrt(
      (ca._1 - cb._1) * (ca._1 - cb._1) + (ca._2 - cb._2) * (ca._2 - cb._2))
    between / (spread(a, ca) + spread(b, cb) + 1e-9)
  }

  test("two bridged cliques: refinement separates the clusters MORE than the spectral init") {
    // two 8-cliques joined by one bridge edge — the spectral init
    // separates them (the GraphEmbeddingSpec ground case); UMAP's
    // attraction (within-clique edges) + repulsion (mostly
    // cross-cluster negatives) must WIDEN that separation: the
    // notebooks' separated-scatter-plot law.
    val a = (0L until 8L).toSet
    val b = (10L until 18L).toSet
    val edges = (for { i <- a; j <- a if i < j } yield (i, j)) ++
      (for { i <- b; j <- b if i < j } yield (i, j)) ++ Seq((7L, 10L))
    val und = undOf(edges.toSeq)
    val (e1, e2) = GraphEmbedding.spectralPair(und)
    val y0 = e1.select(col("id"), (col("xm") * UmapLayout.InitScale).as("y1m"))
      .join(e2.select(col("id"), (col("xm") * UmapLayout.InitScale).as("y2m")),
        Seq("id"))
      .localCheckpoint(true)
    val ids = UmapLayout.ranksOf(
      und.select(col("i").as("vec_id")).distinct()).localCheckpoint(true)
    val n = ids.count()
    val yN = UmapLayout.layoutChain(und, ids, n, y0)
    val before = separation(y0, a, b)
    val after = separation(yN, a, b)
    assert(after > before,
      s"refinement did not widen cluster separation: $before -> $after")
  }

  test("the corpus layout covers every vector once and is finite") {
    val out = UmapLayout.qUmapLayout(spark, SfDir).collect()
    val n = graft.Tables.embeddings(spark, SfDir).count()
    assert(out.length.toLong === n)
    assert(out.map(_.getLong(0)).distinct.length.toLong === n)
    out.foreach { r =>
      val (y1, y2) = (r.getDouble(1), r.getDouble(2))
      assert(!y1.isNaN && !y1.isInfinite && !y2.isNaN && !y2.isInfinite)
      // per-round moves are bounded by alpha*Clip, so 10 rounds from a
      // ~10-unit init cannot leave a generous envelope
      assert(math.abs(y1) < 200 && math.abs(y2) < 200,
        s"vec ${r.getLong(0)} escaped the layout envelope: ($y1, $y2)")
    }
  }

  test("refinement actually moved the corpus layout off the spectral init") {
    val init = GraphEmbedding.qGraphEmbedding(spark, SfDir)
      .select(col("vec_id"), (col("e1") * UmapLayout.InitScale).as("y1"),
        (col("e2") * UmapLayout.InitScale).as("y2"))
    val moved = UmapLayout.qUmapLayout(spark, SfDir)
      .join(init.withColumnRenamed("y1", "i1").withColumnRenamed("y2", "i2"),
        Seq("vec_id"))
      .filter(abs(col("y1") - col("i1")) + abs(col("y2") - col("i2")) > 1e-6)
      .count()
    assert(moved > 0L, "no node moved during refinement")
  }
}
