package graft.operators.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-structure laws for the spectral graph embedding — the
  * LandmarkMdsSpec pattern: feed the kernel a graph whose spectral
  * geometry is known in closed form and assert the embedding recovers
  * it. */
class GraphEmbeddingSpec extends SparkSpec {

  import spark.implicits._

  private def undOf(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(p => (p._2, p._1))).distinct.toDF("i", "j")

  test("two disjoint cliques: e1 separates the components by sign, exactly") {
    // For two equal complete components the leading non-trivial
    // eigenvector of the random walk is (up to sign/scale) the
    // component indicator difference — the embedding must split the
    // cliques cleanly, the spectral-clustering ground case.
    val a = (0L until 8L)
    val b = (10L until 18L)
    val edges = (for { i <- a; j <- a if i != j } yield (i, j)) ++
      (for { i <- b; j <- b if i != j } yield (i, j))
    val (e1, _) = GraphEmbedding.spectralPair(undOf(edges.toSeq))
    val rows = e1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.size === 16)
    val sa = a.map(rows).toSet
    val sb = b.map(rows).toSet
    assert(sa.forall(_ != 0L) && sb.forall(_ != 0L),
      "a clique node embedded at zero")
    assert(sa.forall(_ > 0L) != sb.forall(_ > 0L) &&
      (sa.forall(_ > 0L) || sa.forall(_ < 0L)) &&
      (sb.forall(_ > 0L) || sb.forall(_ < 0L)),
      s"cliques not sign-separated: A=$sa B=$sb")
  }

  test("ring graph: the (e1, e2) plane recovers circular locality") {
    // C_n's leading non-trivial eigenpair is the cos/sin harmonic —
    // ring-adjacent nodes must embed far closer than antipodal ones.
    val n = 24
    val edges = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
    val (e1, e2) = GraphEmbedding.spectralPair(undOf(edges))
    val m1 = e1.collect().map(r => r.getLong(0) -> r.getLong(1) / 1e6).toMap
    val m2 = e2.collect().map(r => r.getLong(0) -> r.getLong(1) / 1e6).toMap
    def d2(i: Long, j: Long): Double = {
      val dx = m1(i) - m1(j); val dy = m2(i) - m2(j)
      dx * dx + dy * dy
    }
    val adj = (0 until n).map(i => d2(i, (i + 1) % n)).sum / n
    val anti = (0 until n).map(i => d2(i, (i + n / 2) % n)).sum / n
    assert(adj < anti / 4,
      s"ring locality not recovered: adjacent $adj vs antipodal $anti")
  }

  test("degenerate spectrum: a single-edge graph embeds at exact zeros instead of NaN") {
    // K2's lazy-walk spectrum is {1, 0}: after deflating the trivial
    // direction nothing survives, rms = 0, and an unguarded division
    // would put NaN into the micro-unit cast (Spark: silent 0L;
    // DuckDB: cast error — the r12 review's cross-engine divergence)
    val (e1, e2) = GraphEmbedding.spectralPair(undOf(Seq((0L, 1L))))
    assert(e1.count() === 2 && e2.count() === 2)
    assert(e1.collect().forall(_.getLong(1) === 0L), "e1 not exactly zero")
    assert(e2.collect().forall(_.getLong(1) === 0L), "e2 not exactly zero")
  }

  test("corpus embedding: full coverage, RMS-normalized coordinates, deterministic replay") {
    val out = GraphEmbedding.qGraphEmbedding(spark, SfDir)
    val n = graft.Tables.embeddings(spark, SfDir).count()
    val rows = out.collect()
    assert(rows.length.toLong === n, "a corpus vector is missing from the embedding")
    val rms1 = math.sqrt(rows.map(r => math.pow(r.getDouble(1), 2)).sum / n)
    val rms2 = math.sqrt(rows.map(r => math.pow(r.getDouble(2), 2)).sum / n)
    assert(rms1 > 0.5 && rms1 < 2.0, s"e1 not RMS-normalized: $rms1")
    assert(rms2 > 0.5 && rms2 < 2.0, s"e2 not RMS-normalized: $rms2")
    // e2 is D-orthogonal to e1 by construction — in the unweighted-RMS
    // sense they must at least be far from collinear
    val dot = rows.map(r => r.getDouble(1) * r.getDouble(2)).sum / n
    assert(math.abs(dot) < 0.5, s"e1 and e2 nearly collinear: <e1,e2>/n = $dot")
    // the kernel is deterministic: a fresh un-memoized replay on the
    // same undirected graph reproduces the micro-unit frames exactly
    val und = GraphIndex.und(GraphIndex.finalGraph(spark, SfDir))
    val (r1, r2) = GraphEmbedding.spectralPair(und)
    val (c1, c2) = GraphEmbedding.corpusPair(spark, SfDir)
    assert(r1.join(c1, Seq("id", "xm"), "left_anti").isEmpty &&
      c1.join(r1, Seq("id", "xm"), "left_anti").isEmpty, "e1 replay diverged")
    assert(r2.join(c2, Seq("id", "xm"), "left_anti").isEmpty &&
      c2.join(r2, Seq("id", "xm"), "left_anti").isEmpty, "e2 replay diverged")
  }
}
