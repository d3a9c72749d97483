package graft.operators.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphAppendStreamSpec extends SparkSpec {

  private lazy val out = GraphAppendStream.qGraphAppendStream(spark, SfDir).collect()
  private def phase(name: String) = out.find(_.getAs[String]("phase") == name).get

  test("the micro-batch ingest commits with ZERO full-corpus fingerprint scans") {
    // declared FIRST so the memoized ingest materializes inside this
    // test: every foreachBatch append must fold its batch delta into
    // the meta accumulator, never rescan the corpus (the r10 verdict's
    // O(corpus)-per-micro-batch finding)
    val before = GraphIndex.fingerprintScans.get()
    GraphAppendStream.streamedGraph(spark, SfDir)
    assert(GraphIndex.fingerprintScans.get() === before,
      "a streamed micro-batch commit ran a full-corpus fingerprint scan")
  }

  test("streamed micro-batch ingest stays in the one-shot append's recall class") {
    val streamed = phase("streamed").getAs[Double]("recall")
    val oneshot = phase("oneshot").getAs[Double]("recall")
    // sequential appends BEAT the bulk append here (0.991 vs 0.9868 at
    // sf0.001): each batch's insertion beams walk a graph already
    // holding the previous batches, and every batch runs its own
    // restricted repair round. The law is one-sided — streamed ingest
    // must never trail the bulk path materially; trailing would mean
    // continuous ingest degrades the index over time
    assert(streamed >= oneshot - 0.05,
      s"streamed $streamed trails oneshot $oneshot — incremental ingest degrades")
    assert(streamed >= 0.9, s"streamed recall $streamed")
  }

  test("the streamed artifact indexes every id with bounded degree and no self-loops") {
    val g = GraphAppendStream.streamedGraph(spark, SfDir).collect()
    assert(g.forall(r => r.getLong(0) != r.getLong(1)))
    val deg = g.groupBy(_.getLong(0)).map(_._2.length)
    assert(deg.max <= GraphIndex.Degree)
    val n = graft.Tables.embeddings(spark, SfDir).count()
    assert(g.map(_.getLong(0)).toSet.size.toLong === n,
      "an id has no out-edges after the streamed ingest")
  }

  test("both phases grade on the same nonzero eval sample") {
    assert(out.length === 2)
    val nev = out.map(_.getAs[Long]("n_eval")).distinct
    assert(nev.length === 1 && nev.head > 0)
  }
}
