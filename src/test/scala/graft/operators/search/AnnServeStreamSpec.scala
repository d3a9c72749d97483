package graft.operators.search

import graft.SparkSpec

class AnnServeStreamSpec extends SparkSpec {

  test("streaming serve returns exactly the batch probe's rows") {
    val stream = AnnQueries.qAnnServeStream(spark, SfDir).collect().toSeq
    val batch = AnnQueries.qIvfBatch(spark, SfDir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      "foreachBatch serve must match the batch probeBatch plan row-for-row")
  }

  test("re-running the serve stream is deterministic (scratch dirs reset)") {
    val a = AnnQueries.qAnnServeStream(spark, SfDir).collect().toSeq
    val b = AnnQueries.qAnnServeStream(spark, SfDir).collect().toSeq
    assert(a == b)
  }
}
