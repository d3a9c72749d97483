package graft.tools

import graft.SparkSpec

class ScaleCorpusSpec extends SparkSpec {
  import spark.implicits._

  test("scaled replicates keyed rows with stride-shifted keys, keyless tables verbatim") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val out = ScaleCorpus.scaled(df, Seq("k"), 3).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out === Set(
      (1L, "a"), (2L, "b"),
      (1L + ScaleCorpus.Stride, "a"), (2L + ScaleCorpus.Stride, "b"),
      (1L + 2 * ScaleCorpus.Stride, "a"), (2L + 2 * ScaleCorpus.Stride, "b")))
    val dim = Seq((7L, "x")).toDF("k", "v")
    assert(ScaleCorpus.scaled(dim, Nil, 3).count() === 1)
  }

  test("re-scaling an already-scaled frame is rejected loudly, not silently collided") {
    val scaledOnce = ScaleCorpus.scaled(Seq((1L, "a")).toDF("k", "v"), Seq("k"), 2)
    val ex = intercept[IllegalArgumentException](
      ScaleCorpus.scaled(scaledOnce, Seq("k"), 2).collect())
    assert(ex.getMessage.contains("already scaled"))
  }

  test("an empty keyed table scales to empty instead of NPE-ing on the NULL max") {
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    assert(ScaleCorpus.scaled(empty, Seq("k"), 4).count() === 0)
  }
}
