package graft.operators.analytics

import graft.SparkSpec

class DriftSpec extends SparkSpec {

  test("embedding drift: deciles cover the reference evenly, PSI consistent with terms") {
    val rows = AnalyticsQueries.qEmbeddingDrift(spark, SfDir).collect()
    assert(rows.length == 10)
    val nRef = rows.map(_.getLong(1)).sum
    val nCur = rows.map(_.getLong(2)).sum
    val total = graft.Tables.embeddings(spark, SfDir).count()
    assert(nRef + nCur == total, "every vector must land in exactly one bin")
    // decile edges of the reference: each bin holds ~10% of the reference
    // (exact order statistics — ties can shift a bin by a few rows)
    rows.foreach { r =>
      assert(math.abs(r.getLong(1) - nRef / 10.0) <= math.max(3.0, nRef * 0.05),
        s"bin ${r.getInt(0)} reference count ${r.getLong(1)} far from decile ${nRef / 10.0}")
    }
    // reported PSI equals the sum of the per-bin terms on every row
    val psi = rows.map(_.getDouble(4)).distinct
    assert(psi.length == 1, "psi must be a single total repeated per row")
    val termSum = rows.map(r => BigDecimal(r.getDouble(3))).sum.toDouble
    assert(approx(psi.head, termSum, 1e-6), s"psi ${psi.head} != Σterms $termSum")
    // even/odd halves of one corpus: no real drift — PSI under the 0.2 alarm
    assert(psi.head >= 0.0 && psi.head < 0.2, s"suspicious PSI ${psi.head}")
  }
}
