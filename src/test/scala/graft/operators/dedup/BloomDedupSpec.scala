package graft.operators.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomDedupSpec extends SparkSpec {

  test("bloom dedup: counts are exact and consistent per source") {
    val rows = DedupQueries.qBloomDedup(spark, SfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nBatch, nDup, nKept) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nDup >= 0 && nDup <= nBatch)
      assert(nKept == nBatch - nDup, s"${r.getString(0)}: kept != batch - dup")
    }
    // the re-crawled slice (doc_id%10 == 0) must be caught as dups in full
    val docs = graft.Tables.documents(spark, SfDir)
    val expectDups = docs.filter(col("doc_id") % 10 === 0).count()
    assert(rows.map(_.getLong(2)).sum == expectDups,
      s"total dups ${rows.map(_.getLong(2)).sum} != re-crawled $expectDups")
  }

  test("bloom prefilter: zero false negatives, bounded false positives") {
    val (nBatch, survivors, trueDups) = DedupQueries.bloomCandidates(spark, SfDir)
    // no false negatives: every true dup must pass might_contain
    assert(survivors >= trueDups, s"bloom dropped a true dup: $survivors < $trueDups")
    // bounded FPs: at 16 bits/item FPP ~1%; allow 10% of the non-dup batch
    val fps = survivors - trueDups
    assert(fps <= math.max(2L, (nBatch - trueDups) / 10),
      s"excessive false positives: $fps of ${nBatch - trueDups} non-dups")
  }
}
