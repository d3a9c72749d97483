package graft.operators.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamNearDupSpec extends SparkSpec {

  test("streaming suppression equals the batch pair rule (min-id wins)") {
    val out = StreamNearDup.qStreamNeardup(spark, SfDir).collect()
    assert(out.nonEmpty)
    // every planted doc must be suppressed, attributed to its original
    val planted = out.filter(_.getLong(0) >= 1000000L)
    assert(planted.length == 20)
    planted.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) - 1000000L
        || r.getLong(1) < 1000000L, s"bad attribution: $r")
      assert(r.getDouble(2) >= 0.5)
    }
    // batch twin: suppressed == larger member of each verified batch pair
    val pairs = MinHashLsh.nearDupPairs(
      MinHashLsh.withPlantedDups(graft.Tables.documents(spark, SfDir)),
      minJaccard = 0.5).collect()
    val expect = pairs.map(_.getLong(1)).toSet
    assert(out.map(_.getLong(0)).toSet == expect,
      "streaming suppression set must equal the batch d2 set")
  }

  test("no band bucket approaches the skew cap (the oracle's validity regime)") {
    // the streaming guard sees only the prefix-so-far; it matches the
    // full-corpus oracle exactly as long as no bucket crosses
    // MaxBandBucket mid-stream. Assert the test corpus sits FAR below the
    // cap so that regime holds with margin.
    import graft.functions.MinHashSketch
    val docs = MinHashLsh.withPlantedDups(graft.Tables.documents(spark, SfDir))
    val perDoc = StreamNearDup.perDocSketches(docs)
    val maxBucket = perDoc
      .select(explode(array((0 until MinHashLsh.Bands).map { b =>
        struct((lit(b) +: (0 until MinHashLsh.RowsPerBand).map(r =>
          element_at(col("sig"), b * MinHashLsh.RowsPerBand + r + 1))): _*)
      }: _*)).as("bk"))
      .groupBy(col("bk")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(maxBucket * 10 <= MinHashLsh.MaxBandBucket,
      s"largest band bucket $maxBucket is within 10x of the skew cap " +
        s"${MinHashLsh.MaxBandBucket}; the streaming prefix guard could " +
        "diverge from the full-corpus oracle")
  }

  test("per-batch band probe reads ONLY matching store partitions") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val docs = graft.Tables.documents(spark, SfDir).limit(200)
    val store = java.nio.file.Files.createTempDirectory("graft_neardup_prune")
    try {
      val bandsDir = store.toString + "/bands"
      StreamNearDup.bandedWithBucket(StreamNearDup.perDocSketches(docs))
        .write.partitionBy("pbucket").mode("overwrite").parquet(bandsDir)
      val allBuckets = new java.io.File(bandsDir).listFiles()
        .filter(_.getName.startsWith("pbucket=")).map(_.getName).sorted
      assert(allBuckets.length > 4, "test corpus must span several buckets")
      val probe = Seq(allBuckets.head, allBuckets.last)
        .map(_.stripPrefix("pbucket=").toInt)
      val pruned = StreamNearDup.prunedBandStoreRead(spark, bandsDir, probe).get
      val rows = pruned.collect()
      assert(rows.nonEmpty)
      assert(rows.map(_.getAs[Int]("pbucket")).toSet == probe.toSet)
      // the SCAN itself must skip non-matching partitions, not post-filter
      val scans = pruned.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f }
      assert(scans.nonEmpty)
      val filesRead = scans.map(_.metrics("numFiles").value).sum
      val totalFiles = new java.io.File(bandsDir).listFiles()
        .filter(_.getName.startsWith("pbucket="))
        .map(d => d.listFiles().count(_.getName.endsWith(".parquet")).toLong).sum
      assert(filesRead < totalFiles,
        s"pruned probe read $filesRead of $totalFiles files — no pruning")
    } finally graft.Fs.deleteRecursively(store)
  }

  test("suppression decisions are independent of batch split") {
    // one-batch run computed straight from the frames (no staging needed)
    val docs = MinHashLsh.withPlantedDups(graft.Tables.documents(spark, SfDir))
    val b = StreamNearDup.perDocSketches(docs).persist()
    val oneShot = StreamNearDup.pairsAgainst(b, b, 0.5)
      .groupBy(col("d2")).agg(min(struct(col("d1"), col("jaccard"))).as("m"))
      .select(col("d2").as("doc_id"), col("m.d1").as("dup_of"),
        col("m.jaccard").as("jaccard"))
      .orderBy("doc_id").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    b.unpersist()
    val streamed = StreamNearDup.qStreamNeardup(spark, SfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(streamed == oneShot,
      "2-batch streaming result must equal the single-batch result")
  }
}
