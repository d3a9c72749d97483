package graft.operators.dedup

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** STREAMING near-duplicate suppression (SURVEY §2 "Streaming" ×
  * "Deduplication") — the ingest-time shape of MinHash dedup: documents
  * arrive in microbatches; each batch is shingled/sketched once, band-
  * joined against the accumulated signature STORE (plus itself), verified
  * with exact Jaccard, and near-dups of any earlier document are
  * suppressed. The store then absorbs the whole batch (kept AND
  * suppressed — matching against every seen doc keeps the decision rule
  * batch-split-independent).
  *
  * Semantics: with an id-ordered arrival (staged here as ordered files; a
  * production ingest replays a log), doc d is suppressed iff a verified
  * pair (x, d) with x < d exists — identical to the batch pipeline's
  * pair rule, which is why the oracle can replay it with the SAME CTEs as
  * q_dedup_minhash.
  *
  * Scale: per batch the work is batch-sized (shingle+sketch one pass, band
  * equi-join against the PRUNED store, candidate-only verification), and
  * nothing driver-side grows with the corpus or the batch count:
  *  - the band store is hash-PARTITIONED by `pbucket` (a bucket of the
  *    band key), so each microbatch reads only the partitions its own
  *    band keys hash into — the same pruned-probe pattern as
  *    IvfIndex.probeBatch, instead of rescanning the whole store;
  *  - the shingle-set store is hash-partitioned by `sbucket(doc_id)` and
  *    read only for the partitions holding candidate d1 docs;
  *  - suppression records stream to a per-batch parquet sink (at web-scale
  *    dup rates they are O(n) — a driver buffer would not survive);
  *  - the only driver-side values are the probed bucket ids, bounded by
  *    [[StoreBuckets]] by construction, never by data.
  * [[StoreBuckets]] is test-sized here; at 100 TB it scales with corpus
  * size (like IVF cell counts) so per-partition store files stay bounded.
  */
object StreamNearDup extends QueryModule {

  import MinHashLsh.{Bands, RowsPerBand, MaxBandBucket, coefA, coefB, P}

  /** Partition fan-out of the on-disk band/set stores (per-batch reads
    * prune to matching partitions). Test-sized here; scales with corpus
    * size in production, like IVF cell counts. */
  val StoreBuckets = 16

  private val keyColNames = (0 until RowsPerBand).map(r => s"k$r")

  /** Hash bucket of a band key — the band store's partition column. */
  private def pbucketCol: org.apache.spark.sql.Column =
    pmod(xxhash64(col("band") +: keyColNames.map(col): _*), lit(StoreBuckets)).cast("int")

  /** Hash bucket of a doc id — the set store's partition column. */
  private def sbucketOf(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(xxhash64(c), lit(StoreBuckets)).cast("int")

  /** Compact per-doc frame: MinHash signature sketch + distinct shingle
    * set — all the state dedup needs (never the text). */
  def perDocSketches(docs: DataFrame): DataFrame =
    MinHashLsh.shingleHashes(docs).groupBy(col("doc_id"))
      .agg(graft.functions.MinHashSketch(col("x"), coefA.toIndexedSeq,
        coefB.toIndexedSeq, P).as("sig"),
        collect_set(col("x")).as("s"))

  private def banded(perDoc: DataFrame): DataFrame = {
    val bandCols = (0 until Bands).map { b =>
      val rows = (0 until RowsPerBand).map(r =>
        element_at(col("sig"), b * RowsPerBand + r + 1).as(s"k$r"))
      struct(lit(b).as("band") +: rows: _*)
    }
    val keyCols = (0 until RowsPerBand).map(r => s"k$r")
    perDoc.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id") +: col("bk.band").as("band") +:
        keyCols.map(k => col(s"bk.$k").as(k)): _*)
  }

  /** Verified pairs (d1 < d2) where d1 ranges over `all` and d2 over
    * `probe` — the incremental-probe twin of
    * [[MinHashLsh.nearDupPairs]], with the same mega-bucket skew guard
    * (computed over `all`, the side whose buckets can bloat).
    *
    * Guard semantics under streaming: the cap applies to the PREFIX seen
    * so far — the only thing an ingest-time decision can see. A bucket
    * that crosses MaxBandBucket only once later batches arrive would make
    * early decisions differ from a full-corpus replay (and from the
    * batch-split-independence invariant), so the oracle contract holds in
    * the regime where no bucket approaches the cap — asserted for the
    * test corpora in StreamNearDupSpec; production corpora near the cap
    * should dedup in batch or tighten banding instead. */
  def pairsAgainst(all: DataFrame, probe: DataFrame,
                   minJaccard: Double): DataFrame =
    verify(
      candidatePairs(banded(all), banded(probe)),
      all.select(col("doc_id").as("d1"), col("s").as("s1")),
      probe.select(col("doc_id").as("d2"), col("s").as("s2")),
      minJaccard)

  /** Distinct candidate pairs (d1 < d2) from the band equi-join, with the
    * mega-bucket skew guard computed over `allBands` (the side whose
    * buckets can bloat). Extra columns (e.g. pbucket) ride along harmlessly
    * — only doc_id survives the select.
    *
    * The guard is a count WINDOW over the join keys, not a separate
    * groupBy + broadcast anti-join: the window's hash partitioning is
    * exactly the equi-join's required distribution, so the guard rides
    * the join's own shuffle — one pass over the store side per batch
    * instead of two plus a blocking broadcast build (measured ~1.3×
    * faster on the streaming path's per-batch `candidates` stage).
    * Filtering only the `all` side is sufficient: a pair needs both
    * sides of its bucket present, so dropping the bucket from one side
    * drops every pair it could produce — identical semantics to the
    * old two-sided anti-join. */
  private def candidatePairs(allBands: DataFrame, probeBands: DataFrame): DataFrame = {
    val joinKeys = "band" +: keyColNames
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(joinKeys.map(col): _*)
    val okAll = allBands
      .withColumn("bsz", count(lit(1)).over(w))
      .filter(col("bsz") <= MaxBandBucket).drop("bsz")
    okAll.alias("l").join(probeBands.alias("r"), joinKeys)
      .filter(col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("d1"), col("r.doc_id").as("d2"))
      .distinct()
  }

  /** Exact-Jaccard verification of candidate pairs against the two shingle
    * set sides. */
  private def verify(cand: DataFrame, sets1: DataFrame, sets2: DataFrame,
                     minJaccard: Double): DataFrame =
    sets1.join(broadcast(cand), Seq("d1")).join(sets2, Seq("d2"))
      .withColumn("inter", size(array_intersect(col("s1"), col("s2"))).cast("double"))
      .withColumn("uni", (size(col("s1")) + size(col("s2"))).cast("double") - col("inter"))
      .withColumn("jaccard", round(col("inter") / col("uni"), 6))
      .filter(col("jaccard") >= minJaccard)
      .select(col("d1"), col("d2"), col("jaccard"))

  /** Stage the planted corpus as two id-ordered files (originals, then
    * the +1e6 perturbed copies) so the file stream delivers ≥2 real
    * microbatches in arrival order. The staged content is a deterministic
    * function of the SOURCE parquet, so a complete prior staging is
    * reused (the corpus write was the dominant cost of re-running this
    * query) — keyed by [[graft.Fs.stageKey]], which fingerprints the
    * source file so a changed corpus or a sanitization collision can
    * never serve stale data. */
  private def stageOrderedFiles(spark: SparkSession, dir: String): String = {
    import java.nio.file.{Files, Paths}
    val key = graft.Fs.stageKey(dir, "documents.parquet")
    val stage = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_neardup_stream", key)
    if ((0 until 2).forall(i => Files.exists(stage.resolve(f"$i%05d.parquet"))))
      return stage.toString
    graft.Fs.sweepStaleKeys(stage.getParent, key)
    graft.Fs.deleteRecursively(stage)
    val docs = Tables.documents(spark, dir)
    graft.Fs.stageParts(stage, Seq(
      docs.select(col("doc_id"), col("text")),
      docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" planted near duplicate suffix")).as("text"))))
    stage.toString
  }

  /** Banded rows plus their store partition bucket. */
  private[dedup] def bandedWithBucket(perDoc: DataFrame): DataFrame =
    banded(perDoc).withColumn("pbucket", pbucketCol)

  /** Band-store schema on disk (pbucket is the partition column). */
  private def bandStoreSchema: StructType = StructType(
    StructField("doc_id", LongType) +: StructField("band", IntegerType) +:
      keyColNames.map(k => StructField(k, LongType)) :+
      StructField("pbucket", IntegerType))

  /** Set-store schema on disk (sbucket is the partition column). */
  private def setStoreSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("s", ArrayType(LongType)),
    StructField("sbucket", IntegerType)))

  private def supSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("dup_of", LongType),
    StructField("jaccard", DoubleType)))

  /** Read a partitioned store dir if it exists (explicit schema so an
    * empty/new store never trips parquet schema inference). */
  private def readStore(spark: SparkSession, dir: String,
                        schema: StructType): Option[DataFrame] =
    if (new java.io.File(dir).exists()) Some(spark.read.schema(schema).parquet(dir))
    else None

  /** The pruned per-batch view of the band store: only the partitions the
    * probe's own band keys hash into are read (static partition pruning on
    * the literal bucket list — the IvfIndex.probeBatch pattern). Exposed
    * for the spec that asserts the scan skips non-matching partitions. */
  private[dedup] def prunedBandStoreRead(spark: SparkSession, bandsDir: String,
                                         buckets: Seq[Int]): Option[DataFrame] =
    readStore(spark, bandsDir, bandStoreSchema)
      .map(_.filter(col("pbucket").isin(buckets.map(Integer.valueOf): _*)))

  /** Suppression record per near-dup detected at ingest: the incoming doc,
    * the earliest stored doc it matched, and that match's Jaccard. */
  def qStreamNeardup(spark: SparkSession, dir: String): DataFrame = {
    // microbatch-sized shuffles: each batch is corpus/batches rows, so 32
    // shuffle partitions is pure task overhead across the ~8 jobs a batch
    // runs (the q_stream_join lesson: size shuffles to the stream's real
    // per-batch throughput, restore after). Store partitioning/pruning is
    // governed by StoreBuckets, not this.
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try qStreamNeardupInner(spark, dir)
    finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
  }

  private def qStreamNeardupInner(spark: SparkSession, dir: String): DataFrame = {
    val stage = stageOrderedFiles(spark, dir)
    val storeRoot = java.nio.file.Files.createTempDirectory("graft_neardup_store")
    val bandsDir = storeRoot.toString + "/bands"
    val setsDir = storeRoot.toString + "/sets"
    val supDir = storeRoot.toString + "/suppressed"
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        def timed[T](st: String)(f: => T): T =
          if (!sys.env.contains("GRAFT_PROFILE")) f
          else {
            val t0 = System.nanoTime()
            val r = f
            System.err.println(
              f"[neardup] batch $batchId $st%-14s ${(System.nanoTime() - t0) / 1e9}%.2f s")
            r
          }
        val b = perDocSketches(batch).persist()
        val bBand = bandedWithBucket(b).persist()
        // no explicit materialize: the probed-buckets collect below is the
        // first action and fills both caches in one pass
        // driver-side values are BUCKET IDS only — ≤ StoreBuckets by
        // construction, never data-sized
        val probed = timed("sketch+probe")(bBand.select("pbucket").distinct()
          .collect().map(_.getInt(0)).toSeq)
        // the pruned store+batch union is consumed ONCE (the skew guard is
        // a window inside the join's own shuffle), so no cache is needed —
        // each store partition is scanned exactly once per batch
        val storeBands = prunedBandStoreRead(spark, bandsDir, probed)
        val allBands = storeBands.map(_.unionByName(bBand)).getOrElse(bBand)
        // candidate PAIRS stay distributed (cached for the two consumers);
        // the only data-dependent values that visit the driver are the
        // DISTINCT d1 store-bucket ids — ≤ StoreBuckets by construction
        val cand = candidatePairs(allBands, bBand).persist()
        val d1Buckets = timed("candidates")(
          cand.select(sbucketOf(col("d1")).cast("int").as("sb"))
            .distinct().collect().map(_.getInt(0)).toSeq)
        val bSets1 = b.select(col("doc_id").as("d1"), col("s").as("s1"))
        val sets1 = readStore(spark, setsDir, setStoreSchema)
          .filter(_ => d1Buckets.nonEmpty)
          .map(_.filter(col("sbucket").isin(d1Buckets.map(Integer.valueOf): _*))
            .select(col("doc_id").as("d1"), col("s").as("s1"))
            .unionByName(bSets1))
          .getOrElse(bSets1)
        val sets2 = b.select(col("doc_id").as("d2"), col("s").as("s2"))
        // suppressions go straight to a per-batch sink — at real dup rates
        // they are corpus-sized, so no driver-side buffer
        timed("verify+sink")(verify(cand, sets1, sets2, minJaccard = 0.5)
          .groupBy(col("d2"))
          .agg(min(struct(col("d1"), col("jaccard"))).as("m"))
          .select(col("d2").as("doc_id"), col("m.d1").as("dup_of"),
            col("m.jaccard").as("jaccard"))
          .write.mode("append").parquet(supDir))
        cand.unpersist(blocking = false)
        // absorb the batch (kept AND suppressed docs — decisions stay
        // batch-split-independent), partitioned for the next batch's
        // prune. Cluster by the partition key first so each batch writes
        // ONE file per touched bucket instead of tasks×buckets shards —
        // store file count stays O(batches·buckets), not O(cores·…).
        // The two stores live in different dirs and read only cached
        // frames, so their writes run CONCURRENTLY — each is scheduling/
        // commit-latency bound at batch scale, not throughput bound.
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        val wBands = Future(timed("band-store")(
          bBand.repartition(col("pbucket"))
            .write.partitionBy("pbucket").mode("append").parquet(bandsDir)))
        val wSets = Future(timed("set-store")(
          b.select(col("doc_id"), col("s"))
            .withColumn("sbucket", sbucketOf(col("doc_id")))
            .repartition(col("sbucket"))
            .write.partitionBy("sbucket").mode("append").parquet(setsDir)))
        Await.result(wBands, scala.concurrent.duration.Duration.Inf)
        Await.result(wSets, scala.concurrent.duration.Duration.Inf)
        bBand.unpersist(); b.unpersist()
        ()
      }
      .start()
    // the sketch stores are per-run scratch: reclaim them eagerly (they
    // used to leak a full corpus of sketches into tmp per invocation —
    // reps=3 benches tripled that). The suppression SINK is the result —
    // returned as a lazy read (never driver-materialized here; a
    // production ingest owns the sink) and reclaimed at JVM exit.
    try {
      q.processAllAvailable()
      spark.read.schema(supSchema).parquet(supDir).orderBy("doc_id")
    } finally {
      q.stop()
      graft.Fs.deleteRecursively(java.nio.file.Paths.get(bandsDir))
      graft.Fs.deleteRecursively(java.nio.file.Paths.get(setsDir))
      graft.Fs.deleteAtExit(storeRoot)
    }
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_neardup" -> (qStreamNeardup _))

  /** Same pipeline CTEs as the batch MinHash oracle; suppression = the
    * larger member of each verified pair, attributed to its smallest
    * partner (id-ordered arrival makes first-seen == min-id). */
  override def oracles: Map[String, String] = Map(
    "q_stream_neardup" ->
      s"""WITH ${MinHashLsh.pipelineCtes}
         |SELECT d2 AS doc_id, d1 AS dup_of, jaccard FROM (
         |  SELECT d1, d2, jaccard,
         |    row_number() OVER (PARTITION BY d2 ORDER BY d1) AS rn
         |  FROM verified)
         |WHERE rn = 1 ORDER BY doc_id""".stripMargin)
}
