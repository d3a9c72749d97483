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
  * equi-join against the bucketed store, candidate-only verification); the
  * store is the compact per-doc (sig, shingle-set) frame (~2 KB/doc)
  * partitioned by band bucket on disk. Nothing driver-side grows with the
  * corpus (the driver only accumulates suppression records).
  */
object StreamNearDup extends QueryModule {

  import MinHashLsh.{Bands, RowsPerBand, MaxBandBucket, coefA, coefB, P}

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
                   minJaccard: Double): DataFrame = {
    val keyCols = (0 until RowsPerBand).map(r => s"k$r")
    val joinKeys = "band" +: keyCols
    val bAll = banded(all)
    val bProbe = banded(probe)
    val oversized = bAll.groupBy(joinKeys.map(col): _*)
      .agg(count(lit(1)).as("sz"))
      .filter(col("sz") > MaxBandBucket)
      .select(joinKeys.map(col): _*)
    val okAll = bAll.join(broadcast(oversized), joinKeys, "left_anti")
    val okProbe = bProbe.join(broadcast(oversized), joinKeys, "left_anti")
    val cand = okAll.alias("l").join(okProbe.alias("r"), joinKeys)
      .filter(col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("d1"), col("r.doc_id").as("d2"))
      .distinct()
    val sets1 = all.select(col("doc_id").as("d1"), col("s").as("s1"))
    val sets2 = probe.select(col("doc_id").as("d2"), col("s").as("s2"))
    sets1.join(broadcast(cand), Seq("d1")).join(sets2, Seq("d2"))
      .withColumn("inter", size(array_intersect(col("s1"), col("s2"))).cast("double"))
      .withColumn("uni", (size(col("s1")) + size(col("s2"))).cast("double") - col("inter"))
      .withColumn("jaccard", round(col("inter") / col("uni"), 6))
      .filter(col("jaccard") >= minJaccard)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

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
    val stage = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_neardup_stream", graft.Fs.stageKey(dir, "documents.parquet"))
    if ((0 until 2).forall(i => Files.exists(stage.resolve(f"$i%05d.parquet"))))
      return stage.toString
    graft.Fs.deleteRecursively(stage)
    Files.createDirectories(stage)
    val docs = Tables.documents(spark, dir)
    val parts = Seq(
      docs.select(col("doc_id"), col("text")),
      docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" planted near duplicate suffix")).as("text")))
    parts.zipWithIndex.foreach { case (df, i) =>
      val scratch = Files.createTempDirectory(s"graft_neardup_part$i")
      df.coalesce(1).write.mode("overwrite").parquet(scratch.toString)
      val listing = Files.list(scratch)
      val part = try listing.toArray.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no parquet part in $scratch"))
      finally listing.close()
      val dst = stage.resolve(f"$i%05d.parquet")
      Files.move(part, dst, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // file source processes oldest-first: force strictly increasing mtimes
      dst.toFile.setLastModified(1700000000000L + i * 600000L)
      graft.Fs.deleteRecursively(scratch)
    }
    stage.toString
  }

  /** Suppression record per near-dup detected at ingest: the incoming doc,
    * the earliest stored doc it matched, and that match's Jaccard. */
  def qStreamNeardup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stage = stageOrderedFiles(spark, dir)
    val storeRoot = java.nio.file.Files.createTempDirectory("graft_neardup_store")
    val storeDir = storeRoot.toString + "/store"
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val suppressed = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = perDocSketches(batch).persist()
        b.count() // materialize once; banded + sets both reuse the cache
        val haveStore = new java.io.File(storeDir).exists()
        val all = if (haveStore) spark.read.parquet(storeDir).unionByName(b) else b
        val sup = pairsAgainst(all, b, minJaccard = 0.5)
          .groupBy(col("d2"))
          .agg(min(struct(col("d1"), col("jaccard"))).as("m"))
          .select(col("d2"), col("m.d1"), col("m.jaccard"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        suppressed.synchronized { suppressed ++= sup }
        b.write.mode("append").parquet(storeDir)
        b.unpersist()
        ()
      }
      .start()
    // the signature store is per-run scratch: collect the suppression
    // records, then reclaim it (it used to leak a full corpus of sketches
    // into tmp per invocation — reps=3 benches tripled that)
    try q.processAllAvailable() finally {
      q.stop()
      graft.Fs.deleteRecursively(storeRoot)
    }
    suppressed.toSeq.toDF("doc_id", "dup_of", "jaccard").orderBy("doc_id")
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
