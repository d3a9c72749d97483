package graft.operators.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Artifact-level lifecycle laws: delete → upsert → compact on a
  * scratch copy of the sf0.001 graph index. */
class GraphIndexLifecycleSpec extends SparkSpec {

  private val DelMod = 7 // different from the query drills' 5 — independent set

  private lazy val emb = graft.Tables.embeddings(spark, SfDir)
    .select(col("vec_id"), col("embedding"))

  private lazy val idx = {
    val p = java.nio.file.Files.createTempDirectory("graft_gidx_life").toString
    val g = GraphIndex.finalGraph(spark, SfDir)
    GraphIndex.build(spark, p, g, emb)
    p
  }

  private def edgeSet(path: String): Set[(Long, Long)] =
    GraphIndex.edges(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Reciprocal-edge share of the live artifact — the q_graph_stats
    * health signal the lifecycle laws below regress. */
  private def recipShareOf(path: String): Double = {
    val es = edgeSet(path)
    es.count { case (i, j) => es((j, i)) }.toDouble / es.size
  }

  /** Share of the freshly built artifact, captured BEFORE any mutation
    * (the first test forces it before deleting). */
  private lazy val shareFresh = recipShareOf(idx)

  test("delete removes every edge touching the batch, repairs only degraded survivors, and keeps the rest byte-identical") {
    shareFresh // force the pre-mutation health baseline
    val before = edgeSet(idx)
    val delIds = emb.filter(col("vec_id") % DelMod === 0).select(col("vec_id"))
    val deleted = delIds.collect().map(_.getLong(0)).toSet
    val surv = emb.filter(col("vec_id") % DelMod =!= 0)
    // nodes that lose a neighbor — eligible for repair; everyone else
    // must come through UNTOUCHED
    val degraded = before.filter { case (i, j) => deleted(j) && !deleted(i) }.map(_._1)
    GraphIndex.delete(spark, idx, delIds, surv)
    val after = edgeSet(idx)
    assert(after.forall { case (i, j) => !deleted(i) && !deleted(j) },
      "an edge still touches a deleted id")
    val untouchedBefore = before.filter { case (i, _) => !deleted(i) && !degraded(i) }
    assert(untouchedBefore.subsetOf(after),
      "a non-degraded survivor's edge list changed during delete")
    val deg = after.groupBy(_._1).map(_._2.size)
    assert(deg.max <= GraphIndex.Degree)
    val meta = spark.read.parquet(s"$idx/meta").head()
    assert(meta.getAs[Long]("n") === surv.count(), "meta n not decremented")
  }

  test("upsert with the original vectors restores every id as an indexed source") {
    val batch = emb.filter(col("vec_id") % DelMod === 0)
    val surv = emb.filter(col("vec_id") % DelMod =!= 0)
    GraphIndex.upsert(spark, idx, surv, batch)
    val after = edgeSet(idx)
    val n = emb.count()
    assert(after.groupBy(_._1).keySet.size.toLong === n,
      "an id is missing as a source after upsert")
    assert(after.forall { case (i, j) => i != j })
    val deg = after.groupBy(_._1).map(_._2.size)
    assert(deg.max <= GraphIndex.Degree && deg.min >= 1)
    val meta = spark.read.parquet(s"$idx/meta").head()
    assert(meta.getAs[Long]("n") === n, "meta n not restored by upsert")
  }

  /** Sidecar-meta coherence: the nodes sidecar must always SUM to the
    * meta accumulator — the law that makes the incremental fold exact. */
  private def assertAuditExact(label: String): Unit = {
    val meta = spark.read.parquet(s"$idx/meta").head()
    val r = spark.read.parquet(s"$idx/nodes")
      .agg(count(lit(1)), sum(col("h").cast("decimal(38,0)"))).head()
    val acc = if (r.isNullAt(1)) java.math.BigInteger.ZERO
              else r.getDecimal(1).toBigInteger
    assert(r.getLong(0) === meta.getAs[Long]("n"), s"$label: sidecar count != meta n")
    assert(acc.toString === meta.getAs[String]("fp_acc"),
      s"$label: sidecar hash sum != meta accumulator")
  }

  test("incremental meta folds stay audit-exact after delete + upsert: folded accumulator equals a full recompute") {
    // the corpus is back to the full emb after the upsert above; the
    // meta accumulator got there purely by folding batch deltas
    // (−Σhash(deleted), +Σhash(appended)) — never a corpus rescan
    assertAuditExact("post-upsert")
    val meta = spark.read.parquet(s"$idx/meta").head()
    assert(meta.getAs[Long]("corpus_fp") === GraphIndex.corpusFingerprint(emb),
      "folded accumulator diverged from the full-recompute audit")
  }

  test("a replayed append batch converges: meta untouched, artifact still fully indexed") {
    val batch = emb.filter(col("vec_id") % DelMod === 0)
    val surv = emb.filter(col("vec_id") % DelMod =!= 0)
    val metaBefore = spark.read.parquet(s"$idx/meta").head()
    val scans0 = GraphIndex.fingerprintScans.get()
    // the crash-retry contract: re-delivering the LAST batch (same
    // content) must skip the meta fold (fingerprint match) and leave a
    // valid, fully indexed artifact — and commit without any
    // full-corpus fingerprint scan
    GraphIndex.append(spark, idx, surv, batch)
    assert(GraphIndex.fingerprintScans.get() === scans0,
      "append ran a full-corpus fingerprint scan")
    val metaAfter = spark.read.parquet(s"$idx/meta").head()
    assert(metaAfter.getAs[Long]("n") === metaBefore.getAs[Long]("n"),
      "replayed batch double-counted meta n")
    assert(metaAfter.getAs[String]("fp_acc") === metaBefore.getAs[String]("fp_acc"),
      "replayed batch double-folded the accumulator")
    assertAuditExact("post-replay")
    val after = edgeSet(idx)
    assert(after.groupBy(_._1).keySet.size.toLong === emb.count())
    assert(after.forall { case (i, j) => i != j })
  }

  test("a replayed upsert converges: per-operation guard slots + the widened delete window recognize both halves") {
    // The r11 review's top finding (an upsert's interleaved delete used
    // to clobber the single guard slot and double-fold the replayed
    // append) plus the v7 position rule: re-delivering an ENTIRE upsert
    // — the foreachBatch crash-retry of a transaction that committed
    // both halves but died mid-swap — must leave meta untouched. The
    // delete's commit sits one position behind the append's, which is
    // exactly the seqTol=1 window upsert passes.
    val batch = emb.filter(col("vec_id") % DelMod === 0)
    val surv = emb.filter(col("vec_id") % DelMod =!= 0)
    GraphIndex.upsert(spark, idx, surv, batch)
    val metaBefore = spark.read.parquet(s"$idx/meta").head()
    GraphIndex.upsert(spark, idx, surv, batch) // the replay
    val metaAfter = spark.read.parquet(s"$idx/meta").head()
    assert(metaAfter.getAs[Long]("n") === metaBefore.getAs[Long]("n"),
      "replayed upsert drifted meta n")
    assert(metaAfter.getAs[String]("fp_acc") === metaBefore.getAs[String]("fp_acc"),
      "replayed upsert drifted the accumulator")
    assertAuditExact("post-upsert-replay")
    val after = edgeSet(idx)
    assert(after.groupBy(_._1).keySet.size.toLong === emb.count(),
      "an id is missing as a source after the replayed upsert")
  }

  test("position-aware guards: a genuine re-append after an intervening delete folds instead of being misread as a replay") {
    // The r12 review finding: a content-only guard survived arbitrarily
    // many intervening ops, so append(B) -> delete(B's ids) -> genuine
    // re-append of the same content matched last_append_fp, skipped the
    // fold, and left meta short by the batch. With (fp, position)
    // guards the intervening delete moves the op counter and the
    // re-append folds.
    val batch = emb.filter(col("vec_id") % DelMod === 0)
    val surv = emb.filter(col("vec_id") % DelMod =!= 0)
    val nFull = emb.count()
    // the guard's last-append slot still remembers `batch` from the
    // upsert above; this standalone delete folds the ids back OUT and
    // moves the op counter past the remembered append position
    GraphIndex.delete(spark, idx, batch.select(col("vec_id")), surv)
    val nAfterDelete = spark.read.parquet(s"$idx/meta").head().getAs[Long]("n")
    assert(nAfterDelete === surv.count(), "intervening delete did not fold")
    // same content as the last recorded append — but an op committed in
    // between, so this is a GENUINE re-add and must fold back in
    GraphIndex.append(spark, idx, surv, batch)
    val metaAfter = spark.read.parquet(s"$idx/meta").head()
    assert(metaAfter.getAs[Long]("n") === nFull,
      "genuine re-append was misread as a replay: meta n is short by the batch")
    assertAuditExact("post-reappend")
    val after = edgeSet(idx)
    assert(after.groupBy(_._1).keySet.size.toLong === nFull)
  }

  test("a genuine upsert is not misread as a replay when an unrelated same-ids delete sits one position back") {
    // The r12 review's top finding against the first position-aware
    // cut: upsert's delete window accepted ANY matching-ids delete at
    // seq-1, so after delete(X) -> re-append(X, v1), a genuine
    // upsert(X, v2) skipped its fold (v1 rows never subtracted) while
    // the swaps removed them - meta permanently high by |X|. The
    // window is now qualified on the sibling append's fingerprint at
    // the head position, which a DIFFERENT-content upsert cannot match.
    val ids = emb.filter(col("vec_id") % DelMod === 0).select(col("vec_id"))
    val batchV1 = emb.filter(col("vec_id") % DelMod === 0)
    val surv = emb.filter(col("vec_id") % DelMod =!= 0)
    GraphIndex.delete(spark, idx, ids, surv)         // unrelated delete(X)
    GraphIndex.append(spark, idx, surv, batchV1)     // genuine re-append(X, v1)
    // genuine upsert(X, v2): same ids, new content
    val batchV2 = batchV1.select(col("vec_id"),
      transform(col("embedding"), x => -x).as("embedding"))
    val survCast = surv.select(col("vec_id"), col("embedding"))
    GraphIndex.upsert(spark, idx, survCast, batchV2)
    val meta = spark.read.parquet(s"$idx/meta").head()
    assert(meta.getAs[Long]("n") === emb.count(),
      "upsert misread as replay: meta n drifted")
    assertAuditExact("post-unrelated-delete-upsert")
    // restore the original content for the downstream recip-share and
    // compact tests (the lifecycle spec's shared-artifact discipline)
    GraphIndex.upsert(spark, idx, survCast, batchV1)
    assertAuditExact("post-restore")
  }

  test("a crash inside the meta commit's rename window heals on the next read") {
    // writeMeta parks the pre-commit meta as meta_old before renaming
    // the fresh one in; a crash between the renames leaves meta missing.
    // recoverMeta (called by readMeta and validArtifact) must restore
    // the parked copy instead of throwing forever.
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val meta = new org.apache.hadoop.fs.Path(s"$idx/meta")
    val old = new org.apache.hadoop.fs.Path(s"$idx/meta_old")
    val n = spark.read.parquet(s"$idx/meta").head().getAs[Long]("n")
    val fp = spark.read.parquet(s"$idx/meta").head().getAs[Long]("corpus_fp")
    assert(fs.rename(meta, old), "test setup: parking meta failed")
    assert(!fs.exists(meta))
    assert(GraphIndex.validArtifact(spark, idx, n, fp),
      "validArtifact did not heal the parked meta")
    assert(fs.exists(meta) && !fs.exists(old), "meta not restored from the park")
  }

  test("reciprocal-edge share does not degrade across the delete -> upsert -> replay cycle") {
    // The corpus is back to the full emb after the upsert + replayed
    // append above, so the artifact's reciprocal share is comparable to
    // the fresh build's. Descent symmetrizes neighborhoods; a lifecycle
    // whose repairs leak asymmetric edges would show up here as a
    // falling share long before serve recall is re-graded (the
    // half-converged-build signal q_graph_stats exists to catch).
    val cycled = recipShareOf(idx)
    assert(cycled >= shareFresh - 0.05,
      s"reciprocal share degraded across the lifecycle: fresh $shareFresh -> cycled $cycled")
  }

  test("a pre-v7 meta fails the direct mutation path with an explicit version message") {
    // A surviving older artifact must not surface as an opaque Parquet
    // missing-column error from append/delete/upsert (r12 advice): the
    // version gate fires BEFORE any v7-only column is touched.
    val p = java.nio.file.Files.createTempDirectory("graft_gidx_v6").toString
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sessionState.newHadoopConf())
    fs.copyFromLocalFile(new org.apache.hadoop.fs.Path(idx),
      new org.apache.hadoop.fs.Path(p))
    val dst = s"$p/${new java.io.File(idx).getName}"
    // rewrite the meta in the v6 shape: same core columns, version 6,
    // none of the v7 replay-guard columns
    import spark.implicits._
    val m = spark.read.parquet(s"$dst/meta").head()
    Seq((m.getAs[Long]("n"), m.getAs[Int]("k"), m.getAs[Int]("rounds"), 6,
        m.getAs[Long]("corpus_fp"), m.getAs[String]("fp_acc")))
      .toDF("n", "k", "rounds", "build_version", "corpus_fp", "fp_acc")
      .coalesce(1).write.mode("overwrite").parquet(s"$dst/meta")
    val batch = emb.limit(0)
    val ex = intercept[IllegalArgumentException] {
      GraphIndex.append(spark, dst, emb, batch)
    }
    assert(ex.getMessage.contains("build_version 6"), ex.getMessage)
    assert(ex.getMessage.contains("rebuild"), ex.getMessage)
  }

  test("compact collapses each bucket to one file without changing a single edge") {
    val before = GraphIndex.edges(spark, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    GraphIndex.compact(spark, idx)
    val after = GraphIndex.edges(spark, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(after === before, "compact changed the edge list")
    val buckets = new java.io.File(s"$idx/edges").listFiles()
      .filter(_.getName.startsWith("bucket="))
    assert(buckets.nonEmpty)
    buckets.foreach { b =>
      val parts = b.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length === 1,
        s"${b.getName} has ${parts.length} files after compact")
    }
  }
}
