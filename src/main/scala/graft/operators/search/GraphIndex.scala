package graft.operators.search

import graft.QueryModule
import graft.functions.VectorOps._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTENT graph index + incremental APPEND — the updatable
  * HNSW-class index the reference's merge-back loop assumes
  * (update-etiquetas.ipynb re-ingests batches into a live Azure vector
  * index, which absorbs uploads incrementally). The [[KnnGraph]]
  * NN-descent adjacency becomes a parquet ARTIFACT, so the multi-minute
  * build is paid at write time and every serve-side consumer
  * ([[GraphServe]], [[GraphDelete]], the beam sweep, streaming serve)
  * starts from a scan, not a rebuild.
  *
  * Layout: `indexPath/edges/bucket=N/` — the edge list partitioned by
  * `bucket = i mod NumBuckets`, the [[IvfIndex]] discipline applied to
  * adjacency. Append then rewrites ONLY the buckets holding changed
  * nodes (rename-aside + rename-in per bucket, crash-recoverable — the
  * IvfIndex.delete swap), so at 10^11 nodes an append touches
  * O(changed/NumBuckets · files), never the whole artifact. A `meta`
  * sidecar pins (n, k, rounds, build version); [[ensure]] rebuilds when
  * any of them drift, so a stale artifact can never serve a differently
  * shaped corpus.
  *
  * Append = HNSW insert, Spark-shaped, in two bounded phases:
  *  1. '''insertion beam''': every new vector beam-searches the OLD
  *     graph ([[GraphServe]] geometry: arithmetic entry points, rounds
  *     of one equi-join with the undirected adjacency + a bounded
  *     [[graft.plans.TopKPerGroup]] heap) → its top-K old neighbors.
  *     Unlike the serve, the query side is the whole new batch, so both
  *     join sides shuffle — no driver bound on batch size.
  *  2. '''one restricted descent round''': the exact dual of
  *     [[GraphDelete]]'s repair — 2-hop candidates are generated only
  *     THROUGH the new batch's neighborhoods (mid ∈ new ∪ Γ(new)), so
  *     new↔new edges surface (two new nodes sharing an old neighbor)
  *     and nearby old nodes adopt better new neighbors, while the rest
  *     of the graph is untouched — O(|Γ(new)|·degree²) scorings, never
  *     a rebuild.
  *
  * Deterministic throughout (arithmetic batch split and entries, rounded
  * sims, id tiebreaks): the whole half-build → insert → repair → grade
  * pipeline replays hash-exact in DuckDB as two namespaced
  * [[KnnGraph.graphCtePrefixWhere]] chains plus unrolled insertion-beam
  * CTEs. q_graph_append grades the appended graph against the full
  * rebuild on the SAME exact truth — the append-law: half-build+append
  * recall ≈ rebuild recall (spec-asserted bound).
  */
object GraphIndex extends QueryModule {

  /** Graded depth (exact top-K membership). */
  val K = KnnGraph.K

  /** Kept edges per node, matching the build ([[KnnGraph.Degree]]). */
  val Degree = KnnGraph.Degree

  /** Edge-list buckets — the append-rewrite granularity. Sized so one
    * bucket ≈ n·K/NumBuckets edges stays a few files; at 10^11 nodes
    * raise it with the corpus (it is a layout constant, not a semantic
    * one — the artifact records nothing about it beyond the dirs). */
  val NumBuckets = 16

  /** Insertion beam width (≥ K — the GraphServe no-eviction contract). */
  val InsertBeam = GraphServe.Beam

  /** Beam-expansion rounds for the insertion search. */
  val InsertRounds = 2

  /** q_graph_append's arithmetic batch split: ids ≡ NewResidue (mod
    * AppendMod) are the 20% "new" batch; the rest is the half build. */
  val AppendMod = 5
  val NewResidue = 4

  /** Bump when the BUILD semantics or the meta schema change: the
    * version is pinned in the artifact's meta sidecar and a mismatch
    * makes [[finalGraph]] rebuild instead of serving a stale graph.
    * v2: meta carries a corpus content fingerprint. v3: 4-round
    * converged descent + √n upper-layer entries. v4: meta carries the
    * RAW fingerprint accumulator + last-batch fingerprint and the
    * artifact carries a `nodes` (id, hash) sidecar, so append/delete
    * fold the batch delta instead of re-scanning the corpus. v5: the
    * descent/repair candidate pools are [[KnnGraph.PoolCap]]-capped
    * (hub-safe NN-descent), changing edge content. v6: meta carries
    * PER-OPERATION replay guards (last_append_fp + last_delete_fp — a
    * single slot let [[upsert]]'s interleaved delete clobber the append
    * guard and double-fold a replayed batch), is committed under a
    * rename-aside swap (a crash mid-overwrite destroyed the meta the
    * replay needs), and the ring seeds exclude self-loops. v7: meta
    * carries a monotonic per-index operation counter (`op_seq`) and
    * each guard slot records the POSITION it committed at — replay
    * detection requires matching content AND position (a content-only
    * guard survived arbitrarily many intervening ops, so
    * append(B) → delete(B's ids) → a GENUINE re-append of the same
    * content was misread as a crash replay and skipped its fold,
    * leaving meta short by the batch — the r12 review finding). v8:
    * the entry HIERARCHY is part of the artifact (the full HNSW
    * shape): meta pins the layer strides (`layer_se1`, `layer_se2` —
    * immutable once built, like HNSW's per-node level assignment) and
    * the build-time layer-1 size (`n1_build`, the walk/brute branch
    * predicate); an `l1nodes` dataset holds every layer-1 member's
    * (id, embedding) so the insert's entry phase never rescans the
    * corpus to find entries, and — when the build-time layer exceeds
    * [[GraphServe.L1BruteBar]] — an `l1edges` dataset persists the
    * layer-1 navigation subgraph the insertion beams descend, closing
    * the r13 survey's stated insert-path √n term. v9: meta also pins
    * the layer TUNING constants (`l1_degree`, `l1_bar`) and
    * [[validArtifact]] checks them — the serve now CONSUMES the
    * persisted subgraph, so a constant changed without a version bump
    * must invalidate surviving artifacts exactly the way k/rounds
    * drift does for the base graph (the r13 late-wave review). */
  val BuildVersion = 9

  private def topKPer(scored: DataFrame, keyCol: String, k: Int): DataFrame =
    graft.plans.TopKPerGroup(
      scored.withColumn("neg_sim", -col("sim")), Seq(keyCol), Seq("neg_sim", "j"), k)
      .select(col(keyCol), col("j"), col("sim"))

  private[graft] def und(g: DataFrame): DataFrame =
    g.select(col("i"), col("j"))
      .union(g.select(col("j").as("i"), col("i").as("j")))
      .distinct()

  /** Score (i, j) pairs with rounded cosine via two embedding-fetch
    * equi-joins — both sides shuffle on their id (the KnnGraph kernel;
    * nothing here assumes either side is driver-sized). */
  private def score(pairs: DataFrame, emb: DataFrame): DataFrame = {
    val ea = emb.select(col("vec_id").as("i"), col("embedding").as("emb_i"))
    val eb = emb.select(col("vec_id").as("j"), col("embedding").as("emb_j"))
    pairs.join(ea, Seq("i")).join(eb, Seq("j"))
      .select(col("i"), col("j"),
        round(cosine_sim(col("emb_i"), col("emb_j")), 6).as("sim"))
  }

  // ---------------------------------------------------------------- artifact

  /** Write a full edge list as a fresh artifact: bucketed by source node,
    * one file per bucket ([[IvfIndex.buildFrom]] discipline), plus the
    * `nodes` (id, content hash) sidecar — same bucketing, one row per
    * corpus vector, what lets [[delete]] subtract exactly the deleted
    * rows' hashes without rescanning survivors — and the meta sidecar
    * pinning (n, raw fingerprint accumulator). Overwrite is
    * whole-directory — the incremental path is [[append]]. One full
    * corpus scan, paid at BUILD time (the one place O(corpus) belongs). */
  def build(spark: SparkSession, indexPath: String, graph: DataFrame,
            emb: DataFrame): Unit = {
    graph.select(col("i"), col("j"), col("sim"))
      .withColumn("bucket", pmod(col("i"), lit(NumBuckets.toLong)))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$indexPath/edges")
    nodesOf(emb)
      .withColumn("bucket", pmod(col("id"), lit(NumBuckets.toLong)))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$indexPath/nodes")
    val (n, acc) = countAndAcc(emb)
    // the persisted entry hierarchy (v8): strides pinned from the BUILD
    // corpus, the member embeddings as their own bucketed dataset (the
    // insert's entry phase reads √n rows of artifact instead of
    // filter-scanning a 100 TB corpus per batch), and — above the
    // measured brute bar — the layer-1 navigation subgraph
    val se1 = GraphServe.upperModulus(n)
    val m1 = emb.filter(GraphServe.entryPick(col("vec_id"), se1))
      .localCheckpoint(true)
    val n1 = m1.count()
    val se2 = se1 * GraphServe.upperModulus(n1)
    m1.select(col("vec_id").as("id"), col("embedding"))
      .withColumn("bucket", pmod(col("id"), lit(NumBuckets.toLong)))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$indexPath/l1nodes")
    // a PRE-EXISTING l1edges (in-place rebuild over a corpus that
    // shrank below the bar) must not survive: it would put the engine
    // on the walk branch while the oracle's build-count predicate takes
    // brute, and its stale member ids point nowhere (the r13 review).
    // The same goes for EVERY dataset's crashed-swap litter dirs: a
    // crashed append parks pre-rebuild buckets aside, and the next
    // append's recovery loop would resurrect those ghost buckets into
    // the fresh artifact wherever the rebuild left a bucket dir empty
    // (the late-wave review) — an in-place rebuild clears all of it
    locally {
      import org.apache.hadoop.fs.Path
      val fs = new Path(indexPath).getFileSystem(spark.sessionState.newHadoopConf())
      val litter = Seq("_appending", "_app_old", "_compacting", "_old")
      (Seq("l1edges") ++
        (for (ds <- Seq("edges", "nodes", "l1nodes", "l1edges"); s <- litter)
          yield s"$ds$s"))
        .foreach(d => fs.delete(new Path(s"$indexPath/$d"), true))
    }
    if (n1 > GraphServe.L1BruteBar)
      writeLayerEdges(GraphServe.l1OutEdges(m1, m1, n1, KnnGraph.dimOf(m1)), indexPath)
    // guard positions -1: no op has committed yet, so no (fp, seq)
    // probe can match a fresh build's slots
    writeMeta(spark, indexPath, Meta(n, acc, 0L, -1L, 0L, -1L, 0L, se1, se2, n1))
  }

  private def writeLayerEdges(edges: DataFrame, indexPath: String): Unit =
    edges.select(col("i"), col("j"), col("sim"))
      .withColumn("bucket", pmod(col("i"), lit(NumBuckets.toLong)))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$indexPath/l1edges")

  /** Explicit dataset schemas: an EMPTY layer (possible on small
    * corpora — membership is a hash stride with no floor — or after a
    * delete drains every member) writes zero parquet files, and a
    * schema-inferring read of such a directory throws instead of
    * returning the empty frame v7's entry handling tolerated (the r13
    * review). Pinning the schema makes empty reads well-defined. */
  private val l1NodesSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("embedding",
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
    org.apache.spark.sql.types.StructField("bucket",
      org.apache.spark.sql.types.LongType)))
  private val l1EdgesSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("i",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("j",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("sim",
      org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("bucket",
      org.apache.spark.sql.types.LongType)))

  private def readL1Nodes(spark: SparkSession, indexPath: String): DataFrame =
    spark.read.schema(l1NodesSchema).parquet(s"$indexPath/l1nodes")

  private def readL1Edges(spark: SparkSession, indexPath: String): DataFrame =
    spark.read.schema(l1EdgesSchema).parquet(s"$indexPath/l1edges")

  /** The live layer-1 member dataset (id, embedding) — every corpus
    * vector with prio(id) ≡ 0 (mod the pinned se1), maintained
    * incrementally by [[append]]/[[delete]]. √n-sized at build; grows
    * linearly with the corpus thereafter (the pinned-stride contract —
    * a rebuild re-pins, exactly like HNSW's fixed per-level share). */
  private[search] def layerNodes(spark: SparkSession, indexPath: String): DataFrame =
    readL1Nodes(spark, indexPath).select(col("id"), col("embedding"))

  /** The persisted layer-1 navigation subgraph (directed i, j, sim),
    * or None while the build-time layer sat at or under
    * [[GraphServe.L1BruteBar]] (the brute branch needs no subgraph).
    * Old members' lists go stale as appends add members (they never
    * re-rank against newcomers) — acceptable for NAVIGATION (the
    * undirected view connects newcomers bidirectionally) and healed by
    * [[materializeLayer]] or a rebuild, the same maintenance story as
    * the base graph's [[optimize]]. */
  private[search] def layerEdges(spark: SparkSession, indexPath: String): Option[DataFrame] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(s"$indexPath/l1edges")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) Some(readL1Edges(spark, indexPath)
      .select(col("i"), col("j"), col("sim")))
    else None
  }

  /** MAINTENANCE: (re)build the layer-1 subgraph over the CURRENT
    * member set, exact top-[[GraphServe.L1Degree]] per member. For an
    * artifact whose corpus outgrew the build-time brute bar through
    * appends (the automatic path keeps brute entries until the layer is
    * materialized — existence of `l1edges` IS the engine's branch), or
    * to heal stale member lists after heavy ingest. One |members|² pair
    * job ≈ one corpus-scan of work — a maintenance pass, never on the
    * per-batch commit path. Drill oracles assume build-time
    * materialization only; calling this mid-drill would fork the
    * replayed branch. */
  def materializeLayer(spark: SparkSession, indexPath: String): Unit = {
    val m1 = layerNodes(spark, indexPath)
      .select(col("id").as("vec_id"), col("embedding")).localCheckpoint(true)
    // tier inputs: a count + a limit-1 dim probe over the CHECKPOINTED
    // member frame (~√n rows) — maintenance-pass cost, never a corpus scan
    writeLayerEdges(
      GraphServe.l1OutEdges(m1, m1, m1.count(), KnnGraph.dimOf(m1)), indexPath)
  }

  /** One (id, content hash) row per corpus vector — the rows the
    * `nodes` sidecar holds. The hash is the [[corpusFingerprint]]
    * per-row term, so Σh over nodes ≡ the raw meta accumulator. */
  private def nodesOf(emb: DataFrame): DataFrame =
    emb.select(col("vec_id").as("id"),
      xxhash64(col("vec_id"), col("embedding")).as("h"))

  /** The live edge list (i, j, sim). */
  def edges(spark: SparkSession, indexPath: String): DataFrame =
    spark.read.parquet(s"$indexPath/edges").select(col("i"), col("j"), col("sim"))

  /** Incremental insert: beam-search each new vector into the live
    * graph, adopt its top-K old neighbors, then run ONE descent round
    * restricted to the new batch's neighborhoods, and rewrite only the
    * buckets whose nodes changed (rename-aside + rename-in per bucket,
    * recovered on the next call after a crash — the IvfIndex.delete
    * swap discipline). `oldEmb`/`newEmb` carry (vec_id, embedding); ids
    * must be disjoint.
    *
    * '''O(batch) bookkeeping''': meta n and the fingerprint accumulator
    * fold the batch delta (n+|batch|, acc+Σhash(batch)) — ZERO
    * full-corpus scans per call, which is what lets
    * [[GraphAppendStream]] commit a micro-batch without re-reading a
    * 100 TB corpus (spec-asserted via [[fingerprintScans]]). The full
    * recompute survives only as [[validArtifact]]'s audit.
    *
    * '''Crash-retry contract''': meta commits FIRST carrying the
    * batch's content fingerprint in its OWN guard slot
    * (`last_append_fp` — per-operation slots, so [[upsert]]'s
    * interleaved delete can never clobber the append guard and
    * double-fold a replayed batch); the bucket swaps follow. A crash
    * anywhere in between is healed by REPLAYING THE SAME BATCH (the
    * foreachBatch/checkpoint contract): a replay whose fingerprint
    * matches the guard's content AND whose position matches meta's op
    * counter (v7 — content alone survived intervening ops, misreading
    * a genuine re-append after a delete as a replay) skips the fold
    * (meta already reflects the batch) AND derives the pre-batch
    * corpus size by subtracting the
    * batch back out of meta's n — so the replayed graph computation
    * sees the same `nOld` (hence the same entry layer) as the crashed
    * attempt, and the graph/nodes swaps converge. After a MID-swap
    * crash the replay recomputes from the partially-swapped edge list,
    * so the healed artifact is a valid top-[[Degree]] graph with exact
    * meta, though not necessarily edge-identical to the uninterrupted
    * run. Out-of-order replays are NOT supported — the streaming
    * ingest's residue guard enforces ordering. That contract also
    * means no OTHER operation may run between a crashed commit and its
    * retry (including a no-op delete of absent ids: any commit moves
    * the op counter, after which the retry reads as a genuine re-issue
    * and double-folds — with position-aware guards this is inherent,
    * not an implementation gap; distinguishing "retry after an
    * unrelated interleaved op" from "genuine re-issue" would need a
    * full op log). */
  def append(spark: SparkSession, indexPath: String,
             oldEmb: DataFrame, newEmb: DataFrame): Unit = {
    recoverAllSwaps(spark, indexPath) // heal parked buckets BEFORE any read
    val gOld = edges(spark, indexPath).localCheckpoint(true)
    val m = readMeta(spark, indexPath)
    val (cntB, accB) = countAndAcc(newEmb) // one O(batch) scan
    val fpB = batchFp(OpAppend, cntB, accB)
    // replay = same content at the CURRENT position: this append's
    // commit was the last op to touch meta (m.lastASeq == m.seq); with
    // any intervening commit the positions diverge and the fold runs
    val replay = m.lastA == fpB && m.lastASeq == m.seq
    val nOld = if (replay) m.n - cntB else m.n // pre-batch size either way
    // the PRE-batch hierarchy state: on a replay the batch's members may
    // already sit in l1nodes/l1edges from the crashed attempt's swaps —
    // subtract them back out so the replayed computation descends the
    // same layers the crashed attempt did (the nOld discipline). The
    // anti-joins are member-frame-sized, never a corpus scan, and only
    // run on the replay branch.
    val m1Live = layerNodes(spark, indexPath)
      .select(col("id").as("vec_id"), col("embedding"))
    val batchIds = newEmb.select(col("vec_id"))
    val m1Old = (if (replay) m1Live.join(batchIds, Seq("vec_id"), "left_anti")
                 else m1Live).localCheckpoint(true)
    val und1Old = layerEdges(spark, indexPath).map { le =>
      val pre = if (!replay) le
        else le.join(batchIds.select(col("vec_id").as("i")), Seq("i"), "left_anti")
          .join(batchIds.select(col("vec_id").as("j")), Seq("j"), "left_anti")
          .select(col("i"), col("j"), col("sim"))
      und(pre).localCheckpoint(true)
    }
    val (gNew, changed) = appendedGraph(spark, gOld, oldEmb, newEmb, nOld, cntB,
      LayerState(m1Old, m.se2, und1Old))
    val touched = changed
      .select(pmod(col("i"), lit(NumBuckets.toLong)).as("bucket")).distinct()
      .collect().map(_.getLong(0)).sorted.toIndexedSeq // ≤ NumBuckets values — driver-sized
    if (!replay)
      writeMeta(spark, indexPath, Meta(m.n + cntB, m.acc.add(accB),
        fpB, m.seq + 1, m.lastD, m.lastDSeq, m.seq + 1, m.se1, m.se2, m.n1b))
    val batchNodes = nodesOf(newEmb).localCheckpoint(true)
    val touchedN = batchNodes
      .select(pmod(col("id"), lit(NumBuckets.toLong)).as("bucket")).distinct()
      .collect().map(_.getLong(0)).sorted.toIndexedSeq
    // partition-pruned union: only the batch's buckets are read back;
    // dropDuplicates makes a replayed batch a no-op (same id, same h)
    val nodesNew = nodes(spark, indexPath)
      .filter(col("bucket").isin(touchedN.map(Long.box): _*)).select(col("id"), col("h"))
      .unionByName(batchNodes).dropDuplicates("id")
    swapDataset(spark, indexPath, "nodes", "id", nodesNew, touchedN)
    // hierarchy maintenance, O(batch-members × layer): batch vectors on
    // the pinned se1 stride JOIN layer 1 (their embeddings into
    // l1nodes; their exact top-L1Degree out-edges into l1edges when the
    // walk layer is materialized). Existing members' lists are not
    // re-ranked — navigation tolerates stale lists (und symmetrizes the
    // new links), materializeLayer/rebuild heals. Replay converges: the
    // recomputed rows equal the crashed attempt's and dropDuplicates
    // absorbs the overlap.
    val batchL1 = newEmb.filter(GraphServe.entryPick(col("vec_id"), m.se1))
      .select(col("vec_id"), col("embedding")).localCheckpoint(true)
    val touchedL1 = batchL1
      .select(pmod(col("vec_id"), lit(NumBuckets.toLong)).as("bucket")).distinct()
      .collect().map(_.getLong(0)).sorted.toIndexedSeq
    if (touchedL1.nonEmpty) {
      val l1New = readL1Nodes(spark, indexPath)
        .filter(col("bucket").isin(touchedL1.map(Long.box): _*))
        .select(col("id"), col("embedding"))
        .unionByName(batchL1.select(col("vec_id").as("id"), col("embedding")))
        .dropDuplicates("id")
      swapDataset(spark, indexPath, "l1nodes", "id", l1New, touchedL1)
      if (und1Old.isDefined) {
        val allM1 = m1Old.unionByName(batchL1)
        // tier inputs are counts over the two CHECKPOINTED member
        // frames (~√n + batch-members rows) — commit-path safe, never
        // a corpus scan (the scoreSliced/fingerprintScans rule)
        val newL1Edges = GraphServe.l1OutEdges(batchL1, allM1,
          m1Old.count() + batchL1.count(), KnnGraph.dimOf(batchL1))
        val l1eNew = readL1Edges(spark, indexPath)
          .filter(col("bucket").isin(touchedL1.map(Long.box): _*))
          .select(col("i"), col("j"), col("sim"))
          .unionByName(newL1Edges).dropDuplicates("i", "j")
        swapDataset(spark, indexPath, "l1edges", "i", l1eNew, touchedL1)
      }
    }
    swapDataset(spark, indexPath, "edges", "i",
      gNew.select(col("i"), col("j"), col("sim")), touched)
  }

  /** Raw per-batch content fingerprint: mixes the batch's hash
    * accumulator, row count, and the operation tag. Deterministic from
    * the CALLER's arguments alone, so a checkpoint replay reproduces it
    * byte-exact regardless of artifact state. */
  private def batchFp(op: Long, cnt: Long, acc: java.math.BigInteger): Long =
    fold(acc) ^ java.lang.Long.rotateLeft(cnt, 17) ^ op
  private val OpAppend = 0x5ca1ab1e0a99e4dL
  private val OpDelete = 0x0de1e7e0f00dfaceL

  /** (row count, raw Σ xxhash64(id, embedding)) of a frame in ONE scan.
    * The decimal(38,0) accumulator is exact (full-range int64 hashes
    * summed as BIGINT overflow under ANSI after a handful of rows;
    * 38 digits hold ~1e19 rows' worth). */
  private def countAndAcc(emb: DataFrame): (Long, java.math.BigInteger) = {
    val r = emb.agg(count(lit(1)),
      sum(xxhash64(col("vec_id"), col("embedding")).cast("decimal(38,0)"))).head()
    (r.getLong(0),
      if (r.isNullAt(1)) java.math.BigInteger.ZERO else r.getDecimal(1).toBigInteger)
  }

  private def fold(acc: java.math.BigInteger): Long =
    acc.mod(java.math.BigInteger.valueOf(Long.MaxValue)).longValue()

  /** The meta sidecar's mutable state: corpus size, raw fingerprint
    * accumulator, the two per-operation replay guards — each a
    * (content fingerprint, commit position) pair — and the monotonic
    * operation counter `seq` every committing op increments. Replay
    * detection compares BOTH halves of a guard: content alone survives
    * intervening ops (the v7 finding), position alone collides across
    * indexes; together they pin "this exact batch was the op that
    * committed last". v8 adds the IMMUTABLE layer pins: `se1`/`se2`
    * (the hierarchy's strides, fixed at build like HNSW's level
    * assignment — layer membership must not shift wholesale as n
    * drifts, or every persisted layer edge goes stale at once) and
    * `n1b` (build-time layer-1 member count — the walk/brute branch
    * predicate, a pure function of the build corpus so the oracle
    * replays the branch from its own chain). */
  private[search] case class Meta(n: Long, acc: java.math.BigInteger,
                                  lastA: Long, lastASeq: Long,
                                  lastD: Long, lastDSeq: Long, seq: Long,
                                  se1: Long, se2: Long, n1b: Long)

  /** Commit the meta sidecar under a rename-aside swap: a bare
    * overwrite is delete-dir-then-write, so a crash mid-write would
    * destroy the very meta the crash-retry replay needs to heal from
    * (the r11 review finding). Windows: a crash before the first
    * rename leaves the old meta live; between the renames, meta is
    * missing and [[recoverMeta]] restores the parked PRE-fold copy —
    * the fold was never committed, so the replay re-folds; after the
    * second rename the new meta is live and the stale park is garbage
    * collected here or by the next write. Heals a PRIOR writer's
    * rename-window crash first, so safety never depends on the caller
    * having gone through [[readMeta]]/[[validArtifact]] (the r12
    * review: [[build]] writes without reading, and a future caller
    * doing the same would otherwise delete the only recovery copy). */
  private def writeMeta(spark: SparkSession, indexPath: String,
                        m: Meta): Unit = {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    recoverMeta(spark, indexPath) // no-op in healthy states
    val meta = new Path(s"$indexPath/meta")
    val fresh = new Path(s"$indexPath/meta_fresh")
    val old = new Path(s"$indexPath/meta_old")
    val fs = meta.getFileSystem(spark.sessionState.newHadoopConf())
    // the RAW accumulator travels as a string: exact, unbounded, and
    // immune to decimal-precision truncation at any corpus size
    Seq((m.n, Degree, KnnGraph.Rounds, BuildVersion, fold(m.acc), m.acc.toString,
        m.lastA, m.lastASeq, m.lastD, m.lastDSeq, m.seq, m.se1, m.se2, m.n1b,
        GraphServe.L1Degree, GraphServe.L1BruteBar))
      .toDF("n", "k", "rounds", "build_version", "corpus_fp", "fp_acc",
        "last_append_fp", "last_append_seq", "last_delete_fp",
        "last_delete_seq", "op_seq", "layer_se1", "layer_se2", "n1_build",
        "l1_degree", "l1_bar")
      .coalesce(1).write.mode("overwrite").parquet(fresh.toString)
    fs.delete(old, true)
    if (fs.exists(meta) && !fs.rename(meta, old))
      throw new java.io.IOException(s"meta commit: rename $meta aside failed")
    if (!fs.rename(fresh, meta))
      throw new java.io.IOException(
        s"meta commit: rename $fresh -> $meta failed — pre-commit meta is " +
          s"parked in $old and restored by the next read")
    fs.delete(old, true)
  }

  /** Heal a crash inside [[writeMeta]]'s rename window: meta missing
    * but the parked pre-commit copy present → restore it (resume-
    * forward: the interrupted fold never committed, the replay redoes
    * it). No-op in every other state. */
  private def recoverMeta(spark: SparkSession, indexPath: String): Unit = {
    import org.apache.hadoop.fs.Path
    val meta = new Path(s"$indexPath/meta")
    val old = new Path(s"$indexPath/meta_old")
    val fs = meta.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(meta) && fs.exists(old) && !fs.rename(old, meta))
      throw new java.io.IOException(
        s"meta recovery: rename $old -> $meta failed — restore manually")
  }

  private def readMeta(spark: SparkSession, indexPath: String): Meta = {
    recoverMeta(spark, indexPath)
    val m = spark.read.parquet(s"$indexPath/meta").head()
    // version gate BEFORE touching v7-only columns: a surviving pre-v7
    // artifact on the direct mutation path (append/delete/upsert) would
    // otherwise surface as an opaque Parquet missing-column error; only
    // finalGraph's validArtifact falls through to a rebuild (r12 advice)
    val ver = scala.util.Try(m.getAs[Int]("build_version")).getOrElse(0)
    require(ver == BuildVersion,
      s"graph-index artifact at $indexPath is build_version $ver but this " +
        s"engine writes v$BuildVersion — the meta schema is incompatible; " +
        "rebuild the artifact (GraphIndex.build) before mutating it")
    Meta(m.getAs[Long]("n"), new java.math.BigInteger(m.getAs[String]("fp_acc")),
      m.getAs[Long]("last_append_fp"), m.getAs[Long]("last_append_seq"),
      m.getAs[Long]("last_delete_fp"), m.getAs[Long]("last_delete_seq"),
      m.getAs[Long]("op_seq"), m.getAs[Long]("layer_se1"),
      m.getAs[Long]("layer_se2"), m.getAs[Long]("n1_build"))
  }

  /** The live `nodes` sidecar (id, h, bucket). */
  private def nodes(spark: SparkSession, indexPath: String): DataFrame =
    spark.read.parquet(s"$indexPath/nodes")

  /** Full-corpus fingerprint scans performed — the scale tripwire
    * [[GraphAppendStreamSpec]] watches: a micro-batch commit must never
    * increment it (the r10 verdict's O(corpus)-per-append finding). */
  private[search] val fingerprintScans = new java.util.concurrent.atomic.AtomicLong

  /** Order-independent content fingerprint of an embedding frame (sum
    * of per-row xxhash64 over id+vector): one FULL scan — the audit
    * path ([[validArtifact]], specs), never the per-batch commit path,
    * which folds deltas into the stored accumulator instead. */
  private[search] def corpusFingerprint(emb: DataFrame): Long = {
    fingerprintScans.incrementAndGet()
    fold(countAndAcc(emb)._2)
  }

  private def topQ(df: DataFrame, k: Int): DataFrame =
    graft.plans.TopKPerGroup(
      df.withColumn("neg_sim", -col("sim")), Seq("q"), Seq("neg_sim", "j"), k)
      .select(col("q"), col("rk"), col("j"), col("sim"))

  /** Distributed beam search of an ARBITRARY query frame into a graph —
    * the kernel shared by the incremental insert (new batch → old
    * graph), the streaming serve, and the filtered serve's two arms.
    * Unlike [[GraphServe]]'s sample-bounded serve, the query side is
    * joined, never broadcast, so the batch can be any size; `entries`
    * is the only broadcast frame (the √n upper layer — a few MB of ids
    * even at 10^11 nodes).
    * The query point is excluded (j ≠ q — the GraphServe contract; a
    * no-op when query ids are disjoint from the corpus, as in append).
    * Returns the final beam (q, rk, j, sim), ≤ `beam` rows per query.
    *
    * Restricting `nodeEmb` restricts the SEARCH: candidates missing
    * from it die in the embedding-fetch join before the heap — which is
    * exactly the filtered serve's pre-filter arm. */
  private[search] def beamSearch(queries: DataFrame, undAdj: DataFrame,
                                 nodeEmb: DataFrame, entries: DataFrame,
                                 beam: Int, rounds: Int): DataFrame =
    beamKernel(queries, nodeEmb, entries, beam, rounds,
      hop1Gen(undAdj), trace = false)._1

  /** The standard 1-hop candidate generator: each beam member expands
    * to its undirected neighbors. */
  private[graft] def hop1Gen(undAdj: DataFrame): DataFrame => DataFrame = b =>
    b.join(undAdj.select(col("i").as("j"), col("j").as("c")), Seq("j"))
      .select(col("q"), col("c").as("j")).distinct()

  /** THE beam kernel — the one implementation behind [[beamSearch]] and
    * [[FilteredGraphServe]]'s instrumented arms (the r11 review: two
    * verbatim copies had to stay row-identical with nothing enforcing
    * it). Generalized over the candidate generator (the three filtered
    * arms differ only there) and over `trace`: when true, each round's
    * scored frame is checkpointed and returned (its row count IS the
    * arm's scoring cost); when false (the serve/insert hot path) the
    * scored frames stream straight into the heap without an extra
    * materialization, exactly the old beamSearch plan. */
  private[graft] def beamKernel(queries: DataFrame, nodeEmb: DataFrame,
                                 entries: DataFrame, beam: Int, rounds: Int,
                                 candGen: DataFrame => DataFrame,
                                 trace: Boolean): (DataFrame, Seq[DataFrame]) = {
    val qs = queries.select(col("q"), col("qv"))
    val entryPairs = qs.select(col("q")).withColumn("one", lit(1))
      .join(broadcast(entries.select(col("j")).withColumn("one", lit(1))), Seq("one"))
      .select(col("q"), col("j"))
    beamKernelFrom(scoreQK(qs, nodeEmb)(entryPairs), queries, nodeEmb,
      beam, rounds, candGen, trace)
  }

  /** The shared scoring stage: (q, j) pairs → (q, j, sim) with the
    * query point excluded. */
  private def scoreQK(qs: DataFrame, nodeEmb: DataFrame)(pairs: DataFrame): DataFrame =
    pairs.filter(col("j") =!= col("q"))
      .join(nodeEmb.select(col("vec_id").as("j"), col("embedding").as("nv")), Seq("j"))
      .join(qs, Seq("q"))
      .select(col("q"), col("j"),
        round(cosine_sim(col("qv"), col("nv")), 6).as("sim"))

  /** The kernel's round loop, started from a caller-supplied SCORED
    * seed frame (q, j, sim) — the entry-descent hook: [[GraphServe]]'s
    * hierarchical entry layers produce the seed (an upper-layer beam
    * walk) and the base rounds continue from it. `beamKernel` itself is
    * this with seed = the scored global entry pairs. When `trace` is
    * set the seed and each round's scored frame are checkpointed and
    * returned (row counts = per-stage scoring cost). */
  private[graft] def beamKernelFrom(seed: DataFrame, queries: DataFrame,
                                     nodeEmb: DataFrame, beam: Int, rounds: Int,
                                     candGen: DataFrame => DataFrame,
                                     trace: Boolean): (DataFrame, Seq[DataFrame]) = {
    val qs = queries.select(col("q"), col("qv"))
    val scoreQ = scoreQK(qs, nodeEmb) _
    val s0 = if (trace) seed.localCheckpoint(true) else seed
    val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (trace) frames += s0
    var b = topQ(s0, beam).localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val srRaw = scoreQ(candGen(b.select(col("q"), col("j"))))
      val sr = if (trace) srRaw.localCheckpoint(true) else srRaw
      if (trace) frames += sr
      b = topQ(sr.unionByName(b.select("q", "j", "sim")).dropDuplicates("q", "j"), beam)
        .localCheckpoint(true)
    }
    (b, frames.toSeq)
  }

  /** [[beamSearch]] from a pre-computed entry seed (q, j, sim) — the
    * serve-side composition: hierarchical entry descent → base-graph
    * beam rounds. */
  private[search] def beamSearchFrom(seed: DataFrame, queries: DataFrame,
                                     undAdj: DataFrame, nodeEmb: DataFrame,
                                     beam: Int, rounds: Int): DataFrame =
    beamKernelFrom(seed, queries, nodeEmb, beam, rounds,
      hop1Gen(undAdj), trace = false)._1

  /** The artifact's entry-hierarchy state at insert time: the layer-1
    * members (vec_id, embedding — from `l1nodes`, PRE-batch on a
    * replay), the pinned layer-2 stride, and the layer-1 navigation
    * subgraph's undirected view when materialized (the walk branch —
    * None keeps the one-stage brute entry, bit-for-bit the v7 path). */
  private[graft] case class LayerState(m1: DataFrame, se2: Long,
                                        und1: Option[DataFrame])

  /** The insertion beams' entry SEED — the [[GraphServe.descend]]
    * geometry over the ARTIFACT's persisted hierarchy instead of the
    * serve's in-session memo, closing the one insert-path term that
    * grew with corpus size (the old entry brute-scored each new vector
    * against all ~√n layer members; at 10⁹ nodes that was ~31.6k
    * scorings per INSERTED vector — the descent bounds it at
    * ~n^(1/4) + L1Rounds·beam·deg, same as the serve). Brute branch:
    * one stage scoring every query against the whole layer (row-exact
    * the pre-v8 entry). Walk branch: the layer-2 sub-stride members
    * brute-scored, then [[GraphServe.L1Rounds]] beam rounds over the
    * persisted layer-1 subgraph. BOTH branches score against the
    * member embeddings from `l1nodes` — the entry phase reads ZERO
    * corpus rows, where the v7 entry filter-scanned the whole corpus
    * per batch to find its entry set. Cut at the fixed upper-layer
    * width ([[GraphServe.Beam]] = [[InsertBeam]]), HNSW's shape. */
  private[graft] def insertSeed(queries: DataFrame, layer: LayerState): DataFrame = {
    val m1e = layer.m1
    val b = layer.und1 match {
      case None =>
        beamKernel(queries, m1e, m1e.select(col("vec_id").as("j")),
          GraphServe.Beam, 0, identity, trace = false)._1
      case Some(u1) =>
        val m2 = m1e.filter(GraphServe.entryPick(col("vec_id"), layer.se2))
          .select(col("vec_id").as("j"))
        beamKernel(queries, m1e, m2, GraphServe.Beam,
          GraphServe.L1Rounds, hop1Gen(u1), trace = false)._1
    }
    b.select(col("q"), col("j"), col("sim"))
  }

  /** The append COMPUTE (shared by [[append]] and the replay spec):
    * returns (full new edge list, changed-node frame). `nOld` comes
    * from the artifact's meta and `cntB` from the caller's one batch
    * scan (not counts over the corpus frames — the commit path stays
    * O(batch) in driver-forced actions, including the scoring-tier
    * inputs below); `layer` is the artifact's pre-batch entry
    * hierarchy ([[LayerState]]). */
  private[search] def appendedGraph(spark: SparkSession, gOld: DataFrame,
                                    oldEmb: DataFrame, newEmb: DataFrame,
                                    nOld: Long, cntB: Long,
                                    layer: LayerState): (DataFrame, DataFrame) = {
    val qs = newEmb.select(col("vec_id").as("q"), col("embedding").as("qv"))
    // phase 1: insertion beam over the old graph, entering through the
    // artifact's persisted hierarchy (the HNSW insert descends the same
    // layers the serve does) ------------------------------------------
    val oldUnd = und(gOld).localCheckpoint(true)
    // the final beam is already ranked (sim DESC, j) — its top-K prefix
    // IS the adopted neighbor list
    val bFinal = beamSearchFrom(insertSeed(qs, layer), qs, oldUnd, oldEmb,
      InsertBeam, InsertRounds)
    val newEdges = bFinal.filter(col("rk") <= Degree)
      .select(col("q").as("i"), col("j"), col("sim"))
    // phase 2: one descent round through the new neighborhoods --------
    val fullEmb = oldEmb.unionByName(newEmb)
    val merged0 = gOld.unionByName(newEdges).localCheckpoint(true)
    val nb = newEdges.select(col("i").as("mid"))
      .union(newEdges.select(col("j").as("mid"))).distinct()
    // pool-capped candidate generation restricted to the batch's 2-hop
    // neighborhood Γ(new): ∪_{m∈nb} Γ'(m)×Γ'(m) with Γ' the
    // KnnGraph.capPool cap — hub middles can't quadratically explode a
    // batch's repair (the r11 100× probe finding, same cap as the build)
    val gamma = KnnGraph.capPool(und(merged0))
    val gm = gamma.select(col("i").as("mid"), col("j"))
    val cand = gm.select(col("mid"), col("j").as("x"))
      .join(nb, Seq("mid"))
      .join(gm.select(col("mid"), col("j").as("y")), Seq("mid"))
      .select(col("x").as("i"), col("y").as("j"))
      .filter(col("i") =!= col("j"))
      .distinct()
    val changedI = cand.select(col("i")).distinct()
      .union(newEdges.select(col("i")).distinct()).distinct()
    // exact pre-dedup candidate bound Σ_{m∈nb} |Γ'(m)|² for the scoring
    // tier choice (KnnGraph.scoreSliced — broadcast / one-shuffle / sliced)
    val degRow = gm.join(nb, Seq("mid"))
      .groupBy("mid").agg(count(lit(1)).as("d"))
      .agg(sum(col("d") * col("d"))).head()
    val candUpper = if (degRow.isNullAt(0)) 0L else degRow.getLong(0)
    val pool = KnnGraph.scoreSliced(cand, fullEmb, candUpper,
        nOld + cntB, KnnGraph.dimOf(newEmb))
      .unionByName(merged0.join(changedI, Seq("i"), "left_semi"))
      .dropDuplicates("i", "j")
    val repaired = topKPer(pool, "i", Degree)
    val gNew = merged0.join(changedI, Seq("i"), "left_anti")
      .unionByName(repaired).localCheckpoint(true)
    (gNew, changedI)
  }

  /** Incremental DELETE on the artifact: drop every edge touching a
    * deleted id, then repair ONLY the degraded survivors (nodes that
    * lost a neighbor) with one descent-style round over the surviving
    * adjacency — the [[GraphDelete]] semantics restricted to the nodes
    * that actually changed, so the rewrite (and the repair compute) is
    * proportional to the deletion's blast radius, not the corpus. Only
    * buckets holding degraded or deleted nodes are rewritten. `emb`
    * must be the SURVIVOR embeddings (deleted ids absent).
    *
    * Bookkeeping is O(blast radius): the deleted rows' content hashes
    * come from the `nodes` sidecar (partition-pruned to the batch's
    * buckets), folded OUT of the meta accumulator — never a survivor
    * rescan. Same meta-first + batch-fingerprint crash-retry contract
    * as [[append]]; deleting already-absent ids is a no-op by
    * construction (they contribute no sidecar rows), which is what
    * makes a replayed [[upsert]] converge. */
  def delete(spark: SparkSession, indexPath: String,
             delIds: DataFrame, emb: DataFrame): Unit =
    delete(spark, indexPath, delIds, emb, upsertAppendFp = None)

  /** `upsertAppendFp` widens the replay window for [[upsert]]'s
    * interleaved delete: a standalone delete is a replay only if its
    * commit was the LAST op (exact position), but in a replayed upsert
    * that crashed after BOTH commits the delete's commit sits one
    * position behind the transaction's append — so the delete also
    * reads as a replay when it sits at seq−1 AND the append guard at
    * the current position carries the SAME upsert's batch fingerprint.
    * Qualifying the window on the sibling append is load-bearing (the
    * r12 review): a bare one-position tolerance let a GENUINE upsert
    * whose ids-only fingerprint matched an unrelated delete one
    * position back skip its fold on the live path — no crash needed —
    * leaving meta permanently high by the batch. With the
    * qualification, that upsert's batch fp differs from the remembered
    * append's and the fold runs. */
  private[search] def delete(spark: SparkSession, indexPath: String,
                             delIds: DataFrame, emb: DataFrame,
                             upsertAppendFp: Option[Long]): Unit = {
    recoverAllSwaps(spark, indexPath) // heal parked buckets BEFORE any read
    val gOld = edges(spark, indexPath).localCheckpoint(true)
    val m = readMeta(spark, indexPath)
    val (nMeta, accOld) = (m.n, m.acc)
    val ids = delIds.select(col("vec_id")).distinct().localCheckpoint(true)
    val dropped = gOld
      .join(ids.select(col("vec_id").as("i")), Seq("i"), "left_anti")
      .join(ids.select(col("vec_id").as("j")), Seq("j"), "left_anti")
      .select(col("i"), col("j"), col("sim"))
    // survivors that LOST an out-neighbor — the only nodes whose lists
    // can improve from a repair
    val degraded = gOld
      .join(ids.select(col("vec_id").as("j")), Seq("j"), "left_semi")
      .select(col("i")).distinct()
      .join(ids.select(col("vec_id").as("i")), Seq("i"), "left_anti")
      .localCheckpoint(true)
    // pool-capped 2-hop repair candidates (KnnGraph.capPool on both
    // hops): a hub middle can't quadratically explode the blast radius
    val gammaD = KnnGraph.capPool(und(dropped)).localCheckpoint(true)
    val hop1 = gammaD.join(degraded, Seq("i"), "left_semi")
    val cand = hop1.select(col("i"), col("j").as("mid"))
      .join(gammaD.select(col("i").as("mid"), col("j").as("c")), Seq("mid"))
      .select(col("i"), col("c").as("j"))
      .filter(col("i") =!= col("j"))
      .distinct()
    val candUpper = hop1.count() * KnnGraph.PoolCap
    // tier inputs: meta n bounds the survivor frame from above (exact
    // pre-fold corpus size), dim from one limit-1 probe — no corpus scan
    val pool = KnnGraph.scoreSliced(cand, emb, candUpper, nMeta, KnnGraph.dimOf(emb))
      .unionByName(dropped.join(degraded, Seq("i"), "left_semi"))
      .dropDuplicates("i", "j")
    val repaired = topKPer(pool, "i", Degree)
    val gNew = dropped.join(degraded, Seq("i"), "left_anti")
      .unionByName(repaired).localCheckpoint(true)
    val changed = degraded.unionByName(ids.select(col("vec_id").as("i"))).distinct()
    val touched = changed
      .select(pmod(col("i"), lit(NumBuckets.toLong)).as("bucket")).distinct()
      .collect().map(_.getLong(0)).sorted.toIndexedSeq
    // the batch fingerprint derives from the CALLER's id frame alone
    // (ids-only hash), so a replay reproduces it whatever the artifact
    // state; the fold amount derives from the sidecar, so only ids
    // actually PRESENT subtract anything
    val rI = ids.agg(count(lit(1)),
      sum(xxhash64(col("vec_id")).cast("decimal(38,0)"))).head()
    val fpD = batchFp(OpDelete, rI.getLong(0),
      if (rI.isNullAt(1)) java.math.BigInteger.ZERO else rI.getDecimal(1).toBigInteger)
    val touchedN = ids
      .select(pmod(col("vec_id"), lit(NumBuckets.toLong)).as("bucket")).distinct()
      .collect().map(_.getLong(0)).sorted.toIndexedSeq
    val sidecar = nodes(spark, indexPath)
      .filter(col("bucket").isin(touchedN.map(Long.box): _*)).select(col("id"), col("h"))
      .localCheckpoint(true) // pin PRE-swap state for the fold
    // replay = same ids at the current position, or (upsert only) one
    // position back with the sibling append's guard live at the head;
    // a content-only match after unrelated intervening ops is a
    // GENUINE re-issue (e.g. delete → re-append → same delete again)
    // and must fold
    val replay = m.lastD == fpD &&
      (m.lastDSeq == m.seq ||
        (m.lastDSeq == m.seq - 1 && upsertAppendFp.exists(fb =>
          m.lastA == fb && m.lastASeq == m.seq)))
    if (!replay) {
      val rD = sidecar.join(ids.select(col("vec_id").as("id")), Seq("id"), "left_semi")
        .agg(count(lit(1)), sum(col("h").cast("decimal(38,0)"))).head()
      val accD = if (rD.isNullAt(1)) java.math.BigInteger.ZERO
                 else rD.getDecimal(1).toBigInteger
      // per-operation guard slot: lastA is PRESERVED, so an upsert's
      // delete can never clobber the append guard (whose clobbering
      // made a replayed upsert double-fold the append batch — the r11
      // review's top finding)
      writeMeta(spark, indexPath, Meta(nMeta - rD.getLong(0),
        accOld.subtract(accD), m.lastA, m.lastASeq, fpD, m.seq + 1, m.seq + 1,
        m.se1, m.se2, m.n1b))
    }
    val nodesNew = sidecar.join(ids.select(col("vec_id").as("id")), Seq("id"), "left_anti")
    swapDataset(spark, indexPath, "nodes", "id", nodesNew, touchedN)
    // hierarchy maintenance: drop deleted members from l1nodes, and —
    // when the walk layer is materialized — every layer edge touching a
    // deleted member (both directions: the in-edge sources are found by
    // one scan of the member-sized edge list, never the corpus).
    // Surviving members keep shortened lists; navigation tolerates it
    // and materializeLayer/rebuild heals (the layerEdges contract).
    val delL1 = ids.filter(GraphServe.entryPick(col("vec_id"), m.se1))
      .localCheckpoint(true)
    val touchedL1 = delL1
      .select(pmod(col("vec_id"), lit(NumBuckets.toLong)).as("bucket")).distinct()
      .collect().map(_.getLong(0)).sorted.toIndexedSeq
    if (touchedL1.nonEmpty) {
      val l1Surv = readL1Nodes(spark, indexPath)
        .filter(col("bucket").isin(touchedL1.map(Long.box): _*))
        .select(col("id"), col("embedding"))
        .join(delL1.select(col("vec_id").as("id")), Seq("id"), "left_anti")
      swapDataset(spark, indexPath, "l1nodes", "id", l1Surv, touchedL1)
      layerEdges(spark, indexPath).foreach { le =>
        // sources that point AT a deleted member — their buckets are
        // rewritten too (the in-edge side)
        val degradedSrc = le
          .join(delL1.select(col("vec_id").as("j")), Seq("j"), "left_semi")
          .select(col("i")).distinct()
        val touchedE = (degradedSrc.unionByName(delL1.select(col("vec_id").as("i")))
          .select(pmod(col("i"), lit(NumBuckets.toLong)).as("bucket")).distinct()
          .collect().map(_.getLong(0)).toSet ++ touchedL1).toSeq.sorted
        val leSurv = le
          .join(delL1.select(col("vec_id").as("i")), Seq("i"), "left_anti")
          .join(delL1.select(col("vec_id").as("j")), Seq("j"), "left_anti")
          .select(col("i"), col("j"), col("sim"))
        swapDataset(spark, indexPath, "l1edges", "i", leSurv, touchedE)
      }
    }
    swapDataset(spark, indexPath, "edges", "i", gNew, touched)
  }

  /** UPSERT = [[delete]] the batch's ids + [[append]] its vectors — the
    * reference's merge-back loop (update-etiquetas.ipynb re-ingests
    * re-labeled documents into the live index). The two steps commit
    * independently; a failure between them leaves the ids absent
    * (delete-first, the [[IvfIndex.upsert]] rationale: re-running the
    * same upsert converges — deleting absent ids is a no-op and the
    * append completes the replacement; append-first's failure mode is
    * duplicate serve results, worse than a transient gap).
    * `survivorEmb` = corpus minus the batch ids, `batch` = the new
    * (vec_id, embedding) rows. */
  def upsert(spark: SparkSession, indexPath: String,
             survivorEmb: DataFrame, batch: DataFrame): Unit = {
    // the batch's append fingerprint qualifies the delete's widened
    // replay window: the delete one position back is this transaction's
    // own only if the head commit is this very batch's append (one
    // extra O(batch) scan — the price of not misreading an unrelated
    // same-ids delete as ours; the r12 review finding)
    val (cntB, accB) = countAndAcc(batch)
    val fpB = batchFp(OpAppend, cntB, accB)
    delete(spark, indexPath, batch.select(col("vec_id")), survivorEmb,
      upsertAppendFp = Some(fpB))
    append(spark, indexPath, survivorEmb, batch)
  }

  /** OPTIMIZE the artifact: run `rounds` full NN-descent rounds over the
    * LIVE adjacency — from its current state, not from seeds — and
    * rewrite only the buckets whose lists changed. The graph sibling of
    * [[IvfIndex.rebalance]]'s reindex-on-drift loop: incremental
    * [[append]]s insert each batch well but never revisit OLD nodes far
    * from the batch, so quality drifts down as appends accumulate; a
    * periodic optimize heals the whole graph at build-round cost
    * (O(n·(2·deg)²) scorings per round — deliberately full-graph, this
    * IS the maintenance pass), with q_graph_stats' reciprocal share as
    * the trigger signal. An exact top-K member already in a list can
    * never be evicted (at most K−1 vectors are strictly closer), so
    * recall against any fixed truth is monotone non-decreasing in
    * rounds — the spec law. Meta is untouched: the corpus did not
    * change, only edge quality. A list can only change by ADMITTING a
    * new edge (each round keeps top-Degree of old ∪ candidates), so
    * changed nodes are exactly the new-edge sources — the bucket-rewrite
    * set. */
  def optimize(spark: SparkSession, indexPath: String, emb: DataFrame,
               rounds: Int = 1): Unit = {
    // heal parked _app_old buckets BEFORE any dataset read, like
    // append/delete — optimizing an artifact whose last append crashed
    // mid-swap would otherwise checkpoint a graph missing a parked
    // bucket (r14 advice #1)
    recoverAllSwaps(spark, indexPath)
    // `emb` MUST be the exact corpus the artifact indexes — verified
    // against meta's (n, accumulator) with one full scan (this is a
    // full-graph maintenance pass; one audit-grade scan is
    // proportionally free, and without it a regenerated corpus with
    // the same ids would mix new candidate sims with stored old sims
    // while the (i, j)-only changed-detection missed sim-only drift —
    // the r11 review finding; every other artifact entry point already
    // fingerprint-checks)
    val mm = readMeta(spark, indexPath)
    val (nMeta, accMeta) = (mm.n, mm.acc)
    val (nE, accE) = countAndAcc(emb)
    fingerprintScans.incrementAndGet() // honesty: this IS a corpus scan
    require(nE == nMeta && accE == accMeta,
      s"optimize: corpus (n=$nE) does not match the artifact's meta " +
        s"(n=$nMeta) — optimize must run with the exact corpus that " +
        "built/appended the index")
    val dim = KnnGraph.dimOf(emb)
    val g0 = edges(spark, indexPath).localCheckpoint(true)
    var g = g0
    for (_ <- 1 to rounds) {
      g = KnnGraph.step(g, emb, Degree, nMeta, dim).localCheckpoint(true)
      System.gc() // reclaim the round's dead shuffle files (KnnGraph note)
    }
    val changed = g.join(g0, Seq("i", "j"), "left_anti")
      .select(col("i")).distinct()
    val touched = changed
      .select(pmod(col("i"), lit(NumBuckets.toLong)).as("bucket")).distinct()
      .collect().map(_.getLong(0)).sorted.toIndexedSeq
    if (touched.nonEmpty)
      swapDataset(spark, indexPath, "edges", "i",
        g.select(col("i"), col("j"), col("sim")), touched)
    // the maintenance pass heals the NAVIGATION layer too: incremental
    // appends leave old members' l1edges lists stale (they never
    // re-rank against newcomers — the layerEdges contract), and this is
    // the pass that pays full-graph cost anyway, so the |members|² pair
    // job (≈ one corpus scan) rides along. Only when materialized —
    // brute artifacts have no subgraph to heal — and only if any
    // mutation has committed since the build (op_seq > 0): a
    // freshly-built layer is exact by construction, so re-healing it
    // would rewrite byte-identical rows for nothing (late-wave review).
    if (mm.seq > 0 && layerEdges(spark, indexPath).isDefined)
      materializeLayer(spark, indexPath)
  }

  /** COMPACT the artifact: rewrite every bucket of both datasets
    * (edges + nodes sidecar) into one file each, healing the small-file
    * accumulation repeated [[append]]/[[delete]] swaps leave behind
    * ([[IvfIndex.compact]]'s sibling — at 10^11 edges, serve-scan
    * latency degrades with file count once buckets fragment). One scan
    * + one shuffle keyed by bucket per dataset, whole-directory swap
    * via two renames (run without concurrent readers; see the
    * IvfIndex.compact scaladoc for the object-store manifest variant). */
  def compact(spark: SparkSession, indexPath: String): Unit = {
    import org.apache.hadoop.fs.Path
    // heal parked _app_old buckets first: compacting an un-healed
    // artifact would rewrite datasets missing a parked bucket AND leave
    // the stale trash to be "restored" into the freshly compacted dir
    // by a later recovery (r14 advice #1)
    recoverAllSwaps(spark, indexPath)
    val fs = new Path(indexPath).getFileSystem(spark.sessionState.newHadoopConf())
    // l1edges only exists on walk-branch artifacts (layerEdges contract)
    val datasets = Seq("edges", "nodes", "l1nodes") ++
      (if (fs.exists(new Path(s"$indexPath/l1edges"))) Seq("l1edges") else Nil)
    datasets.foreach(compactDataset(spark, indexPath, _))
  }

  private def compactDataset(spark: SparkSession, indexPath: String,
                             dataset: String): Unit = {
    import org.apache.hadoop.fs.Path
    val data = new Path(s"$indexPath/$dataset")
    val fresh = new Path(s"$indexPath/${dataset}_compacting")
    val old = new Path(s"$indexPath/${dataset}_old")
    val fs = data.getFileSystem(spark.sessionState.newHadoopConf())
    // a previous compact crashed between its two renames (data parked
    // in `old`, fresh never landed) — restore and proceed
    if (!fs.exists(data) && fs.exists(old) && !fs.rename(old, data))
      throw new java.io.IOException(
        s"compact recovery: rename $old -> $data failed — restore manually")
    require(fs.exists(data), s"$data missing — not a built index")
    fs.delete(old, true)
    fs.delete(fresh, true)
    spark.read.parquet(data.toString)
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(fresh.toString)
    if (!fs.rename(data, old))
      throw new java.io.IOException(s"compact: rename $data -> $old failed")
    if (!fs.rename(fresh, data)) {
      val rolledBack = fs.rename(old, data)
      throw new java.io.IOException(
        s"compact: rename $fresh -> $data failed" +
          (if (rolledBack) " (previous layout restored)"
           else s"; ROLLBACK $old -> $data ALSO FAILED — restore manually from $old"))
    }
    fs.delete(old, true)
  }

  /** Rewrite only `touched` bucket dirs of one artifact dataset from
    * `frame` (bucket derived as `keyCol mod NumBuckets`), with
    * rename-aside crash recovery (see [[IvfIndex.delete]] — same
    * contract). Recovery restores parked buckets where the live dir is
    * missing; a crash mid-swap therefore heals into a MIXED
    * old/new-generation dir set, and correctness depends on the caller
    * REPLAYING the interrupted batch (the [[append]] crash-retry
    * contract) — recovery is resume-forward, not rollback. */
  /** Restore any `_app_old`-parked buckets of ONE dataset into live-dir
    * holes and drop the trash dir. Recovery is resume-forward (see
    * [[swapDataset]]); a dataset with no live dir (l1edges below the
    * brute bar) has nothing to recover into and is skipped. */
  private def recoverDataset(fs: org.apache.hadoop.fs.FileSystem,
                             indexPath: String, dataset: String): Unit = {
    import org.apache.hadoop.fs.Path
    val data = new Path(s"$indexPath/$dataset")
    val trash = new Path(s"$indexPath/${dataset}_app_old")
    if (fs.exists(data) && fs.exists(trash)) {
      fs.listStatus(trash).foreach { st =>
        val live = new Path(data, st.getPath.getName)
        if (!fs.exists(live) && !fs.rename(st.getPath, live))
          throw new java.io.IOException(
            s"append: recovery rename ${st.getPath} -> $live failed — " +
              "restore manually before appending again")
      }
      fs.delete(trash, true)
    }
  }

  /** Run the `_app_old` trash recovery for EVERY artifact dataset,
    * BEFORE any dataset read. swapDataset's lazy in-call recovery only
    * healed each dataset when (and in the order) it was next SWAPPED —
    * so a replayed append after a mid-swap crash could read and
    * localCheckpoint a layer/edge state still missing a parked bucket
    * (gOld/m1Old/und1Old are captured at the top of append/delete),
    * descend a layer without that bucket's edges, and commit base rows
    * diverging from the clean-run/oracle chain (r13 advice). Hoisting
    * recovery ahead of the reads makes the replay see exactly the
    * healed pre-crash state. The in-call recovery stays as a
    * belt-and-braces for direct callers. */
  private def recoverAllSwaps(spark: SparkSession, indexPath: String): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(indexPath).getFileSystem(spark.sessionState.newHadoopConf())
    Seq("edges", "nodes", "l1nodes", "l1edges")
      .foreach(recoverDataset(fs, indexPath, _))
  }

  private def swapDataset(spark: SparkSession, indexPath: String,
                          dataset: String, keyCol: String,
                          frame: DataFrame, touched: Seq[Long]): Unit = {
    import org.apache.hadoop.fs.Path
    val data = new Path(s"$indexPath/$dataset")
    val scratch = new Path(s"$indexPath/${dataset}_appending")
    val trash = new Path(s"$indexPath/${dataset}_app_old")
    val fs = data.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(data), s"$data missing — not a built graph index")
    recoverDataset(fs, indexPath, dataset)
    fs.delete(scratch, true)
    frame.withColumn("bucket", pmod(col(keyCol), lit(NumBuckets.toLong)))
      .filter(col("bucket").isin(touched.map(Long.box): _*))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(scratch.toString)
    // a touched bucket with ZERO surviving rows gets an explicit EMPTY
    // dir: the rename loop then always installs a fresh dir, so a crash
    // after the swap but before the trash cleanup can never be
    // misdiagnosed by recovery as "live missing → restore the aside
    // copy" — which would resurrect deleted edges (r10 review finding)
    touched.foreach { b =>
      val f = new Path(scratch, s"bucket=$b")
      if (!fs.exists(f)) fs.mkdirs(f)
    }
    fs.mkdirs(trash)
    touched.foreach { b =>
      val live = new Path(data, s"bucket=$b")
      val fresh = new Path(scratch, s"bucket=$b")
      if (fs.exists(live) && !fs.rename(live, new Path(trash, s"bucket=$b")))
        throw new java.io.IOException(s"append: rename $live aside failed")
      if (fs.exists(fresh) && !fs.rename(fresh, live))
        throw new java.io.IOException(
          s"append: rename $fresh -> $live failed — bucket $b is parked in " +
            s"$trash and will be restored by the next append() call")
    }
    fs.delete(trash, true)
    fs.delete(scratch, true)
  }

  // ------------------------------------------------------- artifact-backed

  private val finalGraphMemo =
    new graft.BoundedMemo[String, DataFrame](KnnGraph.MemoCap)

  def artifactPath(dir: String): String =
    AnnQueries.scratch(s"graft_graph_index_v$BuildVersion", dir)

  /** The corpus's FINAL descent graph, served from the persisted
    * artifact when a valid one exists (meta matches the corpus size and
    * build version), else built once, persisted, and served — so across
    * sessions the build cost is paid at WRITE time and a cold serve
    * starts from a bucketed scan. Same rows either way (the build is
    * deterministic), which is what lets [[GraphServe]]/[[GraphDelete]]
    * replay against the un-persisted CTE chain. */
  def finalGraph(spark: SparkSession, dir: String): DataFrame =
    finalGraphMemo.getOrElseUpdate(dir) {
      val idx = artifactPath(dir)
      val emb = KnnGraph.e(spark, dir)
      val n = emb.count()
      val fp = corpusFingerprint(emb)
      if (!validArtifact(spark, idx, n, fp)) {
        val g = KnnGraph.nnDescentRounds(emb, dir, Degree, KnnGraph.Rounds).last
        build(spark, idx, g, emb)
      }
      edges(spark, idx).localCheckpoint(true)
    }

  /** The AUDIT path: compares the corpus's recomputed fingerprint with
    * the artifact's folded accumulator — the one place the full
    * O(corpus) scan is correct. A corrupt, partial, or unreadable meta
    * sidecar (crash mid-[[writeMeta]] overwrite) reads as INVALID and
    * falls through to the rebuild path instead of throwing forever. */
  private[search] def validArtifact(spark: SparkSession, idx: String, n: Long,
                                    fp: Long): Boolean = {
    import org.apache.hadoop.fs.Path
    recoverMeta(spark, idx) // heal a writeMeta rename-window crash first
    val meta = new Path(s"$idx/meta")
    val fs = meta.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(meta) && fs.exists(new Path(s"$idx/edges")) &&
      scala.util.Try {
        val m = spark.read.parquet(meta.toString).head()
        m.getAs[Long]("n") == n && m.getAs[Int]("k") == Degree &&
          m.getAs[Int]("rounds") == KnnGraph.Rounds &&
          m.getAs[Int]("build_version") == BuildVersion &&
          m.getAs[Long]("corpus_fp") == fp &&
          // the serve consumes the persisted layer, so its tuning
          // constants must match too — a changed L1Degree/L1BruteBar
          // without a version bump reads as a stale artifact, not a
          // silently mis-shaped layer (r13 late-wave review)
          m.getAs[Int]("l1_degree") == GraphServe.L1Degree &&
          m.getAs[Long]("l1_bar") == GraphServe.L1BruteBar
      }.getOrElse(false)
  }

  // ---------------------------------------------------------------- queries

  /** Half-build → persist → APPEND → grade, memoized per dir (the frames
    * feed the query and the append-law spec). */
  private val appendMemo =
    new graft.BoundedMemo[String, (DataFrame, DataFrame)](KnnGraph.MemoCap)

  private[search] def halfAndAppended(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    appendMemo.getOrElseUpdate(dir) {
      val emb = KnnGraph.e(spark, dir)
      val oldEmb = emb.filter(col("vec_id") % AppendMod =!= NewResidue)
      val newEmb = emb.filter(col("vec_id") % AppendMod === NewResidue)
      val gOld = KnnGraph.nnDescentRounds(oldEmb, s"$dir#old$AppendMod$NewResidue",
        Degree, KnnGraph.Rounds).last
      val idx = AnnQueries.scratch(s"graft_graph_append_v$BuildVersion", dir)
      build(spark, idx, gOld, oldEmb)
      append(spark, idx, oldEmb, newEmb)
      (gOld, edges(spark, idx).localCheckpoint(true))
    }

  private[search] def exactTopK(emb: DataFrame, ev: DataFrame): DataFrame =
    graft.plans.TopKPerGroup(
      emb.select(col("vec_id").as("j"), col("embedding").as("emb_j"))
        .crossJoin(broadcast(ev))
        .filter(col("i") =!= col("j"))
        .select(col("i"), col("j"),
          round(cosine_sim(col("emb_i"), col("emb_j")), 6).as("sim"))
        .withColumn("neg_sim", -col("sim")), Seq("i"), Seq("neg_sim", "j"), K)
      .select(col("i"), col("j"))

  /** Reciprocal-edge count of one edge list as a 1-row frame — the
    * health stat [[qGraphStats]] reports, shared into the append/delete
    * drills so every lifecycle phase carries its own degradation signal
    * (a half-converged or badly repaired graph shows up as a falling
    * reciprocal share long before recall is re-graded). */
  private[search] def recipCount(g: DataFrame): DataFrame =
    g.select(col("i"), col("j"))
      .join(g.select(col("j").as("i"), col("i").as("j")), Seq("i", "j"), "left_semi")
      .agg(count(lit(1)).as("n_recip"))

  /** The append-law drill: recall@10 of (0) the half build on the OLD
    * corpus's truth, (1) the appended graph and (2) the full rebuild on
    * the FULL corpus's truth — same deterministic eval sample
    * ([[KnnGraph.SampleTarget]] modulus). Phase 1 ≈ phase 2 is the law;
    * the gap IS the cost of incremental maintenance vs a rebuild. Each
    * phase also reports its reciprocal-edge share ([[recipCount]]) —
    * the health regression the lifecycle spec pins. */
  /** Exact-truth eval frames for the append drill, memoized per dir:
    * the sample×corpus scoring pass is deterministic corpus state, not
    * drill logic, and at ~2 s per pass it dominated the drill's warm
    * cost (the r12 isolated A/B: 4.0 s warm, of which the two
    * exactTopK checkpoints were most; the three graph builds were
    * already shared through [[halfAndAppended]] / [[finalGraph]] /
    * the KnnGraph descent memo). */
  private val appendEvalMemo =
    new graft.BoundedMemo[String, (DataFrame, DataFrame, Long, Long)](KnnGraph.MemoCap)

  def qGraphAppend(spark: SparkSession, dir: String): DataFrame = {
    val (exactFull, exactOld, nEv, nOev) = appendEvalMemo.getOrElseUpdate(dir) {
      val emb = KnnGraph.e(spark, dir)
      val n = emb.count()
      // eval modulus coprime to the batch split (KnnGraph.evalModulus —
      // the collision class the r10 sf1 campaign caught): a multiple of
      // AppendMod would sample ONLY old nodes, silently grading the
      // appended phase on zero new queries. Identity at driver scales.
      val m = KnnGraph.evalModulus(n, AppendMod)
      val oldEmb = emb.filter(col("vec_id") % AppendMod =!= NewResidue)
      val ev = emb.filter(col("vec_id") % m === 0)
        .select(col("vec_id").as("i"), col("embedding").as("emb_i"))
      val oev = ev.filter(col("i") % AppendMod =!= NewResidue)
      (exactTopK(emb, ev).localCheckpoint(true),
        exactTopK(oldEmb, oev).localCheckpoint(true), ev.count(), oev.count())
    }
    val (gOld, gApp) = halfAndAppended(spark, dir)
    val gFull = finalGraph(spark, dir)
    Seq(("half_build", 0, gOld, exactOld, nOev),
        ("appended", 1, gApp, exactFull, nEv),
        ("full_rebuild", 2, gFull, exactFull, nEv)).map {
      case (name, ord, g, exact, nEval) =>
        val edgesN = g.agg(count(lit(1)).as("n_edges"))
        val hits = g.join(exact, Seq("i", "j"), "left_semi")
          .agg(count(lit(1)).as("n_hits"))
        edgesN.crossJoin(broadcast(hits)).crossJoin(broadcast(recipCount(g)))
          .select(
            lit(ord).as("phase_ord"), lit(name).as("phase"),
            col("n_edges"), lit(nEval).as("n_eval"),
            round(col("n_hits").cast("double") / lit(nEval * K), 6).as("recall"),
            round(col("n_recip").cast("double") / col("n_edges"), 6).as("recip_share"))
    }.reduce(_.unionByName(_)).orderBy("phase_ord")
  }

  /** Index health stats over the PERSISTED artifact — the [[AnnQueries]]
    * q_ivf_stats sibling an index tuner watches: degree spread,
    * reciprocal-edge share (descent symmetrizes neighborhoods, so low
    * reciprocity flags a half-converged build), isolated nodes (corpus
    * vectors with NO out-edges — unreachable as sources; a delete can
    * strand them), plus the v8 HIERARCHY surface: layer-1 member count,
    * whether the walk layer is materialized (the brute-bar branch), and
    * the persisted navigation-subgraph row count. GRADING CONTRACT
    * (r13 advice): the engine reads the LIVE artifact datasets while
    * the oracle computes the FRESH-BUILD closed form
    * (n1 × min(L1Degree, n1−1)) — the graded law is their EQUALITY,
    * which holds because this query serves from [[finalGraph]] and
    * finalGraph rebuilds whenever the corpus fingerprint changes, so
    * within this query the artifact is always fresh. A red here means a
    * stale artifact escaped the fingerprint check, not "drift
    * surfaced". Post-ingest drift on a mutated-in-place artifact
    * (members appended faster than the pinned share, stale lists) is a
    * different lifecycle, monitored by [[GraphDriftOptimize]] over its
    * own appended artifact — not by this drill. Exact integers + two
    * rounded ratios, one row. */
  def qGraphStats(spark: SparkSession, dir: String): DataFrame = {
    val emb = KnnGraph.e(spark, dir)
    val n = emb.count()
    val g = finalGraph(spark, dir)
    val idx = artifactPath(dir)
    val nL1 = layerNodes(spark, idx).count()
    val nL1Edges = layerEdges(spark, idx).map(_.count()).getOrElse(0L)
    val deg = g.groupBy("i").agg(count(lit(1)).as("d"))
    val degStats = deg.agg(
      count(lit(1)).as("n_indexed"), min(col("d")).as("min_degree"),
      max(col("d")).as("max_degree"), sum(col("d")).as("n_edges"))
    val recip = g.select(col("i"), col("j"))
      .join(g.select(col("j").as("i"), col("i").as("j")), Seq("i", "j"), "left_semi")
      .agg(count(lit(1)).as("n_recip"))
    degStats.crossJoin(broadcast(recip)).select(
      lit(n).as("n_vectors"), col("n_indexed"),
      (lit(n) - col("n_indexed")).as("isolated_nodes"),
      col("n_edges"), col("min_degree"), col("max_degree"),
      round(col("n_edges").cast("double") / col("n_indexed"), 6).as("avg_degree"),
      round(col("n_recip").cast("double") / col("n_edges"), 6).as("reciprocal_share"),
      lit(nL1).as("n_l1"),
      lit(if (nL1Edges > 0) 1L else 0L).as("layer_walk"),
      lit(nL1Edges).as("n_l1_edges"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_graph_append" -> (qGraphAppend _),
    "q_graph_stats" -> (qGraphStats _))

  // ---------------------------------------------------------------- oracles

  /** Insertion-beam CTEs round r over the old graph's `ound`. */
  private def insertCtes(r: Int): String = {
    val prev = s"ib${r - 1}"
    s"""ic$r AS (SELECT DISTINCT p.q, u.j FROM $prev p JOIN ound u ON u.i = p.j),
       |is$r AS (SELECT p.q, p.j, round(list_cosine_similarity(qn.qv, oe.v), 6) AS sim
       |  FROM ic$r p JOIN oe ON oe.id = p.j JOIN qn ON qn.q = p.q
       |  WHERE p.j <> p.q),
       |ip$r AS (SELECT q, j, sim FROM is$r UNION SELECT q, j, sim FROM $prev),
       |ib$r AS MATERIALIZED (SELECT q, j, sim FROM (
       |    SELECT q, j, sim, row_number() OVER (PARTITION BY q ORDER BY sim DESC, j) AS rn
       |    FROM ip$r) WHERE rn <= $InsertBeam)""".stripMargin
  }

  /** The insert-entry hierarchy over one member relation `m1` for query
    * frame `qsTbl`, CTE names suffixed `sfx`: member count, pinned
    * layer-2 sub-stride (se2 = se1 · upperModulus(|members|) — for the
    * DRILL artifacts |members at build| IS the member count of the old
    * chain, so the pinned value replays from the chain itself), the
    * layer-1 exact-kNN subgraph, the layer-2 entry scores, the descent
    * rounds, and the branch-selected top-[[InsertBeam]] seed
    * `ib<sfx>0` (brute below [[GraphServe.L1BruteBar]] — row-exact
    * the pre-v8 entry — else the walk; the engine's branch is `l1edges`
    * existence, decided at build by the same count predicate). */
  private[search] def insertEntryCtes(sfx: String, m1: String,
                                      qsTbl: String, se1Sql: String,
                                      n1bSql: String,
                                      undRel: Option[String] = None,
                                      walk: Boolean): String = {
    import GraphServe.{L1BruteBar, L1Degree, entryPickSql, upperModulusSql}
    val undName = undRel.getOrElse(s"und1$sfx")
    // the exact layer-1 subgraph over `m1` — the BUILD-time state; a
    // caller replaying a LATER batch passes the incrementally-grown
    // state instead (undRel), exactly what the engine's l1edges holds
    val subgraph = if (undRel.isDefined) "" else
      s"""l1p$sfx AS (SELECT a.id AS i, b.id AS j,
         |    round(list_cosine_similarity(a.v, b.v), 6) AS sim
         |  FROM $m1 a CROSS JOIN $m1 b WHERE a.id <> b.id),
         |l1g$sfx AS (SELECT i, j FROM (
         |    SELECT i, j, row_number() OVER (PARTITION BY i ORDER BY sim DESC, j) AS rn
         |    FROM l1p$sfx) WHERE rn <= $L1Degree),
         |und1$sfx AS MATERIALIZED (SELECT i, j FROM l1g$sfx
         |  UNION SELECT j AS i, i AS j FROM l1g$sfx),
         |""".stripMargin
    // Scala-side branch (r13 advice): DuckDB evaluates BOTH UNION arms'
    // CTE chains even when the scalar gate kills one (measured: an
    // unreferenced MATERIALIZED CTE runs too), so the old always-emit
    // shape paid the dead branch's member×member and brute-scoring jobs
    // at every drill scale. The generator knows the branch (callers
    // compute the build member count Scala-side, the same value the
    // engine reads from meta/l1edges-existence), so only the TAKEN
    // arm's chain is emitted — and the scalar guard STAYS in the
    // emitted arm: were the Scala-side decision ever wrong, the oracle
    // returns zero rows and the drill goes loudly red instead of
    // silently grading the other branch.
    val brutePart =
      s"""isb$sfx AS (SELECT $qsTbl.q, $m1.id AS j,
         |    round(list_cosine_similarity($qsTbl.qv, $m1.v), 6) AS sim
         |  FROM $qsTbl CROSS JOIN $m1 WHERE $m1.id <> $qsTbl.q),
         |ib${sfx}0 AS MATERIALIZED (
         |  SELECT q, j, sim FROM (
         |    SELECT q, j, sim, row_number() OVER (PARTITION BY q ORDER BY sim DESC, j) AS rn
         |    FROM isb$sfx) WHERE rn <= $InsertBeam AND (SELECT n1 FROM l1n$sfx) <= $L1BruteBar)""".stripMargin
    val walkPart =
      s"""u2prm$sfx AS (SELECT ($se1Sql) * ${upperModulusSql(n1bSql)} AS se2),
         |ent2$sfx AS (SELECT id AS j FROM $m1
         |  WHERE ${entryPickSql("id", s"SELECT se2 FROM u2prm$sfx")}),
         |${subgraph}es2$sfx AS MATERIALIZED (SELECT $qsTbl.q, ent2$sfx.j,
         |    round(list_cosine_similarity($qsTbl.qv, $m1.v), 6) AS sim
         |  FROM $qsTbl CROSS JOIN ent2$sfx JOIN $m1 ON $m1.id = ent2$sfx.j
         |  WHERE ent2$sfx.j <> $qsTbl.q),
         |${GraphServe.descentCtes(sfx, esName = s"es2$sfx", tbl = m1,
            idc = "id", vc = "v", qsTbl = qsTbl, undTbl = undName,
            nodeCol = "j")},
         |ib${sfx}0 AS MATERIALIZED (
         |  SELECT q, j, sim FROM (
         |    SELECT q, j, sim, row_number() OVER (PARTITION BY q ORDER BY sim DESC, j) AS rn
         |    FROM lb$sfx${GraphServe.L1Rounds}) WHERE rn <= $InsertBeam AND (SELECT n1 FROM l1n$sfx) > $L1BruteBar)""".stripMargin
    s"""l1n$sfx AS (SELECT CAST(($n1bSql) AS BIGINT) AS n1),
       |${if (walk) walkPart else brutePart}""".stripMargin
  }

  private val walkBranchMemo = new graft.BoundedMemo[String, Boolean](KnnGraph.MemoCap)

  /** Scala-side replica of the append drills' branch predicate: does the
    * BUILD corpus (the old chain) put the artifact on the walk branch
    * (l1edges materialized)? The same value the engine reads as
    * n1_build/l1edges-existence; computed here so [[dynamicOracles]] can
    * emit only the taken arm's CTE chain.
    *
    * ONE-CORPUS-PER-PATH assumption: the branch is memoized per `dir`
    * for the session's lifetime, so regenerating the corpus at that
    * path at a DIFFERENT scale within one long-lived session can emit
    * the stale arm. The in-arm scalar guard keeps that a loud zero-row
    * red, never a silent wrong grade (r14 advice #4). */
  private[search] def buildWalkBranch(spark: SparkSession, dir: String): Boolean =
    walkBranchMemo.getOrElseUpdate(dir) {
      val oldEmb = KnnGraph.e(spark, dir)
        .filter(col("vec_id") % AppendMod =!= NewResidue)
      val nOld = oldEmb.count()
      val se1 = GraphServe.upperModulus(nOld)
      val n1b = oldEmb.filter(GraphServe.entryPick(col("vec_id"), se1)).count()
      n1b > GraphServe.L1BruteBar
    }

  /** The shared append replay: old chain (prefix `o`), insertion beams,
    * merged graph + one restricted descent round → `gapp`. Shared with
    * [[GraphAppendStream]]'s oracle (the one-shot arm). The insertion
    * beams enter through the persisted hierarchy ([[insertEntryCtes]];
    * `sprm.se` is the pinned build-time stride — in this drill the
    * build corpus IS the old chain, so it replays as
    * upperModulus(|old|)). */
  private[search] def appendCtes(walk: Boolean): String =
    s"""${KnnGraph.graphCtePrefixWhere(s"vec_id % $AppendMod <> $NewResidue", "o")},
       |fe AS MATERIALIZED (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |qn AS MATERIALIZED (SELECT id AS q, v AS qv FROM fe WHERE id % $AppendMod = $NewResidue),
       |ound AS MATERIALIZED (SELECT i, j FROM og${KnnGraph.Rounds}
       |  UNION SELECT j AS i, i AS j FROM og${KnnGraph.Rounds}),
       |sprm AS (SELECT ${GraphServe.upperModulusSql("SELECT n FROM oprm")} AS se),
       |m1a AS MATERIALIZED (SELECT id, v FROM oe
       |  WHERE ${GraphServe.entryPickSql("id", "SELECT se FROM sprm")}),
       |${insertEntryCtes("a", "m1a", "qn", "SELECT se FROM sprm",
          "SELECT count(*) FROM m1a", walk = walk)},
       |ib0 AS MATERIALIZED (SELECT q, j, sim FROM iba0),
       |${(1 to InsertRounds).map(insertCtes).mkString(",\n")},
       |newe AS MATERIALIZED (SELECT q AS i, j, sim FROM (
       |    SELECT q, j, sim, row_number() OVER (PARTITION BY q ORDER BY sim DESC, j) AS rn
       |    FROM ib$InsertRounds) WHERE rn <= $Degree),
       |mrg AS MATERIALIZED (SELECT i, j, sim FROM og${KnnGraph.Rounds} UNION ALL SELECT i, j, sim FROM newe),
       |nb AS (SELECT i AS mid FROM newe UNION SELECT j AS mid FROM newe),
       |mund AS MATERIALIZED (SELECT i, j FROM mrg UNION SELECT j AS i, i AS j FROM mrg),
       |mgm AS MATERIALIZED ${KnnGraph.gammaSql("mund")},
       |mcand AS (SELECT DISTINCT a.j AS i, b.j AS j FROM mgm a
       |  JOIN nb ON nb.mid = a.i
       |  JOIN mgm b ON b.i = a.i
       |  WHERE a.j <> b.j),
       |msc AS (SELECT p.i, p.j, round(list_cosine_similarity(a.v, b.v), 6) AS sim
       |  FROM mcand p JOIN fe a ON a.id = p.i JOIN fe b ON b.id = p.j),
       |mpool AS (SELECT i, j, sim FROM msc UNION SELECT i, j, sim FROM mrg),
       |gapp AS MATERIALIZED (SELECT i, j, sim FROM (
       |    SELECT i, j, sim, row_number() OVER (PARTITION BY i ORDER BY sim DESC, j) AS rn
       |    FROM mpool) WHERE rn <= $Degree)""".stripMargin

  private def phaseRow(ord: Int, name: String, g: String, exact: String,
                       nev: String): String =
    s"""SELECT $ord AS phase_ord, '$name' AS phase,
       |  (SELECT count(*) FROM $g) AS n_edges,
       |  (SELECT n_eval FROM $nev) AS n_eval,
       |  round(CAST((SELECT count(*) FROM $g JOIN $exact USING (i, j)) AS DOUBLE)
       |        / ((SELECT n_eval FROM $nev) * $K), 6) AS recall,
       |  round(CAST((SELECT count(*) FROM $g a
       |              WHERE EXISTS (SELECT 1 FROM $g b WHERE b.i = a.j AND b.j = a.i)) AS DOUBLE)
       |        / (SELECT count(*) FROM $g), 6) AS recip_share""".stripMargin

  /** q_graph_append is a DYNAMIC oracle since r14: the generator
    * computes the drill's walk/brute branch from the corpus (the same
    * deterministic predicate the engine evaluates) so [[appendCtes]]
    * emits only the taken arm's CTE chain — see [[insertEntryCtes]]. */
  override def dynamicOracles(spark: SparkSession,
                              dir: String): Map[String, String] = Map(
    "q_graph_append" ->
      s"""WITH ${KnnGraph.graphCtePrefix},
         |${appendCtes(buildWalkBranch(spark, dir))},
         |evm AS (SELECT CASE WHEN m % $AppendMod = 0 THEN m + 1 ELSE m END AS m FROM prm),
         |ev AS MATERIALIZED (SELECT id, v FROM e WHERE id % (SELECT m FROM evm) = 0),
         |nev AS (SELECT count(*) AS n_eval FROM ev),
         |oev AS (SELECT id, v FROM ev WHERE id % $AppendMod <> $NewResidue),
         |noev AS (SELECT count(*) AS n_eval FROM oev),
         |exactf AS MATERIALIZED ${KnnGraph.exactTopKSql("ev", "id", "v", "e", "i", "j", K)},
         |exacto AS MATERIALIZED ${KnnGraph.exactTopKSql("oev", "id", "v", "oe", "i", "j", K)}
         |${phaseRow(0, "half_build", s"og${KnnGraph.Rounds}", "exacto", "noev")}
         |UNION ALL
         |${phaseRow(1, "appended", "gapp", "exactf", "nev")}
         |UNION ALL
         |${phaseRow(2, "full_rebuild", s"g${KnnGraph.Rounds}", "exactf", "nev")}
         |ORDER BY phase_ord""".stripMargin)

  override def oracles: Map[String, String] = Map(
    "q_graph_stats" ->
      s"""WITH ${KnnGraph.graphCtePrefix},
         |g AS MATERIALIZED (SELECT i, j FROM g${KnnGraph.Rounds}),
         |deg AS (SELECT i, count(*) AS d FROM g GROUP BY i),
         |ds AS (SELECT count(*) AS n_indexed, min(d) AS min_degree,
         |    max(d) AS max_degree, sum(d) AS n_edges FROM deg),
         |rc AS (SELECT count(*) AS n_recip FROM g a
         |  WHERE EXISTS (SELECT 1 FROM g b WHERE b.i = a.j AND b.j = a.i)),
         |sprm AS (SELECT ${GraphServe.upperModulusSql("SELECT n FROM prm")} AS se),
         |l1 AS (SELECT count(*) AS n1 FROM e
         |  WHERE ${GraphServe.entryPickSql("id", "SELECT se FROM sprm")})
         |SELECT (SELECT n FROM prm) AS n_vectors,
         |  CAST(ds.n_indexed AS BIGINT) AS n_indexed,
         |  (SELECT n FROM prm) - ds.n_indexed AS isolated_nodes,
         |  CAST(ds.n_edges AS BIGINT) AS n_edges,
         |  CAST(ds.min_degree AS BIGINT) AS min_degree,
         |  CAST(ds.max_degree AS BIGINT) AS max_degree,
         |  round(CAST(ds.n_edges AS DOUBLE) / ds.n_indexed, 6) AS avg_degree,
         |  round(CAST(rc.n_recip AS DOUBLE) / ds.n_edges, 6) AS reciprocal_share,
         |  l1.n1 AS n_l1,
         |  CASE WHEN l1.n1 > ${GraphServe.L1BruteBar} THEN 1 ELSE 0 END AS layer_walk,
         |  CASE WHEN l1.n1 > ${GraphServe.L1BruteBar}
         |       THEN l1.n1 * least(${GraphServe.L1Degree}, l1.n1 - 1)
         |       ELSE 0 END AS n_l1_edges
         |FROM ds, rc, l1""".stripMargin)
}
