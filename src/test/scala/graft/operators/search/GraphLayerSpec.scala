package graft.operators.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws of the v8 persisted entry hierarchy (meta-pinned strides,
  * `l1nodes` member dataset, `l1edges` navigation subgraph) and of the
  * WALK-branch insert path it enables. The drill corpora sit below
  * [[GraphServe.L1BruteBar]] (brute branch, bit-exact the v7 entry), so
  * the walk branch is forced here through [[GraphIndex.materializeLayer]]
  * — the explicit maintenance API — on a second artifact built from the
  * SAME inputs, and the two appends are compared. */
class GraphLayerSpec extends SparkSpec {

  private lazy val emb = graft.Tables.embeddings(spark, SfDir)
    .select(col("vec_id"), col("embedding"))
  private lazy val oldEmb =
    emb.filter(col("vec_id") % GraphIndex.AppendMod =!= GraphIndex.NewResidue)
  private lazy val newEmb =
    emb.filter(col("vec_id") % GraphIndex.AppendMod === GraphIndex.NewResidue)
  private lazy val gOld = KnnGraph.nnDescentRounds(oldEmb,
    s"$SfDir#old${GraphIndex.AppendMod}${GraphIndex.NewResidue}",
    GraphIndex.Degree, KnnGraph.Rounds).last

  /** Brute-branch artifact (never materialized) and walk-branch artifact
    * (layer materialized before the append) — same build inputs. */
  private lazy val (idxBrute, idxWalk) = {
    val a = java.nio.file.Files.createTempDirectory("graft_layer_brute").toString
    val b = java.nio.file.Files.createTempDirectory("graft_layer_walk").toString
    GraphIndex.build(spark, a, gOld, oldEmb)
    GraphIndex.build(spark, b, gOld, oldEmb)
    GraphIndex.materializeLayer(spark, b)
    GraphIndex.append(spark, a, oldEmb, newEmb)
    GraphIndex.append(spark, b, oldEmb, newEmb)
    (a, b)
  }

  private def meta(idx: String) = spark.read.parquet(s"$idx/meta").head()

  private def edgeSet(idx: String): Set[(Long, Long)] =
    GraphIndex.edges(spark, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("meta pins the hierarchy: se1 from the build corpus, se2 nested, n1_build = the member count") {
    val m = meta(idxBrute)
    val nOld = oldEmb.count()
    val se1 = m.getAs[Long]("layer_se1")
    assert(se1 === GraphServe.upperModulus(nOld))
    val members = oldEmb.filter(GraphServe.entryPick(col("vec_id"), se1)).count()
    assert(m.getAs[Long]("n1_build") === members)
    assert(m.getAs[Long]("layer_se2") === se1 * GraphServe.upperModulus(members))
  }

  test("l1nodes tracks exactly the pinned-stride members through append") {
    val m = meta(idxBrute)
    val se1 = m.getAs[Long]("layer_se1")
    val expect = emb.filter(GraphServe.entryPick(col("vec_id"), se1))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val got = GraphIndex.layerNodes(spark, idxBrute)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got === expect,
      "l1nodes diverged from {id in corpus : prio(id) % se1 == 0} after append")
    assert(expect.nonEmpty, "degenerate test: no layer members at all")
  }

  test("the brute-branch artifact has no l1edges; the materialized one persists exact member out-edges") {
    assert(GraphIndex.layerEdges(spark, idxBrute).isEmpty,
      "below-bar build materialized a layer subgraph")
    val le = GraphIndex.layerEdges(spark, idxWalk).get.collect()
    assert(le.nonEmpty)
    assert(le.forall(r => r.getLong(0) != r.getLong(1)), "self-loop layer edge")
    val se1 = meta(idxWalk).getAs[Long]("layer_se1")
    val memberIds = emb.filter(GraphServe.entryPick(col("vec_id"), se1))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(le.forall(r => memberIds(r.getLong(0)) && memberIds(r.getLong(1))),
      "a layer edge touches a non-member")
    val deg = le.groupBy(_.getLong(0)).map(_._2.length)
    assert(deg.max <= GraphServe.L1Degree)
    // every CURRENT member is a source: the materialize pass covered the
    // build members and the append added the batch members' out-edges
    assert(le.map(_.getLong(0)).toSet === memberIds,
      "a member has no layer out-edges after the walk-branch append")
  }

  test("the walk-branch append stays in the brute-branch append's recall class") {
    val gB = edgeSet(idxBrute)
    val gW = edgeSet(idxWalk)
    // both are valid top-Degree graphs over the full corpus
    val n = emb.count()
    for ((g, name) <- Seq((gB, "brute"), (gW, "walk"))) {
      assert(g.map(_._1).size.toLong > 0)
      assert(g.forall { case (i, j) => i != j }, s"$name: self-loop")
      assert(g.groupBy(_._1).keySet.size.toLong === n, s"$name: node not indexed")
      assert(g.groupBy(_._1).map(_._2.size).max <= GraphIndex.Degree)
    }
    val m = KnnGraph.evalModulus(n, GraphIndex.AppendMod)
    val ev = emb.filter(col("vec_id") % m === 0)
      .select(col("vec_id").as("i"), col("embedding").as("emb_i"))
    val exact = GraphIndex.exactTopK(emb, ev).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(g: Set[(Long, Long)]): Double =
      g.count(exact).toDouble / exact.size
    val (rB, rW) = (recall(gB), recall(gW))
    assert(rW >= rB - 0.05,
      s"walk-branch append recall $rW trails brute-branch $rB — the descent is not finding the entry region")
  }

  test("a replayed walk-branch append converges: meta, l1nodes, and l1edges all unchanged") {
    edgeSet(idxWalk) // force the shared fixture
    val mBefore = meta(idxWalk)
    val nodesBefore = GraphIndex.layerNodes(spark, idxWalk)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    val edgesBefore = GraphIndex.layerEdges(spark, idxWalk).get.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    GraphIndex.append(spark, idxWalk, oldEmb, newEmb) // the replay
    assert(meta(idxWalk).getAs[Long]("n") === mBefore.getAs[Long]("n"))
    assert(meta(idxWalk).getAs[String]("fp_acc") === mBefore.getAs[String]("fp_acc"))
    val nodesAfter = GraphIndex.layerNodes(spark, idxWalk)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(nodesAfter === nodesBefore, "replay drifted l1nodes")
    val edgesAfter = GraphIndex.layerEdges(spark, idxWalk).get.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(edgesAfter === edgesBefore, "replay drifted l1edges")
  }

  test("an in-place rebuild below the bar clears a stale walk-branch l1edges") {
    // the r13 review: a corpus regenerated/shrunk under the SAME
    // artifact path must not leave the old build's subgraph behind —
    // the engine would walk stale member ids while the oracle's
    // build-count predicate takes brute
    val idx = java.nio.file.Files.createTempDirectory("graft_layer_rebuild").toString
    val g = GraphIndex.finalGraph(spark, SfDir)
    GraphIndex.build(spark, idx, g, emb)
    GraphIndex.materializeLayer(spark, idx)
    assert(GraphIndex.layerEdges(spark, idx).isDefined)
    GraphIndex.build(spark, idx, gOld, oldEmb) // in-place rebuild, below bar
    assert(GraphIndex.layerEdges(spark, idx).isEmpty,
      "stale l1edges survived an in-place below-bar rebuild")
  }

  test("a layer drained to zero members stays readable and appendable") {
    // empty datasets write no parquet files; the schema-pinned reads
    // must return the empty frame instead of failing inference (the
    // r13 review — v7 tolerated an empty entry set, v8 must too)
    val idx = java.nio.file.Files.createTempDirectory("graft_layer_drain").toString
    val g = GraphIndex.finalGraph(spark, SfDir)
    GraphIndex.build(spark, idx, g, emb)
    GraphIndex.materializeLayer(spark, idx)
    val se1 = meta(idx).getAs[Long]("layer_se1")
    val memberIds = emb.filter(GraphServe.entryPick(col("vec_id"), se1))
      .select(col("vec_id"))
    val surv = emb.join(memberIds, Seq("vec_id"), "left_anti")
    GraphIndex.delete(spark, idx, memberIds, surv) // every member gone
    assert(GraphIndex.layerNodes(spark, idx).count() === 0L,
      "drained l1nodes should read as empty, not throw")
    assert(GraphIndex.layerEdges(spark, idx).get.count() === 0L,
      "drained l1edges should read as empty, not throw")
    // a subsequent append still commits (empty entry set -> empty
    // insertion beams -> graceful degradation, the v7 contract)
    val batch = memberIds.limit(3)
      .join(emb, Seq("vec_id")).select(col("vec_id"), col("embedding"))
    GraphIndex.append(spark, idx, surv, batch)
    assert(GraphIndex.layerNodes(spark, idx).count() > 0L,
      "re-appended members did not re-enter l1nodes")
  }

  test("upsert on a materialized artifact keeps the layer coherent, and optimize heals stale member lists") {
    val idx = java.nio.file.Files.createTempDirectory("graft_layer_upsert").toString
    val g = GraphIndex.finalGraph(spark, SfDir)
    GraphIndex.build(spark, idx, g, emb)
    GraphIndex.materializeLayer(spark, idx)
    val UpMod = 4
    val batch = emb.filter(col("vec_id") % UpMod === 1)
    val surv = emb.filter(col("vec_id") % UpMod =!= 1)
    GraphIndex.upsert(spark, idx, surv, batch)
    val se1 = meta(idx).getAs[Long]("layer_se1")
    val memberIds = emb.filter(GraphServe.entryPick(col("vec_id"), se1))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val nodeIds = GraphIndex.layerNodes(spark, idx)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(nodeIds === memberIds, "l1nodes diverged across upsert")
    val le = GraphIndex.layerEdges(spark, idx).get.collect()
    assert(le.forall(r => memberIds(r.getLong(0)) && memberIds(r.getLong(1))),
      "a layer edge survived outside the member set")
    assert(le.map(_.getLong(0)).toSet === memberIds,
      "a member lost all layer out-edges across upsert")
    // optimize = the maintenance pass: afterwards the layer equals the
    // EXACT subgraph over current members (stale lists healed)
    GraphIndex.optimize(spark, idx, emb, rounds = 1)
    val healed = GraphIndex.layerEdges(spark, idx).get.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val m1 = emb.filter(GraphServe.entryPick(col("vec_id"), se1))
    val exact = GraphServe.l1OutEdges(m1, m1, m1.count(), KnnGraph.dimOf(m1)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(healed === exact,
      "optimize did not restore the exact member subgraph")
  }

  test("a crash inside the l1edges bucket swap heals on the replayed append") {
    edgeSet(idxWalk) // force the shared fixture (build + append done)
    val before = GraphIndex.layerEdges(spark, idxWalk).get.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // simulate the swapDataset crash window: a bucket renamed aside
    // (live missing, parked in the trash dir) before the fresh rename
    val root = new java.io.File(s"$idxWalk/l1edges")
    val bucket = root.listFiles().filter(_.getName.startsWith("bucket=")).head
    val trash = new java.io.File(s"$idxWalk/l1edges_app_old")
    assert(trash.mkdirs() || trash.isDirectory)
    val parked = new java.io.File(trash, bucket.getName)
    assert(bucket.renameTo(parked), "test setup: parking the bucket failed")
    // the crash-retry contract: replay the SAME batch; swapDataset's
    // recovery restores the parked bucket before the new swap runs
    GraphIndex.append(spark, idxWalk, oldEmb, newEmb)
    val after = GraphIndex.layerEdges(spark, idxWalk).get.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(after === before, "replayed append did not heal the parked bucket")
    assert(!trash.exists(), "swap trash dir not cleaned after recovery")
  }

  test("layer-share tracks corpus-share: the corpus-share monitor dominates layer staleness") {
    // The dominance law (r13 verdict #2): layer membership is a pinned
    // hash stride over ids, so appended rows enter the layer at the SAME
    // rate the corpus grows — the staleness population the ShareBar
    // monitor doesn't directly see (appended members whose neighbors'
    // lists were never re-ranked) tracks the corpus share it DOES see,
    // within binomial concentration. Hence by the time layer staleness
    // could accumulate past the bar, the corpus-share trigger has fired.
    // The tight large-n measurement is the sfwalk decay drill
    // (tools/ProfileLayerDecay; curve recorded in SURVEY §5).
    val memberIds = GraphIndex.layerNodes(spark, idxWalk)
      .select(col("id")).collect().map(_.getLong(0))
    val n1 = memberIds.length.toDouble
    assert(n1 > 0)
    val layerShare = memberIds.count(
      _ % GraphIndex.AppendMod == GraphIndex.NewResidue) / n1
    val nAll = emb.count().toDouble
    val corpusShare = newEmb.count().toDouble / nAll
    val delta = 4.0 * math.sqrt(corpusShare * (1 - corpusShare) / n1) + 1.0 / n1
    assert(math.abs(layerShare - corpusShare) <= delta,
      s"layer share $layerShare drifted from corpus share $corpusShare " +
        s"beyond the 4-sigma binomial envelope ($delta) over $n1 members")
    // and the monitor's decision matches on both sides of the bar: the
    // fixture's 20% growth fires; the quiet (zero-append) case must not
    assert(GraphDriftOptimize.decide(newEmb.count(), nAll.toLong)._2,
      "the corpus-share monitor did not fire at 20% growth")
    assert(!GraphDriftOptimize.decide(0L, nAll.toLong)._2,
      "the quiet case fired")
  }

  test("l1OutEdges tiers are row-identical: sliced-broadcast (forced) equals one-broadcast") {
    // the scoreSliced discipline applied to the layer kernel (r13
    // verdict #3): past the broadcast budget the member frame is
    // hash-sliced into budget-sized broadcasts; same all-pairs, same
    // deterministic top-K → ROWS identical, tier choice plan-only
    val m1 = emb.select(col("vec_id"), col("embedding")).localCheckpoint(true)
    val n1 = m1.count()
    val dim = KnnGraph.dimOf(m1)
    val bytes = n1 * (4L * dim + 48L)
    val one = GraphServe.l1OutEdges(m1, m1, n1, dim) // fits the real budget
    assert(!one.queryExecution.executedPlan.toString.contains("Union"),
      "small member frame should take the single-broadcast tier")
    val forcedBudget = math.max(1L, bytes / 3) // => 4 hash slices
    val sliced = GraphServe.l1OutEdges(m1, m1, n1, dim, budget = forcedBudget)
    val plan = sliced.queryExecution.executedPlan.toString
    assert(plan.contains("Union"), "forced budget did not take the sliced tier")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val a = rows(one)
    assert(a.nonEmpty)
    assert(rows(sliced) === a, "sliced tier diverged from the broadcast tier")
  }

  test("slice-cap guard is loud and the broadcast estimate follows the schema's element width") {
    // r14 verdict #5: needing >L1MaxSlices slices must warn, naming the
    // honest fallback tier — never silently cap
    val budget = GraphServe.L1BroadcastBytes
    assert(GraphServe.sliceCapWarning(10L * budget, budget).isEmpty,
      "within-envelope sizes must not warn")
    val msg = GraphServe.sliceCapWarning(65L * budget, budget)
    assert(msg.exists(_.contains("NN-descent")),
      s"over-cap warning missing or does not name the fallback: $msg")
    // r14 advice #2: a double-typed member frame is budgeted at 8
    // bytes/element — the same (n, dim) flips to the sliced tier at a
    // budget where the float frame stays single-broadcast
    val m1 = emb.select(col("vec_id"), col("embedding")).localCheckpoint(true)
    val n1 = m1.count()
    val dim = KnnGraph.dimOf(m1)
    val between = n1 * (6L * dim + 48L) // float est < between < double est
    val f = GraphServe.l1OutEdges(m1, m1, n1, dim, budget = between)
    assert(!f.queryExecution.executedPlan.toString.contains("Union"),
      "float frame under budget should take the single-broadcast tier")
    val m1d = m1.withColumn("embedding", col("embedding").cast("array<double>"))
    val d = GraphServe.l1OutEdges(m1d, m1d, n1, dim, budget = between)
    assert(d.queryExecution.executedPlan.toString.contains("Union"),
      "double frame over budget must take the sliced tier")
  }

  test("descent tier past the slice envelope: recall >= 0.9 vs the exact layer, sparse ids mapped back") {
    // r15 missing #2, closed: a SELF-build whose member frame needs more
    // than L1MaxSlices budget-slices now hands off to NN-descent over
    // the members instead of warning + over-budget slices. The tier is
    // APPROXIMATE by contract — graded against the exact layer, not
    // asserted row-identical like the two exact tiers.
    // sparse member ids (every 7th vector) exercise the dense re-index
    val m1 = emb.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id"), col("embedding")).localCheckpoint(true)
    val n1 = m1.count()
    val dim = KnnGraph.dimOf(m1)
    val exact = GraphServe.l1OutEdges(m1, m1, n1, dim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // budget of 64 bytes → need ≫ 64 slices → descent tier (self-build)
    val approx = GraphServe.l1OutEdges(m1, m1, n1, dim, budget = 64L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty && approx.nonEmpty)
    // endpoints must be original sparse corpus ids, not dense indices
    val ids = m1.collect().map(_.getLong(0)).toSet
    assert(approx.forall { case (i, j) => ids(i) && ids(j) },
      "descent tier leaked dense re-index ids")
    val recall = (approx intersect exact).size.toDouble / exact.size
    assert(recall >= 0.9, f"descent-tier layer recall $recall%.3f < 0.9 " +
      s"(|exact|=${exact.size}, |approx|=${approx.size})")
    // determinism: a fresh build returns the same edge set
    val replay = GraphServe.l1OutEdges(m1, m1, n1, dim, budget = 64L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(replay == approx, "descent tier is not deterministic")
  }

  test("edges parity through the TRUE mid-swap crash window (l1edges bucket parked, edges pre-append)") {
    // The r13 advice scenario, reconstructed exactly: in append()'s swap
    // order, a crash inside the l1edges bucket swap leaves meta/nodes/
    // l1nodes committed, ONE l1edges bucket parked in _app_old, and the
    // base edges dataset still PRE-append. The replayed append must heal
    // the parked bucket BEFORE capturing the layer state (und1Old), or
    // it descends a layer missing that bucket's edges and can commit
    // base rows diverging from the clean-run/oracle chain. The parity
    // law: the healed artifact's edges AND layer equal the
    // uninterrupted run's, bit-exact (the replay is deterministic and,
    // with the hoisted recovery, sees identical inputs).
    val done = java.nio.file.Files.createTempDirectory("graft_crash_done").toString
    val crashed = java.nio.file.Files.createTempDirectory("graft_crash_mid").toString
    for (idx <- Seq(done, crashed)) {
      GraphIndex.build(spark, idx, gOld, oldEmb)
      GraphIndex.materializeLayer(spark, idx)
    }
    GraphIndex.append(spark, done, oldEmb, newEmb) // the crashed attempt, completed
    // splice the completed attempt's post-swap state into the crashed
    // artifact — everything append() commits BEFORE the edges swap
    val conf = spark.sessionState.newHadoopConf()
    import org.apache.hadoop.fs.{FileUtil, Path}
    val fs = new Path(done).getFileSystem(conf)
    for (ds <- Seq("meta", "nodes", "l1nodes", "l1edges")) {
      fs.delete(new Path(s"$crashed/$ds"), true)
      FileUtil.copy(fs, new Path(s"$done/$ds"), fs, new Path(s"$crashed/$ds"),
        false, conf)
    }
    // park the FULLEST l1edges bucket (the swap died between its two
    // renames) — an empty bucket would make the hole undetectable
    val buckets = fs.listStatus(new Path(s"$crashed/l1edges"))
      .map(_.getPath).filter(_.getName.startsWith("bucket="))
      .sortBy(p => -fs.getContentSummary(p).getLength)
    val trash = new Path(s"$crashed/l1edges_app_old")
    fs.mkdirs(trash)
    assert(fs.rename(buckets.head, new Path(trash, buckets.head.getName)),
      "test setup: parking the bucket failed")
    GraphIndex.append(spark, crashed, oldEmb, newEmb) // the checkpoint replay
    def full(idx: String) = GraphIndex.edges(spark, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(full(crashed) === full(done),
      "replayed append diverged from the clean run's base graph")
    def le(idx: String) = GraphIndex.layerEdges(spark, idx).get.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(le(crashed) === le(done),
      "layer subgraph diverged across the replay")
  }

  test("delete removes members and every layer edge touching them") {
    // fresh artifact: the walk fixture above stays pristine for the
    // other tests' laziness order
    val idx = java.nio.file.Files.createTempDirectory("graft_layer_del").toString
    val g = GraphIndex.finalGraph(spark, SfDir)
    GraphIndex.build(spark, idx, g, emb)
    GraphIndex.materializeLayer(spark, idx)
    val DelMod = 3
    val delIds = emb.filter(col("vec_id") % DelMod === 0).select(col("vec_id"))
    val surv = emb.filter(col("vec_id") % DelMod =!= 0)
    val deleted = delIds.collect().map(_.getLong(0)).toSet
    GraphIndex.delete(spark, idx, delIds, surv)
    val se1 = meta(idx).getAs[Long]("layer_se1")
    val expect = surv.filter(GraphServe.entryPick(col("vec_id"), se1))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val got = GraphIndex.layerNodes(spark, idx)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got === expect, "l1nodes not pruned to the survivor members")
    val le = GraphIndex.layerEdges(spark, idx).get.collect()
    assert(le.forall(r => !deleted(r.getLong(0)) && !deleted(r.getLong(1))),
      "a layer edge still touches a deleted member")
  }
}
