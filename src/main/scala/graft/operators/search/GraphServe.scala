package graft.operators.search

import graft.QueryModule
import graft.functions.VectorOps._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-based ANN SERVE: bounded-round distributed beam search over the
  * [[KnnGraph]] NN-descent graph — the query half of the HNSW-class index
  * family the thesis's vector DB ships (Azure AI Search answers vector
  * queries by walking exactly such a neighbor graph). A faithful greedy
  * walk is pointer-chasing with a data-dependent step count — no Spark
  * shape — but a FIXED-ROUND beam search is: every round is one equi-join
  * of the beam frame with the graph's undirected adjacency (shuffle on
  * the node id) plus a bounded [[graft.plans.TopKPerGroup]] heap per
  * query, so serving Q queries costs O(rounds · Q · beam · degree)
  * scorings regardless of corpus size — the index bounds the work, which
  * is the entire point of building one.
  *
  * Determinism: entry points and the query sample are arithmetic id
  * filters (no data-dependent choice), similarities are rounded to 6 with
  * ties broken by node id, and the graph itself is the deterministic
  * descent replay — so the whole serve (graph build + beam rounds +
  * recall grading) replays hash-exact in DuckDB from the SAME graph CTE
  * chain ([[KnnGraph.graphCtePrefix]]) the build oracle uses.
  *
  * Recall contract: the query point is excluded from every beam (node ≠
  * q, matching the q ≠ node exact truth — see [[scored]]); with beam ≥ k
  * and the shared (sim DESC, node) order, an exact top-k member that
  * enters a query's beam can never be evicted (at most k−1 candidates
  * order before it), so per-round recall@k is monotone non-decreasing —
  * spec-asserted. The same argument across
  * WIDTHS (a wider beam's candidate pool is a superset round by round)
  * makes recall monotone in the beam width, which is what
  * [[qBeamSweep]] measures: the ef/beam tuning curve of an HNSW-class
  * index, the serve-side sibling of the nprobe sweep (q_nprobe_sweep).
  */
object GraphServe extends QueryModule {

  /** Graded result depth per query. */
  val K = 10

  /** Default beam width per query (≥ K for the monotone-recall
    * contract) — HNSW's efSearch, sized WITH the degree: on this
    * structureless corpus (see [[KnnGraph.Degree]]) beam 20 over the
    * degree-20 graph graded ~0.85; 40 grades ≥ 0.95 at the gate scales
    * and ≥ 0.92 at sf0.1 — the ef ≈ 2·M operating point HNSW ships. */
  val Beam = 40

  /** Swept beam widths — the serve-side recall/latency tuning knob
    * (q_beam_sweep's ef curve; the default sits at the top arm). */
  val SweepBeams = Seq(10, 20, 40)

  /** Beam-expansion rounds after entry-point scoring (round 0 = entries). */
  val Rounds = 3

  /** Legacy fixed entry-point count; still the PRE-FILTER arm's matching
    * entry budget ([[FilteredGraphServe]]). The serve itself enters
    * through the √n upper layer ([[upperModulus]]) instead. */
  val Entries = 8

  /** The COARSE UPPER LAYER — the "H" of HNSW, Spark-shaped: entry
    * points are the ~√n ids ≡ 0 (mod upperModulus(n)), and round 0
    * scores each query against ALL of them, so the top-beam prefix that
    * seeds the walk is already query-local (the IVF-centroid trick
    * applied to the graph; HNSW's upper layers serve exactly this
    * role). Cost: √n scorings per query in round 0 — the two-layer
    * operating point; at 10^11 nodes add a third layer by beam-walking
    * the upper layer's own subgraph instead of brute-forcing it, the
    * same recursion HNSW applies. Stride entries (8 fixed ids) capped
    * serve recall at 0.754 at sf0.001; the upper layer is what lifts
    * entry distance from O(n) to O(√n)-bounded. */
  def upperModulus(n: Long): Long =
    math.max(1L, math.ceil(n / math.ceil(math.sqrt(n.toDouble))).toLong)

  /** DuckDB replay of [[upperModulus]] over a scalar subquery `nSql`
    * (same double arithmetic: bigint/ceil(sqrt) division, then ceil). */
  private[search] def upperModulusSql(nSql: String): String =
    s"greatest(1, CAST(ceil(($nSql) / ceil(sqrt(($nSql)))) AS BIGINT))"

  /** Hole-proof upper-layer membership: the engine-exact multiplicative
    * id hash ([[graft.operators.sampling.SamplingQueries.prio]]) modulo
    * the √n stride, instead of a raw `id % se` stride. A raw stride
    * assumes a DENSE id space and annihilates when the stride shares a
    * factor with an arithmetic survivor split — se=21 over a %7-deleted
    * corpus leaves ZERO entries and every insertion beam comes back
    * empty (caught by GraphIndexLifecycleSpec's upsert law). The hash
    * scrambles residue classes, so ~n/se entries survive ANY id space:
    * delete-split survivors, sparse ScaleCorpus ids, production hash
    * ids. Pure map-side filter (no global sort) and exact BIGINT
    * arithmetic in both engines. */
  private[search] def entryPick(id: Column, se: Long): Column =
    graft.operators.sampling.SamplingQueries.prio(id) % lit(se) === 0

  /** The same predicate in DuckDB SQL (sign-normalized like pmod). */
  private[search] def entryPickSql(idSql: String, seSql: String): String = {
    val m = graft.operators.sampling.SamplingQueries.SplitMod
    val c = graft.operators.sampling.SamplingQueries.Mult
    s"((((($idSql % $m) + $m) % $m) * $c) % $m) % ($seSql) = 0"
  }

  /** Query-sample size target: ids ≡ mq−1 (mod mq), mq = max(2, ceil(n/target)). */
  val QueryTarget = 1000L

  /** Serves are memoized per (corpus dir, beam width) — the [[KnnGraph]]
    * memo rationale: the beams feed several lazy consumers (per-round
    * grading, the sweep, the spec's monotonicity checks) and a rolling
    * per-site cache would let a second build unpersist frames the first
    * build's consumers still hold, recomputing the whole graph+beam DAG. */
  private val servedMemo = new graft.BoundedMemo[
    (String, Int), (Seq[DataFrame], DataFrame, Long)](KnnGraph.MemoCap)

  /** Query sample and exact truth depend only on the corpus — shared by
    * every beam width and both grading queries. */
  private val qsMemo = new graft.BoundedMemo[String, DataFrame](KnnGraph.MemoCap)
  private val exactMemo = new graft.BoundedMemo[String, DataFrame](KnnGraph.MemoCap)

  /** Deterministic query sample: ids ≡ mq−1 (mod mq), pinned once per dir. */
  private[search] def qsFor(spark: SparkSession, dir: String): DataFrame =
    qsMemo.getOrElseUpdate(dir) {
      val emb = KnnGraph.e(spark, dir)
      val mq = math.max(2L, math.ceil(emb.count() / QueryTarget.toDouble).toLong)
      emb.filter(col("vec_id") % mq === mq - 1)
        .select(col("vec_id").as("q"), col("embedding").as("qv"))
        .localCheckpoint(true)
    }

  /** Exact top-K of the query sample — the one guarded sample×n quadratic
    * (bounded by [[QueryTarget]]), pinned once per dir and shared by the
    * round curve and the width sweep. */
  private[search] def exactFor(spark: SparkSession, dir: String): DataFrame =
    exactMemo.getOrElseUpdate(dir) {
      val emb = KnnGraph.e(spark, dir)
      val exactPairs = emb
        .select(col("vec_id").as("node"), col("embedding").as("nv"))
        .crossJoin(broadcast(qsFor(spark, dir)))
        .filter(col("q") =!= col("node"))
        .select(col("q"), col("node"),
          round(cosine_sim(col("qv"), col("nv")), 6).as("sim"))
      topPer(exactPairs, K).select(col("q"), col("node")).localCheckpoint(true)
    }

  /** Score (q, node) pairs: rounded cosine between the query's vector and
    * the node's — node side fetched by equi-join, query side broadcast
    * (the sample is bounded by [[QueryTarget]]). The query point itself is
    * EXCLUDED (node ≠ q): the query vectors come from the corpus, so
    * without the filter q-self enters every beam at sim 1.0, permanently
    * occupies rank 1 of the graded top-10 (recall ceiling 0.9 against the
    * q≠node exact truth), and breaks round-monotone recall the round
    * q-self is discovered. Filtering here covers b0 and every round's
    * pool by induction (pools are scored ∪ previous beam). */
  private[search] def scored(pairs: DataFrame, emb: DataFrame, qs: DataFrame): DataFrame =
    pairs.filter(col("node") =!= col("q"))
      .join(emb.select(col("vec_id").as("node"), col("embedding").as("nv")), Seq("node"))
      .join(broadcast(qs), Seq("q"))
      .select(col("q"), col("node"),
        round(cosine_sim(col("qv"), col("nv")), 6).as("sim"))

  private def topPer(df: DataFrame, k: Int): DataFrame =
    graft.plans.TopKPerGroup(
      df.withColumn("neg_sim", -col("sim")), Seq("q"), Seq("neg_sim", "node"), k)
      .select(col("q"), col("node"), col("sim"))

  /** Per-round beam frames b0..b`Rounds` for the deterministic query
    * sample, served from the final descent graph (memoized per
    * (dir, beam)). */
  def beamRounds(spark: SparkSession, dir: String,
                 beam: Int = Beam): (Seq[DataFrame], DataFrame, Long) =
    servedMemo.getOrElseUpdate((dir, beam))(buildBeams(spark, dir, pin = true, beam))

  /** The un-memoized build. `pin = true` persists AND materializes every
    * shared frame (the memoized path); `pin = false` leaves the frames
    * lazy — the determinism spec's fresh-replay bypass, which must not
    * stack a second set of cached copies next to the memo's. */
  private[search] def buildBeams(spark: SparkSession, dir: String,
                                 pin: Boolean, beam: Int = Beam): (Seq[DataFrame], DataFrame, Long) = {
    // localCheckpoint for the [[KnnGraph.nnDescentRounds]] reason: beam
    // round r references round r-1 twice, so plan size (and the driver's
    // per-action canonicalization walk) doubles per round unless each
    // round truncates to a LogicalRDD leaf.
    def pinned(df: DataFrame): DataFrame =
      if (!pin) df else df.localCheckpoint(true)
    val emb = KnnGraph.e(spark, dir)
    val n = emb.count()
    // the artifact-backed final graph ([[GraphIndex.finalGraph]]): same
    // rows as the in-session descent build, but a warm artifact turns a
    // cold serve into a bucketed scan — the build cost is paid at write
    // time (r9 verdict item 8)
    val g = GraphIndex.finalGraph(spark, dir)
    val und = pinned(GraphIndex.und(g))
    val qs = qsFor(spark, dir)
    val se = upperModulus(n)
    // constant-key equi-join (not a cross join): the upper layer is
    // √n-sized (a few MB of ids even at 10^11 nodes), so this is a
    // broadcast hash join, never a BNLJ
    val entryPairs = qs.select(col("q")).withColumn("one", lit(1))
      .join(broadcast(
        emb.filter(entryPick(col("vec_id"), se))
          .select(col("vec_id").as("node")).withColumn("one", lit(1))), Seq("one"))
      .select(col("q"), col("node"))
    val b0 = pinned(topPer(scored(entryPairs, emb, qs), beam))
    val beams = (1 to Rounds).scanLeft(b0) { (b, _) =>
      val cand = b.select(col("q"), col("node"))
        .join(und.withColumnRenamed("i", "node"), Seq("node"))
        .select(col("q"), col("j").as("node")).distinct()
      val pool = scored(cand, emb, qs).unionByName(b).dropDuplicates("q", "node")
      pinned(topPer(pool, beam))
    }
    (beams, qs, n)
  }

  /** Recall row for one served frame: (label, n_beam, n_eval, recall@K). */
  private def recallRowDf(b: DataFrame, exact: DataFrame, nEval: Long,
                          labelName: String, label: Int): DataFrame = {
    val size = b.agg(count(lit(1)).as("n_beam"))
    val hits = topPer(b, K).join(exact, Seq("q", "node"), "left_semi")
      .agg(count(lit(1)).as("n_hits"))
    size.crossJoin(broadcast(hits)).select(
      lit(label).as(labelName), col("n_beam"), lit(nEval).as("n_eval"),
      round(col("n_hits").cast("double") / lit(nEval * K), 6).as("recall"))
  }

  /** Per-round serve quality at the default beam: beam size and recall@10
    * of each round's top-10 vs the exact top-10 of the query sample. */
  def qGraphServe(spark: SparkSession, dir: String): DataFrame = {
    val (beams, qs, _) = beamRounds(spark, dir)
    val exact = exactFor(spark, dir)
    val nEval = qs.count()
    beams.zipWithIndex.map { case (b, r) =>
      recallRowDf(b, exact, nEval, "round", r)
    }.reduce(_.unionByName(_)).orderBy("round")
  }

  /** The ef/beam tuning curve: final-round recall@10 per swept beam
    * width over the SAME graph, entries, and query sample — the
    * serve-side sibling of q_nprobe_sweep's probe curve. Monotone in the
    * width (wider beams keep superset pools round by round). */
  def qBeamSweep(spark: SparkSession, dir: String): DataFrame = {
    val exact = exactFor(spark, dir)
    val nEval = qsFor(spark, dir).count()
    SweepBeams.map { w =>
      val (beams, _, _) = beamRounds(spark, dir, w)
      recallRowDf(beams.last, exact, nEval, "beam", w)
    }.reduce(_.unionByName(_)).orderBy("beam")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_graph_serve" -> (qGraphServe _),
    "q_beam_sweep" -> (qBeamSweep _))

  /** Shared oracle prelude: descent graph, undirected adjacency, query
    * sample, entry points, entry scores, exact truth. Shared with the
    * streaming serve ([[GraphServeStream]]) so batch and stream replay
    * from ONE definition. */
  private[search] def servePrelude: String =
    s"""${KnnGraph.graphCtePrefix},
       |und AS MATERIALIZED (SELECT i, j FROM g${KnnGraph.Rounds}
       |  UNION SELECT j AS i, i AS j FROM g${KnnGraph.Rounds}),
       |qprm AS MATERIALIZED (SELECT greatest(2, CAST(ceil((SELECT n FROM prm) / $QueryTarget.0) AS BIGINT)) AS mq,
       |    ${upperModulusSql("SELECT n FROM prm")} AS se),
       |qs AS MATERIALIZED (SELECT id AS q, v AS qv FROM e
       |  WHERE id % (SELECT mq FROM qprm) = (SELECT mq FROM qprm) - 1),
       |nev AS (SELECT count(*) AS n_eval FROM qs),
       |ent AS (SELECT id AS node FROM e WHERE ${entryPickSql("id", "SELECT se FROM qprm")}),
       |es AS (SELECT qs.q, ent.node, round(list_cosine_similarity(qs.qv, e.v), 6) AS sim
       |  FROM qs CROSS JOIN ent JOIN e ON e.id = ent.node WHERE ent.node <> qs.q),
       |exact AS MATERIALIZED ${KnnGraph.exactTopKSql("qs", "q", "qv", "e", "q", "node", K)}""".stripMargin

  /** b0 for one beam width: top-`beam` of the entry scores. */
  private[search] def b0Cte(beam: Int, sfx: String): String =
    s"""b${sfx}0 AS MATERIALIZED (SELECT q, node, sim FROM (
       |    SELECT q, node, sim, row_number() OVER (PARTITION BY q ORDER BY sim DESC, node) AS rn
       |    FROM es) WHERE rn <= $beam)""".stripMargin

  /** One serve round as CTEs: beam ∪ scored graph-neighbors → top-beam. */
  private[search] def serveCtes(r: Int, beam: Int, sfx: String): String = {
    val prev = s"b$sfx${r - 1}"
    s"""bc$sfx$r AS (SELECT DISTINCT p.q, u.j AS node FROM $prev p
       |  JOIN und u ON u.i = p.node),
       |bs$sfx$r AS (SELECT p.q, p.node, round(list_cosine_similarity(qs.qv, e.v), 6) AS sim
       |  FROM bc$sfx$r p JOIN e ON e.id = p.node JOIN qs ON qs.q = p.q
       |  WHERE p.node <> p.q),
       |bp$sfx$r AS (SELECT q, node, sim FROM bs$sfx$r UNION SELECT q, node, sim FROM $prev),
       |b$sfx$r AS MATERIALIZED (SELECT q, node, sim FROM (
       |    SELECT q, node, sim, row_number() OVER (PARTITION BY q ORDER BY sim DESC, node) AS rn
       |    FROM bp$sfx$r) WHERE rn <= $beam)""".stripMargin
  }

  /** Recall row over a named final beam frame. */
  private def recallSql(b: String, labelName: String, label: Int): String =
    s"""SELECT $label AS $labelName, (SELECT count(*) FROM $b) AS n_beam,
       |  (SELECT n_eval FROM nev) AS n_eval,
       |  round(CAST((SELECT count(*) FROM (
       |      SELECT q, node FROM (
       |        SELECT q, node, row_number() OVER (PARTITION BY q ORDER BY sim DESC, node) AS rn
       |        FROM $b) WHERE rn <= $K) t JOIN exact USING (q, node)) AS DOUBLE)
       |        / ((SELECT n_eval FROM nev) * $K), 6) AS recall""".stripMargin

  override def oracles: Map[String, String] = Map(
    "q_graph_serve" ->
      s"""WITH $servePrelude,
         |${b0Cte(Beam, "")},
         |${(1 to Rounds).map(serveCtes(_, Beam, "")).mkString(",\n")}
         |${(0 to Rounds).map(r => recallSql(s"b$r", "round", r)).mkString("\nUNION ALL\n")}
         |ORDER BY round""".stripMargin,
    "q_beam_sweep" ->
      s"""WITH $servePrelude,
         |${SweepBeams.map(w =>
             (b0Cte(w, s"w${w}_") +: (1 to Rounds).map(serveCtes(_, w, s"w${w}_")))
               .mkString(",\n")).mkString(",\n")}
         |${SweepBeams.map(w => recallSql(s"bw${w}_$Rounds", "beam", w)).mkString("\nUNION ALL\n")}
         |ORDER BY beam""".stripMargin)
}
