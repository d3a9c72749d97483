package graft.operators.search

import graft.QueryModule
import graft.functions.VectorOps._
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * descent replay — so the whole serve (graph build + 3 beam rounds +
  * recall grading) replays hash-exact in DuckDB from the SAME graph CTE
  * chain ([[KnnGraph.graphCtePrefix]]) the build oracle uses.
  *
  * Recall contract: with beam ≥ k and the shared (sim DESC, node) order,
  * an exact top-k member that enters a query's beam can never be evicted
  * (at most k−1 candidates order before it), so per-round recall@k is
  * monotone non-decreasing — spec-asserted, and the measured round curve
  * is the serving-latency/recall tradeoff an index tuner reads.
  */
object GraphServe extends QueryModule {

  /** Graded result depth per query. */
  val K = 10

  /** Beam width per query (≥ K for the monotone-recall contract). */
  val Beam = 20

  /** Beam-expansion rounds after entry-point scoring (round 0 = entries). */
  val Rounds = 3

  /** Entry-point count target: ids ≡ 0 (mod ceil(n/Entries)). */
  val Entries = 8

  /** Query-sample size target: ids ≡ mq−1 (mod mq), mq = max(2, ceil(n/target)). */
  val QueryTarget = 1000L

  /** Serves are memoized per corpus dir (the [[KnnGraph]] memo
    * rationale): the beams feed several lazy consumers — per-round
    * grading, the spec's monotonicity checks — and a rolling per-site
    * cache would let a second build unpersist frames the first build's
    * consumers still hold, recomputing the whole graph+beam DAG. */
  private val servedMemo = scala.collection.concurrent.TrieMap
    .empty[String, (Seq[DataFrame], DataFrame, Long)]

  private val exactCache = new graft.RollingCache

  /** Score (q, node) pairs: rounded cosine between the query's vector and
    * the node's — node side fetched by equi-join, query side broadcast
    * (the sample is bounded by [[QueryTarget]]). */
  private def scored(pairs: DataFrame, emb: DataFrame, qs: DataFrame): DataFrame =
    pairs.join(emb.select(col("vec_id").as("node"), col("embedding").as("nv")), Seq("node"))
      .join(broadcast(qs), Seq("q"))
      .select(col("q"), col("node"),
        round(cosine_sim(col("qv"), col("nv")), 6).as("sim"))

  private def topPer(df: DataFrame, k: Int): DataFrame =
    graft.plans.TopKPerGroup(
      df.withColumn("neg_sim", -col("sim")), Seq("q"), Seq("neg_sim", "node"), k)
      .select(col("q"), col("node"), col("sim"))

  /** Per-round beam frames b0..b`Rounds` for the deterministic query
    * sample, served from the final descent graph (memoized per dir). */
  def beamRounds(spark: SparkSession, dir: String): (Seq[DataFrame], DataFrame, Long) =
    servedMemo.getOrElseUpdate(dir, buildBeams(spark, dir, pin = true))

  /** The un-memoized build. `pin = true` persists AND materializes every
    * shared frame (the memoized path); `pin = false` leaves the frames
    * lazy — the determinism spec's fresh-replay bypass, which must not
    * stack a second set of cached copies next to the memo's. */
  private[search] def buildBeams(spark: SparkSession, dir: String,
                                 pin: Boolean): (Seq[DataFrame], DataFrame, Long) = {
    // localCheckpoint for the [[KnnGraph.nnDescentRounds]] reason: beam
    // round r references round r-1 twice, so plan size (and the driver's
    // per-action canonicalization walk) doubles per round unless each
    // round truncates to a LogicalRDD leaf.
    def pinned(df: DataFrame): DataFrame =
      if (!pin) df else df.localCheckpoint(true)
    val emb = KnnGraph.e(spark, dir)
    val n = emb.count()
    val g = KnnGraph.nnDescentRounds(emb, KnnGraph.K, KnnGraph.Rounds).last
    val und = pinned(
      g.select(col("i"), col("j"))
        .union(g.select(col("j").as("i"), col("i").as("j"))).distinct())
    val mq = math.max(2L, math.ceil(n / QueryTarget.toDouble).toLong)
    val qs = pinned(
      emb.filter(col("vec_id") % mq === mq - 1)
        .select(col("vec_id").as("q"), col("embedding").as("qv")))
    val se = math.max(1L, math.ceil(n / Entries.toDouble).toLong)
    // constant-key equi-join (not a cross join): the entry set is
    // Entries-sized, so this is a broadcast hash join, never a BNLJ
    val entryPairs = qs.select(col("q")).withColumn("one", lit(1))
      .join(broadcast(
        emb.filter(col("vec_id") % se === 0)
          .select(col("vec_id").as("node")).withColumn("one", lit(1))), Seq("one"))
      .select(col("q"), col("node"))
    val b0 = pinned(topPer(scored(entryPairs, emb, qs), Beam))
    val beams = (1 to Rounds).scanLeft(b0) { (b, _) =>
      val cand = b.select(col("q"), col("node"))
        .join(und.withColumnRenamed("i", "node"), Seq("node"))
        .select(col("q"), col("j").as("node")).distinct()
      val pool = scored(cand, emb, qs).unionByName(b).dropDuplicates("q", "node")
      pinned(topPer(pool, Beam))
    }
    (beams, qs, n)
  }

  /** Per-round serve quality: beam size and recall@10 of each round's
    * top-10 vs the exact top-10 of the query sample (the one guarded
    * sample×n quadratic, same contract as [[KnnGraph.qKnnGraph]]). */
  def qGraphServe(spark: SparkSession, dir: String): DataFrame = {
    val (beams, qs, _) = beamRounds(spark, dir)
    val emb = KnnGraph.e(spark, dir)
    val exactPairs = emb
      .select(col("vec_id").as("node"), col("embedding").as("nv"))
      .crossJoin(broadcast(qs))
      .filter(col("q") =!= col("node"))
      .select(col("q"), col("node"),
        round(cosine_sim(col("qv"), col("nv")), 6).as("sim"))
    // one rolling slot: `exact` feeds every round's recall row — without
    // a persist the sample×n scoring pass would run once per round
    val exact = exactCache.persist(
      topPer(exactPairs, K).select(col("q"), col("node")))
    val nEval = qs.count()
    beams.zipWithIndex.map { case (b, r) =>
      val size = b.agg(count(lit(1)).as("n_beam"))
      val hits = topPer(b, K).join(exact, Seq("q", "node"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
      size.crossJoin(broadcast(hits)).select(
        lit(r).as("round"), col("n_beam"), lit(nEval).as("n_eval"),
        round(col("n_hits").cast("double") / lit(nEval * K), 6).as("recall"))
    }.reduce(_.unionByName(_)).orderBy("round")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_graph_serve" -> (qGraphServe _))

  /** One serve round as CTEs: beam ∪ scored graph-neighbors → top-Beam. */
  private def serveCtes(r: Int): String = {
    val prev = s"b${r - 1}"
    s"""bc$r AS (SELECT DISTINCT p.q, u.j AS node FROM $prev p
       |  JOIN und u ON u.i = p.node),
       |bs$r AS (SELECT p.q, p.node, round(list_cosine_similarity(qs.qv, e.v), 6) AS sim
       |  FROM bc$r p JOIN e ON e.id = p.node JOIN qs ON qs.q = p.q),
       |bp$r AS (SELECT q, node, sim FROM bs$r UNION SELECT q, node, sim FROM $prev),
       |b$r AS (SELECT q, node, sim FROM (
       |    SELECT q, node, sim, row_number() OVER (PARTITION BY q ORDER BY sim DESC, node) AS rn
       |    FROM bp$r) WHERE rn <= $Beam)""".stripMargin
  }

  private def recallRow(r: Int): String =
    s"""SELECT $r AS round, (SELECT count(*) FROM b$r) AS n_beam,
       |  (SELECT n_eval FROM nev) AS n_eval,
       |  round(CAST((SELECT count(*) FROM (
       |      SELECT q, node FROM (
       |        SELECT q, node, row_number() OVER (PARTITION BY q ORDER BY sim DESC, node) AS rn
       |        FROM b$r) WHERE rn <= $K) t JOIN exact USING (q, node)) AS DOUBLE)
       |        / ((SELECT n_eval FROM nev) * $K), 6) AS recall""".stripMargin

  override def oracles: Map[String, String] = Map(
    "q_graph_serve" ->
      s"""WITH ${KnnGraph.graphCtePrefix},
         |und AS (SELECT i, j FROM g${KnnGraph.Rounds}
         |  UNION SELECT j AS i, i AS j FROM g${KnnGraph.Rounds}),
         |qprm AS (SELECT greatest(2, CAST(ceil((SELECT n FROM prm) / $QueryTarget.0) AS BIGINT)) AS mq,
         |    greatest(1, CAST(ceil((SELECT n FROM prm) / $Entries.0) AS BIGINT)) AS se),
         |qs AS (SELECT id AS q, v AS qv FROM e
         |  WHERE id % (SELECT mq FROM qprm) = (SELECT mq FROM qprm) - 1),
         |nev AS (SELECT count(*) AS n_eval FROM qs),
         |ent AS (SELECT id AS node FROM e WHERE id % (SELECT se FROM qprm) = 0),
         |es AS (SELECT qs.q, ent.node, round(list_cosine_similarity(qs.qv, e.v), 6) AS sim
         |  FROM qs CROSS JOIN ent JOIN e ON e.id = ent.node),
         |b0 AS (SELECT q, node, sim FROM (
         |    SELECT q, node, sim, row_number() OVER (PARTITION BY q ORDER BY sim DESC, node) AS rn
         |    FROM es) WHERE rn <= $Beam),
         |${(1 to Rounds).map(serveCtes).mkString(",\n")},
         |exact AS (SELECT q, node FROM (
         |    SELECT qs.q, e.id AS node,
         |      row_number() OVER (PARTITION BY qs.q
         |        ORDER BY round(list_cosine_similarity(qs.qv, e.v), 6) DESC, e.id) AS rn
         |    FROM qs JOIN e ON e.id <> qs.q) WHERE rn <= $K)
         |${(0 to Rounds).map(recallRow).mkString("\nUNION ALL\n")}
         |ORDER BY round""".stripMargin)
}
