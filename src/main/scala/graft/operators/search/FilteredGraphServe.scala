package graft.operators.search

import graft.{QueryModule, Tables}
import graft.functions.VectorOps._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FILTERED graph serve: metadata predicate under beam search over the
  * persistent [[GraphIndex]] — the graph-index sibling of
  * [[FilteredAnn]]'s IVF drill (the `filter` parameter of the Azure AI
  * Search vector queries the thesis studies, served from the HNSW-class
  * index instead of the IVF cells). Three strategies, same adaptive
  * machinery:
  *
  *  - '''pre-filter''': the predicate restricts the SEARCH — candidates
  *    failing it die in the embedding-fetch join before the heap, and
  *    entry points are the first [[GraphServe.Entries]] matching ids.
  *    Beams hold only matching nodes, so the walk never wastes width on
  *    non-matches — but on a sparse matching subgraph the walk can
  *    strand (the classic filtered-HNSW connectivity failure the recall
  *    rows surface).
  *  - '''post-filter''': serve unfiltered at an ADAPTIVE width
  *    ([[FilteredAnn.adaptiveOverfetch]]: beam = k·⌈n/n_match⌉ capped at
  *    n), then filter the final beam and re-rank to k. Connectivity is
  *    never broken, but a narrow predicate inflates the width toward a
  *    full scan — the crossover [[FilteredAnn.chooseStrategy]] flags at
  *    5% selectivity, identically to the IVF drill.
  *  - '''acorn''' (connectivity-preserving pre-filter, after ACORN,
  *    Patel et al., SIGMOD'24): the beam holds ONLY matching nodes, but
  *    candidate generation expands THROUGH non-matching neighbors — a
  *    1-hop candidate that fails the predicate is not scored, it is
  *    expanded one more hop, so the walk keeps the FULL graph's
  *    connectivity while scoring (and admitting) only matches. Cost is
  *    bounded by beam·deg² candidate pairs per query per round; scored
  *    work stays proportional to the matching population, so at narrow
  *    predicates it dominates post-filter (same recall class, a
  *    fraction of the scorings — the n_scored column is the evidence).
  *
  * Every arm reports `n_scored` — the exact number of (query, node)
  * similarity evaluations it performed (entry scoring + each round's
  * candidate scoring) — so the recall/cost trade-off is measured, not
  * asserted. Recall is graded per strategy against the exact
  * corpus-wide FILTERED top-k (q ≠ node), denominated by the exact
  * result count so a predicate with < k matches per query still grades
  * on [0, 1]. Deterministic throughout → all arms replay hash-exact in
  * DuckDB from the shared [[KnnGraph.graphCtePrefix]] chain.
  */
object FilteredGraphServe extends QueryModule {

  /** Graded depth. */
  val K = GraphServe.K

  /** Pre/acorn arm beam width (the default serve width). */
  val Beam = GraphServe.Beam

  /** Hard ceiling on the post-filter arm's adaptive over-fetch width.
    * The adaptive rule k·⌈n/n_match⌉ is the honest recall-preserving
    * width, but far below the crossover it grows toward n — at the
    * sf10 probe (200k vectors, 0.05% selectivity) the unclamped post
    * arm brute-forced ~n-wide beams for 2049 s, grading a regime the
    * crossover router never picks (the r11 verdict's probe-cost
    * finding). The cap never binds at the correctness gates (the
    * adaptive width is already ≤ n ≤ 2000 there), so gate-scale
    * grading is unchanged; beyond it the post arm runs, and is GRADED,
    * at the clamped width the output row reports (`beam_w`) — recall
    * honestly degrades instead of the probe stalling. Measured at
    * sf10 (200k nodes, ~1000 queries, cold artifact build included):
    * uncapped 2049 s (r11) → cap 4000: 849 s → cap 2048: see SURVEY
    * r12 wave 2. */
  val PostWidthCap = 2048

  /** The two drilled predicates. `wide` is one label stratum (~10% at
    * every scale); `narrow` conjoins a FIXED id prefix (`id < 100`), so
    * its selectivity shrinks with the corpus (~2% at sf0.001, ~0.2% at
    * sf0.01, …) — deliberately, to drill the regime far below the 5%
    * crossover where pre-filtering is the only sane arm. */
  private val Preds: Seq[(String, (Column, Column) => Column, String)] = Seq(
    ("narrow", (id, label) => label === 3 && id < 100, "label = 3 AND id < 100"),
    ("wide", (_, label) => label === 3, "label = 3"))

  /** [[GraphIndex.beamKernel]] with scored-work accounting — the ONE
    * beam implementation ([[GraphIndex.beamSearch]] is the same kernel
    * untraced), generalized over the candidate generator so the three
    * arms differ ONLY in how a beam produces its next candidates, and
    * instrumented to return each round's scored frame (its row count IS
    * the arm's scoring cost — a similarity evaluation happens exactly
    * once per scored row). */
  private def beamTrace(qs: DataFrame, nodeEmb: DataFrame, entries: DataFrame,
                        beam: Int, rounds: Int,
                        candGen: DataFrame => DataFrame): (DataFrame, Seq[DataFrame]) =
    GraphIndex.beamKernel(qs, nodeEmb, entries, beam, rounds, candGen, trace = true)

  /** Heavy per-corpus frames (beam searches + exact truths + driver
    * counts), memoized; the grading aggregation is REBUILT per call so
    * bench reps measure real work, not a 6-row cached scan. */
  private case class Arm(tag: String, strat: String, nMatch: Long, w: Int,
                         chosen: String, nExact: Long, nScored: Long,
                         top: DataFrame, exact: DataFrame)

  private val armsMemo =
    new graft.BoundedMemo[String, (Long, Seq[Arm])](KnnGraph.MemoCap)

  private def armsFor(spark: SparkSession, dir: String): (Long, Seq[Arm]) =
    armsMemo.getOrElseUpdate(dir) {
      val el = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("label"), col("embedding"))
      val n = el.count()
      val undAdj = GraphIndex.und(GraphIndex.finalGraph(spark, dir))
        .localCheckpoint(true)
      val qs = GraphServe.qsFor(spark, dir)
      val se = GraphServe.upperModulus(n)
      val entriesAll = el.filter(GraphServe.entryPick(col("vec_id"), se))
        .select(col("vec_id").as("j"))
      // the shared 1-hop candidate generator (pre + post arms) — the
      // serve kernel's own
      val hop1: DataFrame => DataFrame = GraphIndex.hop1Gen(undAdj)
      val arms = Preds.flatMap { case (tag, predFn, _) =>
        val pred = predFn(col("vec_id"), col("label"))
        val nMatch = el.filter(pred).count()
        val w = math.min(PostWidthCap, FilteredAnn.overfetchLimit(
          FilteredAnn.adaptiveOverfetch(K, n, nMatch)))
        val chosen = FilteredAnn.chooseStrategy(n, nMatch)
        val elM = el.filter(pred).select(col("vec_id"), col("embedding"))
        val matchIds = elM.select(col("vec_id").as("j"))
        val entriesPre = el.filter(pred).orderBy("vec_id")
          .limit(GraphServe.Entries).select(col("vec_id").as("j"))
        // acorn candidate generator: 1-hop; non-matching candidates are
        // expanded one further hop instead of being scored, so the walk
        // traverses non-matching conduits while only matches reach scoreQ
        val acornGen: DataFrame => DataFrame = b => {
          val h1 = hop1(b)
          val h1n = h1.join(matchIds, Seq("j"), "left_anti")
          val h2 = h1n.join(undAdj.select(col("i").as("j"), col("j").as("c")), Seq("j"))
            .select(col("q"), col("c").as("j"))
          h1.join(matchIds, Seq("j"), "left_semi").unionByName(h2).distinct()
        }
        val (preB, preS) = beamTrace(qs, elM, entriesPre, Beam,
          GraphServe.Rounds, hop1)
        val preTop = preB.filter(col("rk") <= K).select(col("q"), col("j"))
          .localCheckpoint(true)
        val (postB, postS) = beamTrace(qs,
          el.select(col("vec_id"), col("embedding")), entriesAll, w,
          GraphServe.Rounds, hop1)
        val postTop = graft.plans.TopKPerGroup(
            postB.select(col("q"), col("j"), col("sim"))
              .join(el.select(col("vec_id").as("j"), col("label")), Seq("j"))
              .filter(predFn(col("j"), col("label")))
              .withColumn("neg_sim", -col("sim")),
            Seq("q"), Seq("neg_sim", "j"), K)
          .select(col("q"), col("j")).localCheckpoint(true)
        val (acB, acS) = beamTrace(qs, elM, entriesPre, Beam,
          GraphServe.Rounds, acornGen)
        val acTop = acB.filter(col("rk") <= K).select(col("q"), col("j"))
          .localCheckpoint(true)
        // exact filtered truth: qs is sample-bounded → broadcast side
        val exact = graft.plans.TopKPerGroup(
            el.filter(pred)
              .select(col("vec_id").as("j"), col("embedding").as("nv"))
              .crossJoin(broadcast(qs))
              .filter(col("j") =!= col("q"))
              .select(col("q"), col("j"),
                round(cosine_sim(col("qv"), col("nv")), 6).as("sim"))
              .withColumn("neg_sim", -col("sim")), Seq("q"), Seq("neg_sim", "j"), K)
          .select(col("q"), col("j")).localCheckpoint(true)
        val nExact = exact.count()
        def scoredOf(fs: Seq[DataFrame]): Long = fs.map(_.count()).sum
        // beam_w reports each arm's ACTUAL width: pre/acorn run at the
        // fixed serve width, only post runs at the adaptive over-fetch
        Seq(Arm(tag, "pre", nMatch, Beam, chosen, nExact, scoredOf(preS), preTop, exact),
            Arm(tag, "post", nMatch, w, chosen, nExact, scoredOf(postS), postTop, exact),
            Arm(tag, "acorn", nMatch, Beam, chosen, nExact, scoredOf(acS), acTop, exact))
      }
      (n, arms)
    }

  /** All three arms × both predicates. */
  def qGraphFiltered(spark: SparkSession, dir: String): DataFrame = {
    val (n, arms) = armsFor(spark, dir)
    arms.map { a =>
      val hits = a.top.join(a.exact, Seq("q", "j"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
      hits.select(
        lit(a.tag).as("pred"), lit(a.strat).as("strategy"),
        lit(a.nMatch).as("n_match"),
        round(lit(a.nMatch).cast("double") / lit(n), 6).as("sel"),
        lit(a.w.toLong).as("beam_w"), lit(a.chosen).as("chosen"),
        lit(a.nExact).as("n_exact"), lit(a.nScored).as("n_scored"),
        round(when(lit(a.nExact) === 0L, lit(1.0))
          .otherwise(col("n_hits").cast("double") / lit(a.nExact)), 6).as("recall"))
    }.reduce(_.unionByName(_)).orderBy("pred", "strategy")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_graph_filtered" -> (qGraphFiltered _))

  /** Beam CTEs for one (tag, strategy): b{sfx}0..b{sfx}R with per-arm
    * width, candidate predicate, and entry set. Returns the CTE text;
    * the scored frames are es$sfx and bs$sfx{1..R} (see [[scoredSql]]). */
  private def armCtes(sfx: String, widthSql: String, entrySql: String,
                      candPred: String): String = {
    val rounds = (1 to GraphServe.Rounds).map { r =>
      val prev = s"b$sfx${r - 1}"
      s"""bc$sfx$r AS (SELECT DISTINCT p.q, u.j AS node FROM $prev p
         |  JOIN undx u ON u.i = p.node),
         |bs$sfx$r AS MATERIALIZED (SELECT p.q, p.node, round(list_cosine_similarity(qs.qv, el.v), 6) AS sim
         |  FROM bc$sfx$r p JOIN el ON el.id = p.node JOIN qs ON qs.q = p.q
         |  WHERE p.node <> p.q AND ($candPred)),
         |bp$sfx$r AS (SELECT q, node, sim FROM bs$sfx$r UNION SELECT q, node, sim FROM $prev),
         |b$sfx$r AS MATERIALIZED (SELECT q, node, sim FROM (
         |    SELECT q, node, sim, row_number() OVER (PARTITION BY q ORDER BY sim DESC, node) AS rn
         |    FROM bp$sfx$r) WHERE rn <= ($widthSql))""".stripMargin
    }
    s"""es$sfx AS MATERIALIZED (SELECT qs.q, en.node, round(list_cosine_similarity(qs.qv, el.v), 6) AS sim
       |  FROM qs CROSS JOIN ($entrySql) en JOIN el ON el.id = en.node
       |  WHERE en.node <> qs.q),
       |b${sfx}0 AS MATERIALIZED (SELECT q, node, sim FROM (
       |    SELECT q, node, sim, row_number() OVER (PARTITION BY q ORDER BY sim DESC, node) AS rn
       |    FROM es$sfx) WHERE rn <= ($widthSql)),
       |${rounds.mkString(",\n")}""".stripMargin
  }

  /** Acorn beam CTEs: matching 1-hop candidates are scored; NON-matching
    * 1-hop candidates are expanded one further hop (the conduit step) —
    * the exact dual of the Scala `acornGen`. Scored frames again
    * es$sfx + bs$sfx{1..R}. */
  private def acornCtes(sfx: String, entrySql: String, pe: String): String = {
    val rounds = (1 to GraphServe.Rounds).map { r =>
      val prev = s"b$sfx${r - 1}"
      s"""h1$sfx$r AS (SELECT DISTINCT p.q, u.j AS node FROM $prev p
         |  JOIN undx u ON u.i = p.node),
         |h2$sfx$r AS (SELECT p.q, u.j AS node
         |  FROM (SELECT h.q, h.node FROM h1$sfx$r h JOIN el ON el.id = h.node
         |        WHERE NOT ($pe)) p
         |  JOIN undx u ON u.i = p.node),
         |bc$sfx$r AS (SELECT DISTINCT q, node FROM (
         |    SELECT h.q, h.node FROM h1$sfx$r h JOIN el ON el.id = h.node WHERE $pe
         |    UNION ALL SELECT q, node FROM h2$sfx$r)),
         |bs$sfx$r AS MATERIALIZED (SELECT p.q, p.node, round(list_cosine_similarity(qs.qv, el.v), 6) AS sim
         |  FROM bc$sfx$r p JOIN el ON el.id = p.node JOIN qs ON qs.q = p.q
         |  WHERE p.node <> p.q AND ($pe)),
         |bp$sfx$r AS (SELECT q, node, sim FROM bs$sfx$r UNION SELECT q, node, sim FROM $prev),
         |b$sfx$r AS MATERIALIZED (SELECT q, node, sim FROM (
         |    SELECT q, node, sim, row_number() OVER (PARTITION BY q ORDER BY sim DESC, node) AS rn
         |    FROM bp$sfx$r) WHERE rn <= $Beam)""".stripMargin
    }
    s"""es$sfx AS MATERIALIZED (SELECT qs.q, en.node, round(list_cosine_similarity(qs.qv, el.v), 6) AS sim
       |  FROM qs CROSS JOIN ($entrySql) en JOIN el ON el.id = en.node
       |  WHERE en.node <> qs.q),
       |b${sfx}0 AS MATERIALIZED (SELECT q, node, sim FROM (
       |    SELECT q, node, sim, row_number() OVER (PARTITION BY q ORDER BY sim DESC, node) AS rn
       |    FROM es$sfx) WHERE rn <= $Beam),
       |${rounds.mkString(",\n")}""".stripMargin
  }

  /** Total scored (query, node) pairs of one arm: the entry frame plus
    * every round's scored frame — row-for-row the Scala side's count. */
  private def scoredSql(sfx: String): String =
    (s"(SELECT count(*) FROM es$sfx)" +:
      (1 to GraphServe.Rounds).map(r => s"(SELECT count(*) FROM bs$sfx$r)"))
      .mkString(" + ")

  private def predBlock(tag: String, p: String): String = {
    // word-boundary qualification: a blind substring replace would
    // corrupt predicates containing "id" inside another identifier
    val pe = p.replaceAll("\\bid\\b", "el.id")
    s"""st_$tag AS (SELECT count(*) AS n_match FROM el WHERE $p),
       |wf_$tag AS (SELECT CASE WHEN n_match = 0 THEN $K
       |    ELSE least($K * (((SELECT n FROM prm) + n_match - 1) // n_match),
       |               (SELECT n FROM prm), $PostWidthCap) END AS w FROM st_$tag),
       |pent_$tag AS (SELECT id AS node FROM el WHERE $p ORDER BY id LIMIT ${GraphServe.Entries}),
       |${armCtes(s"pr${tag}_", Beam.toString, s"SELECT node FROM pent_$tag", pe)},
       |pre_$tag AS (SELECT q, node FROM (
       |    SELECT q, node, row_number() OVER (PARTITION BY q ORDER BY sim DESC, node) AS rn
       |    FROM bpr${tag}_${GraphServe.Rounds}) WHERE rn <= $K),
       |${armCtes(s"po${tag}_", s"SELECT w FROM wf_$tag", "SELECT node FROM entx", "TRUE")},
       |post_$tag AS (SELECT q, node FROM (
       |    SELECT b.q, b.node, row_number() OVER (PARTITION BY b.q ORDER BY b.sim DESC, b.node) AS rn
       |    FROM bpo${tag}_${GraphServe.Rounds} b JOIN el ON el.id = b.node WHERE $pe)
       |  WHERE rn <= $K),
       |${acornCtes(s"ac${tag}_", s"SELECT node FROM pent_$tag", pe)},
       |acorn_$tag AS (SELECT q, node FROM (
       |    SELECT q, node, row_number() OVER (PARTITION BY q ORDER BY sim DESC, node) AS rn
       |    FROM bac${tag}_${GraphServe.Rounds}) WHERE rn <= $K),
       |ex_$tag AS MATERIALIZED ${KnnGraph.exactTopKSql("qs", "q", "qv", "el", "q", "node", K, pe)},
       |nex_$tag AS (SELECT count(*) AS n_exact FROM ex_$tag)""".stripMargin
  }

  private def armRow(tag: String, strat: String): String = {
    val (sfx, wSql) = strat match {
      case "pre"   => (s"pr${tag}_", s"CAST($Beam AS BIGINT)")
      case "post"  => (s"po${tag}_", "CAST(w.w AS BIGINT)")
      case "acorn" => (s"ac${tag}_", s"CAST($Beam AS BIGINT)")
    }
    s"""SELECT '$tag' AS pred, '$strat' AS strategy,
       |  CAST(s.n_match AS BIGINT) AS n_match,
       |  round(CAST(s.n_match AS DOUBLE) / (SELECT n FROM prm), 6) AS sel,
       |  $wSql AS beam_w,
       |  CASE WHEN s.n_match * 20 < (SELECT n FROM prm) THEN 'pre' ELSE 'post' END AS chosen,
       |  CAST(x.n_exact AS BIGINT) AS n_exact,
       |  CAST(${scoredSql(sfx)} AS BIGINT) AS n_scored,
       |  round(CASE WHEN x.n_exact = 0 THEN 1.0
       |    ELSE CAST((SELECT count(*) FROM ${strat}_$tag t
       |               JOIN ex_$tag USING (q, node)) AS DOUBLE) / x.n_exact END, 6) AS recall
       |FROM st_$tag s, wf_$tag w, nex_$tag x""".stripMargin
  }

  override def oracles: Map[String, String] = Map(
    "q_graph_filtered" ->
      s"""WITH ${KnnGraph.graphCtePrefix},
         |el AS MATERIALIZED (SELECT vec_id AS id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |undx AS MATERIALIZED (SELECT i, j FROM g${KnnGraph.Rounds}
         |  UNION SELECT j AS i, i AS j FROM g${KnnGraph.Rounds}),
         |qprm AS (SELECT greatest(2, CAST(ceil((SELECT n FROM prm) / ${GraphServe.QueryTarget}.0) AS BIGINT)) AS mq,
         |    ${GraphServe.upperModulusSql("SELECT n FROM prm")} AS se),
         |qs AS MATERIALIZED (SELECT id AS q, v AS qv FROM el
         |  WHERE id % (SELECT mq FROM qprm) = (SELECT mq FROM qprm) - 1),
         |entx AS (SELECT id AS node FROM el WHERE ${GraphServe.entryPickSql("id", "SELECT se FROM qprm")}),
         |${Preds.map { case (tag, _, sql) => predBlock(tag, sql) }.mkString(",\n")}
         |${Preds.flatMap { case (tag, _, _) =>
              Seq(armRow(tag, "pre"), armRow(tag, "post"), armRow(tag, "acorn")) }
            .mkString("\nUNION ALL\n")}
         |ORDER BY pred, strategy""".stripMargin)
}
