package graft.operators.search

import graft.{QueryModule, Tables}
import graft.functions.VectorOps._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FILTERED graph serve: metadata predicate under beam search over the
  * persistent [[GraphIndex]] — the graph-index sibling of
  * [[FilteredAnn]]'s IVF drill (the `filter` parameter of the Azure AI
  * Search vector queries the thesis studies, served from the HNSW-class
  * index instead of the IVF cells). Two strategies, same adaptive
  * machinery:
  *
  *  - '''pre-filter''': the predicate restricts the SEARCH — candidates
  *    failing it die in the embedding-fetch join before the heap
  *    ([[GraphIndex.beamSearch]] with a filtered node frame), and entry
  *    points are the first [[GraphServe.Entries]] matching ids. Beams
  *    hold only matching nodes, so the walk never wastes width on
  *    non-matches — but on a NARROW predicate the matching subgraph is
  *    sparse and the walk can strand (the classic filtered-HNSW
  *    connectivity failure the recall rows surface).
  *  - '''post-filter''': serve unfiltered at an ADAPTIVE width
  *    ([[FilteredAnn.adaptiveOverfetch]]: beam = k·⌈n/n_match⌉ capped at
  *    n), then filter the final beam and re-rank to k. Connectivity is
  *    never broken, but a narrow predicate inflates the width toward a
  *    full scan — the crossover [[FilteredAnn.chooseStrategy]] flags at
  *    5% selectivity, identically to the IVF drill.
  *
  * Recall is graded per strategy against the exact corpus-wide FILTERED
  * top-k (q ≠ node), denominated by the exact result count so a
  * predicate with < k matches per query still grades on [0, 1].
  * Deterministic throughout → both arms replay hash-exact in DuckDB from
  * the shared [[KnnGraph.graphCtePrefix]] chain.
  */
object FilteredGraphServe extends QueryModule {

  /** Graded depth. */
  val K = GraphServe.K

  /** Pre-arm beam width (the default serve width). */
  val Beam = GraphServe.Beam

  /** The two drilled predicates. `wide` is one label stratum (~10% at
    * every scale); `narrow` conjoins a FIXED id prefix (`id < 100`), so
    * its selectivity shrinks with the corpus (~2% at sf0.001, ~0.2% at
    * sf0.01, …) — deliberately, to drill the regime far below the 5%
    * crossover where pre-filtering is the only sane arm. */
  private val Preds: Seq[(String, (Column, Column) => Column, String)] = Seq(
    ("narrow", (id, label) => label === 3 && id < 100, "label = 3 AND id < 100"),
    ("wide", (_, label) => label === 3, "label = 3"))

  /** Heavy per-corpus frames (beam searches + exact truths + driver
    * counts), memoized; the grading aggregation is REBUILT per call so
    * bench reps measure real work, not a 4-row cached scan. */
  private case class Arm(tag: String, strat: String, nMatch: Long, w: Int,
                         chosen: String, nExact: Long,
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
      val arms = Preds.flatMap { case (tag, predFn, _) =>
        val pred = predFn(col("vec_id"), col("label"))
        val nMatch = el.filter(pred).count()
        val w = FilteredAnn.overfetchLimit(
          FilteredAnn.adaptiveOverfetch(K, n, nMatch))
        val chosen = FilteredAnn.chooseStrategy(n, nMatch)
        val elM = el.filter(pred).select(col("vec_id"), col("embedding"))
        val entriesPre = el.filter(pred).orderBy("vec_id")
          .limit(GraphServe.Entries).select(col("vec_id").as("j"))
        val preTop = GraphIndex.beamSearch(qs, undAdj, elM, entriesPre,
            Beam, GraphServe.Rounds)
          .filter(col("rk") <= K).select(col("q"), col("j"))
          .localCheckpoint(true)
        val postBeam = GraphIndex.beamSearch(qs, undAdj,
          el.select(col("vec_id"), col("embedding")), entriesAll,
          w, GraphServe.Rounds)
        val postTop = graft.plans.TopKPerGroup(
            postBeam.select(col("q"), col("j"), col("sim"))
              .join(el.select(col("vec_id").as("j"), col("label")), Seq("j"))
              .filter(predFn(col("j"), col("label")))
              .withColumn("neg_sim", -col("sim")),
            Seq("q"), Seq("neg_sim", "j"), K)
          .select(col("q"), col("j")).localCheckpoint(true)
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
        Seq(Arm(tag, "pre", nMatch, w, chosen, nExact, preTop, exact),
            Arm(tag, "post", nMatch, w, chosen, nExact, postTop, exact))
      }
      (n, arms)
    }

  /** Both arms × both predicates. */
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
        lit(a.nExact).as("n_exact"),
        round(when(lit(a.nExact) === 0L, lit(1.0))
          .otherwise(col("n_hits").cast("double") / lit(a.nExact)), 6).as("recall"))
    }.reduce(_.unionByName(_)).orderBy("pred", "strategy")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_graph_filtered" -> (qGraphFiltered _))

  /** Beam CTEs for one (tag, strategy): b{sfx}0..b{sfx}R with per-arm
    * width, candidate predicate, and entry set. */
  private def armCtes(sfx: String, widthSql: String, entrySql: String,
                      candPred: String): String = {
    val rounds = (1 to GraphServe.Rounds).map { r =>
      val prev = s"b$sfx${r - 1}"
      s"""bc$sfx$r AS (SELECT DISTINCT p.q, u.j AS node FROM $prev p
         |  JOIN undx u ON u.i = p.node),
         |bs$sfx$r AS (SELECT p.q, p.node, round(list_cosine_similarity(qs.qv, el.v), 6) AS sim
         |  FROM bc$sfx$r p JOIN el ON el.id = p.node JOIN qs ON qs.q = p.q
         |  WHERE p.node <> p.q AND ($candPred)),
         |bp$sfx$r AS (SELECT q, node, sim FROM bs$sfx$r UNION SELECT q, node, sim FROM $prev),
         |b$sfx$r AS MATERIALIZED (SELECT q, node, sim FROM (
         |    SELECT q, node, sim, row_number() OVER (PARTITION BY q ORDER BY sim DESC, node) AS rn
         |    FROM bp$sfx$r) WHERE rn <= ($widthSql))""".stripMargin
    }
    s"""es$sfx AS (SELECT qs.q, en.node, round(list_cosine_similarity(qs.qv, el.v), 6) AS sim
       |  FROM qs CROSS JOIN ($entrySql) en JOIN el ON el.id = en.node
       |  WHERE en.node <> qs.q),
       |b${sfx}0 AS MATERIALIZED (SELECT q, node, sim FROM (
       |    SELECT q, node, sim, row_number() OVER (PARTITION BY q ORDER BY sim DESC, node) AS rn
       |    FROM es$sfx) WHERE rn <= ($widthSql)),
       |${rounds.mkString(",\n")}""".stripMargin
  }

  private def predBlock(tag: String, p: String): String = {
    // word-boundary qualification: a blind substring replace would
    // corrupt predicates containing "id" inside another identifier
    val pe = p.replaceAll("\\bid\\b", "el.id")
    s"""st_$tag AS (SELECT count(*) AS n_match FROM el WHERE $p),
       |wf_$tag AS (SELECT CASE WHEN n_match = 0 THEN $K
       |    ELSE least($K * (((SELECT n FROM prm) + n_match - 1) // n_match),
       |               (SELECT n FROM prm)) END AS w FROM st_$tag),
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
       |ex_$tag AS MATERIALIZED (SELECT q, node FROM (
       |    SELECT qs.q, el.id AS node,
       |      row_number() OVER (PARTITION BY qs.q
       |        ORDER BY round(list_cosine_similarity(qs.qv, el.v), 6) DESC, el.id) AS rn
       |    FROM qs JOIN el ON el.id <> qs.q AND ($pe)) WHERE rn <= $K),
       |nex_$tag AS (SELECT count(*) AS n_exact FROM ex_$tag)""".stripMargin
  }

  private def armRow(tag: String, strat: String): String =
    s"""SELECT '$tag' AS pred, '$strat' AS strategy,
       |  CAST(s.n_match AS BIGINT) AS n_match,
       |  round(CAST(s.n_match AS DOUBLE) / (SELECT n FROM prm), 6) AS sel,
       |  CAST(w.w AS BIGINT) AS beam_w,
       |  CASE WHEN s.n_match * 20 < (SELECT n FROM prm) THEN 'pre' ELSE 'post' END AS chosen,
       |  CAST(x.n_exact AS BIGINT) AS n_exact,
       |  round(CASE WHEN x.n_exact = 0 THEN 1.0
       |    ELSE CAST((SELECT count(*) FROM ${strat}_$tag t
       |               JOIN ex_$tag USING (q, node)) AS DOUBLE) / x.n_exact END, 6) AS recall
       |FROM st_$tag s, wf_$tag w, nex_$tag x""".stripMargin

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
              Seq(armRow(tag, "pre"), armRow(tag, "post")) }
            .mkString("\nUNION ALL\n")}
         |ORDER BY pred, strategy""".stripMargin)
}
