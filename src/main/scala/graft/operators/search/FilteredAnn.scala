package graft.operators.search

import graft.{QueryModule, Tables}
import graft.functions.VectorOps._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** FILTERED vector search: top-k cosine under a metadata predicate — the
  * most-used vector-DB feature beyond plain top-k (the reference's data
  * model is built around exactly these fields: content_type/category
  * analytics in analisis-informe.ipynb, the per-doc label merge of
  * ChunkLabelingProcesor.py:21-38, and the `filter` parameter of the
  * Azure AI Search vector queries the thesis studies).
  *
  * Two strategies over the PERSISTENT [[IvfIndex]], both distributed and
  * partition-pruned:
  *
  *  - '''pre-filter''': the predicate is pushed INTO the pruned cell
  *    read — the parquet scan receives both the `cell IN (…)` partition
  *    filter and the metadata predicate as PushedFilters, so at 100 TB
  *    only the probed cells' files are opened and only matching rows are
  *    decoded. Best when the filter is selective: the scan is small and
  *    no over-fetch gamble is needed.
  *  - '''post-filter''': probe unfiltered, take the top `c·k`
  *    candidates, then apply the predicate and re-rank to k. Best when
  *    the filter passes most rows: a small over-fetch factor suffices
  *    and the scan shape stays identical to the unfiltered probe (plan
  *    reuse, no second scan pattern). Risk: an under-sized c returns
  *    fewer than k rows — hence the ADAPTIVE factor below.
  *
  * The adaptive over-fetch sizes c from measured selectivity in the
  * probed cells: fetch `k · ceil(n_probed / n_match)` candidates
  * (capped at n_probed) — the expected scan depth to surface k matches
  * under uniform mixing, in exact integer arithmetic both engines
  * replay. The crossover heuristic picks pre-filter when selectivity
  * < 5% (integer-exact: `n_match · 20 < n_probed`): below that, the
  * expected over-fetch exceeds 20·k and the pushed-down filtered scan
  * reads less than the over-fetched unfiltered probe.
  *
  * Everything (cells, candidates, counts, over-fetch, recall) is a
  * deterministic function of the corpus, so both queries replay
  * hash-exact in DuckDB over [[AnnQueries.AsgCte]]'s assignment.
  */
object FilteredAnn extends QueryModule {

  /** Result size every strategy targets. */
  val K = 10

  /** Display-query over-fetch factor (the adaptive variant is measured in
    * q_ann_filtered_recall). */
  val FixedOverfetchFactor = 4

  private val cache = new graft.RollingCache

  /** Candidates to fetch so that k matches are expected to survive the
    * predicate, from measured probe-set selectivity. Exact integer
    * arithmetic (ceil-div), capped at the probe-set size; a zero-match
    * probe set degrades to k (the result is empty either way). */
  def adaptiveOverfetch(k: Int, nProbed: Long, nMatch: Long): Long =
    if (nMatch <= 0L) k.toLong
    else math.min(k.toLong * ((nProbed + nMatch - 1) / nMatch), nProbed)

  /** Crossover heuristic: pre-filter below 5% selectivity, post-filter
    * above (integer-exact compare, no float threshold). */
  def chooseStrategy(nProbed: Long, nMatch: Long): String =
    if (nMatch * 20 < nProbed) "pre" else "post"

  /** The over-fetch as a `limit()` argument: `limit` takes an Int, but
    * [[adaptiveOverfetch]] is bounded only by the probe-set size, which
    * at 10^11 vectors exceeds Int.MaxValue — a raw `.toInt` silently
    * truncates to an arbitrary, possibly negative limit (r9 verdict
    * nit). Cap at Int.MaxValue
    * explicitly: an over-fetch that large means selectivity ≲ k/2^31,
    * far below the 5% crossover, so [[chooseStrategy]] has long since
    * picked the pre-filter arm and the cap is never the binding
    * constraint on a served result — spec-asserted boundary. */
  def overfetchLimit(overfetch: Long): Int =
    math.min(overfetch, Int.MaxValue.toLong).toInt

  /** Exact cosine top-k of `pred`-matching rows inside `data` (already
    * cell-pruned): predicate and cell filter both reach the scan. */
  def preFilterTopK(data: DataFrame, pred: Column, qCol: Column, k: Int): DataFrame =
    data.filter(pred)
      .select(col("vec_id"), col("label"),
        round(cosine_sim(col("embedding"), qCol), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id")).limit(k)

  /** Unfiltered top-`overfetch` probe, then predicate, then re-rank to k.
    * May return fewer than k rows when `overfetch` under-estimates —
    * the honest fixed-factor semantics; [[adaptiveOverfetch]] sizes it
    * from measured selectivity instead. */
  def postFilterTopK(data: DataFrame, pred: Column, qCol: Column, k: Int,
                     overfetch: Long): DataFrame =
    data.select(col("vec_id"), col("label"),
        round(cosine_sim(col("embedding"), qCol), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id")).limit(overfetchLimit(overfetch))
      .filter(pred)
      .orderBy(col("cos_sim").desc, col("vec_id")).limit(k)

  private def indexPath(dir: String): String =
    AnnQueries.scratch("graft_ivf_filtered", dir)

  /** Build (or rebuild) the index and return the cell-pruned candidate
    * scan + the query-vector literal for query vec 0, nprobe=2 — the
    * [[AnnQueries.qAnnIvf]] probe geometry over the persisted layout. */
  private def probedData(spark: SparkSession, dir: String): (DataFrame, Column) = {
    val idx = indexPath(dir)
    IvfIndex.build(spark, dir, idx)
    val q = Tables.headEmbeddingDouble(
      Tables.embeddings(spark, dir).filter(col("vec_id") === 0))
    val cells = IvfIndex.rankCells(IvfIndex.readCentroids(spark, idx), q).take(2)
    val qCol = array(q.map(v => lit(v)): _*)
    val data = spark.read.parquet(s"$idx/data")
      .filter(col("cell").isin(cells: _*) && col("vec_id") > 0)
    (data, qCol)
  }

  /** Both strategies' top-10 under `label = 3` (~10% selectivity) through
    * the persistent index — the plan-shape drill: ExplainAudit shows the
    * label predicate inside the partition-pruned scan for the pre arm.
    * Post arm uses the fixed 4× over-fetch. */
  def qAnnFiltered(spark: SparkSession, dir: String): DataFrame = {
    val (data, qCol) = probedData(spark, dir)
    val pred = col("label") === 3
    def withRk(df: DataFrame, strat: String): DataFrame =
      df.withColumn("rk", row_number().over(
          Window.orderBy(col("cos_sim").desc, col("vec_id"))).cast("int"))
        .withColumn("strategy", lit(strat))
    withRk(preFilterTopK(data, pred, qCol, K), "pre")
      .unionByName(withRk(
        postFilterTopK(data, pred, qCol, K, FixedOverfetchFactor.toLong * K), "post"))
      .select("strategy", "rk", "vec_id", "label", "cos_sim")
      .orderBy("strategy", "rk")
  }

  /** The crossover drill: for a WIDE (~10%: `label = 3`) and a NARROW
    * (~2%: `label = 3 AND vec_id < 100`) predicate, measure per-strategy
    * recall@10 vs the exact corpus-wide filtered top-10, the probe-set
    * selectivity, the adaptive over-fetch the post arm used, and which
    * strategy the heuristic picks. Driver sees only two counts per
    * predicate (bounded); candidates stay cached and distributed. */
  def qAnnFilteredRecall(spark: SparkSession, dir: String): DataFrame = {
    val (data, qCol) = probedData(spark, dir)
    val cand = cache.persist(
      data.select(col("vec_id"), col("label"),
        round(cosine_sim(col("embedding"), qCol), 6).as("cos_sim")))
    val full = Tables.embeddings(spark, dir).filter(col("vec_id") > 0)
      .select(col("vec_id"), col("label"),
        round(cosine_sim(col("embedding"), qCol), 6).as("cos_sim"))
    val preds = Seq(
      "narrow" -> (col("label") === 3 && col("vec_id") < 100),
      "wide" -> (col("label") === 3))
    val nProbed = cand.count()
    def topK(df: DataFrame): DataFrame =
      df.orderBy(col("cos_sim").desc, col("vec_id")).limit(K).select("vec_id")
    val arms = preds.flatMap { case (name, pred) =>
      val nMatch = cand.filter(pred).count()
      val overfetch = adaptiveOverfetch(K, nProbed, nMatch)
      val chosen = chooseStrategy(nProbed, nMatch)
      val exactTop = topK(full.filter(pred))
      val strategies = Seq(
        "pre" -> topK(cand.filter(pred)),
        "post" -> topK(
          cand.orderBy(col("cos_sim").desc, col("vec_id")).limit(overfetchLimit(overfetch))
            .filter(pred)))
      strategies.map { case (strat, top) =>
        val hits = top.join(exactTop, Seq("vec_id")).agg(count(lit(1)).as("n_hits"))
        val m = exactTop.agg(count(lit(1)).as("m"))
        hits.crossJoin(broadcast(m)).select(
          lit(name).as("pred"), lit(strat).as("strategy"),
          lit(nProbed).as("n_probed"), lit(nMatch).as("n_match"),
          round(when(lit(nProbed) === 0L, lit(0.0))
            .otherwise(lit(nMatch).cast("double") / lit(nProbed)), 6).as("sel"),
          lit(overfetch).as("overfetch"), lit(chosen).as("chosen"),
          round(when(col("m") === 0, lit(1.0))
            .otherwise(col("n_hits").cast("double") / least(col("m"), lit(K.toLong))), 6)
            .as("recall"))
      }
    }
    arms.reduce(_.unionByName(_)).orderBy("pred", "strategy")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_filtered" -> (qAnnFiltered _),
    "q_ann_filtered_recall" -> (qAnnFilteredRecall _))

  /** Probed-cell candidates with label + rounded cosine — the shared
    * replay base of both oracles. */
  private val CandCte =
    """cand AS (
      |  SELECT a.vec_id, a.label,
      |    round(list_cosine_similarity(a.raw, (SELECT raw FROM asg WHERE vec_id = 0)), 6) AS cos_sim
      |  FROM asg a WHERE a.vec_id > 0 AND a.cell IN (SELECT cid FROM probe))""".stripMargin

  private def predBlock(tag: String, p: String): String =
    s"""stats_$tag AS (
       |  SELECT count(*) AS n_probed,
       |         count(*) FILTER (WHERE $p) AS n_match FROM cand),
       |of_$tag AS (SELECT n_probed, n_match,
       |    CASE WHEN n_match = 0 THEN $K
       |         ELSE least($K * ((n_probed + n_match - 1) // n_match), n_probed)
       |    END AS overfetch FROM stats_$tag),
       |exact_$tag AS (SELECT vec_id FROM (
       |    SELECT vec_id, row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rn
       |    FROM allv WHERE $p) WHERE rn <= $K),
       |m_$tag AS (SELECT count(*) AS m FROM exact_$tag),
       |pre_$tag AS (SELECT vec_id FROM (
       |    SELECT vec_id, row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rn
       |    FROM cand WHERE $p) WHERE rn <= $K),
       |post_$tag AS (SELECT vec_id FROM (
       |    SELECT vec_id, row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rn2
       |    FROM (SELECT vec_id, label, cos_sim,
       |            row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rn
       |          FROM cand)
       |    WHERE rn <= (SELECT overfetch FROM of_$tag) AND ($p)) WHERE rn2 <= $K)""".stripMargin

  private def armRow(tag: String, strat: String): String =
    s"""SELECT '$tag' AS pred, '$strat' AS strategy,
       |  CAST(s.n_probed AS BIGINT) AS n_probed, CAST(s.n_match AS BIGINT) AS n_match,
       |  round(CASE WHEN s.n_probed = 0 THEN 0.0
       |        ELSE CAST(s.n_match AS DOUBLE) / s.n_probed END, 6) AS sel,
       |  CAST(o.overfetch AS BIGINT) AS overfetch,
       |  CASE WHEN s.n_match * 20 < s.n_probed THEN 'pre' ELSE 'post' END AS chosen,
       |  round(CASE WHEN m.m = 0 THEN 1.0
       |        ELSE CAST((SELECT count(*) FROM ${strat}_$tag JOIN exact_$tag USING (vec_id)) AS DOUBLE)
       |             / least(m.m, $K) END, 6) AS recall
       |FROM stats_$tag s, of_$tag o, m_$tag m""".stripMargin

  override def oracles: Map[String, String] = Map(
    "q_ann_filtered" ->
      s"""WITH ${AnnQueries.AsgCte},
         |$CandCte,
         |pre AS (SELECT 'pre' AS strategy, CAST(rn AS INT) AS rk, vec_id, label, cos_sim FROM (
         |    SELECT vec_id, label, cos_sim, row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rn
         |    FROM cand WHERE label = 3) WHERE rn <= $K),
         |post AS (SELECT 'post' AS strategy, CAST(rn2 AS INT) AS rk, vec_id, label, cos_sim FROM (
         |    SELECT vec_id, label, cos_sim, row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rn2
         |    FROM (SELECT vec_id, label, cos_sim,
         |            row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rn FROM cand)
         |    WHERE rn <= ${FixedOverfetchFactor * K} AND label = 3) WHERE rn2 <= $K)
         |SELECT * FROM pre UNION ALL SELECT * FROM post
         |ORDER BY strategy, rk""".stripMargin,
    "q_ann_filtered_recall" ->
      s"""WITH ${AnnQueries.AsgCte},
         |$CandCte,
         |allv AS (
         |  SELECT n.vec_id, n.label,
         |    round(list_cosine_similarity(n.raw, (SELECT raw FROM nrm WHERE vec_id = 0)), 6) AS cos_sim
         |  FROM nrm n WHERE n.vec_id > 0),
         |${predBlock("narrow", "label = 3 AND vec_id < 100")},
         |${predBlock("wide", "label = 3")}
         |${Seq(armRow("narrow", "pre"), armRow("narrow", "post"),
                armRow("wide", "pre"), armRow("wide", "post"))
               .mkString("\nUNION ALL\n")}
         |ORDER BY pred, strategy""".stripMargin)
}
