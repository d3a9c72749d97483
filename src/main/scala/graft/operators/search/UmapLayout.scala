package graft.operators.search

import graft.QueryModule
import graft.operators.sampling.SamplingQueries
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** UMAP's OPTIMIZATION phase on top of the spectral initialization —
  * the second half of what the reference's ~71 UMAP projections do
  * (nuevo-kmeans-pre.ipynb / silhouettes.ipynb): [[GraphEmbedding]]
  * delivers exactly UMAP's spectral init; this module runs the
  * attraction/repulsion layout refinement that produces the notebooks'
  * separated-cluster scatter plots.
  *
  * DETERMINISTIC BATCH variant of UMAP's SGD epoch (stochastic
  * per-edge updates are not oracle-able; this is):
  *  - per round, every symmetrized graph edge (i, j) contributes an
  *    ATTRACTION term to i: clip(−2/(1+d²) · Δ, ±[[Clip]]) — the
  *    published gradient with the Cauchy kernel at a = b = 1;
  *  - every node gets [[NegSamples]] REPULSION terms against
  *    hash-derived negatives (the LSH seeded-planes discipline: rank =
  *    multiplicative-hash(id·A + round·B + slot) mod n over the dense
  *    id-rank table — deterministic, replayable, fresh each round):
  *    clip(2/((ε+d²)(1+d²)) · Δ, ±[[Clip]]);
  *  - the node moves by α_r · (mean of its terms) — mean, not sum, so
  *    one move is bounded by α·[[Clip]] whatever the degree (the
  *    deterministic stand-in for SGD's interleaved per-sample steps);
  *    α decays linearly (UMAP's schedule).
  *
  * Cross-engine determinism: positions live in INTEGER micro-units
  * (the [[GraphEmbedding]] discipline — per-term scale-0 rounds of
  * straight-line double arithmetic, exact integer sums, one rounded
  * update per node per round), so the whole chain — spectral init ×
  * [[InitScale]] (UMAP's ~10-unit layout convention) + [[LayoutRounds]]
  * refinement rounds — replays token-for-token in DuckDB as unrolled
  * CTEs on top of the shared spectral chain.
  *
  * Scale shape: per round, attraction is one shuffle join of the edge
  * list with the position frame (the SpMV pattern), repulsion is
  * n·[[NegSamples]] hash-rank lookups against the rank table, and the
  * update is one groupBy(id) — all bounded, localCheckpointed per
  * round. The dense id-rank table is ONE global sort paid once per
  * corpus (row_number over id — at 10¹¹ nodes swap in a sortBy +
  * zipWithIndex rank build; the table itself is (id, rank) longs). */
object UmapLayout extends QueryModule {

  /** Refinement rounds (UMAP's n_epochs role; fixed — correctness does
    * not depend on convergence, both engines replay the same rounds). */
  val LayoutRounds = 10

  /** Repulsion samples per node per round (UMAP's negative_sample_rate
    * default territory). */
  val NegSamples = 5

  /** Spectral init (RMS 1) → UMAP's ~10-unit layout space. Integer
    * multiply on the micro-unit state — exact. */
  val InitScale = 10L

  /** Per-term gradient clip — UMAP's ±4. */
  val Clip = 4.0

  /** Repulsion denominator epsilon — UMAP's 0.001. */
  val RepEps = 0.001

  /** Negative-sampling hash mix constants (primes; composite stays
    * well inside int64 for any ScaleCorpus id). */
  val HashA = 1000003L
  val HashB = 7919L

  private val Mic = 1000000.0

  private def alpha(r: Int): Double = 1.0 - (r - 1).toDouble / LayoutRounds

  /** One refinement round in micro-units. `und` (i, j) symmetrized,
    * `ids` (id, rank) dense ranks, `y` (id, y1m, y2m). */
  private def layoutStep(und: DataFrame, ids: DataFrame, n: Long,
                         y: DataFrame, r: Int): DataFrame = {
    val yj = y.select(col("id").as("j"), col("y1m").as("z1"), col("y2m").as("z2"))
    def terms(pairs: DataFrame, attractive: Boolean): DataFrame = {
      val p = pairs.join(y, Seq("id")).join(yj, Seq("j"))
      val dx1 = (col("y1m") - col("z1")) / lit(Mic)
      val dx2 = (col("y2m") - col("z2")) / lit(Mic)
      val d2 = dx1 * dx1 + dx2 * dx2
      val coeff =
        if (attractive) lit(-2.0) / (lit(1.0) + d2)
        else lit(2.0) / ((lit(RepEps) + d2) * (lit(1.0) + d2))
      def t(dx: Column) =
        round(greatest(least(coeff * dx, lit(Clip)), lit(-Clip)) * lit(Mic))
          .cast("long")
      p.select(col("id"), t(dx1).as("t1m"), t(dx2).as("t2m"))
    }
    val att = terms(und.select(col("i").as("id"), col("j")), attractive = true)
    val negs = ids.select(col("id"),
        explode(array((1 to NegSamples).map(s => lit(s.toLong)): _*)).as("s"))
      .withColumn("nrank",
        SamplingQueries.prio(col("id") * lit(HashA) + lit(r.toLong) * lit(HashB)
          + col("s")) % lit(n))
      .join(ids.select(col("rank").as("nrank"), col("id").as("j")), Seq("nrank"))
      .filter(col("j") =!= col("id"))
      .select(col("id"), col("j"))
    val rep = terms(negs, attractive = false)
    val sums = att.unionByName(rep).groupBy("id")
      .agg(sum("t1m").as("s1"), sum("t2m").as("s2"), count(lit(1)).as("cnt"))
    val a = alpha(r)
    y.join(sums, Seq("id"), "left")
      .select(col("id"),
        (col("y1m") + coalesce(round(lit(a)
          * (col("s1").cast("double") / col("cnt").cast("double"))).cast("long"),
          lit(0L))).as("y1m"),
        (col("y2m") + coalesce(round(lit(a)
          * (col("s2").cast("double") / col("cnt").cast("double"))).cast("long"),
          lit(0L))).as("y2m"))
      .localCheckpoint(true) // truncate per-round lineage (SpMV discipline)
  }

  /** The refinement chain from an initial micro-unit layout — the
    * kernel the query and the planted-structure specs share. */
  private[search] def layoutChain(und: DataFrame, ids: DataFrame, n: Long,
                                  y0: DataFrame): DataFrame =
    (1 to LayoutRounds).foldLeft(y0)((y, r) => layoutStep(und, ids, n, y, r))

  /** Dense id→rank table (0-based, id order). One global sort, paid
    * once per corpus and memoized. */
  private[search] def ranksOf(emb: DataFrame): DataFrame =
    emb.select(col("vec_id").as("id"))
      .withColumn("rank", row_number().over(Window.orderBy("id")).cast("long") - 1)

  private val memo = new graft.BoundedMemo[String, DataFrame](KnnGraph.MemoCap)

  private[search] def corpusLayout(spark: SparkSession, dir: String): DataFrame =
    memo.getOrElseUpdate(dir) {
      val emb = KnnGraph.e(spark, dir)
      val n = emb.count()
      val und = GraphIndex.und(GraphIndex.finalGraph(spark, dir))
        .localCheckpoint(true)
      val ids = ranksOf(emb).localCheckpoint(true)
      val (e1, e2) = GraphEmbedding.corpusPair(spark, dir)
      val y0 = e1.select(col("id"), (col("xm") * lit(InitScale)).as("y1m"))
        .join(e2.select(col("id"), (col("xm") * lit(InitScale)).as("y2m")),
          Seq("id"))
        .localCheckpoint(true)
      layoutChain(und, ids, n, y0)
    }

  /** (vec_id, y1, y2): the refined 2D layout — what the notebooks
    * scatter-plot (micro-unit coordinates emitted as doubles). */
  def qUmapLayout(spark: SparkSession, dir: String): DataFrame =
    corpusLayout(spark, dir)
      .select(col("id").as("vec_id"),
        (col("y1m") / lit(Mic)).as("y1"), (col("y2m") / lit(Mic)).as("y2"))
      .orderBy("vec_id")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_umap_layout" -> (qUmapLayout _))

  // ---------------------------------------------------------------- oracle

  private def prioSql(expr: String): String =
    // ONE definition of the hash replay; the composite must be
    // parenthesized (SamplingQueries interpolates `$id % M` directly,
    // and % binds tighter than the composite's +)
    SamplingQueries.prioSql(s"($expr)")

  private def roundSql(r: Int): String = {
    val a = alpha(r)
    val prev = s"uy${r - 1}"
    s"""ua${r}d AS (SELECT u.i AS id,
       |    (a.y1m - b.y1m) / $Mic AS dx1, (a.y2m - b.y2m) / $Mic AS dx2
       |  FROM und u JOIN $prev a ON a.id = u.i JOIN $prev b ON b.id = u.j),
       |ua$r AS (SELECT id,
       |    CAST(round(greatest(least((-2.0 / (1.0 + dx1*dx1 + dx2*dx2)) * dx1, $Clip), -$Clip) * $Mic) AS BIGINT) AS t1m,
       |    CAST(round(greatest(least((-2.0 / (1.0 + dx1*dx1 + dx2*dx2)) * dx2, $Clip), -$Clip) * $Mic) AS BIGINT) AS t2m
       |  FROM ua${r}d),
       |un${r}p AS (SELECT i.id, i2.id AS j
       |  FROM (SELECT ids.id,
       |          ${prioSql(s"ids.id * $HashA + $r * $HashB + s.s")}
       |            % (SELECT n FROM prm) AS nrank
       |        FROM ids, (SELECT unnest(generate_series(1, $NegSamples)) AS s) s) i
       |  JOIN ids i2 ON i2.rank = i.nrank
       |  WHERE i2.id <> i.id),
       |un${r}d AS (SELECT p.id,
       |    (a.y1m - b.y1m) / $Mic AS dx1, (a.y2m - b.y2m) / $Mic AS dx2
       |  FROM un${r}p p JOIN $prev a ON a.id = p.id JOIN $prev b ON b.id = p.j),
       |un$r AS (SELECT id,
       |    CAST(round(greatest(least((2.0 / (($RepEps + dx1*dx1 + dx2*dx2) * (1.0 + dx1*dx1 + dx2*dx2))) * dx1, $Clip), -$Clip) * $Mic) AS BIGINT) AS t1m,
       |    CAST(round(greatest(least((2.0 / (($RepEps + dx1*dx1 + dx2*dx2) * (1.0 + dx1*dx1 + dx2*dx2))) * dx2, $Clip), -$Clip) * $Mic) AS BIGINT) AS t2m
       |  FROM un${r}d),
       |us$r AS (SELECT id, sum(t1m) AS s1, sum(t2m) AS s2, count(*) AS cnt
       |  FROM (SELECT * FROM ua$r UNION ALL SELECT * FROM un$r) GROUP BY id),
       |uy$r AS MATERIALIZED (SELECT y.id,
       |    y.y1m + COALESCE(CAST(round($a * (CAST(s.s1 AS DOUBLE) / CAST(s.cnt AS DOUBLE))) AS BIGINT), 0) AS y1m,
       |    y.y2m + COALESCE(CAST(round($a * (CAST(s.s2 AS DOUBLE) / CAST(s.cnt AS DOUBLE))) AS BIGINT), 0) AS y2m
       |  FROM $prev y LEFT JOIN us$r s USING (id))""".stripMargin
  }

  /** Full replay: descent graph → spectral chain (shared with
    * q_graph_embedding) → ×[[InitScale]] init → [[LayoutRounds]]
    * unrolled refinement rounds. */
  override def oracles: Map[String, String] = Map(
    "q_umap_layout" ->
      s"""WITH ${KnnGraph.graphCtePrefix},
         |${GraphEmbedding.spectralCtes},
         |ids AS MATERIALIZED (SELECT id, row_number() OVER (ORDER BY id) - 1 AS rank FROM e),
         |uy0 AS (SELECT e1.id, e1.xm * $InitScale AS y1m, e2.xm * $InitScale AS y2m
         |  FROM ec1 e1 JOIN ec2 e2 USING (id)),
         |${(1 to LayoutRounds).map(roundSql).mkString(",\n")}
         |SELECT id AS vec_id, y1m / $Mic AS y1, y2m / $Mic AS y2
         |FROM uy$LayoutRounds
         |ORDER BY vec_id""".stripMargin)
}
