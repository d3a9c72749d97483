package graft.operators.search

import graft.QueryModule
import graft.functions.VectorOps._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** QUANTIZED graph serve — SQ8 beam scoring with exact rerank over the
  * persistent [[GraphIndex]]: the HNSW+scalar-quantization composition
  * production systems actually ship (Azure AI Search and Lucene pair
  * their HNSW-class graphs with int8-compressed vectors; the thesis
  * studies exactly this storage/recall trade). At 10^11 vectors the
  * beam walk reads the 4×-smaller SQ8 codes; only the FINAL beam (≤
  * beam·|queries| rows) touches full-precision floats for the rerank —
  * compress-then-refine, the [[ProductQuantization]] serving discipline
  * applied to the graph path.
  *
  * Three graded arms over the same graph, entries, query sample, and
  * exact truth as [[GraphServe]]:
  *  - '''float_beam''': the standard full-precision serve (reference).
  *  - '''sq_beam''': beams scored against DEQUANTIZED SQ8 vectors
  *    (queries stay full precision — the served-system convention);
  *    ranked by quantized sims, graded raw.
  *  - '''sq_rerank''': the sq_beam's final beam re-scored with exact
  *    floats, then cut to top-k — what the 4× storage cut costs AFTER
  *    refinement (usually ≈ nothing, which is the point).
  *
  * Deterministic: the SQ8 fit is exact per-dimension min/max, codes are
  * floor(x+0.5) ([[Quantization]]'s engine-identical rounding), so all
  * three arms replay hash-exact in DuckDB on the shared serve chain.
  */
object GraphSqServe extends QueryModule {

  val K = GraphServe.K

  /** Heavy frames per corpus: the three arms' top-K and the truth. */
  private val memo = new graft.BoundedMemo[String,
    (Long, Seq[(String, DataFrame)], DataFrame)](KnnGraph.MemoCap)

  private def topQK(df: DataFrame): DataFrame =
    graft.plans.TopKPerGroup(
      df.withColumn("neg_sim", -col("sim")), Seq("q"), Seq("neg_sim", "j"), K)
      .select(col("q"), col("j"))

  private def armsFor(spark: SparkSession, dir: String): (Long, Seq[(String, DataFrame)], DataFrame) =
    memo.getOrElseUpdate(dir) {
      val emb = KnnGraph.e(spark, dir)
      val n = emb.count()
      val (mins, maxs) = Quantization.fitMinMax(emb, "embedding")
      val dqEmb = emb.select(col("vec_id"),
        Quantization.dequantize(
          Quantization.quantize(col("embedding"), mins, maxs), mins, maxs)
          .as("embedding"))
      val undAdj = GraphIndex.und(GraphIndex.finalGraph(spark, dir))
        .localCheckpoint(true)
      val qs = GraphServe.qsFor(spark, dir)
      // the hierarchy's layer structures are float-built (they are part
      // of the index); the SQ arm SCORES its descent and beam against
      // the dequantized vectors — the served-system convention
      val (sqSeed, _) = GraphServe.descend(spark, dir, qs, dqEmb, trace = false)
      val sqBeam = GraphIndex.beamSearchFrom(sqSeed, qs, undAdj, dqEmb,
        GraphServe.Beam, GraphServe.Rounds)
      val sqTop = sqBeam.filter(col("rk") <= K)
        .select(col("q"), col("j")).localCheckpoint(true)
      // exact rerank of the final sq beam: full-precision rescoring of
      // ≤ beam rows per query — the only stage that reads float vectors
      val rerankTop = topQK(
        sqBeam.select(col("q"), col("j"))
          .join(emb.select(col("vec_id").as("j"), col("embedding").as("nv")), Seq("j"))
          .join(broadcast(qs), Seq("q"))
          .select(col("q"), col("j"),
            round(cosine_sim(col("qv"), col("nv")), 6).as("sim")))
        .localCheckpoint(true)
      val floatTop = topQK(
        GraphServe.beamRounds(spark, dir).beams.last
          .select(col("q"), col("node").as("j"), col("sim")))
        .localCheckpoint(true)
      val exact = GraphServe.exactFor(spark, dir)
        .select(col("q"), col("node").as("j")).localCheckpoint(true)
      val nEval = qs.count()
      (nEval,
        Seq(("float_beam", floatTop), ("sq_beam", sqTop), ("sq_rerank", rerankTop)),
        exact)
    }

  /** Per-arm recall@K — grading rebuilt per call (bench honesty). */
  def qGraphSqServe(spark: SparkSession, dir: String): DataFrame = {
    val (nEval, arms, exact) = armsFor(spark, dir)
    arms.zipWithIndex.map { case ((name, top), ord) =>
      top.join(exact, Seq("q", "j"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(ord).as("arm_ord"), lit(name).as("arm"),
          lit(nEval).as("n_eval"),
          round(col("n_hits").cast("double") / lit(nEval * K), 6).as("recall"))
    }.reduce(_.unionByName(_)).orderBy("arm_ord")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_graph_sq_serve" -> (qGraphSqServe _))

  private def topKCte(name: String, src: String): String =
    s"""$name AS (SELECT q, node FROM (
       |    SELECT q, node, row_number() OVER (PARTITION BY q ORDER BY sim DESC, node) AS rn
       |    FROM $src) WHERE rn <= $K)""".stripMargin

  private def armRow(ord: Int, name: String, top: String): String =
    s"""SELECT $ord AS arm_ord, '$name' AS arm,
       |  (SELECT n_eval FROM nev) AS n_eval,
       |  round(CAST((SELECT count(*) FROM $top t
       |              JOIN exact ON exact.q = t.q AND exact.node = t.node) AS DOUBLE)
       |        / ((SELECT n_eval FROM nev) * $K), 6) AS recall""".stripMargin

  override def oracles: Map[String, String] = Map(
    "q_graph_sq_serve" ->
      s"""WITH ${GraphServe.servePrelude},
         |${GraphServe.descentCtes("")},
         |${GraphServe.seedCutCte(GraphServe.Beam, "")},
         |${(1 to GraphServe.Rounds).map(GraphServe.serveCtes(_, GraphServe.Beam, "")).mkString(",\n")},
         |${topKCte("ftop", s"b${GraphServe.Rounds}")},
         |ex2 AS (
         |  SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS x,
         |    generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS ord
         |  FROM embeddings),
         |dims AS (
         |  SELECT ord, min(x) AS mn, greatest(max(x) - min(x), 1e-30) AS rg
         |  FROM ex2 GROUP BY ord),
         |dqv AS MATERIALIZED (
         |  SELECT e2.vec_id,
         |    list(d.mn + floor((e2.x - d.mn) / d.rg * 255 + 0.5) * d.rg / 255 ORDER BY e2.ord) AS dq
         |  FROM ex2 e2 JOIN dims d USING (ord) GROUP BY e2.vec_id),
         |-- the SQ arm's descent: same layer structures (float-built),
         |-- every SCORE against the dequantized vectors
         |esq2 AS (SELECT qs.q, ent2.node, round(list_cosine_similarity(qs.qv, dqv.dq), 6) AS sim
         |  FROM qs CROSS JOIN ent2 JOIN dqv ON dqv.vec_id = ent2.node
         |  WHERE ent2.node <> qs.q),
         |${GraphServe.entryFullCtes("esqb", "dqv", "vec_id", "dq")},
         |${GraphServe.descentCtes("sq", "esq2", "dqv", "vec_id", "dq")},
         |${GraphServe.seedCutCte(GraphServe.Beam, "sq", "sq", "esqb")},
         |${(1 to GraphServe.Rounds).map(GraphServe.serveCtes(_, GraphServe.Beam, "sq", "dqv", "vec_id", "dq")).mkString(",\n")},
         |${topKCte("sqtop", s"bsq${GraphServe.Rounds}")},
         |rr AS (SELECT b.q, b.node, round(list_cosine_similarity(qs.qv, e.v), 6) AS sim
         |  FROM bsq${GraphServe.Rounds} b JOIN e ON e.id = b.node JOIN qs ON qs.q = b.q),
         |${topKCte("rrtop", "rr")}
         |${armRow(0, "float_beam", "ftop")}
         |UNION ALL
         |${armRow(1, "sq_beam", "sqtop")}
         |UNION ALL
         |${armRow(2, "sq_rerank", "rrtop")}
         |ORDER BY arm_ord""".stripMargin)
}
