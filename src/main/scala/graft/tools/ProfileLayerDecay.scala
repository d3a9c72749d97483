package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Layer-staleness decay drill (r13 verdict #2): K successive appends
  * into a walk-branch artifact with NO optimize between them, measuring
  * after every step
  *
  *  - `corpus_share` — appended rows / live corpus (what the
  *    [[graft.operators.search.GraphDriftOptimize.ShareBar]] monitor
  *    gates on),
  *  - `layer_share` — appended-era members / layer-1 members (the
  *    staleness population the monitor does NOT directly see: existing
  *    members' l1edges lists are never re-ranked on append),
  *  - `seed_recall` — the insert/serve ENTRY quality in isolation:
  *    [[graft.operators.search.GraphIndex.insertSeed]] over the live
  *    persisted hierarchy, graded against the exact member-restricted
  *    top-Beam (the best any entry could do), so ONLY l1edges staleness
  *    can degrade it,
  *  - `graph_recall` — artifact edge lists vs exact top-K over the
  *    current corpus (the q_graph_append grading),
  *
  * then one optimize pass and the same metrics again (`healed` row) —
  * the layer heals to the exact member subgraph (GraphLayerSpec law),
  * so healed-vs-decayed bounds what staleness cost.
  *
  * The dominance question this answers (SURVEY records the curve): the
  * layer members are a pinned hash stride of the id population, so
  * appended members arrive in the layer at the SAME rate the corpus
  * grows — `layer_share` tracks `corpus_share` — and the corpus-share
  * bar fires before layer staleness accumulates past it. If the curve
  * ever showed seed_recall collapsing while corpus_share sat under the
  * bar, a separate layer trigger would be needed; measure, don't guess.
  *
  * Usage: runMain graft.tools.ProfileLayerDecay <sfDir> [steps=4]
  */
object ProfileLayerDecay {
  import graft.operators.search.{GraphIndex, GraphServe, KnnGraph}
  import graft.functions.VectorOps.cosine_sim

  private val Mod = 10L

  /** Exact top-`k` of `ev` (i, emb_i) against `pool` (vec_id, embedding),
    * self excluded — the [[GraphIndex.exactTopK]] kernel with a caller
    * k (that one is fixed at Degree and package-private to search). */
  private def exactTopK(pool: DataFrame, ev: DataFrame, k: Int): DataFrame =
    graft.plans.TopKPerGroup(
      pool.select(col("vec_id").as("j"), col("embedding").as("emb_j"))
        .crossJoin(broadcast(ev))
        .filter(col("i") =!= col("j"))
        .select(col("i"), col("j"),
          round(cosine_sim(col("emb_i"), col("emb_j")), 6).as("sim"))
        .withColumn("neg_sim", -col("sim")), Seq("i"), Seq("neg_sim", "j"), k)
      .select(col("i"), col("j"))

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val steps = if (args.length > 1) args(1).toInt else 4
    require(steps >= 1 && steps < Mod, s"steps must be in [1, ${Mod - 1})")
    val spark = graft.GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "2min")
    spark.sparkContext.setLogLevel("WARN")

    val emb = KnnGraph.e(spark, dir)
    val buildBar = Mod - steps // residues [0, buildBar) build the artifact
    val prefix = emb.filter(pmod(col("vec_id"), lit(Mod)) < lit(buildBar))
      .localCheckpoint(true)
    val nB = prefix.count()
    val gOld = KnnGraph.nnDescentRounds(prefix, s"$dir#decay$buildBar",
      GraphIndex.Degree, KnnGraph.Rounds).last
    val idx = java.nio.file.Files.createTempDirectory("graft_layer_decay").toString
    Prof.time(s"build (n=$nB)") { GraphIndex.build(spark, idx, gOld, prefix) }
    val meta0 = spark.read.parquet(s"$idx/meta").head()
    val se2 = meta0.getAs[Long]("layer_se2")
    if (!new java.io.File(s"$idx/l1edges").exists()) {
      // prefix sits below the brute bar (the bar is on the BUILD corpus)
      // — force the walk branch through the explicit maintenance API,
      // the GraphLayerSpec discipline: append() maintains l1edges from
      // then on (presence, not the bar, drives maintenance)
      println(s"[decay] build below brute bar " +
        s"(n1_build=${meta0.getAs[Long]("n1_build")}) — forcing the walk " +
        "layer via materializeLayer")
      GraphIndex.materializeLayer(spark, idx)
    }

    // fixed eval queries: a coprime stride of the BUILD prefix, present
    // in the corpus from step 0 so every step grades the same queries
    val ev = prefix.filter(col("vec_id") % 7 === 3)
      .select(col("vec_id").as("i"), col("embedding").as("emb_i"))
      .localCheckpoint(true)
    val nEv = ev.count()
    val qs = ev.select(col("i").as("q"), col("emb_i").as("qv"))
      .localCheckpoint(true)
    val Beam = GraphServe.Beam
    val K = GraphIndex.K

    def measure(label: String, corpus: DataFrame, appendedRes: Seq[Long]): Unit = {
      val n = corpus.count()
      val nApp = if (appendedRes.isEmpty) 0L
        else corpus.filter(pmod(col("vec_id"), lit(Mod))
          .isin(appendedRes.map(Long.box): _*)).count()
      val m1 = spark.read.parquet(s"$idx/l1nodes")
        .select(col("id").as("vec_id"), col("embedding")).localCheckpoint(true)
      val n1 = m1.count()
      val n1App = if (appendedRes.isEmpty) 0L
        else m1.filter(pmod(col("vec_id"), lit(Mod))
          .isin(appendedRes.map(Long.box): _*)).count()
      val le = spark.read.parquet(s"$idx/l1edges")
        .select(col("i"), col("j"), col("sim"))
      val layer = GraphIndex.LayerState(m1, se2, Some(GraphIndex.und(le)))
      val seed = GraphIndex.insertSeed(qs, layer)
        .select(col("q").as("i"), col("j"))
      val exactMember = exactTopK(m1, ev, Beam).localCheckpoint(true)
      val seedHits = seed.join(exactMember, Seq("i", "j"), "left_semi").count()
      val g = GraphIndex.edges(spark, idx)
      val exactG = exactTopK(corpus, ev, K).localCheckpoint(true)
      val gHits = g.join(exactG, Seq("i", "j"), "left_semi").count()
      println(f"[decay] $label%-8s n=$n%7d corpus_share=${nApp.toDouble / n}%.4f " +
        f"n1=$n1%5d layer_share=${n1App.toDouble / math.max(1L, n1)}%.4f " +
        f"seed_recall=${seedHits.toDouble / (nEv * Beam)}%.4f " +
        f"graph_recall=${gHits.toDouble / (nEv * K)}%.4f")
    }

    measure("t0", prefix, Nil)
    var corpus = prefix
    val appended = scala.collection.mutable.ArrayBuffer.empty[Long]
    for (t <- 0 until steps) {
      val res = buildBar + t
      val batch = emb.filter(pmod(col("vec_id"), lit(Mod)) === lit(res))
        .localCheckpoint(true)
      Prof.time(s"append step ${t + 1} (residue $res)") {
        GraphIndex.append(spark, idx, corpus, batch)
      }
      corpus = corpus.unionByName(batch).localCheckpoint(true)
      appended += res
      measure(s"t${t + 1}", corpus, appended.toSeq)
    }
    Prof.time("optimize (heal)") {
      GraphIndex.optimize(spark, idx, corpus, rounds = 1)
    }
    measure("healed", corpus, appended.toSeq)
    spark.stop()
  }
}
