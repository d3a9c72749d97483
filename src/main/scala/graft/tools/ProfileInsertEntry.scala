package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiler for the v8 insert-path entry hierarchy: measures the
  * entry phase of [[graft.operators.search.GraphIndex.appendedGraph]]
  * (the insertion beams' seed) in BOTH branches over the drill's
  * 80/20 split —
  *  (a) brute: every new vector scored against the whole √n layer
  *      (the v7 path, what below-bar artifacts still run);
  *  (b) walk: layer-2 brute + L1Rounds beam rounds over the layer-1
  *      subgraph (what a materialized artifact runs).
  * Prints per-branch scored-row counts (total and per inserted vector)
  * and wall times, plus the one-time layer-subgraph build cost the walk
  * amortizes. Run:
  *   sbt "runMain graft.tools.ProfileInsertEntry /tmp/graft/sf10"
  */
object ProfileInsertEntry {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.search.{GraphIndex, GraphServe, KnnGraph}
    val emb = KnnGraph.e(spark, dir)
    val oldEmb = emb.filter(col("vec_id") % GraphIndex.AppendMod =!= GraphIndex.NewResidue)
      .localCheckpoint(true)
    val newEmb = emb.filter(col("vec_id") % GraphIndex.AppendMod === GraphIndex.NewResidue)
      .localCheckpoint(true)
    val nOld = oldEmb.count()
    val cntB = newEmb.count()
    val se1 = GraphServe.upperModulus(nOld)
    val m1 = oldEmb.filter(GraphServe.entryPick(col("vec_id"), se1)).localCheckpoint(true)
    val n1 = m1.count()
    val se2 = se1 * GraphServe.upperModulus(n1)
    println(s"[insert-entry] nOld=$nOld batch=$cntB layer1=$n1 se1=$se1 se2=$se2 " +
      s"bar=${GraphServe.L1BruteBar} branch=${if (n1 > GraphServe.L1BruteBar) "walk" else "brute"}")
    val qs = newEmb.select(col("vec_id").as("q"), col("embedding").as("qv"))

    val und1 = Prof.time("layer-1 subgraph build (one-time, amortized)") {
      GraphIndex.und(GraphServe.l1OutEdges(m1, m1, n1, KnnGraph.dimOf(m1)))
        .localCheckpoint(true)
    }
    def run(label: String, layer: GraphIndex.LayerState): Unit = (1 to 3).foreach { i =>
      Prof.time(s"$label #$i") {
        val seed = GraphIndex.insertSeed(qs, layer)
        seed.count()
      }
    }
    // scored-row accounting via the traced kernel (count of every scored
    // frame = the entry phase's work, the q_graph_serve n_scored rule)
    def scored(layer: GraphIndex.LayerState): Long = {
      val (_, frames) = layer.und1 match {
        case None => GraphIndex.beamKernel(qs, layer.m1,
          layer.m1.select(col("vec_id").as("j")), GraphServe.Beam, 0,
          identity, trace = true)
        case Some(u1) => GraphIndex.beamKernel(qs, layer.m1,
          layer.m1.filter(GraphServe.entryPick(col("vec_id"), layer.se2))
            .select(col("vec_id").as("j")),
          GraphServe.Beam, GraphServe.L1Rounds, GraphIndex.hop1Gen(u1), trace = true)
      }
      frames.map(_.count()).sum
    }
    val brute = GraphIndex.LayerState(m1, se2, None)
    val walk = GraphIndex.LayerState(m1, se2, Some(und1))
    val sB = scored(brute)
    val sW = scored(walk)
    println(f"[insert-entry] scored: brute=$sB%d (${sB.toDouble / cntB}%.1f/vector) " +
      f"walk=$sW%d (${sW.toDouble / cntB}%.1f/vector)")
    run("(a) brute entry seed", brute)
    run("(b) walk entry seed ", walk)
    spark.stop()
  }
}
