package graft.tools

import graft.GraftSession

/** Pre-build the persistent graph-index artifact for one or more corpus
  * dirs (graft.operators.search.GraphIndex.finalGraph): the NN-descent
  * build is paid HERE, at write time, so a subsequent serve session
  * (bench sweep, verify, production queries) starts from a bucketed
  * scan instead of a multi-minute build — the IvfIndex "bulk index
  * build" discipline applied to the graph family.
  *
  * Usage: runMain graft.tools.BuildGraphIndex <sfDir> [<sfDir> ...]
  */
object BuildGraphIndex {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BuildGraphIndex <sfDir> [<sfDir> ...]")
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), periodicGC = "2min")
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val t0 = System.nanoTime()
      val n = graft.operators.search.GraphIndex.finalGraph(spark, dir).count()
      println(f"[graph-index] $dir: $n edges ready in " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s at " +
        graft.operators.search.GraphIndex.artifactPath(dir))
    }
    spark.stop()
  }
}
