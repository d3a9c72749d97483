package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiler for q_graph_serve_stream (r10 verdict item 8):
  * isolate stream machinery (trigger scheduling, checkpoint commits,
  * sink appends) from the per-batch beam compute by timing
  *  (a) the 2-trigger staging (maxFilesPerTrigger=1, 2 input files),
  *  (b) the single-micro-batch staging (same stream, one trigger),
  *  (c) the pure batch beam serve of the same query sample.
  * (b) − (c) = fixed stream overhead; (a) − (b) = the marginal trigger.
  * Run: sbt "runMain graft.tools.ProfileServeStream /root/testdata/sf0.1"
  */
object ProfileServeStream {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.search.GraphServeStream
    // warm the memoized artifact/adjacency/query frames so reps time the
    // serve, not the build
    Prof.time("warm (artifact + first serve)") {
      GraphServeStream.serveStream(spark, dir, onePerTrigger = true).count()
    }
    (1 to 3).foreach { i =>
      Prof.time(s"(a) stream 2 triggers   #$i") {
        GraphServeStream.serveStream(spark, dir, onePerTrigger = true).count()
      }
      Prof.time(s"(b) stream 1 trigger    #$i") {
        GraphServeStream.serveStream(spark, dir, onePerTrigger = false).count()
      }
      Prof.time(s"(c) batch beam serve    #$i") {
        GraphServeStream.batchServe(spark, dir).count()
      }
      // (d) entry descent alone — (c) − (d) attributes the batch kernel
      // to base beam rounds vs entry ranking (r12 verdict item 8: the
      // hierarchy cut the entry share; this measures what remains)
      Prof.time(s"(d) entry descent only  #$i") {
        val emb = graft.operators.search.KnnGraph.e(spark, dir)
        val qs = graft.operators.search.GraphServe.qsFor(spark, dir)
        graft.operators.search.GraphServe
          .descend(spark, dir, qs, emb, trace = false)._1.count()
      }
    }
    spark.stop()
  }
}
