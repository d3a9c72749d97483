package graft.tools

import graft.GraftSession

/** Scratch profiler for q_stream_neardup (the suite's heaviest query):
  * runs it repeatedly with GRAFT_PROFILE=1 so the per-stage foreachBatch
  * timings (sketch+probe / candidates / verify+sink / band-store /
  * set-store) land on stderr alongside the end-to-end time. */
object ProfileNearDup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    (1 to reps).foreach { r =>
      Prof.time(s"q_stream_neardup rep$r") {
        graft.operators.dedup.StreamNearDup.qStreamNeardup(spark, dir).count()
      }
    }
    spark.stop()
  }
}
