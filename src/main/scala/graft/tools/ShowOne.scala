package graft.tools

import graft.SparkEntry

/** Print the collected result of the named queries (scratch tool:
  * `SPARK_GRAFT_SF_DIR=… sbt "runMain graft.tools.ShowOne q_a q_b"`). */
object ShowOne {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      println(s"==== $name @ $dir ====")
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).show(200, truncate = false)
      println(f"[${(System.nanoTime() - t0) / 1e9}%.1f s]")
    }
    spark.stop()
  }
}
