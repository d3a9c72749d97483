package graft.tools

import graft.SparkEntry

/** Print the formatted physical plan of the named queries (scratch tool:
  * `SPARK_GRAFT_SF_DIR=… sbt "runMain graft.tools.ExplainOne q_a q_b"`). */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.GraftSession.build("8")
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      println(s"==== $name ====")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
