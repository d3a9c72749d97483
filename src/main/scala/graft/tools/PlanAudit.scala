package graft.tools

import graft.SparkEntry

/** Prints which queries' physical plans contain nested-loop or cartesian
  * joins (scale-audit scratch tool). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.GraftSession.build("8")
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val bnlj = plan.contains("BroadcastNestedLoopJoin")
        val cart = plan.contains("CartesianProduct")
        if (bnlj || cart)
          println(s"[planaudit] $name bnlj=$bnlj cartesian=$cart")
      } catch {
        case e: Throwable => println(s"[planaudit] $name ERROR ${e.getMessage}")
      }
    }
    println("[planaudit] done")
    spark.stop()
  }
}
