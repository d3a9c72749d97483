package graft.tools

import graft.Tables
import graft.operators.clustering.Dbscan
import org.apache.spark.sql.functions._

/** Stage profiler for the pivot-band DBSCAN pipeline (epsPairs / label /
  * sweep) at the bench operating point. */
object ProfileDbscan2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.build("32")
    spark.sparkContext.setLogLevel("WARN")

    import Prof.time

    val pts = Tables.embeddings(spark, sfDir)
    pts.write.format("noop").mode("overwrite").save()

    val pairs = Dbscan.epsPairs(pts, "vec_id", "embedding", 1.26)
    time("epsPairs noop (cold)") {
      pairs.write.format("noop").mode("overwrite").save()
    }
    time("epsPairs noop (warm)") {
      pairs.write.format("noop").mode("overwrite").save()
    }
    time("epsPairs count") { println("  pairs=" + pairs.count()) }

    time("full run q_dbscan shape") {
      Dbscan.run(pts, "vec_id", "embedding", 1.26, 4)
        .groupBy(col("cluster"), col("is_core")).agg(count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    time("sweep (2 eps)") {
      Dbscan.sweep(pts, "vec_id", "embedding", Seq(1.20, 1.26), 4)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
