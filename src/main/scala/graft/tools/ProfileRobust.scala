package graft.tools

import graft.Tables
import graft.functions.MahalanobisSq
import graft.operators.analytics.Mahalanobis
import org.apache.spark.sql.functions._

/** Scratch profiler for the robust-covariance C-step loop. */
object ProfileRobust {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.build("32")
    spark.sparkContext.setLogLevel("WARN")

    import Prof.time

    val e = Tables.embeddings(spark, sfDir)
    e.write.format("noop").mode("overwrite").save()

    val (mu0, inv0) = time("classical fitInverse") {
      Mahalanobis.fitInverse(e, "embedding")
    }
    // one scoring+percentile pass in isolation
    val pts = e.select(col("embedding").cast("array<float>").as("v")).cache()
    pts.write.format("noop").mode("overwrite").save()
    val scored = pts.select(col("v"),
      MahalanobisSq(col("v"), mu0.toIndexedSeq,
        inv0.map(_.toIndexedSeq).toIndexedSeq).as("m2"))
    time("score+percentile (1 step)") {
      scored.agg(percentile_approx(col("m2"), lit(0.5), lit(100000))).head()
    }
    time("score+percentile again") {
      scored.agg(percentile_approx(col("m2"), lit(0.5), lit(100000))).head()
    }

    val (mu, inv) = time("fitRobust total") {
      Mahalanobis.fitRobust(e, "embedding")
    }
    println("  mu0=" + mu(0) + " inv00=" + inv(0)(0))
    time("final scoring query") {
      Mahalanobis.qMahalanobisRobust(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
