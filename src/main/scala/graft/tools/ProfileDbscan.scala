package graft.tools

import graft.Tables
import graft.functions.VectorOps._
import graft.operators.clustering.Dbscan
import org.apache.spark.sql.functions._

/** Scratch profiler for the DBSCAN pipeline stages. */
object ProfileDbscan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.build("32")
    spark.sparkContext.setLogLevel("WARN")

    import Prof.time

    val pts = Tables.embeddings(spark, sfDir)
    pts.write.format("noop").mode("overwrite").save()

    val a = pts.select(col("vec_id").as("i"), col("embedding").as("va"))
    val b = pts.select(col("vec_id").as("j"), col("embedding").as("vb"))
    val pairs = a.join(b, col("i") =!= col("j"))
      .filter(euclidean_dist(col("va"), col("vb")) <= 1.26)
      .select(col("i"), col("j"))
    time("eps-pairs (noop)") { pairs.write.format("noop").mode("overwrite").save() }
    time("eps-pairs again") { pairs.write.format("noop").mode("overwrite").save() }
    // stage-by-stage replica of Dbscan.run
    val pc = pairs.cache()
    val counts = pc.groupBy(col("i")).agg((count(lit(1)) + 1).as("n_nb"))
    val core = counts.filter(col("n_nb") >= 4).select(col("i")).cache()
    val coreEdges = pc
      .join(core.select(col("i")), Seq("i"))
      .join(core.select(col("i").as("j")), Seq("j"))
    time("coreEdges count") { println("  edges=" + coreEdges.count()) }
    val cc = time("dataframe CC") {
      graft.operators.clustering.ConnectedComponents.run(coreEdges, "i", "j")
    }
    time("cc count") { println("  verts=" + cc.count()) }
    time("full dbscan run") {
      Dbscan.run(pts, "vec_id", "embedding", 1.26, 4)
        .write.format("noop").mode("overwrite").save()
    }
    time("full dbscan again") {
      Dbscan.run(pts, "vec_id", "embedding", 1.26, 4)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
