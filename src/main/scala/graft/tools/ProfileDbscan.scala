package graft.tools

import graft.Tables
import graft.operators.clustering.{ConnectedComponents, Dbscan}
import org.apache.spark.sql.functions._

/** The one DBSCAN stage profiler (consolidates the former ProfileDbscan /
  * ProfileDbscan2 / ProfileDbscan3 scratch mains): epsPairs, the
  * counts/core/CC/border internals of Dbscan.label, and the full
  * run + sweep shapes at the bench operating point. */
object ProfileDbscan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.build("32")
    spark.sparkContext.setLogLevel("WARN")

    import Prof.time

    val pts = Tables.embeddings(spark, sfDir)
    pts.write.format("noop").mode("overwrite").save()

    val pairs = Dbscan.epsPairs(pts, "vec_id", "embedding", 1.26)
      .select(col("i"), col("j")).cache()
    time("pairs materialize") { println("  pairs=" + pairs.count()) }

    val counts = pairs.groupBy(col("i")).agg((count(lit(1)) + 1).as("n_nb"))
    val core = counts.filter(col("n_nb") >= 4).select(col("i")).cache()
    time("core materialize") { println("  core=" + core.count()) }

    val coreEdges = pairs
      .join(core.select(col("i")), Seq("i"))
      .join(core.select(col("i").as("j")), Seq("j"))
    time("coreEdges count") { println("  edges=" + coreEdges.count()) }

    val cc = time("CC.run (plan)") {
      ConnectedComponents.run(coreEdges, "i", "j", maxRounds = 20)
    }
    time("CC materialize") { println("  verts=" + cc.count()) }

    val labels = core.join(
        cc.select(col("id").as("i"), col("component").as("cl")), Seq("i"), "left")
      .select(col("i"), coalesce(col("cl"), col("i")).as("cl")).cache()
    time("labels materialize") { println("  labels=" + labels.count()) }

    val borderLabels = pairs
      .join(labels.select(col("i").as("j"), col("cl")), Seq("j"))
      .groupBy(col("i")).agg(min(col("cl")).as("border_cl"))
    val out = pts.select(col("vec_id").as("i"))
      .join(labels.withColumnRenamed("cl", "core_cl"), Seq("i"), "left")
      .join(borderLabels, Seq("i"), "left")
      .select(col("i"),
        coalesce(col("core_cl"), col("border_cl"), lit(-1L)).as("cluster"),
        col("core_cl").isNotNull.as("is_core"))
      .groupBy(col("cluster"), col("is_core")).agg(count(lit(1)).as("n"))
    time("border+final agg") {
      out.write.format("noop").mode("overwrite").save()
    }

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

