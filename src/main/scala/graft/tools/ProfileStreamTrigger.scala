package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Micro-batch TRIGGER-overhead A/B (r13 verdict #5): the streaming
  * family costs ~21 s of the sf0.1 sweep and prior A/Bs attributed
  * ~2-3 s per extra trigger — this tool isolates WHERE a trigger's
  * seconds go by running the same staged source through
  *
  *  - a STATELESS passthrough (projection → memory sink), and
  *  - a STATEFUL aggregation (groupBy count, the state-store path),
  *
  * each under (a) maxFilesPerTrigger=1 (K triggers) and (b) no cap
  * (ONE trigger over the same files — the Trigger.AvailableNow-style
  * catch-up shape). Then:
  *
  *   machinery/trigger = (stateless_K − stateless_1) / (K − 1)
  *   stateful/trigger  = (stateful_K  − stateful_1)  / (K − 1)
  *
  * If the two are close, the per-trigger cost is micro-batch PLANNING +
  * sink/offset-log COMMIT (a harness floor no operator change can cut —
  * production amortizes it by processing more data per trigger); a gap
  * attributes the difference to state-store work. reps × median per the
  * bench protocol; run ISOLATED.
  *
  * Usage: runMain graft.tools.ProfileStreamTrigger <sfDir> [K=8] [reps=3]
  */
object ProfileStreamTrigger {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = if (args.length > 1) args(1).toInt else 8
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = graft.GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")

    // stage K files of events (event_id stride), mtime-ordered
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val stage = java.nio.file.Files.createTempDirectory("graft_trigprof")
    graft.Fs.deleteAtExit(stage)
    graft.Fs.stageParts(stage,
      (0L until k).map(r => ev.filter(pmod(col("event_id"), lit(k.toLong)) === r)))
    val schema = spark.read.parquet(stage.toString).schema
    // JIT/codegen warmup on both plan shapes
    runOnce(spark, stage.toString, schema, stateful = false, cap = false)
    runOnce(spark, stage.toString, schema, stateful = true, cap = false)

    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    def arm(stateful: Boolean, cap: Boolean): Double = med((1 to reps).map { _ =>
      val t0 = System.nanoTime()
      runOnce(spark, stage.toString, schema, stateful, cap)
      (System.nanoTime() - t0) / 1e9
    })
    val sl1 = arm(stateful = false, cap = false)
    val slK = arm(stateful = false, cap = true)
    val st1 = arm(stateful = true, cap = false)
    val stK = arm(stateful = true, cap = true)
    val mach = (slK - sl1) / (k - 1)
    val stat = (stK - st1) / (k - 1)
    println(f"[trigprof] K=$k reps=$reps stateless: 1-trigger $sl1%.3f s, K-trigger $slK%.3f s")
    println(f"[trigprof] stateful : 1-trigger $st1%.3f s, K-trigger $stK%.3f s")
    println(f"[trigprof] machinery/trigger = $mach%.3f s; stateful/trigger = $stat%.3f s; state-store share = ${stat - mach}%.3f s")
    spark.stop()
  }

  private def runOnce(spark: SparkSession, stage: String,
                      schema: org.apache.spark.sql.types.StructType,
                      stateful: Boolean, cap: Boolean): Unit = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val reader = spark.readStream.schema(schema)
      val src = (if (cap) reader.option("maxFilesPerTrigger", "1") else reader)
        .parquet(stage)
      val frame: DataFrame =
        if (stateful)
          src.groupBy(col("event_type"))
            .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
        else src.select(col("event_id"), col("user_id"), col("value"))
      val name = s"trigprof_${stateful}_$cap${System.nanoTime()}"
      val q = frame.writeStream
        .outputMode(if (stateful) OutputMode.Complete() else OutputMode.Append())
        .format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
      spark.catalog.dropTempView(name)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
