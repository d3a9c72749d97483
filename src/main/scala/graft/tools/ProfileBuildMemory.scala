package graft.tools

import graft.GraftSession
import graft.operators.search.KnnGraph
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Memory attribution for the cold NN-descent build (SURVEY wave-5
  * follow-up: the sf10 probe needed a 64-96g local JVM and the heap
  * holder was never pinned). Runs the UN-memoized build
  * ([[KnnGraph.buildRounds]]) on a corpus and reports, per descent
  * round and in total:
  *
  *  - '''storage''': bytes pinned by localCheckpoint blocks (the round
  *    frames) — `sc.getRDDStorageInfo`, split memory vs disk;
  *  - '''execution''': Σ and max of per-task peak execution memory per
  *    stage (the shuffle/aggregation buffers), plus memory/disk spill
  *    — a [[SparkListener]] over stage task metrics;
  *  - '''shuffle''': bytes written per stage (the candidate-distinct
  *    shuffle is the known big one).
  *
  * In local[32] the driver JVM hosts all three plus block-transfer
  * overhead, so "driver heap" pressure = max concurrent execution +
  * live storage. Usage:
  *   `java -Xmx<heap> -cp ... graft.tools.ProfileBuildMemory <sfDir>`
  */
object ProfileBuildMemory {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft/sf10")
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), periodicGC = "2min")
    spark.sparkContext.setLogLevel("WARN")
    val maxHeap = Runtime.getRuntime.maxMemory() / (1 << 20)
    println(s"[mem] maxHeap=${maxHeap}MiB dir=$dir")

    // running totals from stage metrics
    val lock = new Object
    var sumPeakExec = 0L;
    var maxStagePeakExec = 0L
    var sumShuffleWrite = 0L; var sumSpillMem = 0L; var sumSpillDisk = 0L
    var maxSingleStage: (Long, String) = (0L, "")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) lock.synchronized {
          sumPeakExec += m.peakExecutionMemory
          if (m.peakExecutionMemory > maxStagePeakExec)
            maxStagePeakExec = m.peakExecutionMemory
          sumShuffleWrite += m.shuffleWriteMetrics.bytesWritten
          sumSpillMem += m.memoryBytesSpilled
          sumSpillDisk += m.diskBytesSpilled
          if (m.peakExecutionMemory > maxSingleStage._1)
            maxSingleStage = (m.peakExecutionMemory,
              sc.stageInfo.name.take(60))
        }
      }
    })

    def mib(b: Long): String = f"${b / 1048576.0}%.0f MiB"
    def storageReport(tag: String): Unit = {
      val infos = spark.sparkContext.getRDDStorageInfo
      val mem = infos.map(_.memSize).sum
      val disk = infos.map(_.diskSize).sum
      println(s"[mem] $tag: checkpoint blocks n=${infos.length} " +
        s"mem=${mib(mem)} disk=${mib(disk)}")
    }

    val emb = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    println(s"[mem] corpus n=$n dim=${KnnGraph.dimOf(emb)}")
    val t0 = System.nanoTime()
    val rounds = KnnGraph.buildRounds(emb, KnnGraph.Degree, KnnGraph.Rounds)
    val built = rounds.last.count()
    val secs = (System.nanoTime() - t0) / 1e9
    storageReport("post-build")
    lock.synchronized {
      println(f"[mem] build ${secs}%.1f s, ${built} edges; " +
        s"execPeak sum=${mib(sumPeakExec)} maxStage=${mib(maxStagePeakExec)} " +
        s"shuffleWrite=${mib(sumShuffleWrite)} " +
        s"spillMem=${mib(sumSpillMem)} spillDisk=${mib(sumSpillDisk)}")
      println(s"[mem] biggest stage: ${mib(maxSingleStage._1)} peak exec in '${maxSingleStage._2}'")
      println(f"[mem] per-node: storage=${spark.sparkContext.getRDDStorageInfo.map(i => i.memSize + i.diskSize).sum / n}%d B/node")
    }
    spark.stop()
  }
}
