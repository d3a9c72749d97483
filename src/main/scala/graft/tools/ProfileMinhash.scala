package graft.tools

import graft.{GraftExtensions, Tables}
import graft.operators.dedup.MinHashLsh
import org.apache.spark.sql.SparkSession

/** Scratch profiler: times each stage of the MinHash near-dup pipeline. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.build("32")
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = MinHashLsh.withPlantedDups(Tables.documents(spark, sfDir))
    docs.write.format("noop").mode("overwrite").save() // warm scan

    val hashed = MinHashLsh.shingleHashes(docs)
    time("shingleHashes (noop)") {
      hashed.write.format("noop").mode("overwrite").save()
    }
    time("signatureSketches (noop)") {
      MinHashLsh.signatureSketches(hashed).write.format("noop").mode("overwrite").save()
    }
    time("full nearDupPairs (noop)") {
      MinHashLsh.nearDupPairs(docs, 0.5).write.format("noop").mode("overwrite").save()
    }
    time("full again (warm)") {
      MinHashLsh.nearDupPairs(docs, 0.5).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
