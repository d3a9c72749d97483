package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Leg fingerprint (round-16, codifying the same-run pairing rule that
  * produced the r14 campaign's false-red kmeans compares): every Verify
  * JVM stamps a unique leg id (JVM run id + corpus fingerprint) into a
  * `_LEG` file beside each query's parquet AND into `oracle_leg.json`
  * next to oracle_sql.json. MLlib-fit-family outputs
  * (q_kmeans_sizes/_inertia/_restarts, q_ksweep, q_pca) are not
  * ulp-reproducible across JVMs, so their parquet may only be compared
  * against oracle literals from the SAME leg — tools/compare_oracle.py
  * refuses cross-leg fit-family pairings loudly. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.build(cpus)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // corpus fingerprint: total bytes + newest mtime of the sf parquet —
    // cheap, and any regenerated corpus changes it
    val corpusFp = {
      val fs = Option(new java.io.File(sfDir).listFiles())
        .getOrElse(Array.empty).filter(_.getName.endsWith(".parquet"))
      s"${fs.map(_.length).sum}_${fs.map(_.lastModified).maxOption.getOrElse(0L)}"
    }
    val legId = s"${java.util.UUID.randomUUID().toString.take(8)}-$corpusFp"
    // Optional comma-separated filter for fast local iteration on a few
    // queries (the driver runs unfiltered).
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        Files.writeString(Paths.get(s"$outDir/$name/_LEG"), legId)
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSqlFor(spark, sfDir)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // leg stamp for the oracle literals — paired with each output's _LEG
    // by compare_oracle.py (kept OUT of oracle_sql.json: the driver runs
    // every entry of that file as SQL)
    Files.writeString(Paths.get(s"$outDir/oracle_leg.json"),
      s"""{"leg": ${q(legId)}}""")
    spark.stop()
  }
}
