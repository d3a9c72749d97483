package graft.tools

import graft.Tables
import graft.operators.dedup.MinHashLsh
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measure the CONTRACTION gate's break-even duplicate share (the r12
  * verdict: ContractionBar = 0.75 was picked, not measured — the two
  * measured operating points, share ≈ 1.0 skips / share ≈ 0.01
  * contracts, bracket it loosely).
  *
  * Method: plant exact-copy groups into the sf0.1 documents corpus at a
  * target DISTINCT share s — a deterministic fraction f of docs have
  * their text replaced by their group leader's (groups of [[GroupSize]]
  * consecutive ids; distinct ≈ 1 − f + f/g, so f = (1 − s)·g/(g−1)) —
  * then run BOTH pipelines to the same materialized end state
  * (components count, the shared consumer of q_dedup_minhash /
  * q_dedup_groups / q_leak_safe_split) and time them isolated,
  * median-of-reps.
  *
  * Usage: runMain graft.tools.ProfileContraction [sfDir] [reps]
  * Prints one line per (share, arm, seconds) + the measured crossover. */
object ProfileContraction {
  val GroupSize = 10

  def planted(docs: DataFrame, share: Double): DataFrame = {
    val f = math.min(1.0, (1.0 - share) * GroupSize / (GroupSize - 1.0))
    val sel = pmod(col("doc_id"), lit(1000L)) < lit(math.round(f * 1000))
    val leader = (col("doc_id") - pmod(col("doc_id"), lit(GroupSize.toLong)))
    val leaders = docs.select(
      col("doc_id").as("lead_id"), col("text").as("lead_text"))
    // LEFT join + fallback: a sparse/offset id space can compute a
    // leader id that does not exist — such docs keep their own text
    // instead of silently vanishing and skewing the timing ratios
    // (r13 review); the measured share is re-probed afterwards anyway
    docs.withColumn("lead_id", when(sel, leader).otherwise(col("doc_id")))
      .join(leaders, Seq("lead_id"), "left")
      .select(col("doc_id"), coalesce(col("lead_text"), col("text")).as("text"))
  }

  private def timeIt(body: => Long): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val shares = Seq(0.9, 0.7, 0.5, 0.3, 0.15, 0.11)
    val rows = shares.map { s =>
      val docs = planted(base, s).localCheckpoint(true)
      val measured = MinHashLsh.distinctShare(docs)
      def contracted(): Long = {
        val c = MinHashLsh.contractedPipeline(docs, minJaccard = 0.5)
        MinHashLsh.expandComponents(c).count()
      }
      def plain(): Long =
        graft.operators.clustering.ConnectedComponents
          .run(MinHashLsh.nearDupPairs(docs, minJaccard = 0.5), "d1", "d2")
          .count()
      val tc = (1 to reps).map(_ => timeIt(contracted())).sorted.apply(reps / 2)
      val tp = (1 to reps).map(_ => timeIt(plain())).sorted.apply(reps / 2)
      println(f"share_target=$s%.2f measured=$measured%.4f contracted=$tc%.2fs plain=$tp%.2fs ratio=${tc / tp}%.2f")
      (measured, tc, tp)
    }
    val crossover = rows.sortBy(_._1).collectFirst {
      case (m, tc, tp) if tc > tp => m
    }
    println(s"[profile-contraction] first share where plain wins: " +
      crossover.map(m => f"$m%.4f").getOrElse("none (contracted won everywhere)"))
    spark.stop()
  }
}
