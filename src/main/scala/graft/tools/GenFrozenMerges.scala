package graft.tools

import graft.Tables
import graft.functions.{Bpe, Gpt2}
import graft.operators.text.PretrainedBpe
import org.apache.spark.sql.functions._

/** One-off generator for the FROZEN pretrained-style BPE vocabulary
  * shipped as a repo resource (src/main/resources/graft/bpe/): trains
  * GPT-2-pipeline merges on the sf0.01 documents corpus — decorated
  * exactly as the query decorates it ([[PretrainedBpe.decorated]]),
  * pre-tokenized by the published regex scan ([[Gpt2.pretokenize]])
  * and byte-unicode remapped ([[Gpt2.remap]]) — and writes them in the
  * published merges.txt format (`#version` header, one `left right`
  * pair per line, rank = line order). Training stops early when the
  * pair space exhausts, so the committed artifact's line count IS the
  * merge count (may be below [[NumMerges]]). The committed artifact is
  * what [[PretrainedBpe]] loads — regenerating it changes the frozen
  * vocabulary and must be deliberate (the query and its oracle both
  * read the same resource, so they can never drift from each other,
  * but counts would drift from any previously recorded run).
  *
  * Usage: `sbt "runMain graft.tools.GenFrozenMerges [corpusDir] [outFile]"`. */
object GenFrozenMerges {
  val NumMerges = 500

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse(
      "src/main/resources/graft/bpe/frozen_gpt2_style.merges.txt")
    val spark = graft.GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // pre-token frequency table in the REMAPPED alphabet — the table
    // BPE training actually operates on (one groupBy, top-K capped)
    val freqs = Tables.documents(spark, dir)
      .select(PretrainedBpe.decorated(col("text"), col("doc_id")).as("txt"))
      .as[String]
      .flatMap(t => Gpt2.pretokenize(t).map(Gpt2.remap))
      .groupByKey(identity).count()
      .toDF("mw", "c")
      .orderBy(col("c").desc, col("mw"))
      .limit(graft.operators.text.BpeQueries.MaxVocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val merges = Bpe.learn(freqs, NumMerges, endMark = false)
    merges.foreach { case (a, b) =>
      require(!a.contains("|") && !b.contains("|") &&
        !a.contains(" ") && !b.contains(" "),
        s"merge symbol breaks the file/oracle format: ($a, $b)")
    }
    val body = "#version: 0.2\n" +
      merges.map { case (a, b) => s"$a $b" }.mkString("\n") + "\n"
    val p = java.nio.file.Paths.get(out)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, body, java.nio.charset.StandardCharsets.UTF_8)
    println(s"[gen-frozen-merges] wrote ${merges.size} merges to $p")
    spark.stop()
  }
}
