package graft.operators.dedup

import graft.SparkSpec
import org.scalacheck.{Gen, Prop}

/** Property checks of the repeated-span detector against driver brute
  * force on random small-vocab corpora (high collision pressure), plus
  * partition independence — the window rank must not depend on physical
  * layout. */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, min: Int = 12): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(res.passed, res.status.toString)
  }

  private val k = DedupQueries.SpanK

  /** Brute force: md5-free — grams compared as joined strings directly. */
  private def brute(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }.filter(_._2.size >= k)
    val occs = for {
      (id, ws) <- toks
      pos <- 1 to (ws.size - k + 1)
    } yield (id, pos.toLong, ws.slice(pos - 1, pos - 1 + k).mkString(" "))
    val firstOf = occs.groupBy(_._3).map { case (g, os) =>
      g -> os.map(o => (o._1, o._2)).min
    }
    toks.map { case (id, ws) =>
      val mine = occs.filter(_._1 == id)
      val rep = mine.filter(o => firstOf(o._3) != ((o._1, o._2)))
      val covered = rep.flatMap(o => o._2 until (o._2 + k)).distinct.size.toLong
      id -> (ws.size.toLong, mine.size.toLong, rep.size.toLong, covered)
    }.toMap
  }

  test("q_span_dedup pipeline equals brute force on random small-vocab corpora") {
    val vocab = Vector("a", "b", "c", "d")
    val docGen = Gen.choose(k, 26).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val corpusGen = Gen.choose(3, 10).flatMap(m => Gen.listOfN(m, docGen))
    check(Prop.forAllNoShrink(corpusGen, Gen.oneOf(1, 7)) { (texts, parts) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = spanStats(docs, parts)
      got == brute(docs)
    })
  }

  private def spanStats(docs: Seq[(Long, String)], parts: Int): Map[Long, (Long, Long, Long, Long)] = {
    // same pipeline as qSpanDedup, over an arbitrary frame
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val d = docs.toDF("doc_id", "text").repartition(parts)
      .select(col("doc_id"),
        filter(split(trim(lower(col("text"))), graft.operators.text.TextQueries.WsRe),
          w => length(w) > 0).as("ws"))
      .filter(size(col("ws")) >= k)
    val grams = d.select(col("doc_id"), size(col("ws")).as("n_tokens"),
      explode(expr(
        s"""transform(sequence(1, size(ws) - $k + 1), i ->
           |  named_struct('pos', i, 'g', md5(concat_ws(' ', slice(ws, i, $k)))))"""
          .stripMargin)).as("s"))
      .select(col("doc_id"), col("n_tokens"),
        col("s.pos").cast("long").as("pos"), col("s.g").as("g"))
    val w = Window.partitionBy(col("g")).orderBy(col("doc_id"), col("pos"))
    val marked = grams.withColumn("rep", row_number().over(w) > 1)
    val perDoc = marked.groupBy(col("doc_id"))
      .agg(first(col("n_tokens")).cast("long").as("n_tokens"),
        count(lit(1)).as("n_spans"),
        sum(when(col("rep"), 1L).otherwise(0L)).as("n_rep"))
    val covered = marked.filter(col("rep"))
      .select(col("doc_id"), explode(expr(s"sequence(pos, pos + $k - 1)")).as("p"))
      .groupBy(col("doc_id")).agg(countDistinct(col("p")).as("n_cov"))
    perDoc.join(covered, Seq("doc_id"), "left")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) 0L else r.getLong(4))))
      .toMap
  }
}
