package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws of the Misra-Gries heavy-hitters sketch (the invariants
  * q_heavy_hitters' oracle argument rests on). */
class MisraGriesSpec extends SparkSpec {

  import spark.implicits._

  private def sketch(terms: Seq[String], budget: Int, parts: Int): Map[String, Long] =
    terms.toDF("t").repartition(parts)
      .agg(MisraGries(col("t"), budget).as("sk"))
      .select(explode(col("sk")).as("s"))
      .select(col("s.term"), col("s.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("guarantee: every item above n/(budget+1) is present, estimates within [c - n/(b+1), c]") {
    val rnd = new scala.util.Random(7L)
    // skewed stream: few heavy items + a long tail
    for (parts <- Seq(1, 5, 32); trial <- 0 until 3) {
      val heavy = (0 until 4).flatMap(i => Seq.fill(400 - 60 * i)(s"heavy$i"))
      val tail = Seq.fill(1200)(s"tail${rnd.nextInt(300)}")
      val stream = rnd.shuffle(heavy ++ tail)
      val n = stream.size
      val budget = 16
      val sk = sketch(stream, budget, parts)
      assert(sk.size <= budget, s"sketch exceeded budget: ${sk.size}")
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = n.toDouble / (budget + 1)
      exact.foreach { case (t, c) =>
        if (c > bound)
          assert(sk.contains(t), s"trial $trial parts=$parts: heavy item $t (c=$c > $bound) missing")
      }
      sk.foreach { case (t, est) =>
        val c = exact(t)
        assert(est <= c && est >= c - bound,
          s"trial $trial parts=$parts: estimate $est outside [${c - bound}, $c] for $t")
      }
    }
  }

  test("exact when distinct items fit the budget, under any partitioning") {
    val stream = (0 until 2000).map(i => s"w${i % 20}")
    for (parts <- Seq(1, 7, 32)) {
      val sk = sketch(stream, budget = 64, parts)
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(sk == exact, s"parts=$parts: sketch not exact below budget")
    }
  }

  test("q_heavy_hitters margin holds on the corpus: cf_10 clears n/(budget+1)") {
    val toks = graft.operators.text.TfIdfQueries
      .tokensOf(graft.Tables.documents(spark, SfDir), "doc_id", "text")
    val counts = toks.groupBy("term").agg(count(lit(1)).as("cf"))
      .orderBy(col("cf").desc, col("term")).limit(10)
      .collect().map(_.getLong(1))
    val n = toks.count()
    val bound = n.toDouble / (graft.operators.text.TfIdfQueries.HhBudget + 1)
    assert(counts.length == 10 && counts.last > bound,
      s"10th count ${counts.lastOption} does not clear the MG bound $bound — " +
        "raise HhBudget or the oracle argument breaks")
  }

  test("cross-batch driver fold (q_hh_stream's shape) preserves the guarantee") {
    val rnd = new scala.util.Random(19L)
    val heavy = (0 until 3).flatMap(i => Seq.fill(500 - 100 * i)(s"hh$i"))
    val stream = rnd.shuffle(heavy ++ Seq.fill(1500)(s"t${rnd.nextInt(400)}"))
    val n = stream.size
    val budget = 16
    for (batches <- Seq(2, 5, 9)) {
      val state = new java.util.HashMap[String, java.lang.Long]()
      stream.grouped(math.ceil(n.toDouble / batches).toInt).foreach { b =>
        val bm = new java.util.HashMap[String, java.lang.Long]()
        sketch(b, budget, parts = 3).foreach { case (t, c) => bm.put(t, c) }
        MisraGries.mergeInto(state, bm, budget)
      }
      assert(state.size <= budget)
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = n.toDouble / (budget + 1)
      exact.foreach { case (t, c) =>
        if (c > bound)
          assert(state.containsKey(t), s"batches=$batches: $t (c=$c) lost in the fold")
      }
      state.forEach { (t, est) =>
        val c = exact(t)
        assert(est <= c && est >= c - bound,
          s"batches=$batches: estimate $est outside [${c - bound}, $c] for $t")
      }
    }
  }

  test("q_heavy_hitters equals the exact top-10 under repartitioning") {
    def run(parts: Int) = {
      val docs = graft.Tables.documents(spark, SfDir).repartition(parts)
      val toks = graft.operators.text.TfIdfQueries.tokensOf(docs, "doc_id", "text")
      val cands = toks.agg(
          MisraGries(col("term"), graft.operators.text.TfIdfQueries.HhBudget).as("sk"))
        .select(explode(col("sk")).as("s")).select(col("s.term").as("term"))
      toks.groupBy("term").agg(count(lit(1)).as("cf"))
        .join(broadcast(cands), Seq("term"))
        .orderBy(col("cf").desc, col("term")).limit(10)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    val exact = graft.operators.text.TfIdfQueries
      .tokensOf(graft.Tables.documents(spark, SfDir), "doc_id", "text")
      .groupBy("term").agg(count(lit(1)).as("cf"))
      .orderBy(col("cf").desc, col("term")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(run(1) == exact && run(13) == exact && run(32) == exact)
  }
}
