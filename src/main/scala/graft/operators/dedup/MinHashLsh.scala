package graft.operators.dedup

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MinHash + LSH-band near-duplicate detection (SURVEY §2 "Deduplication").
  *
  * Shape (all shuffles bounded):
  *  1. explode word-3-gram shingles → distinct (doc, shingle-hash32): one
  *     shuffle on doc_id;
  *  2. 64-permutation signature as 64 codegen'd `min` aggregates over
  *     `(a_i·x + b_i) mod p` — map-side partial, one shuffle;
  *  3. 16 bands × 4 rows: band key = xxhash64(band, sig…); candidates =
  *     equi-join on (band, key) — the only pair-producing step, bounded by
  *     bucket size;
  *  4. exact Jaccard verification on the candidates only.
  *
  * The synthetic corpus has no near-dups, so the query plants perturbed
  * copies (doc_id + 1e6, text ⊕ suffix) — the operator itself is generic.
  */
object MinHashLsh extends QueryModule {

  val NumHashes = 64
  val Bands = 16
  val RowsPerBand = 4
  val P = 4294967311L // prime > 2^32

  /** Deterministic permutation parameters (a odd-ish < 2^31, b < 2^31). */
  val (coefA, coefB) = {
    val rnd = new scala.util.Random(42)
    (Array.fill(NumHashes)(1L + rnd.nextInt(Int.MaxValue - 1).toLong),
      Array.fill(NumHashes)(rnd.nextInt(Int.MaxValue).toLong))
  }

  /** (doc_id, x32) shingle hashes via the one-pass byte-level
    * [[graft.functions.ShingleHashes]] expression (no intermediate shingle
    * strings). NOT deduplicated: every consumer is duplicate-insensitive
    * (`min` for signatures, `collect_set` for the Jaccard sets), so the
    * global distinct shuffle of the widest intermediate in the pipeline is
    * pure cost. */
  def shingleHashes(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(graft.functions.ShingleHashes(col("text"), 3)).as("x"))

  /** One row per doc with sig_0..sig_63 (column form — kept as the
    * cross-check twin of the sketch aggregate). */
  def signatures(docs: DataFrame): DataFrame = {
    val mins: Seq[Column] = (0 until NumHashes).map { i =>
      min((col("x") * coefA(i) + coefB(i)) % P).as(s"sig_$i")
    }
    shingleHashes(docs).groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** One row per doc with the whole signature as array<long>, via the
    * single-buffer TypedImperativeAggregate (one update loop per row
    * instead of 64 aggregate slots). */
  def signatureSketches(hashed: DataFrame): DataFrame =
    hashed.groupBy(col("doc_id"))
      .agg(graft.functions.MinHashSketch(col("x"), coefA.toIndexedSeq,
        coefB.toIndexedSeq, P).as("sig"))

  /** Candidate pairs sharing ≥1 LSH band, verified with exact Jaccard.
    *
    * Shuffle budget: the wide exploded (doc, shingle-hash) frame is
    * aggregated ONCE — signature sketch and Jaccard set come out of the
    * same groupBy — and only the compact per-doc result (~2 KB/doc) is
    * persisted for reuse by banding and verification. */
  def nearDupPairs(docs: DataFrame, minJaccard: Double): DataFrame = {
    val perDoc = shingleHashes(docs).groupBy(col("doc_id"))
      .agg(
        graft.functions.MinHashSketch(col("x"), coefA.toIndexedSeq,
          coefB.toIndexedSeq, P).as("sig"),
        collect_set(col("x")).as("s"))
      .persist()
    val bandCols = (0 until Bands).map { b =>
      val rows = (0 until RowsPerBand).map(r =>
        element_at(col("sig"), b * RowsPerBand + r + 1))
      struct(lit(b).as("band"), xxhash64(rows: _*).as("bh"))
    }
    val banded = perDoc.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
    val cand = banded.alias("l").join(banded.alias("r"), Seq("band", "bh"))
      .filter(col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("d1"), col("r.doc_id").as("d2"))
      .distinct()
    // Candidate pairs are LSH-bounded (orders of magnitude smaller than the
    // corpus): broadcast them so the doc→set frame streams through two
    // broadcast joins instead of shuffling on d1 then d2.
    val sets = perDoc.select(col("doc_id"), col("s"))
    sets.select(col("doc_id").as("d1"), col("s").as("s1"))
      .join(broadcast(cand), Seq("d1"))
      .join(sets.select(col("doc_id").as("d2"), col("s").as("s2")), Seq("d2"))
      .withColumn("inter", size(array_intersect(col("s1"), col("s2"))).cast("double"))
      .withColumn("uni", (size(col("s1")) + size(col("s2"))).cast("double") - col("inter"))
      .withColumn("jaccard", round(col("inter") / col("uni"), 6))
      .filter(col("jaccard") >= minJaccard)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  /** Documents plus perturbed near-copies of doc_id < 20. */
  def withPlantedDups(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text")).unionByName(
      docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" planted near duplicate suffix")).as("text")))

  def qDedupMinhash(spark: SparkSession, dir: String): DataFrame =
    nearDupPairs(withPlantedDups(Tables.documents(spark, dir)), minJaccard = 0.5)
      .orderBy("d1", "d2")

  /** Near-duplicate GROUPS — the keep-one-representative pass of a training
    * pipeline: verified LSH pairs → connected components
    * ([[graft.operators.clustering.ConnectedComponents]]) → one row per
    * duplicate cluster with its canonical (min-id) document. Transitive:
    * A~B, B~C groups {A,B,C} even if A,C never paired. */
  def qDedupGroups(spark: SparkSession, dir: String): DataFrame = {
    val pairs = nearDupPairs(withPlantedDups(Tables.documents(spark, dir)),
      minJaccard = 0.5)
    graft.operators.clustering.ConnectedComponents.run(pairs, "d1", "d2")
      .groupBy(col("component").as("canonical_doc"))
      .agg(count(lit(1)).as("group_size"))
      .orderBy("canonical_doc")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_minhash" -> (qDedupMinhash _),
    "q_dedup_groups" -> (qDedupGroups _))

  /** MinHash permutations are engine-specific (xxhash64) — rows-only. */
  override def oracles: Map[String, String] = Map.empty
}
