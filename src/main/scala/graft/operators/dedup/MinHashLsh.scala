package graft.operators.dedup

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MinHash + LSH-band near-duplicate detection (SURVEY §2 "Deduplication").
  *
  * Shape (all shuffles bounded):
  *  1. explode word-3-gram shingles → distinct (doc, shingle-hash): one
  *     shuffle on doc_id;
  *  2. 64-permutation signature as a single sketch aggregate over
  *     `(a_i·x + b_i) mod p` — map-side partial, one shuffle;
  *  3. 16 bands × 4 rows: band key = the raw 4-sig tuple (exact — no
  *     band-hash collisions); candidates = equi-join on (band, k0..k3) —
  *     the only pair-producing step, bounded by bucket size;
  *  4. exact Jaccard verification on the candidates only.
  *
  * Every stage is plain modular arithmetic over the Karp–Rabin shingle
  * domain ([[graft.functions.ShingleHashes]]), so the driver's DuckDB
  * oracle replays the ENTIRE pipeline — tokenize → shingle fingerprints →
  * 64 permutations → banding → Jaccard — in SQL CTEs (see [[oracles]]).
  *
  * The synthetic corpus has no near-dups, so the query plants perturbed
  * copies (doc_id + 1e6, text ⊕ suffix) — the operator itself is generic.
  */
object MinHashLsh extends QueryModule {

  val NumHashes = 64
  val Bands = 16
  val RowsPerBand = 4
  val P = 4294967311L // prime > 2^32

  /** Skew guard: a band bucket of B docs yields B² candidate pairs, and at
    * corpus scale boilerplate (shared headers/footers) produces mega-
    * buckets that would dominate the join. Buckets above this size are
    * dropped (standard LSH practice — a pair whose ONLY shared bands are
    * boilerplate-flooded is exactly the pair we don't want); the oracle
    * applies the same HAVING cap. */
  val MaxBandBucket = 5000L

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

  /** The banded-verify half shared by [[nearDupPairs]] and
    * [[contractedPipeline]] — ONE implementation, so the contraction's
    * "row-identical" law can't drift (the r11 review finding; the
    * SimHash sibling is `pairsFromSimhashes`). From a per-doc frame
    * (doc_id, sig, s, w): banding → WEIGHTED mega-bucket guard (bucket
    * load = Σw; with w = 1 per doc that IS the plain count, with w =
    * copy multiplicity it is exactly the uncontracted bucket size, so
    * both pipelines drop the same buckets) → candidate equi-join →
    * exact Jaccard verification. The oversized-bucket list is tiny by
    * construction → broadcast anti-join; candidate pairs are
    * LSH-bounded → broadcast through the two set-fetch joins. Returns
    * (verified pairs, the bounded banded frame — the contraction's
    * surviving-band signal). */
  private def bandedVerify(perDoc: DataFrame, minJaccard: Double,
                           maxBandBucket: Long): (DataFrame, DataFrame) = {
    val bandCols = (0 until Bands).map { b =>
      val rows = (0 until RowsPerBand).map(r =>
        element_at(col("sig"), b * RowsPerBand + r + 1).as(s"k$r"))
      struct(lit(b).as("band") +: rows: _*)
    }
    val keyCols = (0 until RowsPerBand).map(r => s"k$r")
    val banded = perDoc
      .select(col("doc_id"), col("w"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id") +: col("w") +: col("bk.band").as("band") +:
        keyCols.map(k => col(s"bk.$k").as(k)): _*)
    val oversized = banded
      .groupBy(col("band") +: keyCols.map(col): _*)
      .agg(sum(col("w")).as("sz"))
      .filter(col("sz") > maxBandBucket)
      .select(col("band") +: keyCols.map(col): _*)
    val bounded = banded.join(broadcast(oversized), "band" +: keyCols, "left_anti")
    val cand = bounded.alias("l").join(bounded.alias("r"), "band" +: keyCols)
      .filter(col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("d1"), col("r.doc_id").as("d2"))
      .distinct()
    val sets = perDoc.select(col("doc_id"), col("s"))
    val pairs = sets.select(col("doc_id").as("d1"), col("s").as("s1"))
      .join(broadcast(cand), Seq("d1"))
      .join(sets.select(col("doc_id").as("d2"), col("s").as("s2")), Seq("d2"))
      .withColumn("inter", size(array_intersect(col("s1"), col("s2"))).cast("double"))
      .withColumn("uni", (size(col("s1")) + size(col("s2"))).cast("double") - col("inter"))
      .withColumn("jaccard", round(col("inter") / col("uni"), 6))
      .filter(col("jaccard") >= minJaccard)
      .select(col("d1"), col("d2"), col("jaccard"))
    (pairs, bounded)
  }

  /** Candidate pairs sharing ≥1 LSH band, verified with exact Jaccard.
    *
    * Shuffle budget: the wide exploded (doc, shingle-hash) frame is
    * aggregated ONCE — signature sketch and Jaccard set come out of the
    * same groupBy — and only the compact per-doc result (~2 KB/doc) is
    * persisted for reuse by banding and verification. */
  def nearDupPairs(docs: DataFrame, minJaccard: Double,
                   maxBandBucket: Long = MaxBandBucket): DataFrame = {
    val perDoc = shingleHashes(docs).groupBy(col("doc_id"))
      .agg(
        graft.functions.MinHashSketch(col("x"), coefA.toIndexedSeq,
          coefB.toIndexedSeq, P).as("sig"),
        collect_set(col("x")).as("s"))
      .withColumn("w", lit(1L))
      .persist()
    // materialize the (LSH-bounded) pair list eagerly, then release the
    // per-doc scratch — repeated calls must not accumulate pinned caches
    // (the SimHash.contractedPairs discipline; checkpointed, so nothing
    // lazy still reads the released frame)
    val out = bandedVerify(perDoc, minJaccard, maxBandBucket)._1.localCheckpoint(true)
    perDoc.unpersist(blocking = false)
    out
  }

  /** Documents plus perturbed near-copies of doc_id < 20. */
  def withPlantedDups(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text")).unionByName(
      docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" planted near duplicate suffix")).as("text")))

  /** Exact-duplicate contraction of the MinHash pipeline (the r10 SemDeDup
    * duplicate-contraction move applied to LSH): exact text copies have
    * identical shingle sets, hence identical signatures, bands and Jaccard
    * values — so the pipeline runs once per DISTINCT text (the md5 "copy
    * group" representative = its min doc_id) and the verified pair list /
    * component labels expand back exactly. The r11 100× probe corpus
    * (100-copy groups) makes the uncontracted pair join quadratic in copy
    * multiplicity; contracted, pair work falls 10⁴× while the OUTPUT is
    * row-identical (spec-asserted against [[nearDupPairs]] on duplicated
    * corpora, and the DuckDB oracle still replays the quadratic
    * definition).
    *
    * Exactness of the band guard: an uncontracted bucket's size is the SUM
    * of copy-group multiplicities of the texts in it, so the contracted
    * guard weighs each rep by `w` — a >cap duplication drops its within-
    * and cross-pairs in both pipelines identically.
    *
    * @param members    (doc_id, rep) for every doc
    * @param groups     (rep, w) one row per distinct text
    * @param repPairs   (d1, d2, jaccard) verified pairs between reps
    * @param withinReps reps of groups with w>1 and ≥1 surviving (non-
    *                   oversized) band — exactly the groups whose member
    *                   pairs the uncontracted pipeline would emit (identical
    *                   docs share all bands; Jaccard of identical sets is
    *                   exactly 1.0 ≥ any threshold)
    */
  private[graft] case class Contracted(members: DataFrame, groups: DataFrame,
                                       repPairs: DataFrame, withinReps: DataFrame)

  private[graft] def contractedPipeline(docs: DataFrame, minJaccard: Double,
                                        maxBandBucket: Long = MaxBandBucket): Contracted = {
    val keyed = docs.select(col("doc_id"), col("text"), md5(col("text")).as("h"))
    val groups = keyed.groupBy(col("h"))
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("w")).persist()
    val members = keyed.select(col("doc_id"), col("h"))
      .join(groups.select(col("h"), col("rep")), Seq("h"))
      .select(col("doc_id"), col("rep")).localCheckpoint(true)
    val repDocs = keyed.join(groups.select(col("h"), col("rep")), Seq("h"))
      .filter(col("doc_id") === col("rep"))
      .select(col("doc_id"), col("text"))
    val perDoc = shingleHashes(repDocs).groupBy(col("doc_id"))
      .agg(
        graft.functions.MinHashSketch(col("x"), coefA.toIndexedSeq,
          coefB.toIndexedSeq, P).as("sig"),
        collect_set(col("x")).as("s"))
      .join(groups.select(col("rep").as("doc_id"), col("w")), Seq("doc_id"))
      .persist()
    // the shared banded-verify half, with w = copy multiplicity (the
    // weighted guard sees exactly the uncontracted bucket loads)
    val (pairs, bounded) = bandedVerify(perDoc, minJaccard, maxBandBucket)
    // materialize the four COMPACT outputs eagerly (members: 2 longs/doc;
    // the rest are group-/LSH-bounded), then release the scratch frames —
    // non-memoized callers invoke this repeatedly and must not accumulate
    // pinned caches (the SimHash.contractedPairs discipline, r12 review)
    val repPairs = pairs.localCheckpoint(true)
    val withinReps = bounded.select(col("doc_id").as("rep")).distinct()
      .join(groups.filter(col("w") > 1).select(col("rep")), Seq("rep"))
      .localCheckpoint(true)
    val groupsOut = groups.select(col("h"), col("rep"), col("w"))
      .localCheckpoint(true)
    perDoc.unpersist(blocking = false)
    groups.unpersist(blocking = false)
    Contracted(members, groupsOut, repPairs, withinReps)
  }

  /** The full verified pair list from a [[Contracted]] pipeline —
    * row-identical to [[nearDupPairs]]: cross-group pairs carry their rep
    * pair's Jaccard (copies have identical sets), within-group pairs are
    * exactly 1.0. */
  private[graft] def expandPairs(c: Contracted): DataFrame = {
    val m = c.members
    val cross = m.select(col("rep").as("d1"), col("doc_id").as("m1"))
      .join(broadcast(c.repPairs), Seq("d1"))
      .join(m.select(col("rep").as("d2"), col("doc_id").as("m2")), Seq("d2"))
      .select(least(col("m1"), col("m2")).as("d1"),
        greatest(col("m1"), col("m2")).as("d2"), col("jaccard"))
    val wm = m.join(broadcast(c.withinReps), Seq("rep"))
    val within = wm.select(col("rep"), col("doc_id").as("m1"))
      .join(wm.select(col("rep"), col("doc_id").as("m2")), Seq("rep"))
      .filter(col("m1") < col("m2"))
      .select(col("m1").as("d1"), col("m2").as("d2"),
        lit(1.0).as("jaccard"))
    cross.unionByName(within)
  }

  /** ("id", "component") for every doc the uncontracted CC would label —
    * connected components run on the REP graph (edges = rep pairs; a w>1
    * surviving group with no cross pair is its own singleton component),
    * expanded through the membership map. Labels match exactly: the
    * component minimum over reps IS the minimum doc id (rep = min of its
    * copy group). */
  private[graft] def expandComponents(c: Contracted): DataFrame = {
    val repCC = graft.operators.clustering.ConnectedComponents
      .run(c.repPairs, "d1", "d2")
      .select(col("id").as("rep"), col("component"))
    val repComp = repCC.unionByName(
      c.withinReps.join(repCC.select(col("rep")), Seq("rep"), "left_anti")
        .select(col("rep"), col("rep").as("component")))
    c.members.join(repComp, Seq("rep"))
      .select(col("doc_id").as("id"), col("component"))
  }

  /** Contraction gate: contract only when the corpus carries DEEP
    * exact-copy duplication. The contracted pipeline pays an extra
    * full-text shuffle (the md5 copy-group join that routes each text
    * to its representative) plus the expansion joins — that overhead is
    * comparable to one shingling pass, so contraction only wins when it
    * skips MOST of the shingling. The bar is MEASURED, not picked
    * (tools/ProfileContraction, planted copy-group sweep, isolated
    * median-of-3 to the shared components end state — the r13 fix of
    * the r12 "0.75 was picked" finding):
    *
    *   distinct share | contracted / plain (sf0.1, 5k docs) | (sf1, 50k docs)
    *   0.93           | 2.14x slower                        | —
    *   0.32           | 1.61x slower                        | —
    *   0.11           | 1.38x slower                        | —
    *   0.093          | —                                   | 0.99x (break-even)
    *   0.054          | —                                   | 0.72x
    *   0.016          | —                                   | 0.46x
    *   0.01 (sf10)    | —                                   | 0.05x (the r12 21x win)
    *
    * The crossover sits at share ≈ 0.09–0.11 on both corpus sizes and
    * moves DOWNWARD-favorable with scale (larger corpora amortize the
    * group machinery), so 0.1 is the conservative measured bar: corpora
    * in the old (0.1, 0.75) band — which measurably paid up to 2×
    * overhead under the picked bar — now take the plain path. The probe
    * is one map-side scan (count + HyperLogLog distinct over md5 — no
    * shuffle of the text column); the sketch's ~2% error is far inside
    * the flat region around the crossover (±1pp of share moves the
    * ratio by <2%). */
  val ContractionBar = 0.1

  /** distinct-text share of a corpus in one cheap scan. */
  private[graft] def distinctShare(docs: DataFrame): Double = {
    val r = docs.agg(count(lit(1)),
      approx_count_distinct(md5(col("text")))).head()
    if (r.getLong(0) == 0L) 1.0 else r.getLong(1).toDouble / r.getLong(0)
  }

  /** Verified pairs and their connected components over the planted
    * corpus are the shared prefix of q_dedup_minhash, q_dedup_groups AND
    * q_leak_safe_split. A 100 TB pipeline materializes the dedup groups
    * ONCE and every downstream consumer reads that table — so the query
    * graph says the same: computed once per (session, dir), materialized
    * (both frames are LSH-bounded, far smaller than the corpus), and
    * shared. Keyed on the session identity too so a recycled dir under a
    * fresh SparkSession recomputes instead of reading a dead plan. */
  private case class PlantedDedup(pairs: DataFrame, components: DataFrame)
  private val sharedPlanted =
    new java.util.concurrent.ConcurrentHashMap[String, PlantedDedup]
  private def skey(spark: SparkSession, dir: String): String =
    System.identityHashCode(spark).toString + "|" + dir

  private def plantedState(spark: SparkSession, dir: String): PlantedDedup =
    sharedPlanted.computeIfAbsent(skey(spark, dir), _ => {
      val docs = withPlantedDups(Tables.documents(spark, dir))
      if (distinctShare(docs) < ContractionBar) {
        val c = contractedPipeline(docs, minJaccard = 0.5)
        // the expanded pair list stays LAZY — its row count is inherently
        // quadratic in copy multiplicity; the contracted state behind it
        // is checkpointed
        PlantedDedup(expandPairs(c), expandComponents(c).localCheckpoint(true))
      } else {
        val pairs = nearDupPairs(docs, minJaccard = 0.5) // checkpointed inside
        PlantedDedup(pairs,
          graft.operators.clustering.ConnectedComponents
            .run(pairs, "d1", "d2").localCheckpoint(true))
      }
    })

  def plantedPairs(spark: SparkSession, dir: String): DataFrame =
    plantedState(spark, dir).pairs

  def plantedComponents(spark: SparkSession, dir: String): DataFrame =
    plantedState(spark, dir).components

  def qDedupMinhash(spark: SparkSession, dir: String): DataFrame =
    plantedPairs(spark, dir).orderBy("d1", "d2")

  /** Near-duplicate GROUPS — the keep-one-representative pass of a training
    * pipeline: verified LSH pairs → connected components
    * ([[graft.operators.clustering.ConnectedComponents]]) → one row per
    * duplicate cluster with its canonical (min-id) document. Transitive:
    * A~B, B~C groups {A,B,C} even if A,C never paired. */
  def qDedupGroups(spark: SparkSession, dir: String): DataFrame =
    plantedComponents(spark, dir)
      .groupBy(col("component").as("canonical_doc"))
      .agg(count(lit(1)).as("group_size"))
      .orderBy("canonical_doc")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_minhash" -> (qDedupMinhash _),
    "q_dedup_groups" -> (qDedupGroups _))

  /** DuckDB replay of the full pipeline. Possible because every stage is
    * bounded modular arithmetic (see [[graft.functions.ShingleHashes]]):
    * word fingerprints via list_reduce over character codes, 3-gram window
    * mix, the 64 MinHash permutations as list_min over list_transform,
    * banding as a join on the raw 4-sig slice, Jaccard on the distinct
    * fingerprint sets. */
  private[graft] def pipelineCtes: String = {
    import graft.functions.ShingleHashes.{M, WordBase, WindowBase}
    val sigExprs = (0 until NumHashes).map { i =>
      s"list_min(list_transform(shs, x -> (x * ${coefA(i)} + ${coefB(i)}) % $P))"
    }.mkString(",\n      ")
    s"""corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, text || ' planted near duplicate suffix'
       |  FROM documents WHERE doc_id < 20),
       |words AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(text, '[ \\t\\n\\r\\f\\x0B]+'), w -> w != '') AS ws
       |  FROM corpus),
       |wordhashes AS (
       |  SELECT doc_id,
       |    list_transform(ws, w -> list_reduce(
       |      list_prepend(CAST(0 AS BIGINT),
       |        list_transform(range(1, length(w) + 1),
       |          i -> CAST(ord(substr(w, CAST(i AS INT), 1)) AS BIGINT))),
       |      (h, c) -> (h * $WordBase + c) % $M)) AS wh
       |  FROM words),
       |shingles AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(range(1, len(wh) - 1),
       |      s -> (((wh[s] * $WindowBase + wh[s + 1]) % $M) * $WindowBase
       |            + wh[s + 2]) % $M)) AS shs
       |  FROM wordhashes
       |  WHERE len(wh) >= 3),
       |sigs AS (
       |  SELECT doc_id, shs,
       |    [$sigExprs] AS sig
       |  FROM shingles
       |  WHERE len(shs) > 0),
       |bands AS (
       |  SELECT doc_id, b, list_slice(sig, b * $RowsPerBand + 1, b * $RowsPerBand + $RowsPerBand) AS key
       |  FROM sigs, (SELECT unnest(range($Bands)) AS b)),
       |oversized AS (
       |  SELECT b, key FROM bands GROUP BY b, key HAVING count(*) > $MaxBandBucket),
       |bands_ok AS (
       |  SELECT bands.* FROM bands ANTI JOIN oversized USING (b, key)),
       |cand AS (
       |  SELECT DISTINCT l.doc_id AS d1, r.doc_id AS d2
       |  FROM bands_ok l JOIN bands_ok r
       |    ON l.b = r.b AND l.key = r.key AND l.doc_id < r.doc_id),
       |verified AS (
       |  SELECT d1, d2, round(inter / (n1 + n2 - inter), 6) AS jaccard
       |  FROM (
       |    SELECT c.d1, c.d2,
       |      CAST(len(list_intersect(s1.shs, s2.shs)) AS DOUBLE) AS inter,
       |      CAST(len(s1.shs) AS DOUBLE) AS n1, CAST(len(s2.shs) AS DOUBLE) AS n2
       |    FROM cand c
       |    JOIN sigs s1 ON c.d1 = s1.doc_id
       |    JOIN sigs s2 ON c.d2 = s2.doc_id)
       |  WHERE jaccard >= 0.5)""".stripMargin
  }

  override def oracles: Map[String, String] = Map(
    "q_dedup_minhash" ->
      s"""WITH $pipelineCtes
         |SELECT d1, d2, jaccard FROM verified ORDER BY d1, d2""".stripMargin,
    "q_dedup_groups" ->
      // component labels via UNROLLED pointer-jumping label propagation
      // (DbscanQueries.ccByLabelProp), NOT a
      // recursive closure: the duplicate-dense sf1 corpus makes `reach`
      // materialize Σ|group|² rows (>70 min measured in r9); the
      // propagation is linear in edges per round and exact at the fixed
      // point (labels = min id per component, identical output).
      s"""WITH $pipelineCtes,
         |edges AS MATERIALIZED (
         |  SELECT d1 AS i, d2 AS j FROM verified
         |  UNION SELECT d2, d1 FROM verified),
         |enodes AS (SELECT DISTINCT i FROM edges),
         |${graft.operators.clustering.DbscanQueries.ccByLabelProp("enodes", "edges", "dg", "comp")}
         |SELECT cl AS canonical_doc, CAST(count(*) AS BIGINT) AS group_size
         |FROM comp GROUP BY cl ORDER BY canonical_doc""".stripMargin)
}
