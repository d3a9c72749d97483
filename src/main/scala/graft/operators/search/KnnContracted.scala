package graft.operators.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-duplicate contraction for the label-blocked EXACT kNN kernels
  * (q_knn, q_knn_outlier, q_lof) — the same pre-pass [[graft.operators
  * .clustering.Dbscan.contractDups]] applies to DBSCAN's ε-scan.
  *
  * Identical vectors in the same block have identical distance multisets,
  * so the O(block²) pair scan only needs to run between DISTINCT vectors
  * (group representatives carrying multiplicities); per-point top-k lists
  * are then reconstructed EXACTLY from driver-free, bounded expansions.
  * On a duplicate-heavy corpus the pair set shrinks quadratically in
  * duplicate depth (the sf10 ScaleCorpus plants 100 copies per base
  * vector: 10⁴× fewer pair rows), and real 100 TB web corpora are
  * duplicate-heavy by nature.
  *
  * Exactness of the expansion (KnnContractedSpec proves it against the
  * uncontracted window formulation):
  *  - a member's candidate list is (own group's other copies at distance
  *    0) ∪ (members of ε… of nearby groups at the group distance); ties
  *    rank by (d, neighbor id);
  *  - the k smallest (d, nb) pairs draw from at most k distinct groups,
  *    and any contributing group must rank within the top-k groups by
  *    (d, min member id) = (d, rep) — TopKPerGroup's exact order — since
  *    every earlier group contributes a strictly smaller candidate;
  *  - within a group only its k smallest member ids can appear in any
  *    top-k, so a bounded per-group id heap (k+1 rows) replaces the full
  *    member list: no collect_list of a potentially million-deep
  *    duplicate group ever materializes.
  */
object KnnContracted {

  /** Contraction pays for itself when the pair scan shrinks at least
    * ~(ratio)²; below this duplicate ratio the expansion machinery (one
    * wide window + two bounded heaps + the candidate union) is pure
    * overhead and the point-level plan is the right one. The gate is
    * PLAN-ONLY — both paths produce identical rows (KnnContractedSpec). */
  val MinContractRatio = 1.25

  /** One cheap probe job: rows / approx-distinct (label, vector) groups.
    * HLL error (±2%) is irrelevant at the 1.25 decision boundary; the
    * corpora that matter sit at 1.0 (unique) or ≫2 (duplicate-heavy). */
  private[search] def dupRatio(e: DataFrame): Double = {
    val r = e.agg(count(lit(1)),
      approx_count_distinct(struct(col("label"), col("embedding")))).head()
    r.getLong(0).toDouble / math.max(1L, r.getLong(1)).toDouble
  }

  /** Below this plan-estimated input size the quadratic pair scan is
    * cheap regardless of duplicates, and even the one probe JOB is
    * measurable overhead (~1.4 s of scheduling on a loaded box against a
    * 0.7 s query at sf0.1) — skip the probe entirely. Read from the
    * optimizer's stats: no job, no scan. 4 MB keeps the sf0.1 bench
    * corpus (0.8 MB parquet) probe-free while the 10×-duplicate sf1
    * corpus (5.2 MB) still probes and contracts. */
  val MinProbeBytes: Long = 4L << 20

  /** The gate, probed once — callers that also need the decision (e.g.
    * LOF's expansion step) pass it back into [[knn]] to avoid a second
    * probe job. Two stages: a free plan-stats size check, then the one
    * probe job only on corpora large enough for contraction to matter. */
  def shouldContract(e: DataFrame): Boolean =
    e.queryExecution.optimizedPlan.stats.sizeInBytes >= MinProbeBytes &&
      dupRatio(e) >= MinContractRatio

  /** Tag every row with its (label, vector) duplicate-group representative
    * and multiplicity. One wide shuffle; NULL vectors form singleton
    * groups so their no-neighbor semantics survive. */
  private[graft] def mark(e: DataFrame): DataFrame = {
    val byVec = Window.partitionBy(col("label"), col("embedding"),
      when(col("embedding").isNull, col("vec_id")))
    e.select(col("label"), col("vec_id"), col("embedding"))
      .withColumn("rep", min(col("vec_id")).over(byVec))
      .withColumn("m", count(lit(1)).over(byVec))
  }

  /** Exact per-point top-k in-block neighbors, reconstructed from the
    * contracted pair scan. Returns (v, nb, d, nbg, rk): point v's rk-th
    * nearest in-block neighbor nb at distance d, nbg = nb's group
    * representative (carried for group-property consumers like LOF).
    *
    * @param dist     distance column builder (rounded for q_knn's rank
    *                 law, raw for LOF) — ranking ties break on (d, nb)
    *                 exactly like the point-level row_number formulation
    * @param repsOnly restrict output to group representatives — enough
    *                 for any group-property derivation (kdist, lrd, LOF),
    *                 skipping the member-level fan-out entirely
    */
  def knn(e: DataFrame, k: Int, dist: (Column, Column) => Column,
          repsOnly: Boolean = false,
          contract: Option[Boolean] = None): DataFrame = {
    if (!contract.getOrElse(shouldContract(e))) {
      // duplicate-poor corpus: the original point-level plan, verbatim —
      // every point is its own group (nbg = nb), so group-property
      // consumers (LOF's kdist/lrd) see exactly the point-level values
      val a = e.select(col("label"), col("vec_id").as("v"),
        col("embedding").as("ea"))
      val b = e.select(col("label"), col("vec_id").as("nb"),
        col("embedding").as("eb"))
      val pairs = a.join(b, Seq("label")).filter(col("v") =!= col("nb"))
        .select(col("v"), dist(col("ea"), col("eb")).as("d"), col("nb"))
      return graft.plans.TopKPerGroup(pairs, Seq("v"), Seq("d", "nb"), k)
        .select(col("v"), col("nb"), col("d"), col("nb").as("nbg"), col("rk"))
    }
    val marked = mark(e).cache()
    val groups = marked.filter(col("vec_id") === col("rep"))
    // k+1 smallest member ids per group (bounded heap): rk=1 is the rep
    // itself; the rest are the only ids that can ever enter a top-k
    val smallIds = graft.plans.TopKPerGroup(
      marked.select(col("rep"), col("vec_id").as("id")),
      Seq("rep"), Seq("id"), k + 1)
    // contracted in-block pair scan — distinct vectors only
    val a = groups.select(col("label"), col("rep").as("i"),
      col("embedding").as("ea"))
    val b = groups.select(col("label"), col("rep").as("j"),
      col("embedding").as("eb"))
    val gp = a.join(b, Seq("label")).filter(col("i") =!= col("j"))
      .select(col("i"), dist(col("ea"), col("eb")).as("d"), col("j"))
    // top-k neighbor GROUPS per group, ordered (d, rep) — see exactness
    // note in the scaladoc
    val topg = graft.plans.TopKPerGroup(gp, Seq("i"), Seq("d", "j"), k)
    // candidates contributed by neighbor groups: each group's k smallest
    // member ids at the group distance
    val nbrCand = topg
      .join(smallIds.select(col("rep").as("j"), col("id").as("nb"),
        col("rk").as("idrk")), Seq("j"))
      .filter(col("idrk") <= k)
      .select(col("i").as("rep"), col("nb"), col("d"), col("j").as("nbg"))
    val pts = (if (repsOnly) groups else marked)
      .select(col("vec_id").as("v"), col("rep"))
    // own-group candidates: the group's other smallest ids at distance 0
    // (d must flow through the SAME dist expression family — it's 0.0
    // under both the raw and rounded builders)
    val selfCand = pts
      .join(smallIds.select(col("rep"), col("id").as("nb")), Seq("rep"))
      .filter(col("nb") =!= col("v"))
      .select(col("v"), col("nb"), lit(0.0).as("d"), col("rep").as("nbg"))
    val cand = selfCand.unionByName(
      pts.join(nbrCand, Seq("rep"))
        .select(col("v"), col("nb"), col("d"), col("nbg")))
    graft.plans.TopKPerGroup(cand, Seq("v"), Seq("d", "nb"), k)
      .select(col("v"), col("nb"), col("d"), col("nbg"), col("rk"))
  }

  /** Expand a per-group frame (keyed `rep`) back to one row per point. */
  def expand(e: DataFrame, perGroup: DataFrame): DataFrame =
    mark(e).select(col("vec_id"), col("rep")).join(perGroup, Seq("rep"))
}
