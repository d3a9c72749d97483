package graft.operators.clustering

import graft.{QueryModule, Tables}
import graft.functions.VectorOps._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed DBSCAN (SURVEY §2) — the reference sweeps sklearn DBSCAN
  * over (eps, min_samples) (silhouettes.ipynb:264-310).
  *
  * Stages:
  *  0. exact-duplicate contraction ([[contractDups]]): identical vectors
  *     collapse to one representative carrying a multiplicity — the
  *     ε-pair scan then runs on DISTINCT vectors only. Duplicates share
  *     neighborhoods exactly (d(x,p)=d(y,p) when x=y), so weighted
  *     neighbor counts give identical core/border decisions and the
  *     per-point labels expand back losslessly; the pair set shrinks
  *     QUADRATICALLY in duplicate depth. On a duplicate-heavy corpus
  *     (real web-scale text is; the sf10 ScaleCorpus plants 100 copies
  *     per base vector) this is the difference between 10⁴ and 10⁸ pair
  *     rows per neighborhood;
  *  1. ε-neighbor pairs — EXACT metric blocking ([[epsPairs]]): band on a
  *     pivot distance + salted equi-join, never a nested-loop join over
  *     the full table;
  *  2. core groups = weighted neighbor count (own copies + Σ multiplicity
  *     of ε-neighbor groups) ≥ minPts — every member of a group is core
  *     iff the group is;
  *  3. clusters = connected components of the core-core group graph
  *     ([[ConnectedComponents]]: partition-local union-find contraction +
  *     alternating star rounds). Copies of a core vector are mutually
  *     connected at distance 0, which the contraction models for free
  *     (one node);
  *  4. border groups adopt the smallest cluster among their core neighbor
  *     groups; everything else is noise (cluster -1).
  *
  * Deterministic: cluster id = min core vec_id in the component — the
  * representative is the group's min id, so min-over-reps equals
  * min-over-points and labels are bit-identical to the uncontracted run
  * (DbscanSpec proves both against a brute-force reference on planted
  * duplicates; the DuckDB oracle replays point-level semantics).
  */
object Dbscan {

  /** Contraction pays when the pair scan shrinks ~(ratio)²; below this
    * duplicate ratio the window + weighted joins are pure overhead and
    * the point-level plan is right. Plan-only gate — both paths are
    * exact (DbscanSpec proves the contracted one against brute force;
    * the DuckDB oracle replays point-level either way). */
  val MinContractRatio = 1.25

  /** One cheap probe job: rows / approx-distinct vectors. HLL error
    * (±2%) is irrelevant at the 1.25 boundary — corpora sit at 1.0
    * (unique) or ≫2 (duplicate-heavy web data). Guarded by a FREE
    * plan-stats size check (KnnContracted.MinProbeBytes): under it the
    * pair scan is cheap either way and even the probe job is
    * measurable overhead at bench granularity. */
  private[clustering] def shouldContract(points: DataFrame,
                                         vecCol: String): Boolean = {
    if (points.queryExecution.optimizedPlan.stats.sizeInBytes <
        graft.operators.search.KnnContracted.MinProbeBytes) return false
    val r = points.agg(count(lit(1)),
      approx_count_distinct(col(vecCol))).head()
    r.getLong(0).toDouble >=
      MinContractRatio * math.max(1L, r.getLong(1)).toDouble
  }

  /** Stage 0: tag every row with its duplicate-group representative
    * (min id among rows with an identical vector) and the group's
    * multiplicity. ONE wide shuffle (window over the vector value); rows
    * with a NULL vector each form their own singleton group so their
    * no-neighbor noise semantics survive contraction. */
  private[clustering] def contractDups(points: DataFrame, idCol: String,
                                       vecCol: String): DataFrame = {
    val byVec = Window.partitionBy(
      col(vecCol), when(col(vecCol).isNull, col(idCol)))
    points.select(col(idCol), col(vecCol))
      .withColumn("rep", min(col(idCol)).over(byVec))
      .withColumn("m", count(lit(1)).over(byVec))
  }

  /** Exact ε-candidate pairs via metric-space blocking (LAESA/iDistance
    * family — public pivot-pruning technique). For any pivot p the triangle
    * inequality gives |d(x,p) − d(y,p)| ≤ d(x,y), so a true ε-pair can
    * never be more than one ε-wide band apart in pivot-distance order:
    *
    *  - band id  = floor(d(x, pivot₀) / w), w = eps (+1e-9 fp slack);
    *  - A side replicates to bands {b−1, b, b+1} × a salt in [0, S) —
    *    B side keys by (own band, id mod S) — so the join is a pure
    *    EQUI-join on (band, salt): shuffle-partitioned, AQE-splittable,
    *    each true pair produced exactly once, parallelism ≥ bands × S
    *    even when one band holds the whole table (the high-dim worst
    *    case, where NO exact scheme can prune);
    *  - remaining pivots prune candidates with scalar |pdₖ(a) − pdₖ(b)| ≤ w
    *    checks before the full-dimension distance.
    *
    * On clustered data with eps below the inter-cluster scale the band
    * join prunes most of the O(n²); on isotropic data it degrades to the
    * unavoidable all-pairs distance count but keeps the scalable plan
    * shape (no BroadcastNestedLoopJoin, bounded per-task work).
    *
    * Returns symmetric (i, j, dist) rows with i ≠ j and dist ≤ maxEps.
    */
  def epsPairs(points: DataFrame, idCol: String, vecCol: String,
               maxEps: Double, nPivots: Int = 4, salt: Int = 32): DataFrame = {
    require(maxEps > 0, s"maxEps must be positive, got $maxEps")
    require(nPivots > 0, s"need at least one pivot, got $nPivots")
    require(salt > 0, s"salt must be positive, got $salt")
    val w = maxEps + 1e-9 // band width; slack absorbs double rounding
    val pts = points.select(col(idCol).as("pid"), col(vecCol).as("pv"))
    // deterministic driver-sized pivot set: the nPivots lowest-id points
    // (same collect-small pattern as IvfIndex centroids)
    val pivots: Array[Seq[Double]] = pts
      .orderBy(col("pid")).limit(nPivots)
      .select(col("pv").cast("array<double>"))
      .collect().map(_.getSeq[Double](0))
    if (pivots.isEmpty)
      return pts.select(col("pid").as("i"), col("pid").as("j"),
        lit(0.0).as("dist")).limit(0)
    val withPd = pivots.zipWithIndex.foldLeft(pts) { case (df, (p, k)) =>
      df.withColumn(s"pd$k", euclidean_dist(col("pv"), typedLit(p)))
    }
    val binned = withPd.withColumn("band", floor(col("pd0") / w).cast("long"))
    val aSide = binned.columns.foldLeft(binned)((df, c) =>
        df.withColumnRenamed(c, if (c == "pid") "i" else if (c == "pv") "va" else s"a_$c"))
      .withColumn("kb", explode(array(col("a_band") - 1, col("a_band"), col("a_band") + 1)))
      .withColumn("q", explode(array((0 until salt).map(lit(_)): _*)))
    val bSide = binned.columns.foldLeft(binned)((df, c) =>
        df.withColumnRenamed(c, if (c == "pid") "j" else if (c == "pv") "vb" else s"b_$c"))
      // hash-based salt keeps the id column type-generic (ids need not be
      // numeric) and spreads sequential ids across salts
      .withColumn("q", pmod(xxhash64(col("j")), lit(salt.toLong)).cast("int"))
    val pivotPrune = (1 until pivots.length)
      .map(k => abs(col(s"a_pd$k") - col(s"b_pd$k")) <= w)
      .foldLeft(col("i") =!= col("j"))(_ && _)
    aSide.join(bSide, aSide("kb") === bSide("b_band") && aSide("q") === bSide("q"))
      .filter(pivotPrune)
      .withColumn("dist", euclidean_dist(col("va"), col("vb")))
      .filter(col("dist") <= maxEps)
      .select(col("i"), col("j"), col("dist"))
  }

  def run(points: DataFrame, idCol: String, vecCol: String,
          eps: Double, minPts: Int, maxIter: Int = 20,
          contract: Option[Boolean] = None): DataFrame = {
    if (!contract.getOrElse(shouldContract(points, vecCol))) {
      // duplicate-poor corpus: every point is its own group — no window,
      // no weighted joins, no expansion; the original point-level plan
      val groups = points.select(col(idCol).as("rep"), col(vecCol),
        lit(1L).as("m"))
      val pairs = epsPairs(groups, "rep", vecCol, eps).select(col("i"), col("j"))
      return labelGroups(groups, pairs, minPts, maxIter, weighted = false)
        .select(col("rep").as(idCol), col("cluster"), col("is_core"))
    }
    val marked = contractDups(points, idCol, vecCol).cache()
    val groups = marked.filter(col(idCol) === col("rep"))
      .select(col("rep"), col(vecCol), col("m"))
    val pairs = epsPairs(groups, "rep", vecCol, eps).select(col("i"), col("j"))
    val grpLabels = labelGroups(groups, pairs, minPts, maxIter, weighted = true)
    // lossless expansion: every member inherits its group's label — core
    // status and cluster are group properties (identical vectors have
    // identical neighborhoods)
    marked.select(col(idCol), col("rep"))
      .join(grpLabels, Seq("rep"))
      .select(col(idCol), col("cluster"), col("is_core"))
  }

  /** Stages 2-4 on the CONTRACTED graph: `groups` = (rep, m) one row per
    * distinct vector, `pairs0` = symmetric ε-pairs between group
    * representatives. Returns (rep, cluster, is_core) per group. */
  private def labelGroups(groups: DataFrame, pairs0: DataFrame,
                          minPts: Int, maxIter: Int,
                          weighted: Boolean): DataFrame = {
    val pairs = pairs0.cache()
    val mByRep = groups.select(col("rep"), col("m"))
    // weighted neighbor count incl. self-copies: a member of group g has
    // (m_g − 1) zero-distance duplicate neighbors plus every member of
    // each ε-neighbor group — n_nb + 1 = m_g + Σ_{(g,h)∈pairs} m_h.
    // In the unweighted (m ≡ 1) branch Σ m_h is a plain pair count — no
    // multiplicity join needed.
    val ext =
      if (weighted) pairs
        .join(mByRep.select(col("rep").as("j"), col("m").as("m_j")), Seq("j"))
        .groupBy(col("i")).agg(sum(col("m_j")).as("ext"))
      else pairs.groupBy(col("i")).agg(count(lit(1)).as("ext"))
    // minPts <= 1: every point is core (incl. zero-neighbor points absent
    // from the pairs frame) — matches sklearn min_samples=1 semantics
    val core =
      if (minPts <= 1) mByRep.select(col("rep").as("i")).cache()
      else mByRep.select(col("rep").as("i"), col("m"))
        .join(ext, Seq("i"), "left")
        .filter(col("m") + coalesce(col("ext"), lit(0L)) >= minPts)
        .select(col("i")).cache()
    // core-core edges (symmetric); intra-group edges are implicit (one node)
    val coreEdges = pairs
      .join(core.select(col("i")), Seq("i"))
      .join(core.select(col("i").as("j")), Seq("j"))
    // connected components of the core group graph — DataFrame-native
    // contraction + star rounds (see ConnectedComponents); component id =
    // min core rep = min core vec_id (reps are group-min ids), so labels
    // equal the uncontracted run's (deterministic)
    val isolatedCores = core // cores with no core neighbor form singleton clusters
    val ccDf = ConnectedComponents.run(coreEdges, "i", "j", maxRounds = maxIter)
      .select(col("id").as("i"), col("component").as("cl"))
    val labels = isolatedCores.join(ccDf, Seq("i"), "left")
      .select(col("i"), coalesce(col("cl"), col("i")).as("cl"))
      .cache()
    // border assignment: smallest core-neighbor group's cluster
    // labels has exactly one row per core group, so this single join both
    // restricts j to core neighbors and fetches their cluster
    val borderLabels = pairs
      .join(labels.select(col("i").as("j"), col("cl")), Seq("j"))
      .groupBy(col("i")).agg(min(col("cl")).as("border_cl"))
    val out = groups.select(col("rep").as("i"))
      .join(labels.withColumnRenamed("cl", "core_cl"), Seq("i"), "left")
      .join(borderLabels, Seq("i"), "left")
      .select(col("i").as("rep"),
        coalesce(col("core_cl"), col("border_cl"), lit(-1L)).as("cluster"),
        col("core_cl").isNotNull.as("is_core"))
    // NOTE: pairs/core/labels stay cached — the returned plan is lazy, so
    // an eager unpersist here would drop them before execution and force
    // full recomputation of every branch. Spark evicts them LRU.
    out
  }

  /** Hyperparameter sweep (reference: silhouettes.ipynb:264-310 sweeps
    * sklearn DBSCAN over eps). Returns one summary row per eps:
    * cluster / core / border / noise counts — identical to running
    * [[run]] per ε and aggregating, but computed INCREMENTALLY:
    *
    * Activation thresholds (the HDBSCAN mutual-reachability idea,
    * Campello et al. 2013, applied to a discrete ε grid): for minPts the
    * point i becomes core exactly at ct(i) = its (minPts−1)-th smallest
    * neighbor distance, and the pair (i,j) becomes a core-core edge
    * exactly at t(i,j) = max(dist(i,j), ct(i), ct(j)). Both are computed
    * ONCE from the shared max-ε pair scan; every per-ε quantity is then a
    * cut of these monotone structures:
    *
    *  - n_core / n_border / n_noise for ALL ε arms come from ONE
    *    aggregation over a per-node (ct, bt) frame, where bt(i) =
    *    minⱼ max(dist(i,j), ct(j)) is the ε at which i first has a core
    *    neighbor — no per-ε joins at all;
    *  - n_clusters needs components: the ε arms ascend, and since
    *    G(ε₁) ⊆ G(ε₂) components only MERGE, so arm k runs connected
    *    components on the QUOTIENT graph — only the edges newly activated
    *    in (εₖ₋₁, εₖ], with endpoints contracted through the previous
    *    arm's labels. One full CC at the smallest ε, then near-empty CC
    *    rounds per extra arm, instead of a full CC + label pipeline per
    *    arm. Isolated cores (no active incident edge) count as singleton
    *    clusters: n_clusters = components(ε) + (n_core − nodes-in-CC).
    *
    * The per-node core threshold uses the bounded TopKPerGroup heap
    * (k = minPts−1 per node); for node cardinalities beyond its
    * per-partition group cap, swap in the window-sort formulation.
    * All driver-side results are O(#arms) numbers; nothing data-sized
    * leaves the executors. */
  def sweep(points: DataFrame, idCol: String, vecCol: String,
            epsList: Seq[Double], minPts: Int, maxIter: Int = 20,
            contract: Option[Boolean] = None): DataFrame = {
    require(epsList.nonEmpty, "epsList must not be empty")
    val spark = points.sparkSession
    import spark.implicits._
    val epsSorted = epsList.sorted
    // stage 0 as in [[run]]: the sweep's shared max-ε pair scan — the
    // stage whose multi-ε shuffle blew a 75 GB disk envelope at sf10
    // before contraction — runs on distinct vectors only; all per-ε
    // statistics are multiplicity-weighted sums, and no expansion back to
    // points is needed because the output is O(#arms) aggregate rows.
    // Same plan-only gate as [[run]]: a duplicate-poor corpus skips the
    // window and the weighted ct machinery entirely.
    val weighted = contract.getOrElse(shouldContract(points, vecCol))
    val marked =
      if (weighted) contractDups(points, idCol, vecCol).cache()
      else points.select(col(idCol), col(vecCol), col(idCol).as("rep"),
        lit(1L).as("m"))
    val groups = marked.filter(col(idCol) === col("rep"))
      .select(col("rep"), col(vecCol), col("m")).cache()
    val mByRep = groups.select(col("rep"), col("m"))
    val distPairs = epsPairs(groups, "rep", vecCol, epsSorted.last).cache()
    // ct(g): the ε at which g's members become core (null = never within
    // the sweep) — the weighted (minPts − m_g)-th smallest neighbor-GROUP
    // distance; 0 when the group's own copies already reach minPts.
    // minPts ≤ 1 is sklearn min_samples=1: every point core immediately
    // (subsumed by m ≥ 1 ≥ minPts).
    val ct =
      if (minPts <= 1) mByRep.select(col("rep").as("i"), lit(0.0).as("ct"))
      else if (!weighted)
        // m ≡ 1: the weighted k-th order statistic IS the (minPts−1)-th
        // smallest pair distance — the bounded heap alone suffices
        graft.plans.TopKPerGroup(distPairs, Seq("i"), Seq("dist", "j"),
            minPts - 1)
          .filter(col("rk") === minPts - 1)
          .select(col("i"), col("dist").as("ct"))
          .cache()
      else {
        val withMj = distPairs
          .join(mByRep.select(col("rep").as("j"), col("m").as("m_j")), Seq("j"))
        // every pair row carries weight ≥ 1, so the weighted k-th element
        // lies within the first (minPts − 1) rows by dist: the bounded
        // TopKPerGroup heap still applies, followed by a cumsum over at
        // most (minPts − 1) rows per group
        val top = graft.plans.TopKPerGroup(
          withMj, Seq("i"), Seq("dist", "j"), minPts - 1)
        val cum = top.withColumn("cumw", sum(col("m_j"))
          .over(Window.partitionBy(col("i")).orderBy(col("dist"), col("j"))))
        val ctExt = cum
          .join(mByRep.select(col("rep").as("i"), col("m").as("m_i")), Seq("i"))
          .filter(col("cumw") >= lit(minPts.toLong) - col("m_i"))
          .groupBy(col("i")).agg(min(col("dist")).as("ct_ext"))
        mByRep.select(col("rep").as("i"), col("m"))
          .join(ctExt, Seq("i"), "left")
          .select(col("i"),
            when(col("m") >= minPts, lit(0.0)).otherwise(col("ct_ext")).as("ct"))
          .filter(col("ct").isNotNull)
          .cache() // feeds bt, nodeStats and both tEdges sides
      }
    // Attach ct to the i side of the SYMMETRIC pair frame once; both
    // threshold structures reduce from it without further joins:
    //  - the unordered pair (a,b) appears as (a,b,ct_a) and (b,a,ct_b), so
    //    max over the pair group of act = max(dist, ct_i) IS the edge
    //    activation t(a,b) = max(dist, ct_a, ct_b) — requiring both
    //    directions present (sides = 2) enforces both-endpoints-core;
    //  - min over j's partner group of the same act IS bt(j), the ε at
    //    which j first has a core neighbor (border activation). A group's
    //    OWN copies never matter here: they become core exactly at ct_g,
    //    and a point only counts as border while ct_g > ε.
    val withCt = distPairs
      .join(ct.select(col("i"), col("ct").as("ct_i")), Seq("i"))
      .select(col("i"), col("j"), greatest(col("dist"), col("ct_i")).as("act"))
      .cache()
    val tEdges = withCt
      .groupBy(least(col("i"), col("j")).as("i"),
        greatest(col("i"), col("j")).as("j"))
      .agg(max(col("act")).as("t"), count(lit(1)).as("sides"))
      .filter(col("sides") === 2).drop("sides")
      .cache()
    tEdges.count()
    val bt = withCt.groupBy(col("j").as("i")).agg(min(col("act")).as("bt"))
    val nodeStats = mByRep.select(col("rep").as("i"), col("m"))
      .join(ct, Seq("i"), "left").join(bt, Seq("i"), "left").cache()
    // ONE pass over the per-group frame for every arm's core/border/noise
    // (m-weighted point counts) plus the per-arm core GROUP count the
    // singleton-cluster arithmetic needs (a core group with no active
    // edge is ONE cluster regardless of its multiplicity — its copies are
    // mutually connected at distance 0)
    val statCols = epsSorted.zipWithIndex.flatMap { case (e, ix) => Seq(
      sum(when(col("ct") <= e, col("m")).otherwise(0L)).as(s"core$ix"),
      sum(when(col("ct") <= e, 1L).otherwise(0L)).as(s"coreg$ix"),
      sum(when((col("ct").isNull || col("ct") > e) && col("bt") <= e, col("m"))
        .otherwise(0L)).as(s"border$ix")) }
    val totals = nodeStats.agg(sum(col("m")).as("n_total"), statCols: _*).head()
    val nTotal = totals.getLong(0)
    // ascending quotient-CC chain for n_clusters
    var comp: DataFrame = null // (id, component) over edge-incident cores
    var prevEps = Double.NegativeInfinity
    val rows = epsSorted.zipWithIndex.map { case (eps, ix) =>
      val delta = tEdges.filter(col("t") > prevEps && col("t") <= eps)
        .select("i", "j")
      val qEdges =
        if (comp == null) delta
        else delta
          .join(comp.select(col("id").as("i"), col("component").as("c_i")),
            Seq("i"), "left")
          .join(comp.select(col("id").as("j"), col("component").as("c_j")),
            Seq("j"), "left")
          .select(coalesce(col("c_i"), col("i")).as("i"),
            coalesce(col("c_j"), col("j")).as("j"))
          .filter(col("i") =!= col("j"))
      val q = ConnectedComponents.run(qEdges, "i", "j", maxRounds = maxIter)
      comp = (
        if (comp == null) q
        else comp
          .join(q.select(col("id").as("component"), col("component").as("c2")),
            Seq("component"), "left")
          .select(col("id"), coalesce(col("c2"), col("component")).as("component"))
          // quotient rows whose id is a NEW node (first edge in this arm)
          .unionByName(q.join(comp.select("id"), Seq("id"), "left_anti"))
        ).localCheckpoint(true)
      prevEps = eps
      val cc = comp.agg(count(lit(1)), countDistinct(col("component"))).head()
      val (ccNodes, ccComps) = (cc.getLong(0), cc.getLong(1))
      val nCore = totals.getLong(totals.fieldIndex(s"core$ix"))
      // singleton clusters count GROUPS: isolated core groups not in the
      // CC node set each form one cluster (their copies are one component)
      val nCoreG = totals.getLong(totals.fieldIndex(s"coreg$ix"))
      val nBorder = totals.getLong(totals.fieldIndex(s"border$ix"))
      (eps, ccComps + (nCoreG - ccNodes), nCore, nBorder, nTotal - nCore - nBorder)
    }
    distPairs.unpersist(false); ct.unpersist(false); withCt.unpersist(false)
    nodeStats.unpersist(false); tEdges.unpersist(false)
    marked.unpersist(false); groups.unpersist(false)
    rows.toDF("eps", "n_clusters", "n_core", "n_border", "n_noise")
      .orderBy("eps")
  }
}

object DbscanQueries extends QueryModule {
  /** ε at the ~5th percentile of pairwise distance on the synthetic
    * embeddings (1.26) — forms one dense component + noise. */
  def qDbscan(spark: SparkSession, dir: String): DataFrame =
    Dbscan.run(Tables.embeddings(spark, dir), "vec_id", "embedding",
      eps = 1.26, minPts = 4)
      .groupBy(col("cluster"), col("is_core"))
      .agg(count(lit(1)).as("n"))
      .orderBy("cluster", "is_core")

  /** ε-sweep up to the 5th-percentile distance (denser ε-graphs grow the
    * edge set super-linearly — sweep below the operating point, as the
    * reference's sweep does). */
  def qDbscanSweep(spark: SparkSession, dir: String): DataFrame =
    Dbscan.sweep(Tables.embeddings(spark, dir), "vec_id", "embedding",
      epsList = Seq(1.20, 1.26), minPts = 4)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dbscan" -> (qDbscan _),
    "q_dbscan_sweep" -> (qDbscanSweep _))

  /** DBSCAN is oracle-checkable: DuckDB replays the exact semantics —
    * ε-pairs, core = |N(i)|+1 ≥ minPts, clusters = connected components
    * of the core graph labeled by min core id, borders adopt the
    * smallest core-neighbor's cluster, rest is noise.
    *
    * The component labels are computed by UNROLLED min-label propagation
    * WITH POINTER JUMPING, not a recursive transitive closure: the r9
    * sf1 campaign measured the `reach` closure materializing Σ|comp|²
    * rows (>70 min on the duplicate-dense 20k-node corpus), and the
    * planned `USING KEY` recursion needs DuckDB ≥1.3 (driver ships
    * 1.0.0). Each of the [[CcRounds]] rounds is (a) adopt the min label
    * over self ∪ neighbors (one |edges| join + group-by), then (b) jump:
    * relabel through the label's OWN current label (one |nodes|
    * self-join) — labels reach along 2^r-length paths, so 12 rounds
    * cover any component diameter < 4096, far beyond any ε-graph here;
    * work per round is linear in edges, never Σ|comp|². Labels at the
    * fixed point equal min-reachable-id — identical to the closure's.
    *
    * The unroll is GUARDED: the final CTE compares the last two rounds
    * and folds `error(...)` into the select when they differ. The step
    * is a deterministic function of the previous labels, so equal
    * consecutive iterates ⟺ a true fixpoint; a pathological component
    * with diameter ≥ 2^CcRounds therefore fails the oracle LOUDLY
    * instead of silently grading against non-minimal labels (the Spark
    * engine's [[ConnectedComponents]] throws on non-convergence — this
    * gives the oracle the same contract). Cost: one extra |nodes| join. */
  private[operators] val CcRounds = 12

  /** lbl0 → (propagate ∪ self, min) → jump, unrolled with a convergence
    * guard; yields `$out AS (node i, component label cl)` from
    * `$nodes`/`$edges`. */
  private[operators] def ccByLabelProp(nodes: String, edges: String,
                                        p: String, out: String): String = {
    val rounds = (1 to CcRounds).map { r =>
      s"""${p}pp$r AS MATERIALIZED (SELECT i, min(cl) AS cl FROM (
         |    SELECT c.i, l.cl FROM $edges c JOIN ${p}lp${r - 1} l ON l.i = c.j
         |    UNION ALL SELECT i, cl FROM ${p}lp${r - 1}) GROUP BY i),
         |${p}lp$r AS MATERIALIZED (
         |  SELECT a.i, q.cl FROM ${p}pp$r a JOIN ${p}pp$r q ON q.i = a.cl)""".stripMargin
    }
    s"""${p}lp0 AS MATERIALIZED (SELECT i, i AS cl FROM $nodes),
       |${rounds.mkString(",\n")},
       |${p}ccchk AS (SELECT count(*) AS n_moved
       |  FROM ${p}lp$CcRounds a JOIN ${p}lp${CcRounds - 1} b ON a.i = b.i
       |  WHERE a.cl <> b.cl),
       |$out AS MATERIALIZED (SELECT i,
       |    CASE WHEN (SELECT n_moved FROM ${p}ccchk) > 0
       |      THEN CAST(error('cc label propagation not converged in $CcRounds rounds — component diameter exceeds the unroll') AS BIGINT)
       |      ELSE cl END AS cl
       |  FROM ${p}lp$CcRounds)""".stripMargin
  }

  private def dbscanCtes(eps: String, minPts: Int, s: String): String =
    s"""pairs$s AS MATERIALIZED (
       |  SELECT a.vec_id AS i, b.vec_id AS j
       |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
       |  WHERE list_distance(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) <= $eps),
       |core$s AS MATERIALIZED (SELECT i FROM pairs$s GROUP BY i HAVING count(*) + 1 >= $minPts),
       |ce$s AS MATERIALIZED (SELECT p.i, p.j FROM pairs$s p
       |       JOIN core$s c1 ON p.i = c1.i JOIN core$s c2 ON p.j = c2.i),
       |${ccByLabelProp(s"core$s", s"ce$s", s"cc$s", s"corelbl$s")},
       |borderlbl$s AS (
       |  SELECT p.i, min(l.cl) AS cl
       |  FROM pairs$s p JOIN corelbl$s l ON p.j = l.i
       |  WHERE p.i NOT IN (SELECT i FROM core$s)
       |  GROUP BY p.i),
       |lbl$s AS (
       |  SELECT e.vec_id,
       |    coalesce(c.cl, b.cl, -1) AS cluster,
       |    (c.cl IS NOT NULL) AS is_core
       |  FROM embeddings e
       |  LEFT JOIN corelbl$s c ON e.vec_id = c.i
       |  LEFT JOIN borderlbl$s b ON e.vec_id = b.i)""".stripMargin

  private def sweepRowSql(eps: String, s: String): String =
    s"""SELECT CAST($eps AS DOUBLE) AS eps,
       |  count(DISTINCT CASE WHEN cluster >= 0 THEN cluster END) AS n_clusters,
       |  CAST(sum(CASE WHEN is_core THEN 1 ELSE 0 END) AS BIGINT) AS n_core,
       |  CAST(sum(CASE WHEN NOT is_core AND cluster >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_border,
       |  CAST(sum(CASE WHEN cluster = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_noise
       |FROM lbl$s""".stripMargin

  override def oracles: Map[String, String] = Map(
    "q_dbscan" ->
      s"""WITH ${dbscanCtes("1.26", 4, "")}
         |SELECT cluster, is_core, count(*) AS n FROM lbl
         |GROUP BY cluster, is_core ORDER BY cluster, is_core""".stripMargin,
    "q_dbscan_sweep" ->
      s"""WITH ${dbscanCtes("1.20", 4, "a")}, ${dbscanCtes("1.26", 4, "b")}
         |${sweepRowSql("1.20", "a")}
         |UNION ALL
         |${sweepRowSql("1.26", "b")}
         |ORDER BY eps""".stripMargin)
}
