package graft.operators.clustering

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — DataFrame-native.
  *
  * Used by [[Dbscan]] to turn the core-core ε-graph into cluster ids
  * (reference: sklearn DBSCAN's internal region-merge,
  * silhouettes.ipynb:264-310). Replaces GraphX Pregel, which carried ≈5 s of
  * fixed RDD-scheduling overhead per call locally and hides its joins from
  * Catalyst/AQE.
  *
  * Two phases, both shuffle-bounded:
  *  1. partition-local union-find contraction (`mapPartitions`): each task
  *     collapses the edges it holds into min-id stars in one pass. Output is
  *     ≤ one edge per (node, partition) — a component-preserving rewrite that
  *     removes local redundancy map-side before anything shuffles.
  *  2. alternating large-star / small-star rounds (Kiveris et al.,
  *     "Connected Components in MapReduce and Beyond", 2014): O(log²) rounds
  *     to a fixpoint, each round a groupBy-min plus a self-join — plain
  *     Catalyst operators that AQE can size, coalesce, and skew-split. As
  *     soon as the contracted edge set fits a single task
  *     (`localFinishThreshold`), one executor finishes it with an exact
  *     union-find — no further rounds, no driver collect.
  *
  * Determinism: the component id is the minimum node id of the component,
  * independent of partitioning. Each round's edge set is `localCheckpoint`ed
  * (materialized, lineage cut) so the loop is iteration-safe at any scale.
  */
object ConnectedComponents {

  /** @param edges  two integral-typed columns; direction and duplicates are
    *               irrelevant (symmetrized internally), self-loops ignored.
    * @param localFinishThreshold  once the contracted edge set has at most
    *               this many rows (~16 B each) it is collapsed in ONE task's
    *               union-find instead of more shuffle rounds — the common
    *               exit even at cluster scale, since contraction shrinks the
    *               graph geometrically.
    * @return ("id", "component") for every node incident to ≥1 non-loop
    *         edge; component = min node id of its connected component.
    *         Isolated nodes and self-loops never appear (callers coalesce
    *         to the node's own id; GraphPropertySpec pins both).
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          maxRounds: Int = 25, localFinishThreshold: Long = 4000000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    val raw = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter($"u" =!= $"v")
      .as[(Long, Long)]

    // Phase 1: per-partition union-find → canonical (hi, lo) min-stars.
    var cur = raw.mapPartitions(localStars(_, withRoots = false))
      .toDF("u", "v").distinct().localCheckpoint(true)
    var prev = signature(cur)
    var round = 0
    var converged = false
    while (!converged && prev._1 > localFinishThreshold && round < maxRounds) {
      val next = smallStar(largeStar(cur)).localCheckpoint(true)
      val sig = signature(next)
      converged = sig == prev
      prev = sig
      cur = next
      round += 1
    }

    if (prev._1 <= localFinishThreshold) {
      // Small enough for one executor: exact union-find in a single task
      // (NOT the driver — the data never moves off the cluster).
      cur.as[(Long, Long)].coalesce(1)
        .mapPartitions(localStars(_, withRoots = true))
        .toDF("id", "component")
    } else if (converged) {
      // Star-round fixpoint: every edge is (node, root-of-component).
      cur.select($"u".as("id"), $"v".as("component"))
        .union(cur.select($"v".as("id"), $"v".as("component")))
        .distinct()
    } else {
      // maxRounds exhausted above the single-task threshold: emitting the
      // unconverged star set would silently mislabel — fail loudly instead.
      throw new IllegalStateException(
        s"ConnectedComponents did not converge in $maxRounds rounds " +
          s"(${prev._1} edges remain); raise maxRounds or localFinishThreshold")
    }
  }

  /** large-star: every node points its larger neighbors at the minimum of
    * its neighborhood (incl. itself). Keeps edges canonical (first > second). */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min(col("v")).as("mv"))
      .select(col("u"), least(col("u"), col("mv")).as("m"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /** small-star: every node links all its smaller neighbors (and itself) to
    * the smallest of them. Input and output are canonical (first > second). */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy("u").agg(min(col("v")).as("m"))
    e.join(mins, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
      .union(mins.select(col("u"), col("m").as("v")))
      .distinct()
  }

  /** Cheap fixpoint probe: (row count, order-independent xor of edge hashes).
    * Sound on distinct canonical edge sets. */
  private def signature(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Min-rooted union-find with path halving over one partition's edges;
    * emits (node, min-of-local-component) for every non-root node, plus
    * (root, root) rows when `withRoots` (the final-labels shape). */
  private def localStars(it: Iterator[(Long, Long)],
                         withRoots: Boolean): Iterator[(Long, Long)] = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrElse(x, x)
      while (p != x) {
        val gp = parent.getOrElse(p, p)
        parent(x) = gp
        x = p
        p = gp
      }
      x
    }
    it.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keysIterator.flatMap { n =>
      val r = find(n)
      if (r != n || withRoots) Iterator((n, r)) else Iterator.empty
    }
  }
}
