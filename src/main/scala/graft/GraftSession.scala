package graft

import org.apache.spark.sql.SparkSession

/** Single place every entrypoint (Verify, Bench, specs, tools) builds its
  * SparkSession, so tuning applies uniformly.
  *
  * Notable settings:
  *  - `shuffle.partitions` = local core count (32 in the driver's harness,
  *    not the 200 default); on a real cluster this scales with executors.
  *  - `objectHashAggregate.sortBased.fallbackThreshold`: the 128-entry
  *    default demotes every TypedImperativeAggregate (our MinHash/SimHash
  *    sketches, collect_set) to sort-based aggregation as soon as a
  *    partition sees 129 groups — i.e. always — turning O(rows) hash
  *    aggregation into an O(rows log rows) sort of the widest frames.
  *    Groups here are doc-sized (≤ ~2 KB buffers), so 256k entries/
  *    partition is well within executor memory at this partition sizing.
  */
object GraftSession {
  /** `periodicGC`: the default cleaner interval when the
    * GRAFT_PERIODIC_GC env var is unset. Gate-scale entrypoints
    * (Bench/Verify/specs) keep Spark's 30min; the BIG-corpus tools
    * (ScaleCorpus, the sf10 probes) pass "2min" themselves so the
    * disk-exhaustion guard cannot be forgotten (the r12 review: an
    * env-var-only knob silently reverts the exact workloads that
    * needed it). */
  def build(cpus: String, periodicGC: String = "30min"): SparkSession =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "262144")
      // Dead shuffle files and unreferenced localCheckpoint blocks are
      // reclaimed by the ContextCleaner only after a DRIVER GC; the 30min
      // default interval lets a multi-stage query (the graph build at the
      // 100x probe corpus ran 60+ stages) accumulate >70GB of dead scratch
      // and exhaust the disk even though no single stage needs more than a
      // few GB. A short sweep keeps disk proportional to LIVE state — but
      // it forces a FULL driver GC each interval, and in local mode the
      // driver JVM is also every executor, so at gate scale (sf≤0.1,
      // seconds-long queries) the stop-the-world pauses tax every query
      // for a disk problem that doesn't exist there (the r11 driver sweep
      // inflated untouched queries 1.1-1.4x after this was added
      // unconditionally — the r11 verdict's top finding; the r12 isolated
      // A/B measured the 2min sweep at +7.1% overall on a 25-query sf0.1
      // subset, reps=5, and up to +41% on sub-second queries).
      // So: Spark's 30min default at gate scale, opt in for big corpora
      // (the sf10 probe, ScaleCorpus) via GRAFT_PERIODIC_GC=2min. On a
      // real cluster executor local disks are guarded the same way, and
      // the GC lands on executors, not the query-planning driver.
      .config("spark.cleaner.periodicGC.interval",
        sys.env.getOrElse("GRAFT_PERIODIC_GC", periodicGC))
      // NOTE: spark.sql.optimizer.canChangeCachedPlanOutputPartitioning was
      // tried and reverted: AQE coalesces small cached frames (embeddings,
      // ε-pairs) to 1 partition, serializing every downstream pair join —
      // the same single-partition trap as the one-row-group testdata scans.
      .withExtensions(new GraftExtensions)
      .getOrCreate()
}
