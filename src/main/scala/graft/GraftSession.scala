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
  def build(cpus: String): SparkSession =
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
      // few GB. A 2min sweep costs one minor driver GC and keeps disk
      // proportional to LIVE state. On a cluster the same knob guards
      // executor local disks.
      .config("spark.cleaner.periodicGC.interval", "2min")
      // NOTE: spark.sql.optimizer.canChangeCachedPlanOutputPartitioning was
      // tried and reverted: AQE coalesces small cached frames (embeddings,
      // ε-pairs) to 1 partition, serializing every downstream pair join —
      // the same single-partition trap as the one-row-group testdata scans.
      .withExtensions(new GraftExtensions)
      .getOrCreate()
}
