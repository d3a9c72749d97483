package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * The reference's data model (a chunk table with embeddings + a centroid
  * table, SURVEY §3) is mapped onto `embeddings`/`documents`; the
  * descriptive-analytics notebooks map onto the TPC-H-ish tables.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** events with a µs-precision TimestampType `ts`, derived from
    * [[eventsNanos]] so both loaders agree on the physical-encoding
    * handling. ns→µs MUST be integer division: `col / 1000L` promotes to
    * double, and epoch-nanos (~2^60.6) exceed double's 53-bit mantissa —
    * rows land ±1 µs off vs DuckDB's exact epoch_ns, a latent hash flake
    * for any oracle that compares timestamps at full precision.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    eventsNanos(spark, dir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))

  /** events with ts as raw epoch NANOS (exact integers end to end) — the
    * input for operators that order/compare on full-precision time, e.g.
    * the as-of and range joins (TemporalJoins).
    *
    * SCHEMA-ADAPTIVE over the parquet's physical timestamp encoding — a
    * production ingest cannot assume its writer's choice, and the driver
    * has shipped events.parquet as both TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS) across corpus generations:
    *  - TIMESTAMP(NANOS): Spark's reader surfaces it as a plain long only
    *    under the legacy `nanosAsLong` conf — applied through a SCOPED
    *    dedicated reader session (see [[nanosReader]]), never by mutating
    *    the caller's session conf.
    *  - TIMESTAMP(MICROS), isAdjustedToUTC=false (pandas/arrow naive):
    *    inferred as TIMESTAMP_NTZ → cast to TimestampType (exact: the
    *    session timeZone is pinned UTC in GraftSession, so the naive
    *    value's micros ARE its epoch micros, matching how DuckDB reads
    *    the same column), then µs→ns is an exact integer multiply.
    *  - TIMESTAMP(MICROS/MILLIS), isAdjustedToUTC=true: TimestampType →
    *    unix_micros * 1000, exact.
    *
    * Representation bound: epoch-NANOS in a signed long covers
    * 1677-09-21..2262-04-11. A µs-encoded corpus can hold instants past
    * that (far-future sentinels like 9999-12-31); the ×1000 multiply
    * would wrap silently. Consumers needing sentinel-tolerant time
    * should read [[events]] (µs TimestampType) instead — the ns loader
    * exists for full-precision ORDERING, where wrapped sentinels would
    * sort wrong anyway and the corpus contract (driver testdata: all ts
    * within a year window) excludes them. */
  def eventsNanos(spark: SparkSession, dir: String): DataFrame = {
    // Try the caller's session first: every encoding except TIMESTAMP(NANOS)
    // reads without legacy confs. Only when the footer carries NANOS (the
    // one encoding Spark refuses by default) fall back to the scoped
    // reader — the caller's session conf is never touched, so no OTHER
    // parquet read in the session can accidentally observe nanos-as-long
    // (the exact cross-query state leak the r8 loader work was about).
    val df = try load(spark, dir, "events") catch {
      case t: Throwable if isNanosIllegalType(t) => loadNanosScoped(spark, dir)
    }
    val tsFixed = df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case org.apache.spark.sql.types.TimestampType =>
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          unix_micros(col("ts").cast(org.apache.spark.sql.types.TimestampType)) * lit(1000L))
      case other => throw new IllegalStateException(
        s"events.ts has unsupported physical type $other (expected " +
          "TIMESTAMP(NANOS)-as-long, TIMESTAMP, or TIMESTAMP_NTZ)")
    }
    // `props` arrived with the r7 corpus generation; older (or future
    // minimal) corpora lack it. Null-degrade instead of letting every
    // props consumer throw on a column the writer never promised —
    // same column-drift discipline as the ts encoding above.
    if (tsFixed.columns.contains("props")) tsFixed
    else tsFixed.withColumn("props", lit(null).cast("string"))
  }

  /** Dedicated reader session for TIMESTAMP(NANOS) parquet: a clone of the
    * caller's session (same context, copied conf) with the legacy
    * `nanosAsLong` conf set ON THE CLONE ONLY. The conf is consulted both
    * at schema inference and again when each scan builds its per-partition
    * reader — and the scan resolves it through the session captured in its
    * `HadoopFsRelation`, so transplanting the resolved plan onto the
    * caller's session (via ofRows) scopes the legacy behavior to exactly
    * this relation: planning, AQE, and every other read in the query run
    * under the caller's untouched conf. Cached per session — the clone is
    * conf-frozen at first use, which is safe because it only ever serves
    * this one relation shape. */
  private val nanosReaders =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, SparkSession]()
  private def nanosReader(spark: SparkSession): SparkSession =
    nanosReaders.computeIfAbsent(spark, s => {
      val clone = org.apache.spark.sql.graftshim.Shim.cloneSession(s)
      clone.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      clone
    })

  private def loadNanosScoped(spark: SparkSession, dir: String): DataFrame = {
    val scoped = nanosReader(spark).read.parquet(s"$dir/events.parquet")
    org.apache.spark.sql.graftshim.Shim.ofRows(spark, scoped.queryExecution.analyzed)
  }

  /** Does this failure (anywhere in its cause chain) say "parquet type I
    * refuse to read: TIMESTAMP(NANOS)"? The inference error can surface as
    * AnalysisException on the driver or wrapped in SparkException when
    * footer reading ran on executors. */
  private def isNanosIllegalType(t: Throwable): Boolean = {
    var cur = t
    while (cur != null) {
      val m = cur.getMessage
      if (m != null && m.toUpperCase(java.util.Locale.ROOT).contains("PARQUET TYPE") &&
          m.contains("NANOS")) return true
      cur = if (cur.getCause eq cur) null else cur.getCause
    }
    false
  }
  /** documents/embeddings feed pair-producing operators (self-joins over
    * blocks); the testdata parquet is a single row group → a single scan
    * partition, which would serialize every downstream pair kernel. These
    * tables are dimension-sized, so an up-front round-robin repartition is
    * ~free and restores the parallelism a multi-file production table has
    * naturally. */
  private def spread(spark: SparkSession, df: DataFrame): DataFrame =
    df.repartition(spark.sparkContext.defaultParallelism)

  def documents(spark: SparkSession, dir: String): DataFrame =
    spread(spark, load(spark, dir, "documents"))
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spread(spark, load(spark, dir, "embeddings"))

  /** Driver-side pull of ONE embedding as doubles, independent of the
    * corpus's element type (array<float> today; the float→double cast is
    * exact, and every vector kernel widens to double anyway). Query-vector
    * pulls used `getSeq[Float]` and would throw ClassCastException the day
    * the writer ships array<double> — the r7 events lesson, vector flavor.
    */
  def headEmbeddingDouble(df: DataFrame, embCol: String = "embedding"): IndexedSeq[Double] =
    df.select(col(embCol).cast("array<double>"))
      .head().getSeq[Double](0).toIndexedSeq

  /** Chunks per synthetic document — the reference's chunk table has
    * (document_id, chunk_id, content_vector); the embeddings table plays
    * that role with `vec_id / 8` as document and `vec_id % 8` as chunk
    * ordinal (8 chunks per document, deterministic, scale-free).
    */
  val ChunksPerDoc = 8
  def chunks(spark: SparkSession, dir: String): DataFrame =
    embeddings(spark, dir)
      .withColumn("document_id", (col("vec_id") / ChunksPerDoc).cast("long"))
      .withColumn("chunk_id", (col("vec_id") % ChunksPerDoc).cast("long"))
}
