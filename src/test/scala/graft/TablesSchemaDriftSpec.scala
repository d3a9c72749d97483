package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Regression guard for the round-7 break: the driver regenerated
  * events.parquet with ts as TIMESTAMP(MICROS) (pandas-naive → inferred
  * TIMESTAMP_NTZ) where earlier corpora used TIMESTAMP(NANOS) (readable
  * only as a long under `nanosAsLong`). The loaders must produce
  * IDENTICAL rows from every physical encoding — a forced schema or a
  * hard-coded `DIV 1000` over the wrong encoding either throws (batch,
  * the loud half) or silently collapses all event time 1000× into 1970
  * (streaming, the dangerous half).
  *
  * The spec writes the same five logical rows in three encodings and
  * asserts Tables.eventsNanos / Tables.events agree across all of them.
  */
class TablesSchemaDriftSpec extends SparkSpec {
  import spark.implicits._

  // five rows spanning an hour, µs-precision, exact in every encoding
  private val baseUs: Long = 1700000000000000L // 2023-11-14T22:13:20Z in µs
  private val rows = Seq(
    (1L, baseUs, 10L, "view", 1.5, """{"k": 1}"""),
    (2L, baseUs + 1L, 10L, "click", 2.5, """{"k": 2}"""),
    (3L, baseUs + 999999L, 11L, "view", 0.0, """{"k": 3}"""),
    (4L, baseUs + 1800L * 1000000L, 11L, "purchase", 9.75, """{"k": 4}"""),
    (5L, baseUs + 3600L * 1000000L, 12L, "view", -3.25, """{"k": 5}"""))

  private def writeDir(suffix: String)(write: java.nio.file.Path => Unit): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_drift_$suffix")
    Fs.deleteAtExit(dir)
    write(dir)
    dir.toString
  }

  private def base: DataFrame = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  /** ts as a plain INT64 nanos column — byte-identical to what the reader
    * surfaces for TIMESTAMP(NANOS) under `nanosAsLong` (Spark cannot
    * write TIMESTAMP(NANOS) itself, but the post-read code path is the
    * same LongType frame either way). */
  private lazy val nanosLongDir = writeDir("nanos") { d =>
    base.withColumn("ts", col("ts") * 1000L)
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
  }

  /** A REAL TIMESTAMP(NANOS, isAdjustedToUTC=false) file, written through
    * parquet-java directly (Spark refuses to write the annotation) — the
    * encoding the pre-r7 driver corpora actually carried. Exercises the
    * scoped-reader fallback in Tables.eventsNanos end to end, which the
    * plain-long stand-in above cannot (a bare INT64 needs no legacy conf). */
  private def writeNanosParquet(file: java.nio.file.Path): Unit = {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    val schema = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64)
      .as(LogicalTypeAnnotation.timestampType(false, LogicalTypeAnnotation.TimeUnit.NANOS))
      .named("ts")
      .required(INT64).named("user_id")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
      .required(DOUBLE).named("value")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(file.toString))
      .withConf(new org.apache.hadoop.conf.Configuration())
      .withType(schema)
      .build()
    val f = new SimpleGroupFactory(schema)
    try rows.foreach { case (id, us, uid, typ, v, props) =>
      val g = f.newGroup()
      g.add("event_id", id)
      g.add("ts", us * 1000L)
      g.add("user_id", uid)
      g.add("event_type", typ)
      g.add("value", v)
      g.add("props", props)
      writer.write(g)
    } finally writer.close()
  }

  private lazy val realNanosDir = writeDir("realnanos") { d =>
    writeNanosParquet(d.resolve("events.parquet"))
    // a nanos-encoded NON-events sibling for the conf-leak straddle test
    writeNanosParquet(d.resolve("metrics.parquet"))
  }

  /** ts as TIMESTAMP_NTZ micros — what Spark infers from the pandas-naive
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) the driver now writes. */
  private lazy val ntzMicrosDir = writeDir("ntz") { d =>
    base.withColumn("ts", timestamp_micros(col("ts")).cast(TimestampNTZType))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
  }

  /** ts as TimestampType micros (isAdjustedToUTC=true) — the third
    * encoding a producer can hand us. */
  private lazy val ltzMicrosDir = writeDir("ltz") { d =>
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try base.withColumn("ts", timestamp_micros(col("ts")))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    finally prev.fold(spark.conf.unset("spark.sql.parquet.outputTimestampType"))(
      spark.conf.set("spark.sql.parquet.outputTimestampType", _))
  }

  private def collected(df: DataFrame): Seq[Row] =
    df.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .orderBy("event_id").collect().toSeq

  private val NanosConfKey = "spark.sql.legacy.parquet.nanosAsLong"

  test("the four dirs really carry the distinct physical ts types") {
    def raw(d: String): DataType = {
      val prev = spark.conf.getOption(NanosConfKey)
      spark.conf.set(NanosConfKey, "true")
      try spark.read.parquet(s"$d/events.parquet").schema("ts").dataType
      finally prev.fold(spark.conf.unset(NanosConfKey))(spark.conf.set(NanosConfKey, _))
    }
    assert(raw(nanosLongDir) === LongType)
    assert(raw(realNanosDir) === LongType) // NANOS surfaces as long under the conf
    assert(raw(ntzMicrosDir) === TimestampNTZType)
    assert(raw(ltzMicrosDir) === TimestampType)
  }

  test("eventsNanos yields identical epoch-ns rows from every encoding") {
    val a = collected(Tables.eventsNanos(spark, nanosLongDir))
    val b = collected(Tables.eventsNanos(spark, ntzMicrosDir))
    val c = collected(Tables.eventsNanos(spark, ltzMicrosDir))
    val d = collected(Tables.eventsNanos(spark, realNanosDir))
    assert(a === b)
    assert(a === c)
    assert(a === d)
    // and the values are the exact nanos we wrote, not a 1000×-off shadow
    val ns = Tables.eventsNanos(spark, ntzMicrosDir)
      .orderBy("event_id").select("ts").as[Long].collect()
    assert(ns.toSeq === rows.map(_._2 * 1000L))
  }

  test("a corpus without the props column null-degrades instead of throwing") {
    val noProps = writeDir("noprops") { d =>
      base.drop("props").withColumn("ts", col("ts") * 1000L)
        .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    }
    val got = Tables.eventsNanos(spark, noProps)
    assert(got.columns.contains("props"))
    assert(got.schema("props").dataType === StringType)
    assert(got.select("props").collect().forall(_.isNullAt(0)))
    // and the props consumers run (no AnalysisException); null-k rows are
    // excluded by the explicit null contract, so an all-null props corpus
    // aggregates to zero rows rather than a null bucket
    val agg = graft.operators.analytics.AnalyticsQueries.qPropsAgg(spark, noProps)
    assert(agg.collect().isEmpty)
  }

  test("scoped nanos conf: an events load does not leak into other reads") {
    // the REAL TIMESTAMP(NANOS) corpus loads through the scoped reader...
    val viaScoped = collected(Tables.eventsNanos(spark, realNanosDir))
    assert(viaScoped === collected(Tables.eventsNanos(spark, ntzMicrosDir)))
    // ...while the CALLER's session conf stays at its default...
    assert(spark.conf.getOption(NanosConfKey).forall(_ == "false"),
      "eventsNanos must not mutate the caller's session conf")
    // ...so a nanos-encoded NON-events table read straddling the events
    // load still refuses loudly instead of silently surfacing longs (the
    // cross-query state leak the scoped reader exists to prevent)
    val err = intercept[Throwable] {
      spark.read.parquet(s"$realNanosDir/metrics.parquet").schema
    }
    def chainHasNanos(t: Throwable): Boolean =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .exists(c => Option(c.getMessage).exists(_.contains("NANOS")))
    assert(chainHasNanos(err), s"expected illegal-NANOS failure, got: $err")
    // and the scoped events frame still EXECUTES correctly after the
    // failed sibling read (the relation carries its own reader session)
    assert(collected(Tables.events(spark, realNanosDir)).nonEmpty)
  }

  test("events yields identical µs timestamps from every encoding") {
    val a = collected(Tables.events(spark, nanosLongDir))
    val b = collected(Tables.events(spark, ntzMicrosDir))
    val c = collected(Tables.events(spark, ltzMicrosDir))
    assert(a === b)
    assert(a === c)
    val us = Tables.events(spark, ntzMicrosDir)
      .orderBy("event_id").select(unix_micros(col("ts"))).as[Long].collect()
    assert(us.toSeq === rows.map(_._2))
  }
}
