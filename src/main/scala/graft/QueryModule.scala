package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A group of named queries plus their DuckDB oracle SQL.
  *
  * Contract (builder prompt): every query key in `queries` that is
  * SQL-expressible has an entry in `oracles` whose column names/aliases match
  * the Spark result exactly (the driver sorts columns by name then
  * hash-compares values).
  *
  * Cross-engine float determinism rules used throughout (SURVEY §5):
  *  - sums of money-like doubles go through `decimal` (exact, order
  *    independent) and are cast back to double;
  *  - per-row double arithmetic is bit-identical across engines and is left
  *    unrounded or rounded to 6;
  *  - order-dependent float aggregates (stddev, float sums) are rounded;
  *  - every query has a total ORDER BY on a unique key;
  *  - timestamps are emitted as strings or epoch longs (ns vs µs parquet
  *    readers disagree on raw values).
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]

  /** Oracles whose SQL embeds DATA-DERIVED literals (e.g. driver-computed
    * eigenvectors, replayed like LSH's seeded planes). Generated against
    * the same (spark, dir) the queries ran on; the generator MUST be
    * deterministic and memoized so the query and its oracle see identical
    * literals. Collected by Verify when dumping oracle_sql.json. */
  def dynamicOracles(spark: SparkSession, dir: String): Map[String, String] =
    Map.empty
}
