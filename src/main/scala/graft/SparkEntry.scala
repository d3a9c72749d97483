package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** All query modules; each contributes `queries` + matching DuckDB
    * oracle SQL (SURVEY §2 inventory). */
  def modules: Seq[QueryModule] = Seq(
    graft.operators.analytics.AnalyticsQueries,
    graft.operators.search.VectorQueries,
    graft.operators.search.SearchQueries,
    graft.operators.text.TextQueries,
    graft.operators.dedup.DedupQueries,
    graft.operators.clustering.ClusteringQueries,
    graft.operators.clustering.KMeansOp,
    graft.operators.clustering.DbscanQueries,
    graft.operators.clustering.ClusterLabels,
    graft.operators.search.AnnQueries,
    graft.operators.search.IvfRebalance,
    graft.operators.search.FilteredAnn,
    graft.operators.search.KnnGraph,
    graft.operators.search.GraphServe,
    graft.operators.search.GraphDelete,
    graft.operators.search.GraphIndex,
    graft.operators.search.GraphOptimize,
    graft.operators.search.GraphDriftOptimize,
    graft.operators.search.UmapLayout,
    graft.operators.search.DriftRebalance,
    graft.operators.search.GraphEmbedding,
    graft.operators.search.GraphAppendStream,
    graft.operators.search.GraphServeStream,
    graft.operators.search.FilteredGraphServe,
    graft.operators.search.GraphSqServe,
    graft.operators.search.KeywordSearch,
    graft.operators.search.Quantization,
    graft.operators.search.ProductQuantizationQueries,
    graft.operators.search.LshAnn,
    graft.operators.dedup.MinHashLsh,
    graft.operators.dedup.SimHash,
    graft.operators.dedup.StreamNearDup,
    graft.operators.multimodal.MediaQueries,
    graft.operators.multimodal.MarkupDecode,
    graft.operators.projection.LandmarkMdsQueries,
    graft.operators.projection.PcaProjection,
    graft.operators.sampling.SamplingQueries,
    graft.operators.text.BpeQueries,
    graft.operators.text.PretrainedBpe,
    graft.operators.text.TfIdfQueries,
    graft.operators.text.PiiRedact,
    graft.operators.text.QualityClassifier,
    graft.operators.analytics.Mahalanobis,
    graft.operators.analytics.TemporalJoins,
    graft.operators.analytics.KmvSketch,
    graft.streaming.StreamingQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.analytics.AnalyticsQueries.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap

  /** Static oracles plus the data-derived ones (SQL embedding literals
    * computed deterministically from the same corpus the queries ran on —
    * the LSH seeded-planes pattern generalized). Verify dumps THIS map. */
  def oracleSqlFor(spark: SparkSession, dir: String): Map[String, String] =
    oracleSql ++ modules.flatMap(_.dynamicOracles(spark, dir))
}
