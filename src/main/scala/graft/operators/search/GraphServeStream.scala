package graft.operators.search

import graft.QueryModule
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** STREAMING graph serve: micro-batched query vectors beam-searched over
  * the persistent [[GraphIndex]] artifact — the graph-index sibling of
  * q_ann_serve_stream (AnnQueries): queries arrive as files, each
  * micro-batch is served by [[GraphIndex.beamSearch]] against the SAME
  * adjacency, results append to a sink. Per-query results are
  * independent of how the batch boundary falls (each query is served
  * exactly once against an index that does not change mid-stream), so
  * the accumulated sink is row-identical to a batch serve of the whole
  * sample — and the oracle IS the batch serve's CTE chain
  * ([[GraphServe.servePrelude]] + the default-width beam rounds), the
  * final beams cut to top-[[K]] per query.
  *
  * Scale shape: the artifact adjacency is loaded once (localCheckpoint)
  * and shared across micro-batches; per batch the work is the bounded
  * O(rounds · batch · beam · degree) serve — no state store needed, the
  * index is the state.
  */
object GraphServeStream extends QueryModule {

  /** Served depth per query (the final beam's top prefix). */
  val K = GraphServe.K

  def qGraphServeStream(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.Paths
    val emb = KnnGraph.e(spark, dir)
    val n = emb.count()
    val se = GraphServe.upperModulus(n)
    val entries = emb.filter(GraphServe.entryPick(col("vec_id"), se))
      .select(col("vec_id").as("j"))
    val undAdj = GraphIndex.und(GraphIndex.finalGraph(spark, dir))
      .localCheckpoint(true)
    val qs = GraphServe.qsFor(spark, dir)
    val inDir = AnnQueries.scratch("graft_graph_serve_in", dir)
    val outDir = AnnQueries.scratch("graft_graph_serve_out", dir)
    val ckDir = AnnQueries.scratch("graft_graph_serve_ck", dir)
    Seq(outDir, ckDir).foreach(d => graft.Fs.deleteRecursively(Paths.get(d)))
    // two files → two micro-batches under maxFilesPerTrigger=1: the
    // batch-boundary independence is exercised, not assumed
    qs.repartition(2).write.mode("overwrite").parquet(inDir)
    val qSchema = spark.read.parquet(inDir).schema
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val served = spark.readStream.schema(qSchema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
        .writeStream
        .option("checkpointLocation", ckDir)
        .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
          GraphIndex.beamSearch(batch.toDF(), undAdj, emb, entries,
              GraphServe.Beam, GraphServe.Rounds)
            .filter(col("rk") <= K)
            .select(col("q"), col("rk"), col("j").as("node"), col("sim"))
            .write.mode("append").parquet(outDir)
        }
        .start()
      try served.processAllAvailable() finally served.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    spark.read.parquet(outDir).orderBy("q", "rk")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_graph_serve_stream" -> (qGraphServeStream _))

  override def oracles: Map[String, String] = Map(
    "q_graph_serve_stream" ->
      s"""WITH ${GraphServe.servePrelude},
         |${GraphServe.b0Cte(GraphServe.Beam, "")},
         |${(1 to GraphServe.Rounds).map(GraphServe.serveCtes(_, GraphServe.Beam, "")).mkString(",\n")}
         |SELECT q, CAST(rn AS INT) AS rk, node, sim FROM (
         |  SELECT q, node, sim, row_number() OVER (PARTITION BY q ORDER BY sim DESC, node) AS rn
         |  FROM b${GraphServe.Rounds}) WHERE rn <= $K
         |ORDER BY q, rk""".stripMargin)
}
