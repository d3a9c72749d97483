package graft.operators.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {

  private lazy val indexPath = {
    val p = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    IvfIndex.build(spark, SfDir, p)
    p
  }

  private lazy val query: Seq[Float] = graft.Tables.embeddings(spark, SfDir)
    .filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toIndexedSeq

  test("persisted probe returns the same hits as the in-memory IVF query") {
    val persisted = IvfIndex.probe(spark, indexPath, query, k = 10)
      .filter(col("vec_id") > 0)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val inMemory = AnnQueries.qAnnIvf(spark, SfDir)
      .collect().map(r => (r.getLong(0), r.getAs[Double]("cos_sim"))).toSeq
    // the persisted probe includes vec 0 itself; compare on the common top hits
    assert(persisted.toSet.intersect(inMemory.toSet).size >= 9,
      s"persisted=$persisted inMemory=$inMemory")
  }

  test("probe plan prunes to the probed cells' partitions") {
    val plan = IvfIndex.probe(spark, indexPath, query, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"no partition pruning visible:\n$plan")
  }

  test("batched probe agrees with per-query probes and prunes dynamically") {
    val qs = graft.Tables.embeddings(spark, SfDir)
      .filter(col("vec_id") < 3).select(col("vec_id"), col("embedding"))
    val batch = IvfIndex.probeBatch(spark, indexPath, qs, "vec_id", "embedding", k = 5)
    val got = batch.collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    (0L until 3L).foreach { q =>
      val qvec = graft.Tables.embeddings(spark, SfDir)
        .filter(col("vec_id") === q).select("embedding").head().getSeq[Float](0).toIndexedSeq
      val single = IvfIndex.probe(spark, indexPath, qvec, k = 5)
        .collect().map(_.getLong(0)).toSeq
      assert(got(q) == single, s"q=$q batch=${got(q)} single=$single")
    }
    // the index scan must be dynamically pruned by the probe-set subquery
    val plan = batch.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning on the index scan:\n$plan")
  }

  test("index directory is laid out by cell") {
    val cells = new java.io.File(s"$indexPath/data").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell="))
    assert(cells.length == graft.operators.clustering.ClusteringQueries.K)
  }
}
