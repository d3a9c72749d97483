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

  test("index directory is laid out by cell") {
    val cells = new java.io.File(s"$indexPath/data").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell="))
    assert(cells.length == graft.operators.clustering.ClusteringQueries.K)
  }
}
