package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraftFacadeSpec extends SparkSpec {

  test("executeClustering adds cluster_label and returns k centroids") {
    val (out, centers) = Graft.executeClustering(
      Tables.embeddings(spark, SfDir), "embedding", k = 5)
    assert(centers.length == 5)
    assert(out.columns.contains("cluster_label"))
    assert(out.select("cluster_label").distinct().count() == 5)
  }

  test("classify agrees with the clustering assignment oracle path") {
    val cs = operators.clustering.ClusteringQueries.centroids(spark, SfDir)
    val viaFacade = Graft.classify(Tables.embeddings(spark, SfDir), "embedding", cs)
      .select(col("vec_id"), col("cluster_label"))
    val viaQuery = operators.clustering.ClusteringQueries.qNearestCentroid(spark, SfDir)
      .select(col("vec_id"), col("centroid_id").as("cluster_label"))
    assert(viaFacade.exceptAll(viaQuery).count() == 0)
  }

  test("search returns the same hits as the brute-force query") {
    val e = Tables.embeddings(spark, SfDir)
    val q = e.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val hits = Graft.search(e.filter(col("vec_id") > 0), "embedding", q, k = 10)
      .collect().map(_.getLong(0)).toSeq
    val oracle = operators.search.SearchQueries.qTopkBruteforce(spark, SfDir)
      .collect().map(_.getLong(0)).toSeq
    assert(hits == oracle)
  }

  test("mergeLabels leaves unmatched rows null and matched rows labeled") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "x")
    val labels = Seq((1L, 7), (3L, 9)).toDF("document_id", "etiqueta_cluster")
    val merged = Graft.mergeLabels(base, "doc_id", labels)
      .collect().map(r => r.getLong(0) -> Option(r.getAs[Integer]("etiqueta_cluster"))).toMap
    assert(merged(1L).contains(7) && merged(2L).isEmpty && merged(3L).contains(9))
  }

  test("SQL functions available via GraftExtensions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
        "vec_norm(array(3.0D, 4.0D)) AS n, " +
        "round(vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)), 6) AS c").head()
    assert(approx(r.getDouble(0), 11.0))
    assert(approx(r.getDouble(1), 5.0))
    assert(approx(r.getDouble(2), 1.0))
  }
}
