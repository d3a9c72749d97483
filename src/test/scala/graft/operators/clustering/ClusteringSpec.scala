package graft.operators.clustering

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {

  test("nearest centroid: centroids assign to themselves at distance 0") {
    val self = ClusteringQueries.qNearestCentroid(spark, SfDir)
      .filter(col("vec_id") < ClusteringQueries.K).collect()
    self.foreach { r =>
      assert(r.getAs[Int]("centroid_id") == r.getAs[Long]("vec_id").toInt)
      assert(approx(r.getAs[Double]("dist"), 0.0, 1e-6))
    }
  }

  test("assignment covers all points exactly once") {
    val asg = ClusteringQueries.assigned(spark, SfDir)
    val n = graft.Tables.embeddings(spark, SfDir).count()
    assert(asg.count() == n)
    assert(asg.groupBy("vec_id").count().filter(col("count") > 1).count() == 0)
  }

  test("exemplars are the closest members of their cluster") {
    val ex = ClusteringQueries.qClusterExemplars(spark, SfDir)
    val worstExemplar = ex.groupBy("centroid_id").agg(max("dist").as("w"))
    val best = ClusteringQueries.assigned(spark, SfDir)
      .groupBy("centroid_id").agg(min(round(col("dist"), 6)).as("b"))
    val bad = worstExemplar.join(best, "centroid_id")
      .filter(col("b") > col("w")).count()
    assert(bad == 0)
  }

  test("silhouette values bounded in [-1, 1]") {
    val bad = ClusteringQueries.qSilhouetteExact(spark, SfDir)
      .filter(col("mean_sil") < -1 || col("mean_sil") > 1).count()
    assert(bad == 0)
  }

  test("silhouette guard rejects above-sample-scale input loudly") {
    import spark.implicits._
    val big = spark.range(ClusteringQueries.MaxSilhouetteRows + 1)
      .select(col("id").as("vec_id"), (col("id") % 3).as("label"),
        array(lit(1.0f), lit(2.0f)).as("embedding"))
    val ex = intercept[IllegalArgumentException] {
      ClusteringQueries.silhouetteExact(big)
    }
    assert(ex.getMessage.contains("sample"), s"unexpected message: ${ex.getMessage}")
  }

  test("label merge assigns every document with chunks") {
    val lm = ClusteringQueries.qLabelMerge(spark, SfDir)
    val nEmb = graft.Tables.embeddings(spark, SfDir).count()
    val docsWithChunks = (nEmb + graft.Tables.ChunksPerDoc - 1) / graft.Tables.ChunksPerDoc
    assert(lm.filter(col("etiqueta_cluster").isNotNull).count() == docsWithChunks)
  }

  test("cluster validity: CH and DB are positive, finite, and self-consistent") {
    val r = ClusteringQueries.qClusterValidity(spark, SfDir).head()
    val (k, n) = (r.getInt(0), r.getLong(1))
    val (w, b, ch, db) = (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(k == ClusteringQueries.K)
    assert(n == graft.Tables.embeddings(spark, SfDir).count())
    assert(w > 0 && b > 0, s"sums of squares must be positive: W=$w B=$b")
    // CH must equal its definition re-derived from the reported sums
    val chRef = (b / (k - 1)) / (w / (n - k))
    assert(approx(ch, chRef, 1e-5), s"CH $ch != (B/(k-1))/(W/(n-k)) = $chRef")
    assert(db > 0 && !db.isNaN && !db.isInfinite, s"bad Davies-Bouldin: $db")
  }
}
