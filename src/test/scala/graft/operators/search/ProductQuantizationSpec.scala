package graft.operators.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProductQuantizationSpec extends SparkSpec {
  import spark.implicits._

  test("codes are in range and reconstruction approximates the normalized vector") {
    val e = graft.Tables.embeddings(spark, SfDir)
    val model = ProductQuantization.fit(e, "embedding", numSub = 8, k = 16, seed = 7L)
    assert(model.numSub == 8 && model.subDim == 8)
    assert(model.codebooks.forall(b => b.length == 16 && b.forall(_.length == 8)))
    val checked = e.select(
        ProductQuantization.encode(col("embedding"), model).as("codes"),
        graft.functions.VectorOps.cosine_sim(
          ProductQuantization.reconstruct(
            ProductQuantization.encode(col("embedding"), model), model),
          col("embedding")).as("fidelity"))
    val rows = checked.collect()
    rows.foreach { r =>
      val codes = r.getSeq[Int](0)
      assert(codes.length == 8 && codes.forall(c => c >= 0 && c < 16))
    }
    // the synthetic embeddings are near-uniform noise (hard case for PQ);
    // require clear alignment — random reconstruction would sit near 0
    val meanFid = rows.map(_.getDouble(1)).sum / rows.length
    assert(meanFid > 0.5, s"mean reconstruction cosine too low: $meanFid")
  }

  test("q_pq_recall is a sane metric and seeded-deterministic") {
    val a = ProductQuantizationQueries.qPqRecall(spark, SfDir).head()
    assert(a.getInt(0) == 10)
    val recall = a.getDouble(1)
    assert(recall >= 0.2 && recall <= 1.0, s"recall=$recall")
  }
}
