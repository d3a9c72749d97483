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

  test("reconstruct generated path == interpreted, and k=64 books stay cheap") {
    // k used to be capped at 32 because the literal-array reconstruct
    // unrolled k*M*subDim literals into the generated source; the gather
    // expression must handle k=64 without a compile-time blowup and match
    // the interpreted eval bitwise
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, IntegerType}
    val rnd = new scala.util.Random(3)
    val books = Array.fill(8, 64, 8)(rnd.nextDouble())
    val ref = BoundReference(0, ArrayType(IntegerType, containsNull = false),
      nullable = false)
    val expr = graft.functions.PqReconstruct(ref,
      graft.functions.PqReconstruct.toSeqs(books))
    val t0 = System.nanoTime()
    val proj = GenerateUnsafeProjection.generate(Seq(expr, expr))
    val compileMs = (System.nanoTime() - t0) / 1e6
    assert(compileMs < 2000, s"codegen took ${compileMs}ms — literal blowup is back")
    val codes = Array.tabulate(8)(s => (s * 7 + 3) % 64)
    val row = InternalRow(ArrayData.toArrayData(codes))
    val gen = proj(row).getArray(0)
    val interp = expr.eval(row).asInstanceOf[ArrayData]
    assert((0 until 64).forall(i => gen.getDouble(i) == interp.getDouble(i)))
    (0 until 8).foreach { s =>
      (0 until 8).foreach { d =>
        assert(interp.getDouble(s * 8 + d) == books(s)(codes(s))(d))
      }
    }
  }
}
