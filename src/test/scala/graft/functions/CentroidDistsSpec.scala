package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CentroidDists must be bit-identical to the interpreted higher-order
  * fold it replaced (aggregate(zip_with(v, c, (x,y)->(x-y)²), 0.0, +)) —
  * the DataFrame path exercises the generated loop; the fold is the
  * DuckDB-replayable reference. */
class CentroidDistsSpec extends SparkSpec {
  import spark.implicits._

  test("generated kernel equals the interpreted fold bit-for-bit (double and float inputs)") {
    val rnd = new scala.util.Random(91L)
    val cen = Seq.fill(5)(Seq.fill(16)(rnd.nextGaussian()))
    val rows = Seq.fill(200)(Seq.fill(16)(rnd.nextGaussian() * 3))
    for (asFloat <- Seq(false, true)) {
      val df0 = rows.toDF("v")
      val df = if (asFloat) df0.select(col("v").cast("array<float>").as("v")) else df0
      val vecCol = if (asFloat) col("v").cast("array<double>") else col("v")
      val foldCols = array(cen.map { c =>
        val cl = array(c.map(lit): _*)
        aggregate(zip_with(vecCol, cl, (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x)
      }: _*)
      val out = df.select(
          CentroidDists(vecCol, cen).as("kernel"), foldCols.as("fold"))
        .collect()
      out.foreach { r =>
        val kb = r.getSeq[Double](0)
        val fb = r.getSeq[Double](1)
        assert(kb == fb, s"kernel $kb != fold $fb (asFloat=$asFloat)")
      }
    }
  }

  test("ragged and null inputs are safe") {
    val cen = Seq(Seq(1.0, 2.0, 3.0), Seq(0.0, 0.0, 0.0))
    val df = Seq(Some(Seq(1.0, 2.0)), Some(Seq.empty[Double]), None).toDF("v")
    val out = df.select(CentroidDists(col("v"), cen).as("d")).collect()
    assert(!out(0).isNullAt(0) && out(0).getSeq[Double](0).size == 2)
    assert(out(1).getSeq[Double](0) == Seq(0.0, 0.0))
    assert(out(2).isNullAt(0))
  }
}
