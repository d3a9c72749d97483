package graft.operators.analytics

import graft.SparkSpec
import graft.functions.MahalanobisSq
import org.apache.spark.sql.functions._

class MahalanobisSpec extends SparkSpec {
  import spark.implicits._

  test("invertSpd inverts a known SPD matrix") {
    val a = Array(Array(4.0, 2.0), Array(2.0, 3.0)) // det = 8
    val inv = Mahalanobis.invertSpd(a)
    assert(approx(inv(0)(0), 3.0 / 8) && approx(inv(0)(1), -2.0 / 8) &&
      approx(inv(1)(1), 4.0 / 8) && approx(inv(1)(0), inv(0)(1)))
  }

  test("fit on correlated data ranks the off-axis point as the outlier") {
    // tight cloud along y = x; planted point (2,-2) has SMALL euclidean norm
    // but sits across the correlation axis — only Mahalanobis flags it
    val rnd = new scala.util.Random(3)
    val cloud = Seq.fill(300) {
      val t = rnd.nextGaussian() * 3
      Array((t + rnd.nextGaussian() * 0.1).toFloat, (t + rnd.nextGaussian() * 0.1).toFloat)
    }
    val far = Array(5f, 5f)      // on-axis, large norm: NOT an outlier
    val planted = Array(2f, -2f) // off-axis, small norm: the outlier
    val df = (cloud :+ far :+ planted).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val (mu, inv) = Mahalanobis.fitInverse(df, "v")
    val top = df.select(col("id"),
        MahalanobisSq(col("v"), mu.toIndexedSeq, inv.map(_.toIndexedSeq).toIndexedSeq).as("m"))
      .orderBy(col("m").desc).head()
    assert(top.getLong(0) == 301L, s"expected planted outlier first, got $top")
  }

  test("expression matches a driver-side quadratic form") {
    val mu = Seq(1.0, 2.0)
    val inv = Seq(Seq(2.0, 0.5), Seq(0.5, 1.0))
    val v = Array(3.0f, 1.0f)
    val got = Seq(Tuple1(v)).toDF("v")
      .select(MahalanobisSq(col("v"), mu, inv).as("m")).head().getDouble(0)
    val z = Array(v(0) - mu(0), v(1) - mu(1))
    val want = z(0) * z(0) * 2.0 + 2 * z(0) * z(1) * 0.5 + z(1) * z(1) * 1.0
    assert(approx(got, want, 1e-12))
  }

  test("q_mahalanobis returns 20 scored rows at test scale") {
    val out = Mahalanobis.qMahalanobis(spark, SfDir).collect()
    assert(out.length == 20)
    val scores = out.map(_.getAs[Double]("maha_sq"))
    assert(scores.forall(_ >= 0) && scores.sliding(2).forall(p => p(0) >= p(1)))
  }
}
