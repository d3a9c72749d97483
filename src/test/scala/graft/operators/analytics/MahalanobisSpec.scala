package graft.operators.analytics

import graft.SparkSpec
import graft.functions.MahalanobisSq
import org.apache.spark.sql.functions._

class MahalanobisSpec extends SparkSpec {
  import spark.implicits._

  test("q_covariance matches a local single-threaded covariance computation") {
    val rows = Mahalanobis.qCovariance(spark, SfDir).collect()
    val vecs = graft.Tables.embeddings(spark, SfDir)
      .orderBy("vec_id").select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = vecs.length
    val d = vecs.head.length
    val mu = Array.tabulate(d)(i => vecs.map(_(i)).sum / n)
    assert(rows.length == d * (d + 1) / 2)
    rows.foreach { r =>
      val (i, j) = (r.getLong(0).toInt - 1, r.getLong(1).toInt - 1)
      assert(r.getLong(2) == n)
      val cov = vecs.map(v => (v(i) - mu(i)) * (v(j) - mu(j))).sum / (n - 1)
      // centered-product vs Σxx−nμμ algebra differ in last bits; the
      // driver-facing values are round(6), so compare a notch tighter
      assert(approx(r.getDouble(4), math.rint(cov * 1e6) / 1e6, 2e-6),
        s"cov($i,$j): ${r.getDouble(4)} vs $cov")
      assert(approx(r.getDouble(3), math.rint(mu(i) * 1e6) / 1e6, 2e-6),
        s"mu($i): ${r.getDouble(3)} vs ${mu(i)}")
    }
  }

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

  test("robust fit recovers planted contamination that masks the classical fit") {
    // 270 inliers in a tight isotropic cloud + 30 clustered far outliers
    // (10% contamination). The outlier CLUSTER inflates the classical
    // covariance toward its own direction (masking); the C-step support
    // drops it, so robust distances separate planted from inliers cleanly.
    val rnd = new scala.util.Random(11)
    val inliers = Seq.fill(270)(Array(
      (rnd.nextGaussian() * 0.5).toFloat, (rnd.nextGaussian() * 0.5).toFloat))
    val planted = Seq.fill(30)(Array(
      (8.0 + rnd.nextGaussian() * 0.2).toFloat, (8.0 + rnd.nextGaussian() * 0.2).toFloat))
    val df = (inliers ++ planted).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v").cache()
    val (muR, invR) = Mahalanobis.fitRobust(df, "v")
    val scored = df.select(col("id"),
      MahalanobisSq(col("v"), muR.toIndexedSeq,
        invR.map(_.toIndexedSeq).toIndexedSeq).as("m")).cache()
    val top30 = scored.orderBy(col("m").desc).limit(30)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(top30 == (270L until 300L).toSet,
      s"robust top-30 must be exactly the planted points, got ${top30.toSeq.sorted.take(5)}...")
    // robust mean must sit in the inlier cloud, not dragged toward (8, 8)
    assert(math.abs(muR(0)) < 0.5 && math.abs(muR(1)) < 0.5,
      s"robust mean dragged to ${muR.toSeq}")
    // separation margin: weakest planted score far above strongest inlier
    val minPlanted = scored.filter(col("id") >= 270).agg(min("m")).head().getDouble(0)
    val maxInlier = scored.filter(col("id") < 270).agg(max("m")).head().getDouble(0)
    assert(minPlanted > maxInlier * 10,
      s"robust separation too weak: $minPlanted vs $maxInlier")
  }

  test("robust fit is deterministic and matches classical on clean data") {
    val rnd = new scala.util.Random(5)
    val clean = Seq.fill(200)(Array(
      (rnd.nextGaussian()).toFloat, (rnd.nextGaussian() * 2).toFloat))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val (mu1, inv1) = Mahalanobis.fitRobust(clean, "v")
    val (mu2, inv2) = Mahalanobis.fitRobust(clean, "v")
    assert(mu1.toSeq == mu2.toSeq &&
      inv1.map(_.toSeq).toSeq == inv2.map(_.toSeq).toSeq,
      "two robust fits on identical data must be bit-identical")
    // clean gaussian data: robust and classical agree on the model's shape
    val (muC, _) = Mahalanobis.fitInverse(clean, "v")
    assert(math.abs(mu1(0) - muC(0)) < 0.3 && math.abs(mu1(1) - muC(1)) < 0.6)
  }

  test("q_mahalanobis_robust returns 20 ranked rows on the corpus") {
    val r = Mahalanobis.qMahalanobisRobust(spark, SfDir).collect()
    assert(r.length == 20)
    val scores = r.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
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
