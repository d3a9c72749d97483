package graft.operators.projection

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LandmarkMdsSpec extends SparkSpec {
  import spark.implicits._

  /** Points on a 2-D lattice embedded isometrically in 64-dim via two
    * orthonormal axes — LMDS must recover the planar geometry. */
  private lazy val planar = {
    val d = 64
    val u = Array.tabulate(d)(i => if (i < 32) 1.0 / math.sqrt(32) else 0.0)
    val w = Array.tabulate(d)(i => if (i >= 32) 1.0 / math.sqrt(32) else 0.0)
    val pts = for (a <- 0 until 12; b <- 0 until 12) yield {
      val v = Array.tabulate(d)(i => (a * u(i) + b * w(i)).toFloat)
      ((a * 12 + b).toLong, a.toDouble, b.toDouble, v)
    }
    pts.toDF("id", "a", "b", "vec").cache()
  }

  test("recovers planar geometry: projected distances match plane distances") {
    val model = LandmarkMds.fit(planar, "id", "vec", numLandmarks = 24)
    assert(model.eigenvalues(0) > 0 && model.eigenvalues(1) > 0)
    val proj = LandmarkMds.transform(planar, "vec", model, precision = 9)
      .select(col("id"), col("a"), col("b"), col("p0"), col("p1"))
    // compare pairwise distances on a deterministic pair set (i, i+7)
    val l = proj.select(col("id").as("i"), col("a").as("a1"), col("b").as("b1"),
      col("p0").as("x1"), col("p1").as("y1"))
    val r = proj.select((col("id") - 7).as("i"), col("a").as("a2"), col("b").as("b2"),
      col("p0").as("x2"), col("p1").as("y2"))
    val pairs = l.join(r, "i")
      .select(
        sqrt(pow(col("a1") - col("a2"), 2) + pow(col("b1") - col("b2"), 2)).as("d_plane"),
        sqrt(pow(col("x1") - col("x2"), 2) + pow(col("y1") - col("y2"), 2)).as("d_proj"))
      .collect()
    pairs.foreach { row =>
      val (dp, dq) = (row.getDouble(0), row.getDouble(1))
      assert(math.abs(dp - dq) <= 1e-4 * math.max(1.0, dp),
        s"planar distance $dp vs projected $dq")
    }
  }

  test("fit is deterministic") {
    val m1 = LandmarkMds.fit(planar, "id", "vec", numLandmarks = 16)
    val m2 = LandmarkMds.fit(planar, "id", "vec", numLandmarks = 16)
    assert(m1.eigenvalues.toSeq == m2.eigenvalues.toSeq)
    assert(m1.weights.map(_.toSeq).toSeq == m2.weights.map(_.toSeq).toSeq)
  }

  test("topEigen matches a known symmetric spectrum") {
    // diag(5, 2, 1) in a rotated basis is overkill; plain diagonal suffices
    val a = Array(
      Array(5.0, 0.0, 0.0),
      Array(0.0, 2.0, 0.0),
      Array(0.0, 0.0, 1.0))
    val (values, vectors) = LandmarkMds.topEigen(a, 2)
    assert(approx(values(0), 5.0, 1e-9) && approx(values(1), 2.0, 1e-9))
    assert(approx(math.abs(vectors(0)(0)), 1.0, 1e-6))
    assert(approx(math.abs(vectors(1)(1)), 1.0, 1e-6))
  }

  test("q_lmds yields one row per label with finite coordinates") {
    val r = LandmarkMdsQueries.qLmds(spark, SfDir).collect()
    assert(r.length == 10)
    r.foreach { row =>
      assert(!row.getDouble(2).isNaN && !row.getDouble(3).isNaN)
      assert(row.getLong(1) > 0)
    }
  }
}
