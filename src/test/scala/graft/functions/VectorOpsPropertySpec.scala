package graft.functions

import graft.SparkSpec
import graft.functions.VectorOps._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (scalacheck generators, seeded deterministic sampling —
  * the scalatest/scalacheck bridge artifact isn't available offline): the
  * Catalyst kernels agree with plain-Scala reference math on random
  * vectors, and metric axioms hold. */
class VectorOpsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int, seed: Long): Seq[T] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(seed + i)))

  private def vecGen(len: Int): Gen[Array[Float]] =
    Gen.listOfN(len, Gen.choose(-100.0f, 100.0f)).map(_.toArray)

  private val pairGen: Gen[(Array[Float], Array[Float])] = for {
    n <- Gen.choose(1, 16)
    a <- vecGen(n)
    b <- vecGen(n)
  } yield (a, b)

  private def refDot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  test("vec_dot / euclidean / manhattan match reference math on random vectors") {
    val cases = samples(pairGen, 30, 1000L)
    val rs = cases.toDF("a", "b")
      .select(vec_dot($"a", $"b"), euclidean_dist($"a", $"b"), manhattan_dist($"a", $"b"))
      .as[(Double, Double, Double)].collect()
    cases.zip(rs).foreach { case ((a, b), r) =>
      val eu = math.sqrt(a.zip(b).map { case (x, y) =>
        val d = x.toDouble - y.toDouble; d * d }.sum)
      val mh = a.zip(b).map { case (x, y) => math.abs(x.toDouble - y.toDouble) }.sum
      assert(approx(r._1, refDot(a, b), 1e-6 * (1 + math.abs(refDot(a, b)))))
      assert(approx(r._2, eu, 1e-6 * (1 + eu)))
      assert(approx(r._3, mh, 1e-6 * (1 + mh)))
    }
  }

  test("normalize yields unit norm; cosine bounded; euclidean <= manhattan") {
    val cases = samples(pairGen, 30, 2000L)
    val rs = cases.toDF("a", "b")
      .select(vec_norm(vec_normalize($"a")), cosine_sim($"a", $"b"),
        euclidean_dist($"a", $"b"), manhattan_dist($"a", $"b"))
      .as[(Double, Double, Double, Double)].collect()
    cases.zip(rs).foreach { case ((a, _), r) =>
      if (!a.forall(_ == 0.0f)) assert(approx(r._1, 1.0, 1e-6))
      assert(r._2 >= -1.0 - 1e-9 && r._2 <= 1.0 + 1e-9)
      assert(r._3 <= r._4 + 1e-9, "euclidean must not exceed manhattan")
    }
  }

  test("triangle inequality for euclidean distance") {
    val tripleGen = for {
      a <- vecGen(8); b <- vecGen(8); c <- vecGen(8)
    } yield (a, b, c)
    val cases = samples(tripleGen, 20, 3000L)
    val rs = cases.toDF("a", "b", "c")
      .select(euclidean_dist($"a", $"b"), euclidean_dist($"b", $"c"),
        euclidean_dist($"a", $"c"))
      .as[(Double, Double, Double)].collect()
    rs.foreach(r => assert(r._3 <= r._1 + r._2 + 1e-6))
  }
}
