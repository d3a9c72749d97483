package graft.operators.clustering

import graft.SparkSpec
import org.scalacheck.{Gen, Prop}

/** Property-based checks for the graph-iterative cores against driver
  * brute force on random inputs — chain shapes, self-loops, duplicate
  * edges, isolated cores, and border ties that the fixed corpus never
  * produces. */
class GraphPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, cases: Int): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(cases), prop)
    assert(res.passed, res.status.toString)
  }

  test("connected components equal a driver union-find on random graphs") {
    val edgeGen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 19L), Gen.choose(0L, 19L)))
    check(Prop.forAll(edgeGen) { edges =>
      val parent = Array.tabulate(20)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (u, v) =>
        val (ru, rv) = (find(u.toInt), find(v.toInt))
        if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
      }
      // self-loops connect nothing: a node with only self-loops is
      // isolated and (per the documented contract) absent from the output
      val incident = edges.filter(e => e._1 != e._2)
        .flatMap(e => Seq(e._1, e._2)).toSet
      val expected = incident.map(x => x -> find(x.toInt).toLong).toMap
      val got = ConnectedComponents.run(edges.toDF("u", "v"), "u", "v")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == expected
    }, cases = 12)
  }

  test("dbscan matches a brute-force driver twin on random planar points") {
    val ptsGen = for {
      n <- Gen.choose(4, 16)
      xs <- Gen.listOfN(n, Gen.choose(0, 9))
      ys <- Gen.listOfN(n, Gen.choose(0, 9))
    } yield xs.zip(ys).zipWithIndex.map { case ((x, y), i) =>
      (i.toLong, Array(x.toFloat, y.toFloat))
    }
    val cfgGen = Gen.zip(Gen.oneOf(1.1, 1.6, 2.3), Gen.choose(2, 4))
    check(Prop.forAll(ptsGen, cfgGen) { case (pts, (eps, minPts)) =>
      // brute force: symmetric eps-neighbors, core = |N|+1 >= minPts,
      // cluster = min core id of the core-graph component, border = min
      // core-neighbor's cluster, noise = -1
      def d(a: Array[Float], b: Array[Float]) =
        math.sqrt(a.zip(b).map { case (p, q) => (p - q).toDouble * (p - q) }.sum)
      val nbrs = pts.map { case (i, v) =>
        i -> pts.filter { case (j, w) => j != i && d(v, w) <= eps }.map(_._1)
      }.toMap
      val cores = pts.map(_._1).filter(i => nbrs(i).length + 1 >= minPts).toSet
      val parent = scala.collection.mutable.Map(cores.map(c => c -> c).toSeq: _*)
      def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
      for (i <- cores; j <- nbrs(i) if cores(j)) {
        val (ri, rj) = (find(i), find(j))
        if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
      }
      val coreCl = cores.map(c => c -> find(c)).toMap
      val expected = pts.map { case (i, _) =>
        val cl =
          if (cores(i)) coreCl(i)
          else {
            val cn = nbrs(i).filter(cores).map(coreCl)
            if (cn.nonEmpty) cn.min else -1L
          }
        (i, cl, cores(i))
      }.toSet
      val got = Dbscan.run(pts.toDF("id", "vec"), "id", "vec", eps, minPts)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      got == expected
    }, cases = 8)
  }
}
