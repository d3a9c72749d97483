package graft.operators.clustering

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side union-find oracle: node -> min id of its component. */
  private def oracle(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElse(x, x) != x) x = parent(x)
      x
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keys.map(n => n -> find(n)).toMap
  }

  private def check(edges: Seq[(Long, Long)]): Unit = {
    val got = ConnectedComponents.run(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got === oracle(edges))
  }

  test("two triangles and a bridge") {
    check(Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 12L), (3L, 10L)))
  }

  test("long chain (worst case for plain label propagation)") {
    check((1L to 200L).sliding(2).map(p => (p(1), p.head)).toSeq)
  }

  test("duplicate, reversed, and self edges are harmless") {
    check(Seq((1L, 2L), (2L, 1L), (1L, 2L), (5L, 5L), (5L, 6L)))
  }

  test("random graph matches union-find oracle") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(500)((rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
      .filter(e => e._1 != e._2)
    check(edges)
  }

  test("many singleton components (star forest already)") {
    check((0L until 50L).map(i => (2 * i, 2 * i + 1)))
  }

  test("star-round loop path (localFinishThreshold = 0) matches oracle") {
    val rnd = new scala.util.Random(7)
    val edges = (Seq.fill(400)((rnd.nextInt(250).toLong, rnd.nextInt(250).toLong)) ++
      (1000L to 1100L).sliding(2).map(p => (p.head, p(1)))).filter(e => e._1 != e._2)
    val got = ConnectedComponents.run(edges.toDF("a", "b"), "a", "b",
      localFinishThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(got === oracle(edges))
  }
}
