package graft.operators.analytics

import graft.SparkSpec
import org.scalacheck.{Gen, Prop}

/** Property-based semantics checks for the temporal joins on random tiny
  * frames with DELIBERATE timestamp collisions — the events corpus has
  * unique (user, ts) pairs, so tie rules (at-or-before at equal ts,
  * same-ts build rows, boundary containment) are otherwise exercised only
  * by handcrafted cases. ScalaCheck compares against driver brute force. */
class TemporalJoinsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  // small domains force collisions: 3 keys × 8 timestamps
  private val key = Gen.choose(0L, 2L)
  private val ts = Gen.choose(0L, 7L)

  test("asOfJoin equals brute force on random frames with ts collisions") {
    val buildGen = Gen.listOf(Gen.zip(key, ts)).map(_.distinct) // unique (k, ts)
    val probeGen = Gen.nonEmptyListOf(Gen.zip(key, ts))
    check(Prop.forAll(buildGen, probeGen) { (build, probe) =>
      val b = build.map { case (k, t) => (k, t, s"s$k-$t") }
      val p = probe.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val out = TemporalJoins.asOfJoin(
          p.toDF("k", "t", "pid"), b.toDF("k", "t", "s"), "k", "t", Seq("s"))
        .collect()
        .map(r => (r.getAs[Long]("pid"),
          if (r.isNullAt(3)) None else Some((r.getLong(3), r.getString(4)))))
        .toMap
      val expected = p.map { case (k, t, pid) =>
        val prior = b.filter(x => x._1 == k && x._2 <= t)
        pid -> (if (prior.isEmpty) None
                else Some(prior.maxBy(_._2)).map(x => (x._2, x._3)))
      }.toMap
      out == expected
    })
  }

  test("rangeJoin equals brute force for any bin width") {
    val winGen = Gen.listOf(Gen.zip(Gen.choose(0L, 20L), Gen.choose(0L, 12L)))
      .map(_.zipWithIndex.map { case ((s, len), i) => (i.toLong, s, s + len) })
    val ptGen = Gen.nonEmptyListOf(Gen.choose(0L, 32L))
    val widthGen = Gen.choose(1L, 9L)
    check(Prop.forAll(winGen, ptGen, widthGen) { (wins, pts, width) =>
      val out = TemporalJoins.rangeJoin(
          pts.toDF("t"), wins.toDF("w_id", "s", "e"), "t", "s", "e", width)
        .groupBy($"w_id", $"t").count().collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      // each containment pair appears EXACTLY once per point instance
      val ptCount = pts.groupBy(identity).view.mapValues(_.size).toMap
      val expected = (for {
        (w, s, e) <- wins; t <- pts.distinct if t >= s && t < e
      } yield ((w, t), ptCount(t).toLong)).toMap
      out.toMap == expected && out.length == expected.size
    })
  }
}
