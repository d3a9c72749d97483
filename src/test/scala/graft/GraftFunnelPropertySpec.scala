package graft

import org.scalacheck.{Gen, Prop}

import java.math.{BigDecimal => JBig, RoundingMode}

/** Property-based semantics checks for the GENERIC funnel / cohort
  * primitives (round-4 verdict ask #8): q_event_funnel and
  * q_retention_cohorts oracle them on ONE event shape, so random tiny
  * frames with deliberate ts collisions, missing stages, empty windows and
  * NON-LEXICALLY-SORTED stage labels are compared here against driver
  * brute force (the TemporalJoinsPropertySpec pattern). The label
  * generator is adversarial on purpose: the round-4 implementation lagged
  * over Window.orderBy(label), which silently paired stages with the
  * wrong predecessor whenever labels didn't sort in stage order. */
class GraftFunnelPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, min: Int = 20): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(res.passed, res.status.toString)
  }

  private def round6(d: Double): Double =
    JBig.valueOf(d).setScale(6, RoundingMode.HALF_UP).doubleValue()

  // small domains force ts collisions and absent stages
  private val user = Gen.choose(0L, 3L)
  private val ts = Gen.choose(0L, 7L)
  private val evType = Gen.oneOf("a", "b", "c")

  /** Driver brute force of the funnel rule: t_i(u) = min ts of a stage-i
    * event strictly after t_{i-1}(u) and within the window (≤0 = open). */
  private def bruteFunnel(events: Seq[(Long, String, Long)],
                          stages: Seq[(String, String, Long)]): Seq[(String, Long, Option[Double])] = {
    var reached = Map.empty[Long, Long]
    var prevN = Option.empty[Long]
    stages.zipWithIndex.map { case ((label, tpe, win), i) =>
      reached =
        if (i == 0)
          events.filter(_._2 == tpe).groupBy(_._1)
            .map { case (u, es) => u -> es.map(_._3).min }
        else
          reached.flatMap { case (u, tPrev) =>
            val qual = events.filter(e => e._1 == u && e._2 == tpe &&
              e._3 > tPrev && (win <= 0 || e._3 <= tPrev + win)).map(_._3)
            if (qual.isEmpty) None else Some(u -> qual.min)
          }
      val n = reached.size.toLong
      val pct = prevN match {
        case None if n == 0L => None // 0/0 → null (ANSI-safe guard)
        case None            => Some(1.0)
        case Some(0L)        => None // dead predecessor → undefined
        case Some(p)         => Some(round6(n.toDouble / p))
      }
      prevN = Some(n)
      (label, n, pct)
    }
  }

  test("funnel equals brute force — non-lexical labels, ts collisions, missing stages") {
    val eventsGen = Gen.nonEmptyListOf(Gen.zip(user, evType, ts))
    val winGen = Gen.oneOf(0L, 1L, 2L, 4L)
    // labels sort lexically AGAINST stage order — the round-4 bug's blind spot
    val labels = Seq("z_first", "m_second", "a_third")
    check(Prop.forAll(eventsGen, winGen, winGen) { (events, w1, w2) =>
      val stages = Seq((labels(0), "a", 0L), (labels(1), "b", w1), (labels(2), "c", w2))
      val got = Graft.funnel(
          events.toDF("u", "t", "ts"), "u", "t", "ts", stages)
        .collect()
        .map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
        .toSeq
      got == bruteFunnel(events, stages)
    })
  }

  test("funnel: single stage and fully-empty stages behave") {
    val events = Seq((1L, "a", 3L), (1L, "a", 5L), (2L, "a", 4L))
    val one = Graft.funnel(events.toDF("u", "t", "ts"), "u", "t", "ts",
      Seq(("only", "a", 0L))).collect()
    assert(one.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq(("only", 2L, 1.0)))
    val dead = Graft.funnel(events.toDF("u", "t", "ts"), "u", "t", "ts",
      Seq(("s1", "b", 0L), ("s2", "a", 0L))).collect()
    assert(dead.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("s1", 0L), ("s2", 0L)))
    assert(dead.head.isNullAt(2) && dead(1).isNullAt(2),
      "0-user stages: pct undefined (null), not a divide-by-zero crash")
  }

  /** Driver brute force of periodic cohort retention. */
  private def bruteRetention(activity: Seq[(Long, Long)], periodLen: Long)
      : Seq[(Long, Long, Long, Long, Double)] = {
    val ev = activity.map { case (u, t) => (u, t / periodLen) }.distinct
    val first = ev.groupBy(_._1).map { case (u, ps) => u -> ps.map(_._2).min }
    val sizes = first.groupBy(_._2).map { case (p, us) => p -> us.size.toLong }
    ev.groupBy { case (u, p) => (first(u), p - first(u)) }
      .map { case ((c, o), rows) =>
        (c, o, rows.map(_._1).distinct.size.toLong, sizes(c),
          round6(rows.map(_._1).distinct.size.toDouble / sizes(c)))
      }
      .toSeq.sortBy(t => (t._1, t._2))
  }

  test("cohortRetention equals brute force for any period length") {
    val actGen = Gen.nonEmptyListOf(Gen.zip(user, Gen.choose(0L, 30L)))
    val periodGen = Gen.choose(1L, 5L)
    check(Prop.forAll(actGen, periodGen) { (act, periodLen) =>
      val got = Graft.cohortRetention(
          act.toDF("u", "ts"), "u", "ts", periodLen)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4)))
        .toSeq
      got == bruteRetention(act, periodLen)
    })
  }

  test("cohortRetention: single-period cohort has exactly the o=0 full-retention row") {
    val act = Seq((1L, 0L), (2L, 1L), (1L, 1L))
    val got = Graft.cohortRetention(act.toDF("u", "ts"), "u", "ts", 10L).collect()
    assert(got.length == 1)
    assert((got.head.getLong(0), got.head.getLong(1), got.head.getLong(2),
      got.head.getLong(3), got.head.getDouble(4)) == (0L, 0L, 2L, 2L, 1.0))
  }
}
