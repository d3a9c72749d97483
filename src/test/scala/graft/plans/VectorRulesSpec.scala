package graft.plans

import graft.SparkSpec
import graft.functions.VectorOps._
import org.apache.spark.sql.functions._

class VectorRulesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (Array(1.0f, 2.0f, 2.0f), Array(3.0f, 0.0f, 4.0f)),
    (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f))
  ).toDF("a", "b")

  private def optimizedPlan(c: org.apache.spark.sql.Column): String = {
    val q = df.select(c.as("r"))
    EliminateNormalizeUnderCosine(q.queryExecution.analyzed).toString
  }

  test("normalize under cosine is eliminated from the plan") {
    val p = optimizedPlan(cosine_sim(vec_normalize($"a"), vec_normalize($"b")))
    assert(!p.contains("vec_normalize"), s"normalize survived:\n$p")
    assert(p.contains("vec_cosine"))
  }

  test("double normalize collapses to one") {
    val p = optimizedPlan(vec_normalize(vec_normalize($"a")))
    assert(p.sliding("vec_normalize".length).count(_ == "vec_normalize") == 1)
  }

  test("rewrite preserves values including the zero-vector NaN edge") {
    val raw = df.select(cosine_sim($"a", $"b")).as[Double].collect()
    val viaNorm = df.select(cosine_sim(vec_normalize($"a"), vec_normalize($"b")))
      .as[Double].collect()
    raw.zip(viaNorm).foreach { case (x, y) =>
      assert((x.isNaN && y.isNaN) || approx(x, y, 1e-12))
    }
  }
}
