package graft.operators.search

import graft.SparkSpec
import graft.functions.VectorOps._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Proves the duplicate-contracted kNN kernel row-identical to the
  * uncontracted point-level window formulation it replaced, on a corpus
  * planted to hit every contraction case: a group deeper than k+1, a
  * group exactly at k, cross-group distance ties resolved by member id,
  * singleton groups, a sub-k block, and the same vector appearing under
  * two labels (must NOT contract across blocks). */
class KnnContractedSpec extends SparkSpec {
  import spark.implicits._

  private val K = 3

  /** (label, vec_id, embedding) with planted duplicate structure. */
  private lazy val dupFrame: DataFrame = {
    val rows: Seq[(Int, Long, Array[Double])] =
      // label 0: 6 copies of p0 (> k+1 deep), 2 copies of p1, singletons
      (0L to 5L).map(i => (0, i, Array(0.0, 0.0))) ++
        Seq(10L, 11L).map(i => (0, i, Array(1.0, 0.0))) ++
        Seq((0, 20L, Array(2.0, 0.0))) ++
        // cross-group tie: two distinct vectors equidistant from p1,
        // with interleaved member ids (13 < 15 < 14-group's second id)
        Seq((0, 13L, Array(1.0, 1.0)), (0, 40L, Array(1.0, 1.0))) ++
        Seq((0, 15L, Array(1.0, -1.0)), (0, 14L, Array(1.0, -1.0))) ++
        // label 1: the SAME vector as label 0's p0 — separate block —
        // plus a block of only 2 points (< k)
        Seq(30L, 31L).map(i => (1, i, Array(0.0, 0.0))) ++
        // label 2: singleton block — no neighbors, must vanish from knn
        Seq((2, 50L, Array(9.0, 9.0)))
    rows.toDF("label", "vec_id", "embedding")
  }

  /** The pre-contraction formulation: full label-blocked pair join +
    * row_number window — the semantics both engines' oracles replay. */
  private def pointLevelKnn(e: DataFrame, k: Int,
                            rounded: Boolean): DataFrame = {
    val a = e.select(col("label"), col("vec_id").as("v"), col("embedding").as("ea"))
    val b = e.select(col("label"), col("vec_id").as("nb"), col("embedding").as("eb"))
    val raw = euclidean_dist(col("ea"), col("eb"))
    val pairs = a.join(b, Seq("label")).filter(col("v") =!= col("nb"))
      .select(col("v"), col("nb"), (if (rounded) round(raw, 6) else raw).as("d"))
    pairs.withColumn("rk", row_number().over(
        Window.partitionBy(col("v")).orderBy(col("d"), col("nb"))))
      .filter(col("rk") <= k)
  }

  private def asSet(df: DataFrame): Set[(Long, Long, Double, Int)] =
    df.select(col("v"), col("nb"), col("d"), col("rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet

  test("gate: size pre-gate rejects toy frames; forced paths agree") {
    // the two-stage gate: toy frames fail the free plan-stats size check
    // before any probe job runs
    assert(!KnnContracted.shouldContract(dupFrame),
      "a toy frame must not pass the size pre-gate")
    val unique = (0L to 20L).map(i => (0, i, Array(i.toDouble, 0.0)))
      .toDF("label", "vec_id", "embedding")
    assert(!KnnContracted.shouldContract(unique))
    // the forced-off path on the duplicate frame still produces the same
    // rows (the gate is plan-only)
    val on = asSet(KnnContracted.knn(dupFrame, K, euclidean_dist(_, _),
      contract = Some(true)))
    val off = asSet(KnnContracted.knn(dupFrame, K, euclidean_dist(_, _),
      contract = Some(false)))
    assert(on == off, s"gate changed results: ${(on -- off).take(5)} / ${(off -- on).take(5)}")
  }

  test("contracted knn equals the point-level window formulation (rounded dist)") {
    val got = asSet(KnnContracted.knn(dupFrame, K,
      (a, b) => round(euclidean_dist(a, b), 6), contract = Some(true)))
    val want = asSet(pointLevelKnn(dupFrame, K, rounded = true))
    assert(got == want,
      s"extra=${(got -- want).take(5)} missing=${(want -- got).take(5)}")
  }

  test("contracted knn equals the point-level window formulation (raw dist)") {
    val got = asSet(KnnContracted.knn(dupFrame, K, euclidean_dist(_, _),
      contract = Some(true)))
    val want = asSet(pointLevelKnn(dupFrame, K, rounded = false))
    assert(got == want,
      s"extra=${(got -- want).take(5)} missing=${(want -- got).take(5)}")
  }

  test("repsOnly output is the rep-rows subset, with correct neighbor groups") {
    val all = KnnContracted.knn(dupFrame, K, euclidean_dist(_, _),
      contract = Some(true)).cache()
    val reps = KnnContracted.knn(dupFrame, K, euclidean_dist(_, _),
      repsOnly = true, contract = Some(true))
    val marked = KnnContracted.mark(dupFrame)
      .select(col("vec_id"), col("rep")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val repSet = marked.values.toSet
    val wantRows = asSet(all.filter(col("v").isin(repSet.toSeq: _*)))
    assert(asSet(reps) == wantRows)
    // nbg really is the neighbor's group representative
    reps.select(col("nb"), col("nbg")).collect()
      .foreach(r => assert(marked(r.getLong(0)) == r.getLong(1),
        s"nbg mismatch for nb=${r.getLong(0)}"))
  }

  test("qLof on planted duplicates equals the point-level LOF formulation") {
    // point-level LOF exactly as the pre-contraction implementation (and
    // the DuckDB oracle) computes it
    val knn = pointLevelKnn(dupFrame, 5, rounded = false)
      .select(col("v").as("i"), col("nb").as("j"), col("d"))
    val kdist = knn.groupBy(col("i").as("p")).agg(max(col("d")).as("kdist"))
    val lrd = knn.join(kdist, knn("j") === kdist("p"))
      .select(col("i"), greatest(col("kdist"), col("d")).as("reach"))
      .groupBy(col("i"))
      .agg((lit(1.0) / (avg(col("reach")) + lit(1e-10))).as("lrd"))
    val nbLrd = lrd.select(col("i").as("nb"), col("lrd").as("lrd_nb"))
    val want = knn.join(nbLrd, knn("j") === nbLrd("nb"))
      .groupBy(col("i")).agg(avg(col("lrd_nb")).as("mean_lrd_nb"))
      .join(lrd, Seq("i"))
      .select(col("i"), round(col("mean_lrd_nb") / col("lrd"), 4).as("lof"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the contracted qLof pipeline, on the same frame (k=5)
    val knnC = KnnContracted.knn(dupFrame, 5, euclidean_dist(_, _),
      repsOnly = true, contract = Some(true))
      .select(col("v").as("i"), col("nbg").as("j"), col("d"))
    val kdistC = knnC.groupBy(col("i").as("p")).agg(max(col("d")).as("kdist"))
    val lrdC = knnC.join(kdistC, knnC("j") === kdistC("p"))
      .select(col("i"), greatest(col("kdist"), col("d")).as("reach"))
      .groupBy(col("i"))
      .agg((lit(1.0) / (avg(col("reach")) + lit(1e-10))).as("lrd"))
    val nbLrdC = lrdC.select(col("i").as("nb"), col("lrd").as("lrd_nb"))
    val lofByGroup = knnC.join(nbLrdC, knnC("j") === nbLrdC("nb"))
      .groupBy(col("i")).agg(avg(col("lrd_nb")).as("mean_lrd_nb"))
      .join(lrdC, Seq("i"))
      .select(col("i").as("rep"), round(col("mean_lrd_nb") / col("lrd"), 4).as("lof"))
    val got = KnnContracted.expand(dupFrame, lofByGroup)
      .select(col("vec_id"), col("lof"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == want,
      s"diverging points: ${(got.toSet -- want.toSet).take(5)} / ${(want.toSet -- got.toSet).take(5)}")
  }
}
