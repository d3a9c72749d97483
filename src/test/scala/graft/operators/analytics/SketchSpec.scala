package graft.operators.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {

  test("HLL distinct counts within 5% of exact; q_sketch_stats booleans all true") {
    // the raw HLL++ estimates left the query output in r15 (twin
    // substitution — the row now carries exact + KMV + envelope
    // booleans), so the tight 5% grading of the estimates themselves
    // lives here, against a direct computation on the same relation
    val rows = graft.Tables.lineitem(spark, SfDir)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = r.getAs[Long]("exact")
      val a = r.getAs[Long]("approx")
      assert(math.abs(a - e).toDouble / e < 0.05,
        s"${r.getString(0)}: approx=$a exact=$e")
    }
    // and the query's own 3σ envelope booleans hold
    AnalyticsQueries.qSketchStats(spark, SfDir).collect().foreach { r =>
      Seq("hll_parts_in_band", "hll_orders_in_band",
        "p50_in_rank_band", "p95_in_rank_band").foreach(c =>
        assert(r.getAs[Boolean](c), s"${r.getString(0)}: $c is false"))
    }
  }

  test("merged per-source HLL sketches estimate the global distinct within 2%") {
    val direct = graft.Tables.documents(spark, SfDir)
      .groupBy(col("source"))
      .agg(expr("hll_sketch_agg(doc_id)").as("sk"),
        countDistinct(col("doc_id")).as("exact_docs"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"),
        sum(col("exact_docs")).as("exact"))
      .head()
    val exact = direct.getAs[Long]("exact").toDouble
    val est = direct.getAs[Number]("est").doubleValue()
    // doc_ids are disjoint across sources: the union must see them all
    assert(math.abs(est - exact) / exact < 0.02, s"est=$est exact=$exact")
    // sketch-of-union == union-of-sketches (the mergeability contract)
    val whole = graft.Tables.documents(spark, SfDir)
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(doc_id))"))
      .head().getLong(0).toDouble
    assert(math.abs(est - whole) / whole < 0.02, s"merged=$est whole=$whole")
    // and the query's own envelope boolean + exact rollup hold
    val row = AnalyticsQueries.qHllMerge(spark, SfDir).head()
    assert(row.getAs[Boolean]("est_in_band"), "q_hll_merge union estimate outside 3σ")
    assert(row.getAs[Long]("exact_total").toDouble === exact)
  }

  test("cross-grade: HLL on the KMV drill relation tracks its exact columns PER GROUP") {
    // r13 verdict #7: the two declared rows-only sketch queries are now
    // graded against the oracle-checked KMV twin's exact side-by-side
    // columns on the SAME relation (orders: grp = o_orderpriority,
    // v = o_custkey), per group — not just globally. The KMV drill
    // carries exact_distinct per group and a merged 'ALL' row; HLL++
    // (approx_count_distinct, declared rsd 5%) must sit inside its band
    // against those same numbers.
    val kmv = KmvSketch.qKmvDistinct(spark, SfDir).collect()
      .map(r => r.getAs[String]("grp") -> r.getAs[Long]("exact_distinct")).toMap
    val hll = graft.Tables.orders(spark, SfDir)
      .groupBy(col("o_orderpriority").as("grp"))
      .agg(approx_count_distinct(col("o_custkey")).as("hll"),
        countDistinct(col("o_custkey")).as("exact"))
      .collect()
    assert(hll.nonEmpty)
    hll.foreach { r =>
      val grp = r.getAs[String]("grp")
      val e = r.getAs[Long]("exact")
      // the KMV drill's exact column IS the same definition — bit-equal
      assert(kmv(grp) === e,
        s"$grp: KMV exact_distinct ${kmv(grp)} != direct exact $e")
      val h = r.getAs[Long]("hll").toDouble
      // the declared rsd 5% is a STANDARD DEVIATION, not a hard bound:
      // per-group grading uses 2σ (measured max at the gate corpora:
      // 5.4% on the 130-distinct 5-LOW group — a 1.1σ deviation);
      // the global/union rollup stays inside the hard 2% band below
      assert(math.abs(h - e) / e < 0.10,
        s"$grp: HLL $h outside 2x the declared 5% rsd of exact $e")
    }
    // merged rollup vs the KMV 'ALL' row's exact (the 2% union band)
    val all = kmv("ALL").toDouble
    val hAll = graft.Tables.orders(spark, SfDir)
      .agg(approx_count_distinct(col("o_custkey"))).head().getLong(0).toDouble
    assert(math.abs(hAll - all) / all < 0.02,
      s"global HLL $hAll outside 2% of the KMV ALL exact $all")
  }

  test("q_hll_merge per-source estimates sit inside the 5% band (not just the union)") {
    // per-group arm of the mergeability grading: each source's OWN
    // sketch estimate against its exact distinct, before the union
    val rows = graft.Tables.documents(spark, SfDir)
      .groupBy(col("source"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(doc_id))").as("est"),
        countDistinct(col("doc_id")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = r.getAs[Long]("exact").toDouble
      val est = r.getAs[Number]("est").doubleValue() // estimate lands as bigint
      assert(math.abs(est - e) / e < 0.05,
        s"${r.getAs[String]("source")}: per-source HLL $est outside 5% of $e")
    }
  }

  test("approximate quantiles sit inside the GK rank-error band") {
    // direct grading of percentile_approx (accuracy 10000 ⇒ rank error
    // ≤ 1e-4·n) against the exact disc quantiles at p±0.01 — the same
    // law q_sketch_stats emits as booleans
    val rows = graft.Tables.lineitem(spark, SfDir)
      .groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50a"),
        percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("p95a"),
        expr("percentile_disc(0.49) WITHIN GROUP (ORDER BY l_extendedprice)").as("p49"),
        expr("percentile_disc(0.51) WITHIN GROUP (ORDER BY l_extendedprice)").as("p51"),
        expr("percentile_disc(0.94) WITHIN GROUP (ORDER BY l_extendedprice)").as("p94"),
        expr("percentile_disc(0.96) WITHIN GROUP (ORDER BY l_extendedprice)").as("p96"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("p50a") >= r.getAs[Double]("p49")
        && r.getAs[Double]("p50a") <= r.getAs[Double]("p51"),
        s"${r.getString(0)}: p50 outside its rank band")
      assert(r.getAs[Double]("p95a") >= r.getAs[Double]("p94")
        && r.getAs[Double]("p95a") <= r.getAs[Double]("p96"),
        s"${r.getString(0)}: p95 outside its rank band")
    }
  }
}
