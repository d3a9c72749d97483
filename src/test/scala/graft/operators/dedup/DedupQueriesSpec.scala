package graft.operators.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup finds planted duplicates") {
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z")).toDF("doc_id", "text")
    val groups = docs.groupBy(md5($"text").as("h"))
      .agg(count(lit(1)).as("n_copies"), min($"doc_id").as("keeper"))
    val dups = groups.filter($"n_copies" > 1).collect()
    assert(dups.length == 1 && dups(0).getAs[Long]("keeper") == 1L)
  }

  test("embed-dedup contraction is row-identical to the point-level pair scan") {
    // planted duplicate structure incl. interleaved member ids across
    // groups (so the (least, greatest) emission is exercised), a
    // duplicate group whose within-pairs must carry the computed
    // self-cosine, and a cross-label clone that must NOT pair
    val rows: Seq[(Int, Long, Array[Double])] =
      (0L to 3L).map(i => (0, i, Array(1.0, 0.0, 0.0))) ++
        Seq((0, 10L, Array(0.9, 0.1, 0.0)), (0, 2L + 100L, Array(0.9, 0.1, 0.0))) ++
        Seq((0, 20L, Array(-1.0, 0.0, 0.0))) ++ // anti-parallel: below τ
        Seq((1, 30L, Array(1.0, 0.0, 0.0)), (1, 31L, Array(0.8, 0.2, 0.0)))
    val e = rows.toDF("label", "vec_id", "embedding")
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val contracted = asSet(DedupQueries.embedPairs(e, contract = true))
    val pointLevel = asSet(DedupQueries.embedPairs(e, contract = false))
    assert(contracted == pointLevel,
      s"extra=${(contracted -- pointLevel).take(5)} missing=${(pointLevel -- contracted).take(5)}")
    assert(pointLevel.nonEmpty)
    // within-group pairs present with the computed self-cosine
    assert(contracted.exists { case (_, v1, v2, c) => v1 == 0L && v2 == 1L && c >= 0.999999 })
  }

  test("jaccard: identical texts → 1.0, disjoint → 0.0") {
    val sh = DedupQueries.shingles(lit("a b c d e"))
    val self = spark.range(1).select(
      size(array_intersect(sh, sh)).cast("double")
        .divide(size(array_union(sh, sh))).as("j")).as[Double].head()
    assert(approx(self, 1.0))
    val sh2 = DedupQueries.shingles(lit("p q r s t"))
    val dis = spark.range(1)
      .select(size(array_intersect(sh, sh2)).cast("double").as("j")).as[Double].head()
    assert(approx(dis, 0.0))
  }

  test("shingles of short text are empty") {
    val n = spark.range(1).select(size(DedupQueries.shingles(lit("one two")))).as[Int].head()
    assert(n == 0)
  }

  test("sem-dedup matches a brute-force driver twin and its counts add up") {
    val out = DedupQueries.qSemDedup(spark, SfDir).collect()
      .map(r => (r.getAs[Number]("centroid_id").longValue(), r.getAs[Long]("n_vecs"),
        r.getAs[Long]("n_dropped"), r.getAs[Long]("n_kept")))

    // invariants: partition of the whole table, kept + dropped = vecs
    val total = graft.Tables.embeddings(spark, SfDir).count()
    assert(out.map(_._2).sum == total)
    assert(out.forall { case (_, n, d, k) => k + d == n && d >= 0 && k >= 1 })

    // brute-force twin: same centroids, same assignment, all within-cluster
    // pairs, same round-then-threshold rule — computed on the driver
    val cs = graft.operators.clustering.ClusteringQueries.centroids(spark, SfDir)
      .map(_.toArray).toArray
    val pts = graft.Tables.embeddings(spark, SfDir)
      .select($"vec_id", $"embedding").collect()
      .map { r =>
        val e = r.getSeq[Float](1).toArray.map(_.toDouble)
        val inv = 1.0 / math.sqrt(e.map(x => x * x).sum)
        val v = e.map(_ * inv)
        val cid = cs.indices.minBy { c =>
          val d = math.sqrt(cs(c).zip(v).map { case (a, b) => (a - b) * (a - b) }.sum)
          (d, c)
        }
        (r.getLong(0), cid, v)
      }
    val byCluster = pts.groupBy(_._2)
    val expected = byCluster.map { case (cid, ps) =>
      val sorted = ps.sortBy(_._1)
      val droppedIds = (for {
        i <- sorted.indices; j <- (i + 1) until sorted.length
        dot = sorted(i)._3.zip(sorted(j)._3).map { case (a, b) => a * b }.sum
        if BigDecimal(dot).setScale(6, BigDecimal.RoundingMode.HALF_UP) > 0.4
      } yield sorted(j)._1).toSet
      (cid.toLong, ps.length.toLong, droppedIds.size.toLong,
        ps.length.toLong - droppedIds.size)
    }.toSeq.sortBy(_._1)
    assert(out.toSeq == expected,
      s"spark=${out.toSeq.mkString(",")} expected=${expected.mkString(",")}")
  }
}
