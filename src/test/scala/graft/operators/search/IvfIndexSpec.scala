package graft.operators.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {

  private lazy val indexPath = {
    val p = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    IvfIndex.build(spark, SfDir, p)
    p
  }

  private lazy val query: Seq[Float] = graft.Tables.embeddings(spark, SfDir)
    .filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toIndexedSeq

  test("persisted probe returns the same hits as the in-memory IVF query") {
    val persisted = IvfIndex.probe(spark, indexPath, query, k = 10)
      .filter(col("vec_id") > 0)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val inMemory = AnnQueries.qAnnIvf(spark, SfDir)
      .collect().map(r => (r.getLong(0), r.getAs[Double]("cos_sim"))).toSeq
    // the persisted probe includes vec 0 itself; compare on the common top hits
    assert(persisted.toSet.intersect(inMemory.toSet).size >= 9,
      s"persisted=$persisted inMemory=$inMemory")
  }

  test("probe plan prunes to the probed cells' partitions") {
    val plan = IvfIndex.probe(spark, indexPath, query, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"no partition pruning visible:\n$plan")
  }

  test("batched probe agrees with per-query probes and prunes dynamically") {
    val qs = graft.Tables.embeddings(spark, SfDir)
      .filter(col("vec_id") < 3).select(col("vec_id"), col("embedding"))
    val batch = IvfIndex.probeBatch(spark, indexPath, qs, "vec_id", "embedding", k = 5)
    val got = batch.collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    (0L until 3L).foreach { q =>
      val qvec = graft.Tables.embeddings(spark, SfDir)
        .filter(col("vec_id") === q).select("embedding").head().getSeq[Float](0).toIndexedSeq
      val single = IvfIndex.probe(spark, indexPath, qvec, k = 5)
        .collect().map(_.getLong(0)).toSeq
      assert(got(q) == single, s"q=$q batch=${got(q)} single=$single")
    }
    // the index scan must be dynamically pruned by the probe-set subquery
    val plan = batch.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning on the index scan:\n$plan")
  }

  test("index directory is laid out by cell") {
    val cells = new java.io.File(s"$indexPath/data").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell="))
    assert(cells.length == graft.operators.clustering.ClusteringQueries.K)
  }

  test("append maintains the index: build-half + append-half == build-full") {
    val e = graft.Tables.embeddings(spark, SfDir)
    val mid = e.agg(expr("percentile(vec_id, 0.5)")).head().getDouble(0).toLong
    val cs = graft.operators.clustering.ClusteringQueries.centroids(spark, SfDir)

    val incremental = java.nio.file.Files.createTempDirectory("graft_ivf_inc").toString
    IvfIndex.buildFrom(spark, e.filter(col("vec_id") <= mid), incremental, cs)
    IvfIndex.append(spark, incremental, e.filter(col("vec_id") > mid))

    val queries = e.filter(col("vec_id") < 5).select(col("vec_id"), col("embedding"))
    val viaAppend = IvfIndex.probeBatch(spark, incremental, queries,
        "vec_id", "embedding", k = 10)
      .orderBy("qid", "rk").collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val viaFull = IvfIndex.probeBatch(spark, indexPath, queries,
        "vec_id", "embedding", k = 10)
      .orderBy("qid", "rk").collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(viaAppend == viaFull,
      "probes over the appended index must equal probes over a full rebuild")

    // compaction collapses the per-cell file fragmentation appends create
    // and must not change a single probe row
    def dataFiles(p: String): Int = {
      val root = java.nio.file.Paths.get(s"$p/data")
      val s = java.nio.file.Files.walk(root)
      try s.filter(f => f.toString.endsWith(".parquet")).count().toInt
      finally s.close()
    }
    val before = dataFiles(incremental)
    IvfIndex.compact(spark, incremental)
    val after = dataFiles(incremental)
    assert(after < before, s"compaction should shrink file count ($before -> $after)")
    val viaCompacted = IvfIndex.probeBatch(spark, incremental, queries,
        "vec_id", "embedding", k = 10)
      .orderBy("qid", "rk").collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(viaCompacted == viaFull, "compaction must not change probe results")
  }

  test("delete rewrites only affected cells; probes equal a rebuild-without") {
    import spark.implicits._
    val e = graft.Tables.embeddings(spark, SfDir)
    val cs = graft.operators.clustering.ClusteringQueries.centroids(spark, SfDir)
    val victims = Seq(3L, 17L, 29L, 41L)

    val p = java.nio.file.Files.createTempDirectory("graft_ivf_del").toString
    IvfIndex.buildFrom(spark, e, p, cs)
    IvfIndex.delete(spark, p, victims.toDF("vec_id"))

    // deleted ids are gone, everything else intact
    val remaining = spark.read.parquet(s"$p/data")
    assert(remaining.filter(col("vec_id").isin(victims.map(Long.box): _*)).count() == 0)
    assert(remaining.count() == e.count() - victims.length)

    // probe equivalence against an index built without the victims
    val rebuilt = java.nio.file.Files.createTempDirectory("graft_ivf_del_ref").toString
    IvfIndex.buildFrom(spark,
      e.filter(!col("vec_id").isin(victims.map(Long.box): _*)), rebuilt, cs)
    val queries = e.filter(col("vec_id") < 5).select(col("vec_id"), col("embedding"))
    def rows(path: String) = IvfIndex.probeBatch(spark, path, queries,
        "vec_id", "embedding", k = 10)
      .orderBy("qid", "rk").collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rows(p) == rows(rebuilt),
      "probes after delete must equal probes over a rebuild-without")

    // upsert: replace vec 3's embedding with vec 0's — it must come back
    // and rank at full similarity against vec 0's own query
    val v0 = e.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0)
    IvfIndex.upsert(spark, p,
      Seq((3L, v0)).toDF("vec_id", "embedding")
        .withColumn("label", lit(0)))
    val hits = IvfIndex.probe(spark, p, v0, k = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(hits.map(_._1).toSet == Set(0L, 3L), s"got ${hits.toSeq}")
    assert(hits.forall(_._2 == 1.0), s"got ${hits.toSeq}")
    assert(spark.read.parquet(s"$p/data")
      .filter(col("vec_id") === 3L).count() == 1)
  }

  test("lifecycle works on a scheme-qualified (file:) Hadoop path") {
    // the swap goes through Hadoop FileSystem resolved from the path's
    // scheme — the same code must work on hdfs:/object stores; prove the
    // scheme resolution path (not default-FS fallback) end to end
    val e = graft.Tables.embeddings(spark, SfDir)
    val cs = graft.operators.clustering.ClusteringQueries.centroids(spark, SfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_uri")
    val uri = "file://" + dir.toString
    IvfIndex.buildFrom(spark, e.filter(col("vec_id") < 200), uri, cs)
    IvfIndex.append(spark, uri, e.filter(col("vec_id") >= 200 && col("vec_id") < 400))
    IvfIndex.compact(spark, uri)
    val hits = IvfIndex.probe(spark, uri, query, k = 5).collect()
    assert(hits.length == 5)
    assert(new java.io.File(dir.toFile, "data").exists()
      && !new java.io.File(dir.toFile, "data_old").exists()
      && !new java.io.File(dir.toFile, "data_compacting").exists())
  }
}
