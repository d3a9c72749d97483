package graft.operators.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphIndexSpec extends SparkSpec {

  private lazy val out = GraphIndex.qGraphAppend(spark, SfDir).collect()
  private def phase(name: String) = out.find(_.getAs[String]("phase") == name).get

  test("artifact round-trip: the persisted final graph equals the in-session descent build") {
    val emb = graft.Tables.embeddings(spark, SfDir).select(col("vec_id"), col("embedding"))
    val direct = KnnGraph.nnDescentRounds(emb, SfDir, KnnGraph.Degree, KnnGraph.Rounds)
      .last.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val persisted = GraphIndex.finalGraph(spark, SfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(persisted === direct)
  }

  test("meta sidecar validates and detects drift (size, content fingerprint, version)") {
    GraphIndex.finalGraph(spark, SfDir) // ensure built
    val idx = GraphIndex.artifactPath(SfDir)
    val emb = graft.Tables.embeddings(spark, SfDir)
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val fp = GraphIndex.corpusFingerprint(emb)
    assert(GraphIndex.validArtifact(spark, idx, n, fp))
    assert(!GraphIndex.validArtifact(spark, idx, n + 1, fp),
      "a corpus-size drift must invalidate the artifact")
    assert(!GraphIndex.validArtifact(spark, idx, n, fp + 1),
      "a same-size content drift must invalidate the artifact (r10 review)")
    assert(!GraphIndex.validArtifact(spark, idx + "_nope", n, fp))
  }

  test("appended graph invariants: <=K per node, no self-loops, every node indexed") {
    val (_, gApp) = GraphIndex.halfAndAppended(spark, SfDir)
    val rows = gApp.collect()
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)), "self-loop edge")
    val deg = rows.groupBy(_.getLong(0)).map(_._2.length)
    assert(deg.max <= GraphIndex.Degree)
    val n = graft.Tables.embeddings(spark, SfDir).count()
    assert(rows.map(_.getLong(0)).toSet.size === n,
      "a node (old or newly appended) has no out-edges after append")
  }

  test("the append law: half-build + append recall tracks the full rebuild") {
    val app = phase("appended").getAs[Double]("recall")
    val full = phase("full_rebuild").getAs[Double]("recall")
    // the incremental path must be in the rebuild's class — the artifact
    // is useless if appends degrade it materially. (Empirically it BEATS
    // the 4-round rebuild here: the insertion beam scores the √n upper
    // layer exactly and walks serve rounds, which finds better
    // neighborhoods for the new 20% than descent from ring seeds does —
    // appended 0.9868 vs rebuild 0.7872 at sf0.001.)
    assert(app >= full - 0.1, s"appended recall $app vs rebuild $full")
    assert(app >= 0.9, s"appended recall $app — insertion beam is not finding neighborhoods")
  }

  test("append health: the appended graph's reciprocal share stays in the rebuild's class") {
    val app = phase("appended").getAs[Double]("recip_share")
    val full = phase("full_rebuild").getAs[Double]("recip_share")
    assert(app > 0.0 && app <= 1.0)
    assert(app >= full - 0.1,
      s"appended reciprocal share $app degraded vs rebuild $full — the insert/repair is leaking asymmetric edges")
  }

  test("append rewrites ONLY the touched buckets on disk") {
    GraphIndex.halfAndAppended(spark, SfDir) // builds + appends the scratch artifact
    val idx = graft.operators.search.AnnQueries.scratch(
      s"graft_graph_append_v${GraphIndex.BuildVersion}", SfDir)
    // the half graph was written with bucketed layout; after append every
    // bucket dir still exists and holds parquet (bucket swap left no
    // aside/scratch litter behind)
    val root = new java.io.File(s"$idx/edges")
    val buckets = root.listFiles().filter(_.getName.startsWith("bucket="))
    assert(buckets.nonEmpty)
    assert(!new java.io.File(s"$idx/edges_appending").exists(), "scratch dir leaked")
    assert(!new java.io.File(s"$idx/edges_app_old").exists(), "aside dir leaked")
    // and the artifact still reads as a coherent edge list
    val n = GraphIndex.edges(spark, idx).count()
    assert(n > 0)
  }

  test("q_graph_stats: exact shape and internal consistency") {
    val r = GraphIndex.qGraphStats(spark, SfDir).head()
    assert(r.getAs[Long]("n_vectors") ===
      graft.Tables.embeddings(spark, SfDir).count())
    assert(r.getAs[Long]("n_indexed") + r.getAs[Long]("isolated_nodes") ===
      r.getAs[Long]("n_vectors"))
    assert(r.getAs[Long]("max_degree") <= GraphIndex.Degree)
    assert(r.getAs[Long]("min_degree") >= 1)
    val share = r.getAs[Double]("reciprocal_share")
    assert(share > 0.0 && share <= 1.0)
    // the v8 hierarchy surface: member count matches the pinned stride,
    // and the walk/edge columns follow the brute-bar contract
    val emb = graft.Tables.embeddings(spark, SfDir)
      .select(col("vec_id"), col("embedding"))
    val se1 = GraphServe.upperModulus(emb.count())
    assert(r.getAs[Long]("n_l1") ===
      emb.filter(GraphServe.entryPick(col("vec_id"), se1)).count())
    val walk = r.getAs[Long]("layer_walk")
    assert(walk === (if (r.getAs[Long]("n_l1") > GraphServe.L1BruteBar) 1L else 0L))
    assert(r.getAs[Long]("n_l1_edges") ===
      (if (walk == 1L)
        r.getAs[Long]("n_l1") * math.min(GraphServe.L1Degree, r.getAs[Long]("n_l1") - 1)
      else 0L))
  }
}
