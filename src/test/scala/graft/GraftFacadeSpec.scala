package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraftFacadeSpec extends SparkSpec {

  test("executeClustering adds cluster_label and returns k centroids") {
    val (out, centers) = Graft.executeClustering(
      Tables.embeddings(spark, SfDir), "embedding", k = 5)
    assert(centers.length == 5)
    assert(out.columns.contains("cluster_label"))
    assert(out.select("cluster_label").distinct().count() == 5)
  }

  test("classify agrees with the clustering assignment oracle path") {
    val cs = operators.clustering.ClusteringQueries.centroids(spark, SfDir)
    val viaFacade = Graft.classify(Tables.embeddings(spark, SfDir), "embedding", cs)
      .select(col("vec_id"), col("cluster_label"))
    val viaQuery = operators.clustering.ClusteringQueries.qNearestCentroid(spark, SfDir)
      .select(col("vec_id"), col("centroid_id").as("cluster_label"))
    assert(viaFacade.exceptAll(viaQuery).count() == 0)
  }

  test("search returns the same hits as the brute-force query") {
    val e = Tables.embeddings(spark, SfDir)
    val q = e.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val hits = Graft.search(e.filter(col("vec_id") > 0), "embedding", q, k = 10)
      .collect().map(_.getLong(0)).toSeq
    val oracle = operators.search.SearchQueries.qTopkBruteforce(spark, SfDir)
      .collect().map(_.getLong(0)).toSeq
    assert(hits == oracle)
  }

  test("mergeLabels leaves unmatched rows null and matched rows labeled") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "x")
    val labels = Seq((1L, 7), (3L, 9)).toDF("document_id", "etiqueta_cluster")
    val merged = Graft.mergeLabels(base, "doc_id", labels)
      .collect().map(r => r.getLong(0) -> Option(r.getAs[Integer]("etiqueta_cluster"))).toMap
    assert(merged(1L).contains(7) && merged(2L).isEmpty && merged(3L).contains(9))
  }

  test("rrfFuse ranks a doc present in both lists above single-list docs") {
    import spark.implicits._
    val a = Seq((1L, 0.9), (2L, 0.8), (3L, 0.7)).toDF("id", "s")
    val b = Seq((2L, 0.99), (4L, 0.5)).toDF("id", "s")
    val fused = Graft.rrfFuse(a, b, "id", k = 4).collect()
    assert(fused.head.getLong(0) == 2L) // in both lists
    assert(fused.map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
  }

  test("dedupGroups maps near-dup chains to one canonical id") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again tomorrow"),
      (3L, "completely unrelated text about spark catalyst expressions and shuffles here")
    ).toDF("id", "body")
    val g = Graft.dedupGroups(docs, "id", "body", minJaccard = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g == Map(1L -> 1L, 2L -> 1L))
  }

  test("kmeansSweep and mahalanobisScores run on the embeddings table") {
    val e = Tables.embeddings(spark, SfDir)
    val sweep = Graft.kmeansSweep(e, "embedding", Seq(2, 3))
    assert(sweep.map(_.k) == Seq(2, 3) && sweep.forall(_.inertia > 0))
    val m = Graft.mahalanobisScores(e, "vec_id", "embedding")
    assert(m.filter(col("maha_sq") < 0).count() == 0)
  }

  test("round-2 facade: robust scores, LMDS projection, markup, BPE") {
    val e = Tables.embeddings(spark, SfDir)
    val r = Graft.robustMahalanobisScores(e, "vec_id", "embedding")
    assert(r.filter(col("robust_maha_sq") < 0).count() == 0)
    val p = Graft.projectLandmarkMds(e, "vec_id", "embedding")
    assert(p.columns.contains("p0") && p.columns.contains("p1"))
    assert(p.filter(col("p0").isNaN || col("p1").isNaN).count() == 0)
    assert(Graft.extractText("html", "<p>hi</p>".getBytes("UTF-8")) == "hi")
    val merges = Graft.trainBpe(Tables.documents(spark, SfDir), "text", numMerges = 20)
    assert(merges.size == 20)
    import spark.implicits._
    val toks = Seq(Tuple1("the test")).toDF("t")
      .select(Graft.bpeTokens(col("t"), merges).as("tk"))
      .head().getSeq[String](0)
    assert(toks.nonEmpty && toks.mkString.endsWith(functions.Bpe.EndMark))
  }

  test("round-3 facade: codecs, tfidf, pii, unigram, incremental near-dup") {
    import spark.implicits._
    // codecs roundtrip through the facade
    val pcm = Graft.decodeWav(operators.multimodal.WavCodec.encode(
      Array.tabulate(32)(i => (i * 500).toShort), 16000))
    assert(pcm.sampleRate == 16000 && pcm.samples.length == 32)
    val img = Graft.decodePng(operators.multimodal.PngCodec.encode(
      4, 4, Array.tabulate(16)(_ * 15)))
    assert(img.width == 4 && img.pixels.toSeq == (0 until 16).map(_ * 15))
    // tfidf: k rows per doc, ranked
    val docs = Tables.documents(spark, SfDir)
    val tt = Graft.tfidfTopTerms(docs, "doc_id", "text", topK = 2)
    assert(tt.groupBy("doc_id").count().filter(col("count") > 2).count() == 0)
    // pii redaction
    val red = Seq(Tuple1("mail me at a.b@x.io ref 123456 ok"))
      .toDF("t").select(Graft.redactPii(col("t"))).head().getString(0)
    assert(red == "mail me at <EMAIL> ref <NUM> ok")
    // unigram quality: scores strictly positive
    val uq = Graft.unigramQualityScores(docs.limit(50), "doc_id", "text")
    assert(uq.filter(col("mean_neg_logprob") <= 0).count() == 0)
    // incremental near-dup: planted copy matches its original in the store
    val store = operators.dedup.StreamNearDup.perDocSketches(
      docs.select(col("doc_id"), col("text")))
    val probe = operators.dedup.StreamNearDup.perDocSketches(
      docs.filter(col("doc_id") < 3)
        .select((col("doc_id") + 500000L).as("doc_id"),
          concat(col("text"), lit(" tail")).as("text")))
    val hits = Graft.nearDupAgainstStore(store, probe).collect()
    assert(hits.length >= 3 &&
      hits.forall(r => r.getLong(1) >= 500000L && r.getDouble(2) >= 0.5))
  }

  test("round-3b facade: temporal joins, semDedup, pdf/docx extraction") {
    import spark.implicits._
    // as-of: probe event at t=15 sees the t=10 state, not the t=20 one
    val build = Seq((1L, 10L, 100.0), (1L, 20L, 200.0)).toDF("k", "t", "v")
    val probe = Seq((1L, 15L, "e")).toDF("k", "t", "tag")
    val asof = Graft.asOfJoin(probe, build, "k", "t", Seq("v")).head()
    assert(asof.getAs[Long]("state_t") == 10L &&
      asof.getAs[Double]("state_v") == 100.0)
    // range: end-exclusive containment
    val w = Seq((7L, 0L, 10L)).toDF("w_id", "s", "e")
    val p = Seq(9L, 10L).toDF("t")
    val rj = Graft.rangeJoin(p, w, "t", "s", "e", 4L).collect()
    assert(rj.length == 1 && rj(0).getAs[Long]("t") == 9L)
    // semDedup: an exact copy of vec 0 (higher id) is dropped, survivors keep one
    val emb = Tables.embeddings(spark, SfDir).select("vec_id", "embedding")
    val copy = emb.filter(col("vec_id") === 0)
      .select((col("vec_id") + 900000L).as("vec_id"), col("embedding"))
    val cs = operators.clustering.ClusteringQueries.centroids(spark, SfDir)
    val kept = Graft.semDedup(emb.unionByName(copy), "vec_id", "embedding", cs, 0.99)
    assert(kept.filter(col("vec_id") === 900000L).count() == 0)
    assert(kept.filter(col("vec_id") === 0).count() == 1)
    // pdf/docx/xlsx/pptx extraction roundtrips through the facade
    val lines = Seq("hello (pdf) world", "x & <y>")
    assert(Graft.extractPdfText(
      operators.multimodal.PdfCodec.encode(lines)) == lines.toVector)
    assert(Graft.extractDocxText(
      operators.multimodal.DocxCodec.encode(lines)) == lines.toVector)
    import operators.multimodal.XlsxCodec.{NumCell, StrCell}
    val grid = Vector(Vector[operators.multimodal.XlsxCodec.Cell](
      StrCell("a&b"), NumCell(1.25)))
    assert(Graft.extractXlsxCells(
      operators.multimodal.XlsxCodec.encode(grid)) == grid)
    assert(Graft.extractPptxText(
      operators.multimodal.PptxCodec.encode(Seq(lines))) == Vector(lines.toVector))
    // zoo dispatch routes by format tag and rejects non-text formats
    assert(Graft.extractDocument("pdf",
      operators.multimodal.PdfCodec.encode(lines)) == lines.toVector)
    assert(Graft.extractDocument("pptx",
      operators.multimodal.PptxCodec.encode(Seq(lines))) == lines.toVector)
    assert(Graft.extractDocument("html",
      "<p>hi</p>".getBytes("UTF-8")) == Vector("hi"))
    intercept[IllegalArgumentException](Graft.extractDocument("wav", Array[Byte]()))
  }

  test("SQL functions available via GraftExtensions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
        "vec_norm(array(3.0D, 4.0D)) AS n, " +
        "round(vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)), 6) AS c").head()
    assert(approx(r.getDouble(0), 11.0))
    assert(approx(r.getDouble(1), 5.0))
    assert(approx(r.getDouble(2), 1.0))
  }

  test("bloomDedupFilter drops exactly the history-contained batch rows") {
    import spark.implicits._
    val history = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "text")
    val batch = Seq((10L, "beta"), (11L, "delta"), (12L, "gamma"), (13L, "epsilon"))
      .toDF("id", "text")
    val kept = Graft.bloomDedupFilter(history, batch, "text")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(11L, 13L), s"expected fresh rows only, got $kept")
  }

  test("importanceWeights ranks target-like docs above off-target docs") {
    import spark.implicits._
    val docs = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, "the quick brown fox jumps over the lazy dog", true)
      else (i.toLong, "zzz qqq xxx vvv kkk www yyy uuu ooo ppp", false)
    }.toDF("id", "text", "is_en")
    val w = Graft.importanceWeights(docs, "id", "text", org.apache.spark.sql.functions.col("is_en"), buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val evenMean = (0 until 40 by 2).map(i => w(i.toLong)).sum / 20
    val oddMean = (1 until 40 by 2).map(i => w(i.toLong)).sum / 20
    assert(evenMean > oddMean,
      s"target-matching docs must outweigh off-target: $evenMean <= $oddMean")
  }

  test("psiDrift is ~0 for identical halves and large for disjoint ranges") {
    import spark.implicits._
    val a = (0 until 200).map(i => i.toDouble % 50).toDF("x")
    val same = Graft.psiDrift(a, a, "x").head().getDouble(4)
    assert(same < 0.05, s"identical distributions must have ~zero PSI: $same")
    val b = (0 until 200).map(i => 1000.0 + i % 50).toDF("x")
    val far = Graft.psiDrift(a, b, "x").head().getDouble(4)
    assert(far > 0.2, s"disjoint distributions must trip the PSI alarm: $far")
  }

  test("stratifiedFilter keeps at least half of each group, cut at its own median") {
    import spark.implicits._
    val df = (for (g <- Seq("a", "b"); i <- 0 until 20)
      yield (g, if (g == "a") i.toDouble else i * 100.0)).toDF("g", "s")
    val kept = Graft.stratifiedFilter(df, "g", "s")
    val counts = kept.groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("a") >= 10 && counts("b") >= 10, s"median cut must keep >= half: $counts")
    // group a's absolute scores are far below b's kept rows — per-group cut, not global
    assert(counts("a") > 0, "a would be empty under a global threshold")
  }

  test("clusterValidity on separated synthetic clusters: CH high, DB low vs mixed") {
    import spark.implicits._
    def mk(center: Double, n: Int, off: Int) =
      (0 until n).map { i =>
        (off + i.toLong, Array(center.toFloat, (center + 0.1 * (i % 5)).toFloat,
          (center - 0.05 * (i % 3)).toFloat, center.toFloat))
      }
    val pts = (mk(1.0, 20, 0) ++ mk(-1.0, 20, 100)).toDF("vec_id", "embedding")
    val cents = Seq(Seq.fill(4)(0.5), Seq.fill(4)(-0.5))
    val r = Graft.clusterValidity(pts, "embedding", cents).head()
    assert(r.getInt(0) == 2 && r.getLong(1) == 40)
    assert(r.getDouble(4) > 100.0, s"well-separated clusters need high CH: ${r.getDouble(4)}")
    assert(r.getDouble(5) < 0.5, s"well-separated clusters need low DB: ${r.getDouble(5)}")
  }
}
