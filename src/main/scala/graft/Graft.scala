package graft

import graft.functions.{NearestCentroid, VectorOps}
import VectorOps._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-facing facade mirroring the reference's API surface, so a user of
  * CarolinaTorrente/Vector-Search-Optimization can switch method-for-method
  * (reference name in each scaladoc) while staying DataFrame-native.
  *
  * {{{
  *   import graft.Graft
  *   val clustered = Graft.executeClustering(chunks, "embedding", k = 37, seed = 42)
  *   val labeled   = Graft.mergeLabels(documents, "doc_id", docLabels)
  *   val hits      = Graft.search(corpus, "embedding", queryVec, k = 10)
  * }}}
  */
object Graft {

  private val semDedupCache = new RollingCache

  /** ClusteringCreator.execute_clustering (cluster_creator.py:44-59):
    * KMeans with restarts over an embedding column; returns the input with
    * a `cluster_label` column plus driver-side centroids. */
  def executeClustering(df: DataFrame, embeddingCol: String, k: Int,
                        seed: Long = 42L, nInit: Int = 1, maxIter: Int = 25)
      : (DataFrame, Array[Array[Double]]) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feats = df.withColumn("__features",
      array_to_vector(vec_normalize(col(embeddingCol)))).cache()
    val model = (0 until math.max(1, nInit)).map { s =>
      new KMeans().setK(k).setSeed(seed + s).setMaxIter(maxIter)
        .setFeaturesCol("__features").setPredictionCol("cluster_label").fit(feats)
    }.minBy(_.summary.trainingCost)
    // NOTE: feats stays cached — the returned frame is lazy, so an eager
    // unpersist here would drop the cache before `out` ever executes and
    // force recomputation per action. Spark evicts it LRU.
    val out = model.transform(feats).drop("__features")
    (out, model.clusterCenters.map(_.toArray))
  }

  /** classify_embedding (nuevo-kmeans-pre.ipynb:11-17 / cluster_creator):
    * nearest-centroid id for each row — map-side, no join. */
  def classify(df: DataFrame, embeddingCol: String,
               centroids: Seq[Seq[Double]]): DataFrame =
    df.withColumn("cluster_label",
      NearestCentroid(vec_normalize(col(embeddingCol)), centroids)
        .getField("centroid_id"))

  /** Azure AI Search top-k vector query equivalent: exact cosine top-k of
    * the corpus against one query vector (per-partition heaps, no global
    * sort). */
  def search(df: DataFrame, embeddingCol: String, query: Seq[Double], k: Int,
             idCol: String = "vec_id"): DataFrame = {
    val qCol = array(query.map(lit): _*)
    df.select(col(idCol), round(cosine_sim(col(embeddingCol), qCol), 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** LabelingChunksProcessor / merge_documents
    * (ChunkLabelingProcesor.py:24-52): join-update of a label column onto
    * a base table, leaving unmatched rows untouched. */
  def mergeLabels(base: DataFrame, idCol: String, labels: DataFrame,
                  labelIdCol: String = "document_id",
                  labelCol: String = "etiqueta_cluster"): DataFrame =
    base.join(labels.select(col(labelIdCol).as("__id"), col(labelCol)),
      base(idCol) === col("__id"), "left").drop("__id")

  /** chunk_similarities.ipynb `similarity` (lines 177-240): per-group
    * pairwise-cosine summary with a τ threshold. */
  def similarityReport(df: DataFrame, groupCol: String, idCol: String,
                       embeddingCol: String, tau: Double): DataFrame = {
    val a = df.select(col(groupCol), col(idCol).as("__ida"), col(embeddingCol).as("__ea"))
    val b = df.select(col(groupCol), col(idCol).as("__idb"), col(embeddingCol).as("__eb"))
    val pairs = a.join(b, Seq(groupCol)).filter(col("__ida") < col("__idb"))
      .withColumn("__cos", cosine_sim(col("__ea"), col("__eb")))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("__cos") > tau, 1L).otherwise(0L)).as(s"n_above"),
        round(avg(col("__cos")), 6).as("mean_cos"))
    df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_chunks"))
      .join(pairs, Seq(groupCol), "left")
      .na.fill(0L, Seq("n_pairs", "n_above"))
  }

  /** num_tokens_from_string / contar_tokens (update-etiquetas.ipynb:108):
    * BPE-ish token count Column. */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(graft.operators.text.TextQueries.TokenRegex), lit(0)))

  // ---- extended surface (training-pipeline + hybrid-index operators) ----

  /** BM25 keyword top-k — the lexical half of the reference's hybrid index. */
  def keywordSearch(docs: DataFrame, idCol: String, textCol: String,
                    terms: Seq[String], k: Int): DataFrame =
    operators.search.KeywordSearch.bm25TopK(docs, idCol, textCol, terms, k)

  /** Reciprocal-rank fusion (Azure AI Search's hybrid fusion, k=60): each
    * input is an (id, score) frame; ranks are taken by score desc, ties by
    * id; a doc scores Σ 1/(rrfK + rank) over the lists it appears in. */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, k: Int,
              rrfK: Int = 60): DataFrame =
    operators.search.KeywordSearch.rrfFuse(a, b, idCol, k, rrfK)

  /** Near-duplicate groups: MinHash-LSH candidate pairs (verified by exact
    * Jaccard) → connected components → (id, canonical_id) mapping. The
    * mapping covers ONLY docs in some near-dup group — documents with no
    * near-duplicate are absent. To deduplicate a corpus, left-join this
    * mapping and keep rows where canonical_id is null OR equals the id. */
  def dedupGroups(docs: DataFrame, idCol: String, textCol: String,
                  minJaccard: Double): DataFrame = {
    val pairs = operators.dedup.MinHashLsh.nearDupPairs(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("text")), minJaccard)
    operators.clustering.ConnectedComponents.run(pairs, "d1", "d2")
      .select(col("id").as(idCol), col("component").as("canonical_id"))
  }

  /** silhouettes.ipynb k-sweep: every k fitted in shared scans; returns
    * (k, inertia, silhouette) models with centroids. */
  def kmeansSweep(df: DataFrame, embeddingCol: String, ks: Seq[Int],
                  seed: Long = 42L, maxIter: Int = 10)
      : Seq[operators.clustering.MultiKMeans.SweepModel] =
    operators.clustering.MultiKMeans.sweep(
      df.select(vec_normalize(col(embeddingCol)).cast("array<float>").as("__v")),
      "__v", ks, seed, maxIter)

  /** silhouettes.ipynb DBSCAN: (id, cluster, is_core); cluster -1 = noise. */
  def dbscan(df: DataFrame, idCol: String, embeddingCol: String,
             eps: Double, minPts: Int): DataFrame =
    operators.clustering.Dbscan.run(df, idCol, embeddingCol, eps, minPts)

  /** SQ8 scalar quantization of an embedding column (the index-compression
    * path): returns (withCodes, mins, maxs); reconstruct with
    * [[operators.search.Quantization.dequantize]]. Codes land in a
    * smallint column (2 bytes/element — Spark's smallest integral type
    * covering 0..255; pack to binary for the full 4× cut). */
  def quantizeEmbeddings(df: DataFrame, embeddingCol: String)
      : (DataFrame, Array[Double], Array[Double]) = {
    val (mn, mx) = operators.search.Quantization.fitMinMax(df, embeddingCol)
    (df.withColumn(s"${embeddingCol}_q8",
      operators.search.Quantization.quantize(
        col(embeddingCol).cast("array<double>"), mn, mx).cast("array<smallint>")),
      mn, mx)
  }

  /** analisis-informe.ipynb MinCovDet study (classical-covariance
    * substitute): squared Mahalanobis score per row. */
  def mahalanobisScores(df: DataFrame, idCol: String,
                        embeddingCol: String): DataFrame = {
    val (mu, inv) = operators.analytics.Mahalanobis.fitInverse(df, embeddingCol)
    df.select(col(idCol),
      graft.functions.MahalanobisSq(col(embeddingCol), mu.toIndexedSeq,
        inv.map(_.toIndexedSeq).toIndexedSeq).as("maha_sq"))
  }

  /** analisis-informe.ipynb MinCovDet itself: ROBUST squared Mahalanobis
    * score per row (distributed C-step fit — contaminated points do not
    * inflate the covariance they are scored against). */
  def robustMahalanobisScores(df: DataFrame, idCol: String,
                              embeddingCol: String,
                              supportFraction: Double = 0.5): DataFrame = {
    val (mu, inv) = operators.analytics.Mahalanobis.fitRobust(
      df, embeddingCol, supportFraction)
    df.select(col(idCol),
      graft.functions.MahalanobisSq(col(embeddingCol), mu.toIndexedSeq,
        inv.map(_.toIndexedSeq).toIndexedSeq).as("robust_maha_sq"))
  }

  /** nuevo-kmeans-pre.ipynb UMAP 2D/3D role: Landmark-MDS embedding —
    * appends p0..p{dims-1} coordinate columns, map-side. */
  def projectLandmarkMds(df: DataFrame, idCol: String, embeddingCol: String,
                         dims: Int = 2, numLandmarks: Int = 32): DataFrame = {
    val model = operators.projection.LandmarkMds.fit(
      df, idCol, embeddingCol, numLandmarks, dims)
    operators.projection.LandmarkMds.transform(df, embeddingCol, model)
  }

  /** The document-conversion zoo's text formats (analisis-informe.ipynb
    * html/markdown converters): html/md/txt payload bytes → plain text. */
  def extractText(fmt: String, payload: Array[Byte]): String =
    operators.multimodal.MarkupDecode.MarkupExtractor.extract(fmt, payload)

  /** tiktoken-style token budgeting: train BPE merges on the corpus
    * (one word-frequency groupBy + driver merge loop)… */
  def trainBpe(docs: DataFrame, textCol: String,
               numMerges: Int = 200): Seq[(String, String)] = {
    val freqs = docs
      .select(explode(split(trim(lower(col(textCol))), graft.operators.text.TextQueries.WsRe)).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(operators.text.BpeQueries.MaxVocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    functions.Bpe.learn(freqs, numMerges)
  }

  /** …then encode any text column into subword tokens with them. */
  def bpeTokens(text: Column, merges: Seq[(String, String)]): Column =
    functions.BpeTokens(text, merges)

  /** Decode a RIFF/WAVE PCM16 payload (pure JVM — the audio entry of the
    * conversion zoo, analisis-informe.ipynb converter table). */
  def decodeWav(payload: Array[Byte]): operators.multimodal.WavCodec.Pcm =
    operators.multimodal.WavCodec.decode(payload)

  /** Decode an 8-bit grayscale PNG payload (pure JVM: CRC-verified chunks,
    * zlib inflate, all five scanline filters). */
  def decodePng(payload: Array[Byte]): operators.multimodal.PngCodec.Image =
    operators.multimodal.PngCodec.decode(payload)

  /** Top-k TF-IDF terms per document (sklearn smooth-idf; ranking on the
    * rounded score so cross-engine ln() ulps can't flip ranks). Delegates
    * to the oracle-checked operator — one tokenizer, one formula. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    topK: Int = 3): DataFrame =
    operators.text.TfIdfQueries.tfidfTopTerms(docs, idCol, textCol, topK)

  /** PII scrub: redact emails and long digit runs in one projection (the
    * pre-training scrub pass; see operators.text.PiiRedact). */
  def redactPii(text: Column): Column = {
    import operators.text.PiiRedact.{EmailRe, LongNumRe}
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), LongNumRe, "<NUM>")
  }

  /** Unigram log-prob quality scores: per doc, mean −ln(cf/T) under the
    * corpus's own unigram model (perplexity-proxy quality filter).
    * Delegates to the oracle-checked operator. */
  def unigramQualityScores(docs: DataFrame, idCol: String,
                           textCol: String): DataFrame =
    operators.text.TfIdfQueries.unigramScores(docs, idCol, textCol)

  /** Latest-state-at-event-time enrichment: distributed as-of join — one
    * shuffle on the key, one window pass, NO join node (the union-window
    * formulation; see operators.analytics.TemporalJoins). */
  def asOfJoin(probe: DataFrame, build: DataFrame, keyCol: String,
               tsCol: String, stateCols: Seq[String]): DataFrame =
    operators.analytics.TemporalJoins.asOfJoin(probe, build, keyCol, tsCol, stateCols)

  /** Point-in-interval containment join (start inclusive, end exclusive)
    * via fixed-width bin blocking — the shuffle key is the bin, never a
    * cross product. */
  def rangeJoin(points: DataFrame, windows: DataFrame, ptCol: String,
                startCol: String, endCol: String, binWidth: Long): DataFrame =
    operators.analytics.TemporalJoins.rangeJoin(
      points, windows, ptCol, startCol, endCol, binWidth)

  /** SemDeDup (Abbas et al. 2023): drop every row whose embedding is
    * within cosine τ of an earlier-id row in the same k-means cell —
    * pairwise work bounded by the cluster assignment, never n². Returns
    * the surviving rows. */
  def semDedup(df: DataFrame, idCol: String, embeddingCol: String,
               centroids: Seq[Seq[Double]], tau: Double): DataFrame = {
    // persisted: feeds both pair-join sides AND the anti-join left; the
    // rolling cache bounds repeated calls to one live cached copy (an
    // eager unpersist here would drop the cache before the lazy result
    // ever executes — same reasoning as executeClustering above)
    val pts = semDedupCache.persist(df
      .withColumn("__v", vec_normalize(col(embeddingCol)))
      .withColumn("__cell",
        NearestCentroid(col("__v"), centroids).getField("centroid_id")))
    val a = pts.select(col("__cell"), col(idCol).as("__id1"), col("__v").as("__va"))
    val b = pts.select(col("__cell"), col(idCol).as("__id2"), col("__v").as("__vb"))
    val dropped = a.join(b, Seq("__cell"))
      .filter(col("__id1") < col("__id2"))
      .filter(vec_dot(col("__va"), col("__vb")) > tau)
      .select(col("__id2").as("__dropped")).distinct()
    pts.join(dropped, pts(idCol) === col("__dropped"), "left_anti")
      .drop("__v", "__cell")
  }

  /** Extract the text runs of a PDF payload (pure JVM: object walk,
    * FlateDecode inflate, literal-string unescape, Tj/TJ). */
  def extractPdfText(payload: Array[Byte]): Vector[String] =
    operators.multimodal.PdfCodec.decodeText(payload)

  /** Extract the paragraphs of a DOCX payload (pure JVM: zip walk,
    * run concatenation, entity unescape). */
  def extractDocxText(payload: Array[Byte]): Vector[String] =
    operators.multimodal.DocxCodec.decodeText(payload)

  /** Extract the cell grid of an XLSX payload (pure JVM: shared-string /
    * inline / numeric cells). */
  def extractXlsxCells(payload: Array[Byte])
      : Vector[Vector[operators.multimodal.XlsxCodec.Cell]] =
    operators.multimodal.XlsxCodec.decode(payload)

  /** Extract slide paragraphs of a PPTX payload (pure JVM: deck-ordered
    * slides, run concatenation). */
  def extractPptxText(payload: Array[Byte]): Vector[Vector[String]] =
    operators.multimodal.PptxCodec.decodeText(payload)

  /** The conversion zoo's text dispatch (analisis-informe.ipynb converter
    * table): route a payload to its real codec by format tag. Spreadsheet
    * cells and audio/image payloads have non-text shapes — use
    * [[extractXlsxCells]] / [[decodeWav]] / [[decodePng]] for those. */
  def extractDocument(fmt: String, payload: Array[Byte]): Vector[String] =
    fmt match {
      case "pdf"  => extractPdfText(payload)
      case "docx" => extractDocxText(payload)
      case "pptx" => extractPptxText(payload).flatten
      case "html" | "markdown" | "md" | "txt" | "text" =>
        Vector(extractText(fmt, payload))
      case other =>
        throw new IllegalArgumentException(s"no text codec for format '$other'")
    }

  /** Incremental near-dup check: verified MinHash pairs (store-side id <
    * probe-side id) between a compact signature store and a new batch —
    * the ingest-time dedup primitive behind q_stream_neardup. Build the
    * per-doc frames with [[operators.dedup.StreamNearDup.perDocSketches]]. */
  def nearDupAgainstStore(store: DataFrame, batch: DataFrame,
                          minJaccard: Double = 0.5): DataFrame =
    operators.dedup.StreamNearDup.pairsAgainst(store.unionByName(batch),
      batch, minJaccard)

  /** Incremental exact dedup against an already-ingested history: drops
    * every batch row whose `textCol` content the history contains. The
    * history is summarized once into a Bloom filter (mergeable one-pass
    * sketch, 16 bits/item ≈ 1.1% FPP) probed MAP-SIDE by the batch; only
    * survivors pay the exact md5 semi-join, so the verify shuffle carries
    * the dup rate, not the batch. Exact regardless of FPP (no bloom false
    * negatives; false positives die in the join) — q_bloom_dedup's
    * primitive. */
  def bloomDedupFilter(history: DataFrame, batch: DataFrame,
                       textCol: String): DataFrame = {
    val hist = history.select(md5(col(textCol)).as("__h"),
      xxhash64(col(textCol)).as("__hx"))
    val nHist = math.max(hist.count(), 1L)
    val bloom = hist
      .agg(functions.SketchOps.bloom_filter_agg(col("__hx"), nHist, nHist * 16))
      .head().getAs[Array[Byte]](0)
    val candidates = batch
      .filter(functions.SketchOps.might_contain(lit(bloom), xxhash64(col(textCol))))
      .withColumn("__h", md5(col(textCol)))
      .join(hist.select("__h"), Seq("__h"), "left_semi")
      .select(md5(col(textCol)).as("__dup_h")).distinct()
    batch.join(candidates, md5(col(textCol)) === col("__dup_h"), "left_anti")
  }

  /** DSIR importance weights (Xie et al. 2023) of every document against a
    * target slice: hashed word uni+bigram features, add-1-smoothed
    * target/raw log-ratios, per-doc Σcnt·lr. Returns (idCol, n_feats,
    * logw); resample by ranking on logw. `isTarget` marks the
    * high-quality slice (e.g. `col("lang") === "en"`). */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        isTarget: Column, buckets: Int = 4096): DataFrame = {
    val ws = filter(split(trim(lower(col(textCol))),
      operators.text.TextQueries.WsRe), w => length(w) > 0)
    val base = docs.select(col(idCol).as("__id"), isTarget.as("__tgt"), ws.as("__ws"))
    val uni = base.select(col("__id"), col("__tgt"), explode(col("__ws")).as("__f"))
    val bi = base.filter(size(col("__ws")) > 1)
      .select(col("__id"), col("__tgt"), explode(expr(
        "transform(sequence(1, size(__ws) - 1), i -> concat(__ws[i-1], ' ', __ws[i]))")).as("__f"))
    val feats = dsirFacadeCache.persist(uni.unionByName(bi).withColumn("__bkt",
      functions.HornerBucket(col("__f"), 1000003L, buckets)))
    val tot = feats.agg(count(lit(1)), count(when(col("__tgt"), 1))).head()
    val (tr, tt) = (tot.getLong(0), tot.getLong(1))
    val raw = feats.groupBy("__bkt").agg(count(lit(1)).as("__cr"))
    val tgt = feats.filter(col("__tgt")).groupBy("__bkt").agg(count(lit(1)).as("__ct"))
    val lrs = feats.sparkSession.range(buckets).select(col("id").as("__bkt"))
      .join(raw, Seq("__bkt"), "left").join(tgt, Seq("__bkt"), "left")
      .select(col("__bkt"),
        round(log((coalesce(col("__ct"), lit(0L)) + 1).cast("double") * lit(tr + buckets)
          / ((coalesce(col("__cr"), lit(0L)) + 1) * lit(tt + buckets))), 6)
          .cast("decimal(9,6)").as("__lr"))
    feats.join(broadcast(lrs), Seq("__bkt"))
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_feats"),
        round(sum(col("__lr")).cast("double"), 6).as("logw"))
  }
  private val dsirFacadeCache = new RollingCache

  /** Calinski-Harabasz + Davies-Bouldin validity indices of a clustering
    * over `centroids` (nuevo-kmeans-pre.ipynb pairs these sweeps with the
    * silhouette): one scan of per-point terms, k-sized everything after.
    * Returns a single row (k, n_pts, w_ssq, b_ssq, ch_index, db_index). */
  def clusterValidity(df: DataFrame, embeddingCol: String,
                      centroids: Seq[Seq[Double]]): DataFrame = {
    // the oracled diagnostic is the same shape over the testdata tables
    val spark = df.sparkSession
    import spark.implicits._
    val k = centroids.length
    val pts = validityFacadeCache.persist(df
      .withColumn("__v", vec_normalize(col(embeddingCol)))
      .withColumn("__asg", NearestCentroid(col("__v"), centroids))
      .select(col("__v"), col("__asg.centroid_id").as("__cell"),
        col("__asg.dist").as("__dist")))
    val glob = pts.agg(count(lit(1)).as("n_pts"),
      sum(round(col("__dist") * col("__dist"), 6).cast("decimal(25,6)"))
        .cast("double").as("__w"))
    val gRows = pts.select(posexplode(col("__v")).as(Seq("__d", "__x")))
      .groupBy("__d")
      .agg((sum(round(col("__x"), 6).cast("decimal(25,6)")).cast("double")
        / count(lit(1))).as("__m")).collect()
    val gbar = new Array[Double](gRows.length)
    gRows.foreach(r => gbar(r.getInt(0)) = r.getDouble(1))
    val gbarCol = array(gbar.map(lit).toIndexedSeq: _*)
    val bDf = centroids.zipWithIndex.map { case (c, i) => (i, c) }.toDF("__cell", "__cv")
      .select(col("__cell"),
        round(aggregate(zip_with(col("__cv"), gbarCol, (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x), 6).as("__bd"))
    val si = pts.groupBy("__cell").agg(count(lit(1)).as("__ni"),
      round(sum(round(col("__dist"), 6).cast("decimal(25,6)")).cast("double")
        / count(lit(1)), 6).as("__si"))
    val bSum = si.join(broadcast(bDf), Seq("__cell"))
      .agg(sum(col("__ni").cast("decimal(9,0)") * col("__bd").cast("decimal(9,6)"))
        .cast("double").as("__b"))
    val pairSeq = for {
      i <- centroids.indices; j <- centroids.indices if i != j
    } yield (i, j,
      math.sqrt(centroids(i).zip(centroids(j)).map { case (a, b) => (a - b) * (a - b) }.sum))
    val dbv = pairSeq.toDF("__ci", "__cj", "__dij")
      .join(broadcast(si.select(col("__cell").as("__ci"), col("__si").as("__s1"))), Seq("__ci"))
      .join(broadcast(si.select(col("__cell").as("__cj"), col("__si").as("__s2"))), Seq("__cj"))
      .groupBy("__ci")
      .agg(max(round((col("__s1") + col("__s2")) / col("__dij"), 6)).as("__dbi"))
      .agg(round(sum(col("__dbi").cast("decimal(9,6)")).cast("double")
        / count(lit(1)), 6).as("db_index"))
    glob.crossJoin(broadcast(bSum)).crossJoin(broadcast(dbv))
      .select(lit(k).as("k"), col("n_pts"),
        round(col("__w"), 6).as("w_ssq"), round(col("__b"), 6).as("b_ssq"),
        round((col("__b") / (lit(k) - 1)) / (col("__w") / (col("n_pts") - lit(k))), 6)
          .as("ch_index"),
        col("db_index"))
  }
  private val validityFacadeCache = new RollingCache

  /** Population Stability Index of `valueCol` between a reference and a
    * current frame — the drift alarm over any scalar marginal (embedding
    * dimension, norm, quality score). Bins are exact reference deciles;
    * returns per-bin rows with the PSI total repeated. PSI > 0.2 is the
    * classic "retrain/reindex" threshold. */
  def psiDrift(reference: DataFrame, current: DataFrame,
               valueCol: String, bins: Int = 10): DataFrame = {
    val both = reference.select(round(col(valueCol), 6).as("__x"), lit(true).as("__ref"))
      .unionByName(current.select(round(col(valueCol), 6).as("__x"), lit(false).as("__ref")))
    val qs = (1 until bins).map(i => i.toDouble / bins)
    val edgeRow = both.filter(col("__ref"))
      .agg(expr(s"percentile_disc(${qs.head}) WITHIN GROUP (ORDER BY __x)"),
        qs.tail.map(q => expr(s"percentile_disc($q) WITHIN GROUP (ORDER BY __x)")): _*)
      .head()
    val edges = (0 until bins - 1).map(edgeRow.getDouble)
    val tot = both.agg(sum(when(col("__ref"), 1L).otherwise(0L)),
      sum(when(!col("__ref"), 1L).otherwise(0L))).head()
    val (nr, nc) = (tot.getLong(0), tot.getLong(1))
    val binCol = edges.map(e => when(col("__x") > lit(e), 1).otherwise(0)).reduce(_ + _)
    val counts = both.sparkSession.range(bins).select(col("id").cast("int").as("bin"))
      .join(both.groupBy(binCol.as("bin")).agg(
        sum(when(col("__ref"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(!col("__ref"), 1L).otherwise(0L)).as("n_cur")), Seq("bin"), "left")
      .select(col("bin"), coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val pr = (col("n_ref") + lit(1.0)) / lit(nr + bins)
    val pc = (col("n_cur") + lit(1.0)) / lit(nc + bins)
    counts.withColumn("term", round((pc - pr) * log(pc / pr), 6))
      .withColumn("psi", round(
        sum(col("term").cast("decimal(9,6)")).over(Window.partitionBy())
          .cast("double"), 6))
      .orderBy("bin")
  }

  /** Ordered, windowed funnel over an event frame: stage i counts users
    * whose first qualifying `eventType` event falls strictly after their
    * stage-(i−1) time and within `windowFromPrev` of it (≤ 0 = unbounded;
    * the first stage's window is ignored). Timestamps are compared as-is
    * — pass exact integer epoch units. Returns (stage, n_users,
    * pct_of_prev) — q_event_funnel's primitive. Each stage is one
    * groupBy(user) min + a user-keyed equi-join; nothing driver-side. */
  def funnel(events: DataFrame, userCol: String, typeCol: String, tsCol: String,
             stages: Seq[(String, String, Long)]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    var reached: DataFrame = null
    val counts = stages.zipWithIndex.map { case ((label, eventType, windowFromPrev), i) =>
      val ev = events.filter(col(typeCol) === eventType)
      reached =
        if (i == 0) ev.groupBy(col(userCol)).agg(min(col(tsCol)).as(s"__t$i"))
        else {
          val inWindow =
            if (windowFromPrev > 0)
              col(tsCol) > col(s"__t${i - 1}") &&
                col(tsCol) <= col(s"__t${i - 1}") + lit(windowFromPrev)
            else col(tsCol) > col(s"__t${i - 1}")
          ev.join(reached, Seq(userCol)).filter(inWindow)
            .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"__t$i"))
        }
      reached.agg(count(lit(1)).as("n_users"))
        .select(lit(i).as("__idx"), lit(label).as("stage"), col("n_users"))
    }
    // window over the POSITIONAL stage index, not the label: caller-supplied
    // labels need not sort lexically in stage order, and a lag over label
    // order would silently pair a stage with the wrong predecessor
    val w = Window.orderBy("__idx")
    counts.reduce(_.unionByName(_))
      .withColumn("__prev", coalesce(lag(col("n_users"), 1).over(w), col("n_users")))
      // explicit 0-guard: a dead predecessor stage means pct is undefined
      // (null), not a DIVIDE_BY_ZERO crash under ANSI mode
      .withColumn("pct_of_prev",
        when(col("__prev") =!= 0, round(col("n_users") / col("__prev"), 6)))
      .orderBy("__idx")
      .select(col("stage"), col("n_users"), col("pct_of_prev"))
  }

  /** Periodic cohort retention over an activity frame: users grouped by
    * the period of their first activity; retention(c, o) = distinct users
    * of cohort c active in period c+o over the cohort size. `tsCol` must
    * be an exact integer epoch unit; `periodLen` the cohort period in the
    * same unit — q_retention_cohorts' primitive. */
  def cohortRetention(activity: DataFrame, userCol: String, tsCol: String,
                      periodLen: Long): DataFrame = {
    // integer DIV: epoch nanos exceed double's mantissa (Tables.events)
    val ev = activity.select(col(userCol).as("__u"), col(tsCol).as("__ts"))
      .select(col("__u"), expr(s"__ts DIV $periodLen").as("__p"))
    val first = ev.groupBy("__u").agg(min("__p").as("__p0"))
    val joined = ev.distinct().join(first, Seq("__u"))
      .select(col("__u"), col("__p0").as("cohort"),
        (col("__p") - col("__p0")).as("period_offset"))
    val ret = joined.groupBy("cohort", "period_offset")
      .agg(countDistinct(col("__u")).as("n_active"))
    val sizes = first.groupBy(col("__p0").as("cohort"))
      .agg(count(lit(1)).as("cohort_size"))
    ret.join(sizes, Seq("cohort"))
      .select(col("cohort"), col("period_offset"), col("n_active"),
        col("cohort_size"),
        round(col("n_active") / col("cohort_size"), 6).as("retention"))
      .orderBy("cohort", "period_offset")
  }

  /** Per-group stratified filter: keep rows at or above their own group's
    * exact `quantile` of `scoreCol` (CCNet's per-language cut —
    * q_lang_quality_filter's primitive). */
  def stratifiedFilter(df: DataFrame, groupCol: String, scoreCol: String,
                       quantile: Double = 0.5): DataFrame = {
    val thr = df.groupBy(col(groupCol)).agg(
      expr(s"percentile_disc($quantile) WITHIN GROUP (ORDER BY $scoreCol)").as("__thr"))
    df.join(broadcast(thr), Seq(groupCol))
      .filter(col(scoreCol) >= col("__thr"))
      .drop("__thr")
  }
}
