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
}
