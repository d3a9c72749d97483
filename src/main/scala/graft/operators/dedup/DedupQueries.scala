package graft.operators.dedup

import graft.{QueryModule, Tables}
import graft.functions.VectorOps._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY §2 "Deduplication").
  *
  * Scale design: exact dedup is one shuffle on a 128-bit content hash with
  * map-side partial aggregation; n-gram Jaccard and embedding near-dup are
  * *blocked* pair joins (adjacent-id / label blocks here; MinHash-LSH bands
  * are the general blocking path) — never a global cross join.
  */
object DedupQueries extends QueryModule {

  private val ngramCache = new graft.RollingCache
  private val spanCache = new graft.RollingCache
  private val semDedupCache = new graft.RollingCache

  /** Exact duplicate grouping by md5(text); keeper = min doc_id per group
    * (the canonical survivor rule). */
  def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper"))
      .withColumn("is_dup", col("n_copies") > 1)
      .orderBy("h")

  /** Incremental (cross-snapshot) exact dedup with a Bloom prefilter —
    * the "don't re-ingest what the corpus already has" step of a rolling
    * 100 TB pipeline. History = 80% of the corpus (doc_id%10 < 8); the
    * incoming batch = the remaining fresh docs PLUS re-crawled copies of
    * every doc_id%10 == 0 history doc under a new id (re-ingestion is
    * exactly how exact dups arise in production).
    *
    * Scale shape: the history is summarized ONCE into a Bloom filter via
    * `bloom_filter_agg` (a mergeable partial-agg sketch — one pass, no
    * shuffle of history content), sized from the history count at 16
    * bits/item (~1.1% FPP). The batch probes the broadcast filter
    * MAP-SIDE; only `might_contain` survivors (true dups + ~1% FPs) pay
    * the exact md5 semi-join, so the verify shuffle carries the dup rate,
    * not the batch. Blooms have no false negatives and the semi-join
    * kills false positives, so the RESULT is exact regardless of FPP —
    * the oracle replays plain IN-history semantics and never sees the
    * filter. */
  def qBloomDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val hist = docs.filter(col("doc_id") % 10 < 8)
      .select(md5(col("text")).as("h"), xxhash64(col("text")).as("hx"))
    val batch = docs.filter(col("doc_id") % 10 >= 8)
      .select(col("doc_id"), col("source"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("source"), col("text")))
    val nHist = math.max(hist.count(), 1L)
    val bloom = hist
      .agg(graft.functions.SketchOps.bloom_filter_agg(col("hx"), nHist, nHist * 16))
      .head().getAs[Array[Byte]](0)
    val candidates = batch.filter(
      graft.functions.SketchOps.might_contain(lit(bloom), xxhash64(col("text"))))
    val nb = batch.groupBy("source").agg(count(lit(1)).as("n_batch"))
    val nd = candidates.withColumn("h", md5(col("text")))
      .join(hist.select("h"), Seq("h"), "left_semi")
      .groupBy("source").agg(count(lit(1)).as("n_dup"))
    nb.join(nd, Seq("source"), "left")
      .select(col("source"), col("n_batch"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        (col("n_batch") - coalesce(col("n_dup"), lit(0L))).as("n_kept"))
      .orderBy("source")
  }

  /** The batch's Bloom-prefilter survivors (exposed for the spec: every
    * true dup MUST survive — no false negatives — and FPs stay bounded). */
  private[dedup] def bloomCandidates(spark: SparkSession, dir: String): (Long, Long, Long) = {
    val docs = Tables.documents(spark, dir)
    val hist = docs.filter(col("doc_id") % 10 < 8).select(xxhash64(col("text")).as("hx"))
    val batch = docs.filter(col("doc_id") % 10 >= 8)
      .select(col("text"))
      .unionByName(docs.filter(col("doc_id") % 10 === 0).select(col("text")))
    val nHist = math.max(hist.count(), 1L)
    val bloom = hist
      .agg(graft.functions.SketchOps.bloom_filter_agg(col("hx"), nHist, nHist * 16))
      .head().getAs[Array[Byte]](0)
    val surv = batch.filter(
      graft.functions.SketchOps.might_contain(lit(bloom), xxhash64(col("text")))).count()
    val trueDups = docs.filter(col("doc_id") % 10 === 0).count()
    (batch.count(), surv, trueDups)
  }

  /** Word 3-gram shingle sets for a text column (distinct). */
  def shingles(text: Column, n: Int = 3): Column = {
    val ws = split(trim(text), graft.operators.text.TextQueries.WsRe)
    when(size(ws) >= n,
      array_distinct(transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", slice(ws, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** N-gram Jaccard over adjacent-doc pairs: |A∩B| / |A∪B| on distinct
    * 3-gram shingle sets. Symmetric inter/union formula mirrored in the
    * oracle so both engines agree on set semantics.
    *
    * Perf: shingle sets are built once and persisted (both join sides read
    * the same branch), and intersected as xxhash64 longs, not strings —
    * identical counts modulo 2^-64 collisions. */
  def qNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val sh = ngramCache.persist(d.select(col("doc_id"),
      array_distinct(transform(shingles(col("text")), s => xxhash64(s))).as("sh")))
    val a = sh.select(col("doc_id"), col("sh").as("sh_a"))
    val b = sh.select((col("doc_id") - 1).as("doc_id"), col("sh").as("sh_b"))
    a.join(b, "doc_id")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
      .select(col("doc_id"),
        size(col("sh_a")).as("n_sh_a"), size(col("sh_b")).as("n_sh_b"),
        round(col("inter") / when(col("uni") === 0, lit(null)).otherwise(col("uni")), 6)
          .as("jaccard"))
      .orderBy("doc_id")
  }

  /** Embedding-cosine near-duplicate pairs, blocked by the `label` column
    * (at 100 TB the block key is an LSH band, see MinHashLsh). τ=0.4 —
    * the synthetic corpus has no pairs above 0.5. */
  def qDedupEmbed(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    // r16: exact-duplicate contraction behind the shared ratio-probe gate
    // (graft.operators.search.KnnContracted). The OUTPUT is inherently
    // pair-sized either way, but the cosine SCORING drops from
    // Σ block² point pairs to distinct-vector group pairs (10⁴× at 100
    // copies/vector); qualifying group pairs then expand to member pairs
    // by two bounded joins. Exact: identical vectors give identical
    // cosines (the expansion reuses the group-level computed value, never
    // a literal), each unordered member pair appears exactly once
    // (distinct groups via (least, greatest); within-group via v1 < v2),
    // and the gate keeps duplicate-poor corpora on the original plan.
    embedPairs(e, graft.operators.search.KnnContracted.shouldContract(e))
      .orderBy("v1", "v2")
  }

  /** The τ-filtered pair kernel behind [[qDedupEmbed]], gate explicit so
    * the spec can force both plans on one frame. */
  private[dedup] def embedPairs(e: DataFrame, contract: Boolean): DataFrame = {
    if (!contract) {
      val a = e.select(col("label"), col("vec_id").as("v1"), col("embedding").as("emb_a"))
      val b = e.select(col("label"), col("vec_id").as("v2"), col("embedding").as("emb_b"))
      return a.join(b, Seq("label"))
        .filter(col("v1") < col("v2"))
        .withColumn("cos_sim", round(cosine_sim(col("emb_a"), col("emb_b")), 6))
        .filter(col("cos_sim") > 0.4)
        .select(col("label"), col("v1"), col("v2"), col("cos_sim"))
    }
    val marked = graft.operators.search.KnnContracted.mark(e).cache()
    val groups = marked.filter(col("vec_id") === col("rep"))
    val ga = groups.select(col("label"), col("rep").as("g1"), col("embedding").as("emb_a"))
    val gb = groups.select(col("label"), col("rep").as("g2"), col("embedding").as("emb_b"))
    // group pairs INCLUDING self-pairs (g, g): a duplicate group's own
    // member pairs share the group's self-cosine (computed, ≈1.0)
    val gp = ga.join(gb, Seq("label"))
      .filter(col("g1") <= col("g2"))
      .withColumn("cos_sim", round(cosine_sim(col("emb_a"), col("emb_b")), 6))
      .filter(col("cos_sim") > 0.4)
      .select(col("label"), col("g1"), col("g2"), col("cos_sim"))
    val m1 = marked.select(col("rep").as("g1"), col("vec_id").as("va"))
    val m2 = marked.select(col("rep").as("g2"), col("vec_id").as("vb"))
    val cross = gp.filter(col("g1") =!= col("g2"))
      .join(m1, Seq("g1")).join(m2, Seq("g2"))
      .select(col("label"), least(col("va"), col("vb")).as("v1"),
        greatest(col("va"), col("vb")).as("v2"), col("cos_sim"))
    val within = gp.filter(col("g1") === col("g2"))
      .join(m1, Seq("g1"))
      .join(m2.withColumnRenamed("g2", "g1"), Seq("g1"))
      .filter(col("va") < col("vb"))
      .select(col("label"), col("va").as("v1"), col("vb").as("v2"), col("cos_sim"))
    cross.unionByName(within)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — the embedding-space
    * dedup used on LAION/C4-scale corpora): k-means the embeddings, then
    * near-dedup ONLY within each cluster — the cluster assignment is the
    * blocking key, so pair cost is Σ|cluster|², never n². Survivor rule =
    * min vec_id per similar pair (the same canonical rule as exact dedup;
    * the transitive-group variant is qDedupGroups' connected components).
    *
    * Composition: deterministic centroids + the map-side NearestCentroid
    * expression from the clustering stack (no assignment shuffle), one
    * equi-join on centroid_id for pairs. At 100 TB the cluster count k
    * scales with n so E|cluster| stays bounded (SemDeDup uses k≈10⁵ for
    * 10⁹ points); the join stays shuffle-partitioned on centroid_id and
    * AQE splits skewed cells. */
  def qSemDedup(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.NearestCentroid
    import graft.operators.clustering.ClusteringQueries
    val cs = ClusteringQueries.centroids(spark, dir)
    // both pair-join sides read the same assignment branch; the rolling
    // cache bounds repeated invocations to one live cached copy
    // EXACT-DUPLICATE CONTRACTION before the pair join (r10 scale fix):
    // a crawled corpus is duplicate-heavy — the sf1 stress corpus plants
    // 10-copy groups, and within-cluster pairs grow QUADRATICALLY in
    // copies (100× pairs at 10 copies; 9.7× measured wall). Identical
    // vectors have identical sims, so the pair join only needs DISTINCT
    // vectors: for a copy-group with ids {i1<…<im}, every non-minimum
    // member is dropped unconditionally (sim 1 with the earlier i1 >
    // τ), and i1 is dropped iff SOME OTHER similar group has an earlier
    // min id (any of its members is earlier ⟺ its min is). Output is
    // IDENTICAL to the all-pairs form — the oracle still replays the
    // quadratic definition and hash-matches.
    val uniq = semDedupCache.persist(Tables.embeddings(spark, dir)
      .withColumn("v", vec_normalize(col("embedding")))
      .withColumn("centroid_id",
        NearestCentroid(col("v"), cs).getField("centroid_id"))
      .groupBy(col("centroid_id"), col("v"))
      .agg(min(col("vec_id")).as("mid"), count(lit(1)).as("cnt")))
    val a = uniq.select(col("centroid_id"), col("mid").as("m1"), col("v").as("va"))
    val b = uniq.select(col("centroid_id"), col("mid").as("m2"), col("v").as("vb"))
    // normalized vectors → dot product IS cosine; round-then-compare keeps
    // the τ boundary identical across engines (same scheme as qDedupEmbed)
    val repDropped = a.join(b, Seq("centroid_id"))
      .filter(col("m1") < col("m2"))
      .filter(round(vec_dot(col("va"), col("vb")), 6) > 0.4)
      .groupBy(col("centroid_id"))
      .agg(countDistinct(col("m2")).as("n_rep_dropped"))
    uniq.groupBy(col("centroid_id"))
      .agg(sum(col("cnt")).as("n_vecs"),
        sum(col("cnt") - 1).as("n_copy_dropped"))
      .join(repDropped, Seq("centroid_id"), "left")
      .select(col("centroid_id"), col("n_vecs"),
        (col("n_copy_dropped") + coalesce(col("n_rep_dropped"), lit(0L)))
          .as("n_dropped"),
        (col("n_vecs") - col("n_copy_dropped")
          - coalesce(col("n_rep_dropped"), lit(0L))).as("n_kept"))
      .orderBy("centroid_id")
  }

  /** Span length (tokens) of the repeated-substring detector. */
  val SpanK = 8

  /** EXACT repeated-SPAN detection (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better" — the substring-granular layer of
    * the dedup ladder, below document-level exact/near dedup): every
    * k-token window of every document is fingerprinted (md5 of the joined
    * tokens, identical hex in both engines); a window whose fingerprint
    * occurred EARLIER in the corpus order (lower doc_id, or same doc at a
    * lower position) is a repeated span. Per doc: window/repeat counts and
    * the number of distinct token POSITIONS covered by repeated spans —
    * the fraction a span-level deduper would clip, and the per-doc
    * repetition exposure a curation report ranks on.
    *
    * Shape: windows are built map-side (one transform over the split
    * array — no join, no explode-then-window over the corpus); the only
    * shuffles are the fingerprint groupBy (first-occurrence rank via one
    * window over g — map-side combinable count would not give rank) and
    * the per-doc aggregations. All outputs are exact integers. */
  def qSpanDedup(spark: SparkSession, dir: String): DataFrame = {
    val k = SpanK
    val d = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        filter(split(trim(lower(col("text"))), graft.operators.text.TextQueries.WsRe),
          w => length(w) > 0).as("ws"))
      .filter(size(col("ws")) >= k)
    val grams = d.select(col("doc_id"), size(col("ws")).as("n_tokens"),
      explode(expr(
        s"""transform(sequence(1, size(ws) - $k + 1), i ->
           |  named_struct('pos', i, 'g', md5(concat_ws(' ', slice(ws, i, $k)))))"""
          .stripMargin)).as("s"))
      .select(col("doc_id"), col("n_tokens"),
        col("s.pos").cast("long").as("pos"), col("s.g").as("g"))
    val w = Window.partitionBy(col("g")).orderBy(col("doc_id"), col("pos"))
    // cache the ranked windows: both consumers (per-doc counts, covered
    // positions) would otherwise re-scan and re-rank the whole corpus
    val marked = spanCache.persist(grams.withColumn("rep", row_number().over(w) > 1))
    val perDoc = marked.groupBy(col("doc_id"))
      .agg(first(col("n_tokens")).as("n_tokens"),
        count(lit(1)).as("n_spans"),
        sum(when(col("rep"), 1L).otherwise(0L)).as("n_rep_spans"))
    val covered = marked.filter(col("rep"))
      .select(col("doc_id"),
        explode(expr(s"sequence(pos, pos + $k - 1)")).as("p"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("p")).as("n_rep_tokens"))
    perDoc.join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_spans"), col("n_rep_spans"),
        coalesce(col("n_rep_tokens"), lit(0L)).as("n_rep_tokens"))
      .orderBy("doc_id")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> (qDedupExact _),
    "q_ngram_jaccard" -> (qNgramJaccard _),
    "q_dedup_embed" -> (qDedupEmbed _),
    "q_sem_dedup" -> (qSemDedup _),
    "q_span_dedup" -> (qSpanDedup _),
    "q_bloom_dedup" -> (qBloomDedup _))

  override def oracles: Map[String, String] = Map(
    // repeated-span replay: same tokenizer, same md5 window fingerprints,
    // first-occurrence rank by (doc_id, pos); Spark slice(ws, i, k) ==
    // DuckDB ws[i : i+k-1] (both 1-based, length k); exact integers only
    "q_span_dedup" ->
      s"""WITH d AS (
         |  SELECT doc_id, list_filter(
         |    string_split_regex(trim(lower(text)), '[ \\t\\n\\r\\f\\x0B]+'),
         |    w -> len(w) > 0) AS ws
         |  FROM documents),
         |dk AS (SELECT doc_id, ws FROM d WHERE len(ws) >= $SpanK),
         |grams AS (
         |  SELECT doc_id, len(ws) AS n_tokens, CAST(i AS BIGINT) AS pos,
         |    md5(array_to_string(ws[CAST(i AS INT) : CAST(i AS INT) + $SpanK - 1], ' ')) AS g
         |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - $SpanK + 2)) AS i FROM dk)),
         |marked AS (
         |  SELECT doc_id, n_tokens, pos, g,
         |    row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) > 1 AS rep
         |  FROM grams),
         |per_doc AS (
         |  SELECT doc_id, any_value(n_tokens) AS n_tokens, count(*) AS n_spans,
         |    sum(CASE WHEN rep THEN 1 ELSE 0 END) AS n_rep_spans
         |  FROM marked GROUP BY doc_id),
         |covered AS (
         |  SELECT doc_id, count(DISTINCT p) AS n_rep_tokens
         |  FROM (SELECT doc_id, unnest(generate_series(pos, pos + $SpanK - 1)) AS p
         |        FROM marked WHERE rep)
         |  GROUP BY doc_id)
         |SELECT p.doc_id, CAST(p.n_tokens AS BIGINT) AS n_tokens,
         |  CAST(p.n_spans AS BIGINT) AS n_spans,
         |  CAST(p.n_rep_spans AS BIGINT) AS n_rep_spans,
         |  CAST(coalesce(c.n_rep_tokens, 0) AS BIGINT) AS n_rep_tokens
         |FROM per_doc p LEFT JOIN covered c ON p.doc_id = c.doc_id
         |ORDER BY p.doc_id""".stripMargin,
    "q_bloom_dedup" ->
      """WITH hist AS (SELECT md5(text) AS h FROM documents WHERE doc_id % 10 < 8),
        |batch AS (
        |  SELECT doc_id, source, text FROM documents WHERE doc_id % 10 >= 8
        |  UNION ALL
        |  SELECT doc_id + 1000000, source, text FROM documents WHERE doc_id % 10 = 0),
        |nb AS (SELECT source, CAST(count(*) AS BIGINT) AS n_batch FROM batch GROUP BY source),
        |nd AS (SELECT source, CAST(count(*) AS BIGINT) AS n_dup FROM batch
        |       WHERE md5(text) IN (SELECT h FROM hist) GROUP BY source)
        |SELECT nb.source, nb.n_batch,
        |  COALESCE(nd.n_dup, 0) AS n_dup,
        |  nb.n_batch - COALESCE(nd.n_dup, 0) AS n_kept
        |FROM nb LEFT JOIN nd USING (source) ORDER BY nb.source""".stripMargin,
    "q_dedup_exact" ->
      """SELECT md5(text) AS h, count(*) AS n_copies, min(doc_id) AS keeper,
        |  count(*) > 1 AS is_dup
        |FROM documents GROUP BY 1 ORDER BY h""".stripMargin,
    "q_ngram_jaccard" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(ws) >= 3
        |    THEN list_transform(range(1, len(ws) - 1),
        |         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
        |    ELSE [] END) AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '[ \t\n\r\f\x0B]+') AS ws FROM documents))
        |SELECT a.doc_id,
        |  len(a.s) AS n_sh_a, len(b.s) AS n_sh_b,
        |  round(CAST(len(list_filter(a.s, x -> list_contains(b.s, x))) AS DOUBLE)
        |    / NULLIF(len(a.s) + len(b.s) - len(list_filter(a.s, x -> list_contains(b.s, x))), 0), 6) AS jaccard
        |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
        |ORDER BY a.doc_id""".stripMargin,
    "q_sem_dedup" -> {
      import graft.operators.clustering.ClusteringQueries.NrmCte
      s"""WITH $NrmCte,
         |pts AS (SELECT a.vec_id, a.centroid_id, n.v
         |        FROM asg a JOIN nrm n USING (vec_id)),
         |drp AS (
         |  SELECT centroid_id, count(DISTINCT dropped_id) AS n_dropped FROM (
         |    SELECT p1.centroid_id, p2.vec_id AS dropped_id
         |    FROM pts p1 JOIN pts p2
         |      ON p1.centroid_id = p2.centroid_id AND p1.vec_id < p2.vec_id
         |    WHERE round(list_inner_product(p1.v, p2.v), 6) > 0.4)
         |  GROUP BY centroid_id),
         |tot AS (SELECT centroid_id, count(*) AS n_vecs FROM pts GROUP BY 1)
         |SELECT t.centroid_id, t.n_vecs, COALESCE(d.n_dropped, 0) AS n_dropped,
         |  t.n_vecs - COALESCE(d.n_dropped, 0) AS n_kept
         |FROM tot t LEFT JOIN drp d USING (centroid_id)
         |ORDER BY t.centroid_id""".stripMargin
    },
    "q_dedup_embed" ->
      """SELECT a.label, a.vec_id AS v1, b.vec_id AS v2,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
        |FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) > 0.4
        |ORDER BY v1, v2""".stripMargin)
}
