package graft.operators.sampling

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-assembly operators a training-data pipeline needs downstream
  * of dedup/quality filtering (SURVEY §2 "Sampling & assembly"):
  *
  *  - deterministic train/val/test split — hash-bucket assignment, so the
  *    split is stable across reruns, engines, and cluster sizes (no RNG,
  *    no per-partition state);
  *  - per-source quota sampling — cap every source's contribution at k
  *    docs picked by hashed priority (the "no single crawl dominates"
  *    balancing step), expressed on the bounded-heap [[graft.plans.TopKPerGroup]]
  *    operator rather than a window sort;
  *  - token-budget packing — assign docs to fixed-token-budget bins per
  *    source (the context-window packing step before batching), a
  *    partitioned running sum + integer division, no sequential driver
  *    loop.
  *
  * All three are exact-integer arithmetic end to end, so the DuckDB
  * oracle replays them bit-for-bit.
  *
  * Scale shape: split is a pure map + one groupBy(3); quota is one
  * shuffle on source with O(k) state per group; packing is one window
  * shuffle partitioned by source (never a global sort). Reference
  * analog: the train/eval splits and per-source balancing of the corpus
  * notebooks (update-etiquetas.ipynb samples per etiqueta).
  */
object SamplingQueries extends QueryModule {

  /** Mersenne prime 2^31−1: modulus for all priority hashing. */
  val SplitMod = 2147483647L
  /** Knuth's multiplicative constant (2^32/φ). */
  val Mult = 2654435761L
  /** Docs per source kept by the quota sampler. */
  val Quota = 10
  /** Token budget per packed bin. */
  val BinBudget = 2048L

  /** Deterministic per-id priority in [0, 2^31−1): (id mod M)·c mod M.
    * Both factors stay below 2^31·2^32 < 2^63, so the arithmetic is exact
    * BIGINT in Spark AND DuckDB at any id scale (no overflow, no floats).
    * Spark's pmod is always non-negative while SQL `%` keeps the
    * dividend's sign, so the oracle uses the ((x % M) + M) % M form —
    * identical for negative ids too. */
  private[graft] def prio(id: Column): Column =
    pmod(pmod(id, lit(SplitMod)) * lit(Mult), lit(SplitMod))

  /** Same expression in DuckDB SQL (sign-normalized to match pmod). */
  private[graft] def prioSql(id: String): String =
    s"((((($id % $SplitMod) + $SplitMod) % $SplitMod) * $Mult) % $SplitMod)"

  /** Documents plus their deterministic hash-split assignment. */
  private def withSplit(df: DataFrame): DataFrame =
    df.withColumn("bucket", prio(col("doc_id")) % 100)
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test"))

  /** 80/10/10 hash split with per-split corpus accounting. */
  def qSampleSplit(spark: SparkSession, dir: String): DataFrame =
    withSplit(Tables.documents(spark, dir))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy("split")

  /** Keep ≤ Quota docs per source by hashed priority — TopKPerGroup keeps
    * one bounded heap per source instead of sorting each partition. */
  def qQuotaSample(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("h", prio(col("doc_id")))
    graft.plans.TopKPerGroup(d,
        groupCols = Seq("source"), orderCols = Seq("h", "doc_id"), k = Quota)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("n_chars")).as("sum_chars_kept"),
        min(col("doc_id")).as("first_doc"))
      .orderBy("source")
  }

  /** Pack each source's docs (id order) into BinBudget-token bins: bin id
    * = tokens-before-this-doc DIV budget. A doc straddling a boundary
    * goes to the bin its first token falls in — the standard cumsum
    * packing used for pretraining sequence assembly. */
  def qTokenPacking(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        size(split(trim(col("text")), graft.operators.text.TextQueries.WsRe)).cast("long").as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("bin", expr("(cum - n_tok) div " + BinBudget))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("bin_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_bins"),
        max(col("bin_tokens")).as("max_bin_tokens"),
        sum(col("bin_tokens")).as("total_tokens"))
      .orderBy("source")
  }

  /** Winnowing shingle length for decontamination: any train/eval pair
    * sharing a character span of ≥ DecontamK + DecontamW − 1 (47 chars,
    * roughly a 7–8 word phrase) shares a fingerprint — the standard
    * n-gram-overlap decontamination bar. */
  val DecontamK = 40
  val DecontamW = 8

  /** Train/eval contamination audit — the decontamination step every
    * training pipeline needs: does any training document share a long
    * n-gram with the held-out (hash-split test) set? Winnowed rolling-hash
    * fingerprints ([[graft.functions.RollingFingerprint]]) make the check
    * a fingerprint equi-join, not a doc×doc comparison: explode each
    * side's fingerprints, distinct the eval side, LEFT SEMI join train
    * fingerprints against it — at 100 TB both sides shuffle on the
    * fingerprint value and the join never materializes cross-doc pairs.
    * One summary row: train/eval sizes, contaminated-train count, rate. */
  def qDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val d = withSplit(Tables.documents(spark, dir))
    val fps = d.select(col("doc_id"), col("split"),
      explode(graft.functions.RollingFingerprint(
        col("text"), k = DecontamK, w = DecontamW)).as("fp"))
    val evalFps = fps.filter(col("split") === "test").select(col("fp")).distinct()
    val contaminated = fps.filter(col("split") === "train")
      .join(evalFps, Seq("fp"), "left_semi")
      .select(col("doc_id")).distinct()
      .agg(count(lit(1)).as("n_contaminated"))
    val counts = d.agg(
      sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
      sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_eval"))
    // 1-row × 1-row — bounded by construction
    counts.crossJoin(contaminated)
      .select(col("n_train"), col("n_eval"), col("n_contaminated"),
        round(col("n_contaminated") / col("n_train"), 6).as("contamination_rate"))
  }

  /** Mixture weights (numerator over [[SplitMod]]): the dominant language
    * is halved, the rest kept — the domain-reweighting step that stops one
    * crawl/language from swamping the mixture. Exact-integer: a doc
    * survives iff prio(id) < weight·M, with weight·M precomputed as a
    * BIGINT literal. */
  val MixtureKeepEn: Long = SplitMod / 2 // 50%
  val MixtureKeepOther: Long = SplitMod  // 100%

  /** Deterministic importance-weighted downsampling by language: same
    * hash-threshold trick as the split (stable, engine-exact, no RNG
    * state), with per-group acceptance thresholds. Pure map + one
    * groupBy — 100 TB-clean. */
  def qMixtureSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("keep",
        prio(col("doc_id")) <
          when(col("lang") === "en", lit(MixtureKeepEn))
            .otherwise(lit(MixtureKeepOther)))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_before"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_after"),
        sum(when(col("keep"), col("n_chars")).otherwise(0L)).as("chars_after"))
      .orderBy("lang")

  /** Temperature-scaled domain mixture — the GPT-3/PaLM data-mixing step
    * (sampling probability over domains ∝ n^α, α = 1/T; T = 2 upweights
    * small domains relative to proportional sampling): per-source weight
    * w = √n̅ (IEEE sqrt is correctly rounded — engine-exact), normalized
    * over domains, converted to a deterministic hash-acceptance
    * threshold on the split's exact-integer priority. Determinism chain:
    * weights are ROUNDED then DECIMAL-summed (order-free normalizer),
    * every subsequent double op is computed identically on both engines,
    * so even floor() at the threshold boundary cannot diverge. Shape:
    * one tiny groupBy(source), a one-row normalizer crossJoin, a
    * dim-sized broadcast back onto the corpus — pure map after that. */
  def qTemperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val cnt = d.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
      .withColumn("w", round(sqrt(col("n_s").cast("double")), 6))
    val z = cnt.agg(
      sum(col("w").cast("decimal(25,6)")).cast("double").as("zz"),
      sum(col("n_s")).as("n"))
    // output budget = N/2 docs; domain s receives share frac_s of it, so
    // its acceptance RATE is (N/2)·frac/n_s capped at 1 — final
    // composition ∝ w_s (rate = frac would give composition ∝ w_s·n_s)
    val rates = cnt.crossJoin(broadcast(z))
      .withColumn("frac", col("w") / col("zz"))
      .withColumn("rate", least(lit(1.0),
        col("n").cast("double") / lit(2.0) * col("frac") / col("n_s").cast("double")))
      .withColumn("t", floor(col("rate") * lit(SplitMod.toDouble)).cast("long"))
      .select(col("source"), col("w"), col("frac"), col("t"))
    d.join(broadcast(rates), Seq("source"))
      .withColumn("keep", prio(col("doc_id")) < col("t"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_before"),
        min(col("w")).as("w"),
        round(min(col("frac")), 6).as("frac"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_after"),
        sum(when(col("keep"), col("n_chars")).otherwise(0L)).as("chars_after"))
      .orderBy("source")
  }

  /** DSIR feature-space size (hashed n-gram buckets). Tiny here so the
    * sf-scale corpus populates every bucket; production would use 10^4. */
  val DsirBuckets = 64
  private val DsirHashMod = 1000003L
  private val dsirCache = new graft.RollingCache

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): features are hashed
    * word uni+bigrams; log w(d) = Σ_f cnt_f(d)·(ln p_target(f) − ln
    * p_raw(f)) with add-1 smoothing, target = the English slice of the
    * corpus. Docs ranked by weight = the resampling order.
    *
    * Scale shape: feature expansion and bucket hashing are MAP-SIDE
    * (array transform + char-Horner fold, codegen'd — no UDF); BOTH
    * distributions AND their totals come from ONE partial-agg shuffle
    * collapsing to ≤B=64 rows (r16 — previously a totals agg plus two
    * separate groupBys made three passes); scoring joins the B-row ratio
    * table BROADCAST, so the whole pipeline is two scans + one bounded
    * shuffle regardless of corpus size.
    *
    * Oracle determinism: the bucket hash is exact integer arithmetic both
    * engines replay char-for-char; per-feature log-ratios are round(ln,6)
    * → DECIMAL(9,6), summed exactly (order-free), per the QueryModule
    * discipline. Per-bucket counts are exact longs; totals are their sums
    * (DsirEquivalence spec proves the fused shape row-identical to the
    * three-pass formulation).
    */
  def qDsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val B = DsirBuckets
    val ws = filter(split(trim(lower(col("text"))),
      graft.operators.text.TextQueries.WsRe), w => length(w) > 0)
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), ws.as("ws"))
    val uni = base.select(col("doc_id"), col("lang"), explode(col("ws")).as("f"))
    val bi = base.filter(size(col("ws")) > 1)
      .select(col("doc_id"), col("lang"), explode(expr(
        "transform(sequence(1, size(ws) - 1), i -> concat(ws[i-1], ' ', ws[i]))")).as("f"))
    val feats = dsirCache.persist(uni.unionByName(bi)
      // codegen'd code-point Horner loop — semantically identical to the
      // SQL HOF `aggregate(sequence(1, length(f)), ...)` the oracle
      // replays (HornerBucketSpec asserts equality), ~O(len) allocations
      // cheaper per feature
      .withColumn("bkt", graft.functions.HornerBucket(col("f"), DsirHashMod, B)))
    // r16: ONE partial-agg pass yields both distributions AND the totals —
    // the previous shape scanned the (cached) feature frame three times
    // before the scoring join (totals agg, raw groupBy, filtered tgt
    // groupBy); cr/ct per bucket carry the same exact longs
    // (count(when(en)) ≡ filter(en).count()), and the totals are their
    // sums over the ≤B collected rows (driver-bounded by construction).
    // Guide §1.2: remove unnecessary passes before tuning anything else.
    val bktCounts = feats.groupBy("bkt").agg(
      count(lit(1)).as("cr"),
      count(when(col("lang") === "en", 1)).as("ct")).collect()
    val (tr, tt) = bktCounts.foldLeft((0L, 0L)) { case ((a, t), r) =>
      (a + r.getLong(1), t + r.getLong(2)) }
    val counts = spark.createDataFrame(
      spark.sparkContext.parallelize(bktCounts.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("bkt",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cr",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ct",
          org.apache.spark.sql.types.LongType))))
    val lrs = spark.range(B).select(col("id").as("bkt"))
      .join(counts, Seq("bkt"), "left")
      .select(col("bkt"),
        round(log((coalesce(col("ct"), lit(0L)) + 1).cast("double") * lit(tr + B)
          / ((coalesce(col("cr"), lit(0L)) + 1) * lit(tt + B))), 6)
          .cast("decimal(9,6)").as("lr6"))
    feats.join(broadcast(lrs), Seq("bkt"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_feats"),
        round(sum(col("lr6")).cast("double"), 6).as("logw"))
      .orderBy(col("logw").desc, col("doc_id"))
      .limit(25)
  }

  /** Split label from a deterministic key hash (80/10/10). */
  private def splitOf(key: Column): Column = {
    val b = prio(key) % 100
    when(b < 80, "train").when(b < 90, "val").otherwise("test")
  }

  /** LEAK-SAFE train/val/test split — the self-leakage guard q_sample_split
    * lacks: hashing DOC ids scatters near-duplicates across splits, so a
    * test document's near-copy can sit in train (the leakage
    * q_decontaminate guards against external eval sets, replayed here for
    * the corpus's own splits). The fix: split by the near-dup GROUP's
    * canonical id (verified MinHash pairs → connected components; unpaired
    * docs are their own singleton group), so a whole duplicate cluster
    * lands in one split by construction. Output: per-split doc/group
    * accounting plus two corpus-level audits — group_leaks (groups
    * spanning >1 split under the group-keyed hash: structurally 0, the
    * guarantee made visible) and naive_leaks (what the doc-keyed hash
    * WOULD leak: >0 on the planted corpus — the reason this operator
    * exists). Same planted-dup corpus and CC machinery as q_dedup_groups —
    * literally: the verified-pairs → connected-components prefix is the
    * per-dir materialization shared via [[MinHashLsh.plantedComponents]],
    * so this query adds only the group-keyed hashing and the audit aggs
    * (the 100 TB shape: dedup groups are materialized once, every
    * consumer reads them). */
  def qLeakSafeSplit(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.dedup.MinHashLsh
    val docs = MinHashLsh.withPlantedDups(Tables.documents(spark, dir))
      .select(col("doc_id"))
    val cc = MinHashLsh.plantedComponents(spark, dir)
      .select(col("id").as("doc_id"), col("component"))
    val assigned = docs.join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("gid"))
      .select(col("doc_id"), col("gid"),
        splitOf(col("gid")).as("split"), splitOf(col("doc_id")).as("naive_split"))
    val per = assigned.groupBy("split")
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("gid")).as("n_groups"))
    val leaks = assigned.groupBy("gid")
      .agg(countDistinct(col("split")).as("ns"),
        countDistinct(col("naive_split")).as("nn"))
      .agg(sum(when(col("ns") > 1, 1L).otherwise(0L)).as("group_leaks"),
        sum(when(col("nn") > 1, 1L).otherwise(0L)).as("naive_leaks"))
    per.crossJoin(broadcast(leaks)).orderBy("split")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dsir_weights" -> (qDsirWeights _),
    "q_sample_split" -> (qSampleSplit _),
    "q_leak_safe_split" -> (qLeakSafeSplit _),
    "q_temperature_mix" -> (qTemperatureMix _),
    "q_quota_sample" -> (qQuotaSample _),
    "q_token_packing" -> (qTokenPacking _),
    "q_decontaminate" -> (qDecontaminate _),
    "q_mixture_sample" -> (qMixtureSample _))

  override def oracles: Map[String, String] = Map(
    // group-keyed split replayed on the dedup pipeline's comp CTE; the
    // split/prio arithmetic is the exact-integer q_sample_split form
    "q_leak_safe_split" -> {
      def splitSql(x: String) =
        s"CASE WHEN ${prioSql(x)} % 100 < 80 THEN 'train' " +
          s"WHEN ${prioSql(x)} % 100 < 90 THEN 'val' ELSE 'test' END"
      // components via unrolled pointer-jumping label propagation
      // (DbscanQueries.ccByLabelProp) — the recursive `reach` closure is
      // Σ|group|² rows on a duplicate-dense corpus (r9 sf1 timeout)
      s"""WITH ${graft.operators.dedup.MinHashLsh.pipelineCtes},
         |edges AS MATERIALIZED (
         |  SELECT d1 AS i, d2 AS j FROM verified
         |  UNION SELECT d2, d1 FROM verified),
         |enodes AS (SELECT DISTINCT i FROM edges),
         |${graft.operators.clustering.DbscanQueries.ccByLabelProp("enodes", "edges", "ls", "comp")},
         |assigned AS (
         |  SELECT d.doc_id, coalesce(c.cl, d.doc_id) AS gid,
         |    ${splitSql("coalesce(c.cl, d.doc_id)")} AS split,
         |    ${splitSql("d.doc_id")} AS naive_split
         |  FROM (SELECT doc_id FROM corpus) d
         |  LEFT JOIN comp c ON d.doc_id = c.i),
         |per AS (
         |  SELECT split, count(*) AS n_docs, count(DISTINCT gid) AS n_groups
         |  FROM assigned GROUP BY split),
         |lk AS (
         |  SELECT
         |    sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS group_leaks,
         |    sum(CASE WHEN nn > 1 THEN 1 ELSE 0 END) AS naive_leaks
         |  FROM (SELECT gid, count(DISTINCT split) AS ns,
         |          count(DISTINCT naive_split) AS nn
         |        FROM assigned GROUP BY gid))
         |SELECT p.split, CAST(p.n_docs AS BIGINT) AS n_docs,
         |  CAST(p.n_groups AS BIGINT) AS n_groups,
         |  CAST(l.group_leaks AS BIGINT) AS group_leaks,
         |  CAST(l.naive_leaks AS BIGINT) AS naive_leaks
         |FROM per p CROSS JOIN lk l ORDER BY p.split""".stripMargin
    },
    "q_dsir_weights" ->
      s"""WITH docs2 AS (
         |  SELECT doc_id, lang, list_filter(
         |    string_split_regex(trim(lower(text)), '[ \\t\\n\\r\\f\\x0B]+'), w -> len(w) > 0) AS ws
         |  FROM documents),
         |uni AS (SELECT doc_id, lang, unnest(ws) AS f FROM docs2),
         |bi AS (
         |  SELECT doc_id, lang, ws[CAST(i AS INT)] || ' ' || ws[CAST(i AS INT) + 1] AS f
         |  FROM (SELECT doc_id, lang, ws, unnest(generate_series(1, len(ws) - 1)) AS i
         |        FROM docs2 WHERE len(ws) > 1)),
         |feats AS (
         |  SELECT doc_id, lang,
         |    list_reduce(list_transform(range(1, len(f) + 1),
         |      i -> CAST(ord(f[i]) AS BIGINT)), (a, b) -> (a * 31 + b) % $DsirHashMod) % $DsirBuckets AS bkt
         |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
         |tots AS (SELECT count(*) AS tr,
         |                count(*) FILTER (lang = 'en') AS tt FROM feats),
         |raw AS (SELECT bkt, count(*) AS cr FROM feats GROUP BY bkt),
         |tgt AS (SELECT bkt, count(*) AS ct FROM feats WHERE lang = 'en' GROUP BY bkt),
         |lrs AS (
         |  SELECT b.bkt,
         |    CAST(round(ln(CAST(COALESCE(t.ct, 0) + 1 AS DOUBLE) * (s.tr + $DsirBuckets)
         |      / ((COALESCE(r.cr, 0) + 1) * (s.tt + $DsirBuckets))), 6) AS DECIMAL(9,6)) AS lr6
         |  FROM (SELECT unnest(range(0, $DsirBuckets)) AS bkt) b
         |  LEFT JOIN raw r USING (bkt) LEFT JOIN tgt t USING (bkt) CROSS JOIN tots s)
         |SELECT f.doc_id, f.lang, CAST(count(*) AS BIGINT) AS n_feats,
         |  round(CAST(sum(l.lr6) AS DOUBLE), 6) AS logw
         |FROM feats f JOIN lrs l USING (bkt)
         |GROUP BY f.doc_id, f.lang
         |ORDER BY logw DESC, f.doc_id LIMIT 25""".stripMargin,
    "q_sample_split" ->
      s"""WITH b AS (
         |  SELECT doc_id, n_chars, ${prioSql("doc_id")} % 100 AS bucket
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, n_chars,
         |    CASE WHEN bucket < 80 THEN 'train'
         |         WHEN bucket < 90 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM b)
         |SELECT split, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |FROM s GROUP BY split ORDER BY split""".stripMargin,
    "q_quota_sample" ->
      s"""WITH r AS (
         |  SELECT doc_id, source, n_chars,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY ${prioSql("doc_id")}, doc_id) AS rn
         |  FROM documents)
         |SELECT source, count(*) AS n_kept,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars_kept,
         |  min(doc_id) AS first_doc
         |FROM r WHERE rn <= $Quota
         |GROUP BY source ORDER BY source""".stripMargin,
    "q_temperature_mix" ->
      s"""WITH cnt AS (
         |  SELECT source, count(*) AS n_s,
         |    round(sqrt(CAST(count(*) AS DOUBLE)), 6) AS w
         |  FROM documents GROUP BY source),
         |z AS (SELECT CAST(sum(CAST(w AS DECIMAL(25,6))) AS DOUBLE) AS zz,
         |             CAST(sum(n_s) AS BIGINT) AS n FROM cnt),
         |fr AS (SELECT source, n_s, w, n, w / zz AS frac FROM cnt CROSS JOIN z),
         |rates AS (
         |  SELECT source, w, frac,
         |    CAST(floor(least(1.0, CAST(n AS DOUBLE) / 2.0 * frac / CAST(n_s AS DOUBLE))
         |               * $SplitMod.0) AS BIGINT) AS t
         |  FROM fr),
         |k AS (
         |  SELECT d.source, d.n_chars, r.w, r.frac,
         |    ${prioSql("d.doc_id")} < r.t AS keep
         |  FROM documents d JOIN rates r USING (source))
         |SELECT source, count(*) AS n_before, min(w) AS w,
         |  round(min(frac), 6) AS frac,
         |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_after,
         |  CAST(sum(CASE WHEN keep THEN n_chars ELSE 0 END) AS BIGINT) AS chars_after
         |FROM k GROUP BY source ORDER BY source""".stripMargin,
    "q_mixture_sample" ->
      s"""WITH k AS (
         |  SELECT lang, n_chars,
         |    ${prioSql("doc_id")} <
         |      CASE WHEN lang = 'en' THEN $MixtureKeepEn
         |           ELSE $MixtureKeepOther END AS keep
         |  FROM documents)
         |SELECT lang, count(*) AS n_before,
         |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_after,
         |  CAST(sum(CASE WHEN keep THEN n_chars ELSE 0 END) AS BIGINT) AS chars_after
         |FROM k GROUP BY lang ORDER BY lang""".stripMargin,
    // the winnow CTE replays RollingFingerprint(k=40, w=8) exactly as the
    // q_fingerprint_winnow oracle does for (8, 4): direct polynomial fold
    // per position (algebraically equal to the rolling update), list_min
    // per window (winnowing keeps only VALUES)
    "q_decontaminate" ->
      s"""WITH g AS (
         |  SELECT doc_id,
         |    CASE WHEN length(text) < $DecontamK THEN []
         |    ELSE list_transform(range(1, length(text) - $DecontamK + 2),
         |      i -> list_reduce(
         |        list_prepend(CAST(0 AS BIGINT),
         |          list_transform(range(0, $DecontamK),
         |            j -> CAST(ord(substr(text, CAST(i + j AS INT), 1)) AS BIGINT))),
         |        (h, c) -> (h * 257 + c) % 1000000007))
         |    END AS hs
         |  FROM documents),
         |sel AS (
         |  SELECT doc_id,
         |    CASE WHEN len(hs) = 0 THEN []
         |         WHEN len(hs) <= $DecontamW THEN [list_min(hs)]
         |         ELSE list_transform(range(1, len(hs) - $DecontamW + 2),
         |                st -> list_min(list_slice(hs, st, st + $DecontamW - 1)))
         |    END AS fps
         |  FROM g),
         |spl AS (
         |  SELECT doc_id,
         |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM (SELECT doc_id, ${prioSql("doc_id")} % 100 AS b FROM documents)),
         |fp AS (
         |  SELECT s.doc_id, sp.split, unnest(s.fps) AS fp
         |  FROM sel s JOIN spl sp USING (doc_id)),
         |ev AS (SELECT DISTINCT fp FROM fp WHERE split = 'test'),
         |contam AS (
         |  SELECT count(DISTINCT f.doc_id) AS n_contaminated
         |  FROM fp f JOIN ev USING (fp) WHERE f.split = 'train'),
         |c AS (
         |  SELECT
         |    CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
         |    CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_eval
         |  FROM spl)
         |SELECT c.n_train, c.n_eval,
         |  CAST(contam.n_contaminated AS BIGINT) AS n_contaminated,
         |  round(CAST(contam.n_contaminated AS DOUBLE) / c.n_train, 6)
         |    AS contamination_rate
         |FROM c, contam""".stripMargin,
    "q_token_packing" ->
      s"""WITH t AS (
         |  SELECT source, doc_id,
         |    CAST(len(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) AS BIGINT) AS n_tok
         |  FROM documents),
         |c AS (
         |  SELECT source, doc_id, n_tok,
         |    CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM t),
         |bins AS (
         |  SELECT source, (cum - n_tok) // $BinBudget AS bin,
         |    count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS bin_tokens
         |  FROM c GROUP BY source, (cum - n_tok) // $BinBudget)
         |SELECT source, count(*) AS n_bins,
         |  max(bin_tokens) AS max_bin_tokens,
         |  CAST(sum(bin_tokens) AS BIGINT) AS total_tokens
         |FROM bins GROUP BY source ORDER BY source""".stripMargin)
}
