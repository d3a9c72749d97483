package graft.operators.clustering

import graft.{QueryModule, Tables}
import graft.functions.VectorOps._
import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.feature.PCA
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative clustering on MLlib (SURVEY §2) — the distributed re-expression
  * of cluster_creator.py `execute_clustering` (sklearn KMeans, k=37,
  * n_init restarts, max_iter) and the notebook k-sweeps.
  *
  * MLlib KMeans is the 100 TB-correct implementation: per-iteration one
  * broadcast of k centroids + one treeAggregate of per-centroid partial
  * sums; nothing driver-side grows with n. Restarts (`n_init`) map to
  * distinct seeds. Results are seed-deterministic but engine-specific →
  * rows-only driver checks; invariants covered in ScalaTest.
  */
object KMeansOp extends QueryModule {

  /** Features for the iterative fits. Coalesced to a handful of partitions:
    * each Lloyd iteration is a job over these partitions, and at sample
    * scale (thousands of rows) 32-way task launch overhead dominates the
    * actual math. A production-sized input keeps its natural partitioning
    * upstream of this operator. */
  def features(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .withColumn("features", array_to_vector(vec_normalize(col("embedding"))))
      .coalesce(4)

  /** Raw float features for the shared-scan operators ([[MultiKMeans]]). */
  def rawFeatures(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(vec_normalize(col("embedding")).cast("array<float>").as("v"))
      .coalesce(4)

  /** Fits are memoized per (dir, k, seed, maxIter) — the "bulk index
    * build" is reused by every query that consumes the same model
    * (sizes/inertia share the k=10 fit). */
  private val fitted =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Long, Int), KMeansModel]

  def fit(spark: SparkSession, dir: String, k: Int, seed: Long = 42L,
          maxIter: Int = 25): KMeansModel =
    fitted.getOrElseUpdate((dir, k, seed, maxIter),
      new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
        .setFeaturesCol("features").setPredictionCol("cluster")
        .fit(features(spark, dir)))

  /** Best-of-n restarts by training cost — reference N_ITER_KMEANS /
    * n_init (cluster_creator.py:18). */
  def fitBestOf(spark: SparkSession, dir: String, k: Int, nInit: Int): KMeansModel = {
    val df = features(spark, dir).cache()
    try (0 until nInit)
      .map(s => new KMeans().setK(k).setSeed(42L + s).setMaxIter(25)
        .setFeaturesCol("features").setPredictionCol("cluster").fit(df))
      .minBy(_.summary.trainingCost)
    finally df.unpersist()
  }

  /** (cluster, a2, b2) of every row against FIXED centroid literals:
    * fold-d2 per centroid (the ksweep kernel — 0.0-init ascending, ≡
    * DuckDB's list_inner_product of the diff list), argmin via
    * array_position (first match = lowest cid both engines), second-min
    * for the simplified silhouette. The literal-replay bridge that lets
    * the seeded MLlib/MultiKMeans fits go hash-green: the FIT stays
    * engine-specific, the evaluation of its centroids does not. */
  private def assignStats(e: DataFrame, vecCol: Column,
                          cen: Array[Array[Double]]): DataFrame = {
    val d2s = graft.functions.CentroidDists(vecCol,
      cen.map(_.toIndexedSeq).toIndexedSeq)
    e.select(d2s.as("d2s"))
      .select(
        (expr("array_position(d2s, array_min(d2s))") - 1).cast("long").as("cluster"),
        array_min(col("d2s")).as("a2"),
        element_at(sort_array(col("d2s")), 2).as("b2"))
  }

  /** One-row (inertia, silhouette) under the micro-int / decimal
    * disciplines: inertia = Σ round(a2·1e6) micro-units; silhouette =
    * mean of the simplified per-row s = (b−a)/max(a,b). */
  private def inertiaSil(asg: DataFrame): DataFrame = {
    val a = sqrt(col("a2")); val b = sqrt(col("b2"))
    asg.select(col("a2"),
        when(greatest(a, b) > 0, round((b - a) / greatest(a, b), 6))
          .otherwise(0.0).as("s"))
      .agg(
        (sum(round(col("a2") * lit(1000000.0)).cast("long")).cast("double")
          / lit(1000000.0)).as("inertia"),
        round(sum(col("s").cast("decimal(25,6)")).cast("double")
          / count(lit(1)), 4).as("silhouette"))
  }

  /** The k=10 MLlib centroids as plain arrays (fit memoized per dir). */
  private def mllibCentroids(spark: SparkSession, dir: String): Array[Array[Double]] =
    fit(spark, dir, k = 10).clusterCenters.map(_.toArray)

  /** Cluster sizes (rank by size — cluster ids are not portable). The
    * assignment runs OUR fold-argmin kernel over the fitted centroids as
    * literals (not summary.predictions), which is what makes the query
    * replayable in SQL — hash-green since r5. */
  def qKmeansSizes(spark: SparkSession, dir: String): DataFrame = {
    val cen = mllibCentroids(spark, dir)
    assignStats(Tables.embeddings(spark, dir), vec_normalize(col("embedding")), cen)
      .groupBy(col("cluster")).agg(count(lit(1)).as("size"))
      .select(row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("size").desc, col("cluster"))).as("size_rank"), col("size"))
      .orderBy("size_rank")
  }

  /** Inertia (WSSSE) + simplified silhouette for the k=10 fit — reference
    * tracks kmeans.inertia_. Both metrics are evaluated at the fitted
    * centroids through [[assignStats]] under the replayable disciplines
    * (micro-int inertia sum, decimal silhouette mean) — hash-green since
    * r5; MLlib's own trainingCost stays a spec-level cross-check. */
  def qKmeansInertia(spark: SparkSession, dir: String): DataFrame = {
    val cen = mllibCentroids(spark, dir)
    inertiaSil(assignStats(Tables.embeddings(spark, dir),
        vec_normalize(col("embedding")), cen))
      .select(lit(10).as("k"), col("inertia"), col("silhouette"))
  }

  // sweep fits memoized per dir: the query and its dynamic oracle embed
  // the same per-k centroid literals, and the multi-model fit is the
  // expensive part
  private val sweepCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(Int, Array[Array[Double]])]]()

  private def sweepModels(spark: SparkSession, dir: String): Seq[(Int, Array[Array[Double]])] =
    sweepCache.computeIfAbsent(dir, _ =>
      MultiKMeans.sweep(rawFeatures(spark, dir), "v", 2 to 8, seed = 42L, maxIter = 10)
        .map(m => (m.k, m.centroids)))

  /** k-sweep: (k, inertia, silhouette) — silhouettes.ipynb:146-186. All k
    * fitted concurrently by [[MultiKMeans]], one shared scan per Lloyd
    * iteration instead of a serial fit + evaluate per k; each fitted
    * model's metrics are then re-evaluated at its centroids through
    * [[assignStats]]/[[inertiaSil]] (replayable disciplines, one cached
    * scan feeding every arm) — hash-green since r5, closing the last
    * deterministic rows-only query. */
  def qKsweep(spark: SparkSession, dir: String): DataFrame = {
    val e = nprobeStyleCache.persist(Tables.embeddings(spark, dir))
    val fl = vec_normalize(col("embedding")).cast("array<float>").cast("array<double>")
    sweepModels(spark, dir).map { case (k, cen) =>
      inertiaSil(assignStats(e, fl, cen))
        .select(lit(k).as("k"), col("inertia"), col("silhouette"))
    }.reduce(_.unionByName(_)).orderBy("k")
  }

  private val nprobeStyleCache = new graft.RollingCache

  // MLlib PCA basis memoized per dir: the FIT (distributed Gram +
  // engine-specific eigensolver) is not replayable, but its eigenvector
  // columns are constants the query and oracle embed bit-identically —
  // the q_mahalanobis/q_pca_proj literal-replay argument
  private val pcaCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Double]]]()

  private def pcaBasis(spark: SparkSession, dir: String): Array[Array[Double]] =
    pcaCache.computeIfAbsent(dir, _ => {
      val model = new PCA().setK(3).setInputCol("features").setOutputCol("pc")
        .fit(features(spark, dir))
      val pc = model.pc // dim×3, column-major
      Array.tabulate(3)(j =>
        java.util.Arrays.copyOfRange(pc.values, j * pc.numRows, (j + 1) * pc.numRows))
    })

  /** PCA projection to 3 components of the normalized embeddings —
    * nuevo-kmeans-pre.ipynb:243-286 (2D/3D PCA; stands in for UMAP too,
    * SURVEY §2 "Projection"). Distributed Gram-matrix + local eigen via
    * MLlib for the BASIS; the projection itself runs through the
    * codegen'd VecDot kernel with the basis as plan constants (not
    * model.transform's BLAS gemv) so the per-row arithmetic is the
    * list_inner_product-proven fold and the whole query sits under the
    * driver hash via dynamicOracles literal replay (r5 — was rows-only). */
  def qPca(spark: SparkSession, dir: String): DataFrame = {
    val basis = pcaBasis(spark, dir)
    def lits(v: Array[Double]) = array(v.map(lit).toIndexedSeq: _*)
    val nv = vec_normalize(col("embedding"))
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        round(vec_dot(nv, lits(basis(0))), 4).as("pc1"),
        round(vec_dot(nv, lits(basis(1))), 4).as("pc2"),
        round(vec_dot(nv, lits(basis(2))), 4).as("pc3"))
      .orderBy("vec_id")
  }

  // best-of-restarts centroids memoized per dir: the query and its
  // dynamic oracle must embed bit-identical literals, and the 8-restart
  // fit is the expensive part
  private val restartsCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Double]]]()

  private def bestRestartCentroids(spark: SparkSession, dir: String): Array[Array[Double]] =
    restartsCache.computeIfAbsent(dir, _ =>
      MultiKMeans.restarts(rawFeatures(spark, dir), "v", k = 10,
        seeds = (0 until 8).map(42L + _), maxIter = 10)
        .minBy(_.inertia).centroids)

  /** Best-of-8 seeded restarts at k=10 — the reference's n_init
    * (cluster_creator.py:18), all restarts sharing one scan per Lloyd
    * iteration via [[MultiKMeans.restarts]] instead of 8 serial fits.
    * The winner's metrics are re-evaluated at its centroids through
    * [[assignStats]] (replayable disciplines) — hash-green since r5.
    * rawFeatures rounds the normalized vectors to FLOAT, so the replay
    * applies the same float round before the fold. */
  def qKmeansRestarts(spark: SparkSession, dir: String): DataFrame = {
    val cen = bestRestartCentroids(spark, dir)
    inertiaSil(assignStats(Tables.embeddings(spark, dir),
        vec_normalize(col("embedding")).cast("array<float>").cast("array<double>"), cen))
      .select(lit(8).as("n_init"), lit(10).as("k"),
        col("inertia").as("best_inertia"), col("silhouette"))
  }

  /** One deterministic Lloyd iteration from the first-K raw embeddings:
    * per (cluster, dim) the updated centroid coordinate + member count,
    * plus the inertia under the starting centroids. Unlike the seeded
    * MLlib fits this IS oracle-able — assignment is per-row sequential
    * double arithmetic — so it puts the assignPass + mean-update
    * arithmetic under the driver's DuckDB hash (full fits stay
    * rows-only; [[MultiKMeans.lloydStep]] remains the production step).
    *
    * r5 hardening (the q_covariance lesson applied BEFORE it bites): the
    * earlier version replayed lloydStep's treeAggregate double sums
    * against a DuckDB `avg(v)`/`round(sum(d2), 6)` — both sides sum raw
    * fractional doubles in their own partition/scan order, so any
    * coordinate near a .5e-6 boundary was one repartition away from a
    * hash flip. Now both the mean and the inertia follow the
    * round-then-DECIMAL(25,6)-sum discipline (order-free, engine-exact
    * quanta), computed declaratively: per-row fold d2 to every seed
    * (the q_ksweep_1step kernel), argmin via array_position (first
    * match = lowest cid, both engines), one element explode for the
    * per-(cluster, dim) means, and a seed grid LEFT JOIN so empty
    * clusters replay their seed coordinate. */
  def qKmeans1Step(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = ClusteringQueries.K
    val e = Tables.embeddings(spark, dir)
    val cen = e.filter(col("vec_id") < k).orderBy("vec_id")
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(cen.length == k, s"need $k seed vectors, got ${cen.length}")
    val pe = col("embedding").cast("array<double>")
    // assignment via the CODEGEN'd NearestCentroid kernel (its inner fold
    // is the same 0.0-init ascending squared-diff sum the oracle's
    // list_distance computes; argmin-on-dist with lowest-id ties is the
    // q_nearest_centroid-proven pairing) — the interpreted higher-order
    // fold tripled this query's time
    val asg = e
      .select(pe.as("pe"),
        graft.functions.NearestCentroid(pe,
          cen.map(_.toIndexedSeq).toIndexedSeq).as("a"))
      .select(col("pe"), col("a.centroid_id").cast("long").as("cluster"),
        (col("a.dist") * col("a.dist")).as("a2"))
    // micro-unit BIGINT sums (the covarianceExact discipline): integer
    // rounding of the same double is engine-exact, integer sums are
    // order-free, and LONG partial aggs are far cheaper than DECIMAL over
    // the n·d element explosion (the decimal variant doubled this
    // query's time). Longs hold to ~9e12 rows per (cluster, dim) group;
    // past that, swap the accumulator to decimal(38,0) as covarianceExact
    // does.
    val means = asg
      .select(col("cluster"), posexplode(col("pe")).as(Seq("i0", "v")))
      .groupBy(col("cluster"), (col("i0") + 1).cast("long").as("dim"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("v") * lit(1000000.0)).cast("long")).as("sm"))
    val inert = asg.agg(
      (sum(round(col("a2") * lit(1000000.0)).cast("long")).cast("double")
        / lit(1000000.0)).as("inertia"))
    val grid = (for { c <- 0 until k; d <- 0 until cen.head.length }
      yield (c.toLong, (d + 1).toLong, cen(c)(d))).toDF("cluster", "dim", "seed")
    grid.join(means, Seq("cluster", "dim"), "left")
      .crossJoin(broadcast(inert))
      .select(col("cluster"), col("dim"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(
          round(col("sm").cast("double") / col("n")).cast("long") / lit(1000000.0),
          round(col("seed") * lit(1000000.0)).cast("long") / lit(1000000.0))
          .as("coord"),
        col("inertia"))
      .orderBy("cluster", "dim")
  }

  /** The ORACLED slice of the k-sweep (q_ksweep itself stays rows-only —
    * full Lloyd fits are engine-specific): every k in 2..K evaluated at
    * the SAME deterministic first-K seed centroids for one assignment
    * pass, sharing one scan across all k (each point computes its K
    * seed distances once; sweep metrics are prefix minima over them).
    * Per k: inertia under the seed centroids (exact decimal sum of
    * per-row rounded min-d2 quanta) and the SIMPLIFIED silhouette
    * (centroid-based: a = dist to nearest seed, b = dist to second
    * nearest, s = (b−a)/max(a,b) — closed-form per row, unlike the
    * pairwise silhouette, so it is plain SQL). This pins the sweep
    * machinery's assignment/argmin/prefix arithmetic under the driver
    * hash the way q_kmeans_1step pins the mean update. */
  def qKsweep1Step(spark: SparkSession, dir: String): DataFrame = {
    val kMax = ClusteringQueries.K
    val e = Tables.embeddings(spark, dir)
    val cen = e.filter(col("vec_id") < kMax).orderBy("vec_id")
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(cen.length == kMax, s"need $kMax seed vectors, got ${cen.length}")
    val pe = col("embedding").cast("array<double>")
    // d2 to each seed centroid via the codegen'd CentroidDists kernel —
    // the same 0.0-init ascending fold DuckDB's list_inner_product(df, df)
    // replays (bit-identity asserted in CentroidDistsSpec), one generated
    // loop instead of k interpreted higher-order folds per row
    val d2s = graft.functions.CentroidDists(pe,
      cen.map(_.toIndexedSeq).toIndexedSeq)
    val perK = e.select(d2s.as("d2s"))
      .select(explode(expr(
        s"""transform(sequence(2, $kMax), k -> named_struct(
           |  'k', k,
           |  'a2', array_min(slice(d2s, 1, k)),
           |  'b2', element_at(sort_array(slice(d2s, 1, k)), 2)))""".stripMargin)).as("s"))
      .select(col("s.k").cast("long").as("k"), col("s.a2").as("a2"), col("s.b2").as("b2"))
    val a = sqrt(col("a2")); val b = sqrt(col("b2"))
    perK
      .select(col("k"), round(col("a2"), 6).as("qin"),
        when(greatest(a, b) > 0, round((b - a) / greatest(a, b), 6))
          .otherwise(0.0).as("s"))
      .groupBy("k")
      .agg(sum(col("qin").cast("decimal(25,6)")).as("si"),
        sum(col("s").cast("decimal(25,6)")).as("ss"),
        count(lit(1)).as("n"))
      .select(col("k"), col("si").cast("double").as("inertia"),
        round(col("ss").cast("double") / col("n"), 6).as("silhouette"))
      .orderBy("k")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_kmeans_sizes" -> (qKmeansSizes _),
    "q_kmeans_inertia" -> (qKmeansInertia _),
    "q_kmeans_restarts" -> (qKmeansRestarts _),
    "q_kmeans_1step" -> (qKmeans1Step _),
    "q_ksweep" -> (qKsweep _),
    "q_ksweep_1step" -> (qKsweep1Step _),
    "q_pca" -> (qPca _))

  /** Full iterative/eigen fits are engine-specific — no SQL oracles (driver
    * records rows-only checks; invariants live in KMeansOpSpec). The single
    * deterministic Lloyd step IS replayed: assignment = argmin of the
    * sequential squared-distance fold (list_inner_product of the diff list
    * matches the Scala loop's mul+add order bit-for-bit; ties break to the
    * lowest cluster id in both engines), update = avg per (cluster, dim),
    * inertia = sum of best distances. */
  /** The AsgCte-green normalization form (double path). */
  private val NormSql =
    """list_transform(CAST(embedding AS DOUBLE[]),
      |    x -> x * (1.0 / sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))))""".stripMargin

  /** The shared normalized-input CTE (`nv`). */
  private def nvCte(normSql: String): String =
    s"nv AS (SELECT vec_id, $normSql AS v FROM embeddings)"

  /** [[assignStats]]' SQL twin against centroid LITERALS: hoisted lits
    * CTE (literals inside DuckDB lambdas re-materialize per call), cid
    * rows via unnest-ordinality, fold-d2 = list_inner_product of the diff
    * list, argmin/second-min as list_position/list_sort over the
    * cid-ordered distance list. Consumes the shared `nv` CTE; `sfx`
    * disambiguates CTE names when several centroid sets share one WITH
    * (the k-sweep). */
  private def assignCtes(cen: Array[Array[Double]], sfx: String = ""): String = {
    val cenL = cen.map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")
    s"""lits$sfx AS (SELECT $cenL AS cen),
       |cenr$sfx AS (SELECT CAST(i - 1 AS BIGINT) AS cid, l.cen[CAST(i AS INT)] AS ce
       |  FROM lits$sfx l CROSS JOIN (SELECT unnest(generate_series(1, ${cen.length})) AS i)),
       |dst$sfx AS (
       |  SELECT n.vec_id, c.cid, list_inner_product(
       |      list_transform(generate_series(1, len(n.v)), i -> n.v[i] - c.ce[i]),
       |      list_transform(generate_series(1, len(n.v)), i -> n.v[i] - c.ce[i])) AS d2
       |  FROM nv n CROSS JOIN cenr$sfx c),
       |darr$sfx AS (SELECT vec_id, list(d2 ORDER BY cid) AS ds FROM dst$sfx GROUP BY vec_id),
       |asg$sfx AS (SELECT vec_id, list_position(ds, list_min(ds)) - 1 AS cluster,
       |  list_min(ds) AS a2, list_sort(ds)[2] AS b2 FROM darr$sfx)""".stripMargin
  }

  /** [[inertiaSil]]'s SQL twin (micro-int inertia, decimal sil mean). */
  private val InertiaSilSql =
    """CAST(sum(CAST(round(a2 * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS inertia,
      |  round(CAST(sum(CAST(CASE WHEN greatest(sqrt(a2), sqrt(b2)) > 0
      |      THEN round((sqrt(b2) - sqrt(a2)) / greatest(sqrt(a2), sqrt(b2)), 6)
      |      ELSE 0.0 END AS DECIMAL(25,6))) AS DOUBLE) / count(*), 4) AS silhouette""".stripMargin

  /** Replays the memoized fitted constants (PCA basis / MLlib k=10
    * centroids / best-restart centroids) as literals — the fits stay
    * engine-specific, the evaluation arithmetic does not. */
  override def dynamicOracles(spark: SparkSession, dir: String): Map[String, String] = {
    val basis = pcaBasis(spark, dir)
    def l(v: Array[Double]) = v.mkString("[", ", ", "]")
    val floatNorm =
      s"list_transform($NormSql, x -> CAST(CAST(x AS REAL) AS DOUBLE))"
    Map(
      "q_pca" ->
        s"""WITH nv AS (SELECT vec_id, $NormSql AS v
           |  FROM embeddings)
           |SELECT vec_id,
           |  round(list_inner_product(v, ${l(basis(0))}), 4) AS pc1,
           |  round(list_inner_product(v, ${l(basis(1))}), 4) AS pc2,
           |  round(list_inner_product(v, ${l(basis(2))}), 4) AS pc3
           |FROM nv ORDER BY vec_id""".stripMargin,
      "q_kmeans_sizes" ->
        s"""WITH ${nvCte(NormSql)},
           |${assignCtes(mllibCentroids(spark, dir))},
           |sizes AS (SELECT cluster, count(*) AS size FROM asg GROUP BY cluster)
           |SELECT row_number() OVER (ORDER BY size DESC, cluster) AS size_rank,
           |  CAST(size AS BIGINT) AS size
           |FROM sizes ORDER BY size_rank""".stripMargin,
      "q_kmeans_inertia" ->
        s"""WITH ${nvCte(NormSql)},
           |${assignCtes(mllibCentroids(spark, dir))}
           |SELECT 10 AS k, $InertiaSilSql
           |FROM asg""".stripMargin,
      "q_kmeans_restarts" ->
        s"""WITH ${nvCte(floatNorm)},
           |${assignCtes(bestRestartCentroids(spark, dir))},
           |m AS (SELECT $InertiaSilSql FROM asg)
           |SELECT 8 AS n_init, 10 AS k, inertia AS best_inertia, silhouette
           |FROM m""".stripMargin,
      "q_ksweep" -> {
        val arms = sweepModels(spark, dir)
        val ctes = arms.map { case (k, cen) => assignCtes(cen, s"_$k") }.mkString(",\n")
        val selects = arms.map { case (k, _) =>
          s"SELECT $k AS k, $InertiaSilSql FROM asg_$k"
        }.mkString("\nUNION ALL\n")
        s"""WITH ${nvCte(floatNorm)},
           |$ctes
           |SELECT * FROM (
           |$selects
           |) ORDER BY k""".stripMargin
      })
  }

  override def oracles: Map[String, String] = Map(
    "q_kmeans_1step" ->
      // K interpolated from the single source of truth; the seed grid
      // LEFT JOINs the per-cluster means so an empty cluster replays the
      // Scala side's (n=0, seed coordinate) rows; means and inertia are
      // round-then-DECIMAL(25,6) sums (order-free, engine-exact), never
      // avg/sum of raw doubles
      s"""WITH cen AS (
        |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
        |  FROM embeddings WHERE vec_id < ${ClusteringQueries.K}),
        |pts AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS pe FROM embeddings),
        |dst AS (
        |  SELECT p.vec_id, c.cid, p.pe, list_distance(p.pe, c.ce) AS dist
        |  FROM pts p CROSS JOIN cen c),
        |asg AS (
        |  SELECT vec_id, cid AS cluster, dist * dist AS a2, pe FROM (
        |    SELECT vec_id, cid, dist, pe,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |    FROM dst) WHERE rn = 1),
        |el AS (
        |  SELECT cluster, generate_subscripts(pe, 1) AS dim, unnest(pe) AS v FROM asg),
        |means AS (
        |  SELECT cluster, dim, count(*) AS n,
        |    sum(CAST(round(v * 1000000.0) AS BIGINT)) AS sm
        |  FROM el GROUP BY cluster, dim),
        |dims AS (
        |  SELECT unnest(generate_series(1, (SELECT len(ce) FROM cen LIMIT 1))) AS dim),
        |grid AS (
        |  SELECT c.cid AS cluster, d.dim, c.ce[CAST(d.dim AS INT)] AS seed
        |  FROM cen c CROSS JOIN dims d),
        |inert AS (
        |  SELECT CAST(sum(CAST(round(a2 * 1000000.0) AS BIGINT)) AS DOUBLE)
        |    / 1000000.0 AS inertia FROM asg)
        |SELECT CAST(g.cluster AS BIGINT) AS cluster, CAST(g.dim AS BIGINT) AS dim,
        |  CAST(COALESCE(m.n, 0) AS BIGINT) AS n,
        |  COALESCE(CAST(round(CAST(m.sm AS DOUBLE) / m.n) AS BIGINT) / 1000000.0,
        |           CAST(round(g.seed * 1000000.0) AS BIGINT) / 1000000.0) AS coord,
        |  i.inertia AS inertia
        |FROM grid g LEFT JOIN means m ON m.cluster = g.cluster AND m.dim = g.dim
        |CROSS JOIN inert i
        |ORDER BY cluster, dim""".stripMargin,
    // the sweep twin: per-point distances to ALL K seed centroids once,
    // per-k metrics as prefix minima; inertia/silhouette under the
    // round-then-DECIMAL(25,6)-sum discipline (engine-exact sums)
    "q_ksweep_1step" ->
      s"""WITH cen AS (
        |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
        |  FROM embeddings WHERE vec_id < ${ClusteringQueries.K}),
        |pts AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS pe FROM embeddings),
        |d2s AS (
        |  SELECT vec_id, cid, list_inner_product(df, df) AS d2
        |  FROM (
        |    SELECT p.vec_id, c.cid,
        |      list_transform(generate_series(1, len(p.pe)), i -> p.pe[i] - c.ce[i]) AS df
        |    FROM pts p CROSS JOIN cen c)),
        |darr AS (
        |  SELECT vec_id, list(d2 ORDER BY cid) AS ds FROM d2s GROUP BY vec_id),
        |per_k AS (
        |  SELECT vec_id, k, ds[1:CAST(k AS INT)] AS pre
        |  FROM darr CROSS JOIN
        |    (SELECT unnest(generate_series(2, ${ClusteringQueries.K})) AS k)),
        |scored AS (
        |  SELECT k, round(list_min(pre), 6) AS qin,
        |    sqrt(list_min(pre)) AS a, sqrt(list_sort(pre)[2]) AS b
        |  FROM per_k),
        |s2 AS (
        |  SELECT k, qin,
        |    CASE WHEN greatest(a, b) > 0
        |         THEN round((b - a) / greatest(a, b), 6) ELSE 0.0 END AS s
        |  FROM scored)
        |SELECT CAST(k AS BIGINT) AS k,
        |  CAST(sum(CAST(qin AS DECIMAL(25,6))) AS DOUBLE) AS inertia,
        |  round(CAST(sum(CAST(s AS DECIMAL(25,6))) AS DOUBLE) / count(*), 6) AS silhouette
        |FROM s2 GROUP BY k ORDER BY k""".stripMargin)
}
