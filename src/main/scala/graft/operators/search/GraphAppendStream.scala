package graft.operators.search

import graft.QueryModule
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** STREAMING ingest into the live graph index: micro-batched new vectors
  * are [[GraphIndex.append]]ed into the persisted artifact batch by
  * batch — the reference's merge-back loop end to end
  * (update-etiquetas.ipynb re-ingests labeled batches into the live
  * Azure vector index), and the ingest half that pairs with
  * [[GraphServeStream]]'s query half.
  *
  * Unlike the serve, appends are NOT batch-boundary independent: batch
  * 2's insertion beams walk a graph that already contains batch 1, so
  * the sequential result differs (slightly, and deterministically) from
  * one bulk append of the union. That difference IS the measured
  * quantity: q_graph_append_stream grades the 2-micro-batch ingest and
  * the one-shot bulk append against the SAME exact truth, and the
  * near-equality of the two recalls is the law that makes incremental
  * ingest safe to run forever (spec-asserted; the oracle replays both
  * arms hash-exact — the one-shot arm from the SAME
  * [[GraphIndex.appendCtes]] chain q_graph_append uses).
  *
  * Determinism: the new 20% batch (ids ≡ 4 mod 5) splits arithmetically
  * into micro-batches (ids ≡ 4 mod 10, then ≡ 9 mod 10) staged as
  * one-file-per-batch with forced mtime order ([[graft.Fs.stageParts]],
  * maxFilesPerTrigger=1) — the batch ORDER is pinned, and a residue
  * guard inside foreachBatch fails loudly if the source ever delivers
  * them out of order. Each batch's `oldEmb` side is the arithmetic
  * prefix corpus, so every entry set, beam, and repair replays in SQL.
  */
object GraphAppendStream extends QueryModule {

  val K = GraphIndex.K

  /** Micro-batch residues of the new batch, in pinned arrival order. */
  val BatchResidues: Seq[Long] = Seq(4L, 9L) // mod 10

  private val memo = new graft.BoundedMemo[String, DataFrame](KnnGraph.MemoCap)

  /** The artifact after the 2-micro-batch streamed ingest. */
  private[search] def streamedGraph(spark: SparkSession, dir: String): DataFrame =
    memo.getOrElseUpdate(dir) {
      val emb = KnnGraph.e(spark, dir)
      val oldEmb = emb.filter(
        col("vec_id") % GraphIndex.AppendMod =!= GraphIndex.NewResidue)
      val gOld = KnnGraph.nnDescentRounds(oldEmb,
        s"$dir#old${GraphIndex.AppendMod}${GraphIndex.NewResidue}",
        GraphIndex.Degree, KnnGraph.Rounds).last
      val idx = AnnQueries.scratch(
        s"graft_graph_appstream_v${GraphIndex.BuildVersion}", dir)
      GraphIndex.build(spark, idx, gOld, oldEmb)
      val stage = java.nio.file.Files.createTempDirectory("graft_appstream_in")
      graft.Fs.deleteAtExit(stage)
      graft.Fs.stageParts(stage, BatchResidues.map(r =>
        emb.filter(col("vec_id") % 10 === r)))
      val schema = spark.read.parquet(stage.toString).schema
      val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val ingest = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(stage.toString)
          .writeStream
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory("graft_appstream_ck").toString)
          .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
            // a source retry, a coalesced trigger, or a checkpoint replay
            // would deliver an id outside the pinned sequence — diagnose
            // it loudly instead of an IndexOutOfBoundsException
            require(batchId >= 0 && batchId < BatchResidues.size,
              s"micro-batch id $batchId outside the pinned ingest order " +
                s"(expected 0..${BatchResidues.size - 1}) — " +
                "file-source ordering broke the pinned ingest order")
            val res = BatchResidues(batchId.toInt)
            val rows = batch.toDF().localCheckpoint(true)
            // the ingest semantics depend on arrival order — verify the
            // arithmetic split REALLY arrived in the pinned order
            // instead of silently appending against the wrong prefix
            require(rows.filter(col("vec_id") % 10 =!= res).isEmpty,
              s"micro-batch $batchId is not the ids ≡ $res (mod 10) slice — " +
                "file-source ordering broke the pinned ingest order")
            // prefix corpus for this batch: everything except the
            // residues that have not arrived yet
            val pending = BatchResidues.drop(batchId.toInt)
            val prefixOld = pending.foldLeft(emb)((d, r) =>
              d.filter(col("vec_id") % 10 =!= r))
            GraphIndex.append(spark, idx, prefixOld, rows)
          }
          .start()
        try ingest.processAllAvailable() finally ingest.stop()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      GraphIndex.edges(spark, idx).localCheckpoint(true)
    }

  /** Streamed-ingest vs one-shot bulk append, graded on the SAME full
    * exact truth (coprime eval modulus — the GraphDelete.evalModulus
    * discipline). */
  def qGraphAppendStream(spark: SparkSession, dir: String): DataFrame = {
    val emb = KnnGraph.e(spark, dir)
    val n = emb.count()
    val m = KnnGraph.evalModulus(n, GraphIndex.AppendMod)
    val ev = emb.filter(col("vec_id") % m === 0)
      .select(col("vec_id").as("i"), col("embedding").as("emb_i"))
    // the SAME exact-truth kernel as q_graph_append — both arms of both
    // drills grade against one definition
    val exact = GraphIndex.exactTopK(emb, ev).localCheckpoint(true)
    val nEv = ev.count()
    val gOneshot = GraphIndex.halfAndAppended(spark, dir)._2
    val gStream = streamedGraph(spark, dir)
    Seq(("oneshot", 0, gOneshot), ("streamed", 1, gStream)).map {
      case (name, ord, g) =>
        val edgesN = g.agg(count(lit(1)).as("n_edges"))
        val hits = g.join(exact, Seq("i", "j"), "left_semi")
          .agg(count(lit(1)).as("n_hits"))
        edgesN.crossJoin(broadcast(hits)).select(
          lit(ord).as("phase_ord"), lit(name).as("phase"),
          col("n_edges"), lit(nEv).as("n_eval"),
          round(col("n_hits").cast("double") / lit(nEv * K), 6).as("recall"))
    }.reduce(_.unionByName(_)).orderBy("phase_ord")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_graph_append_stream" -> (qGraphAppendStream _))

  /** Insertion beams of one micro-batch `t` over adjacency `und` with
    * query set `qn$t`, entering through the PINNED hierarchy
    * ([[GraphIndex.insertEntryCtes]]): members of the prefix corpus on
    * the build-time stride (`sprm.se` from the shared
    * [[GraphIndex.appendCtes]] chain — the engine reads the same value
    * from meta), branch predicate = the BUILD's member count (the
    * engine's l1edges-existence contract), and — on the walk branch —
    * the INCREMENTALLY-grown layer state: batch 0 descends the build's
    * exact subgraph (`und1a`), batch t>0 descends it plus every prior
    * batch's member out-edges ([[layerStateCtes]], the engine's
    * append-time l1edges rows). Then the merged graph + restricted
    * round → `gs$t`. */
  private def streamBatchCtes(t: Int, prevGraph: String,
                              walk: Boolean): String = {
    val rounds = (1 to GraphIndex.InsertRounds).map { r =>
      val prev = s"ib$t${r - 1}"
      s"""ic$t$r AS (SELECT DISTINCT p.q, u.j FROM $prev p JOIN sund$t u ON u.i = p.j),
         |is$t$r AS (SELECT p.q, p.j, round(list_cosine_similarity(qq.qv, s.v), 6) AS sim
         |  FROM ic$t$r p JOIN src$t s ON s.id = p.j JOIN qn$t qq ON qq.q = p.q
         |  WHERE p.j <> p.q),
         |ip$t$r AS (SELECT q, j, sim FROM is$t$r UNION SELECT q, j, sim FROM $prev),
         |ib$t$r AS MATERIALIZED (SELECT q, j, sim FROM (
         |    SELECT q, j, sim, row_number() OVER (PARTITION BY q ORDER BY sim DESC, j) AS rn
         |    FROM ip$t$r) WHERE rn <= ${GraphIndex.InsertBeam})""".stripMargin
    }
    s"""qn$t AS MATERIALIZED (SELECT id AS q, v AS qv FROM fe
       |  WHERE id % 10 = ${BatchResidues(t)}),
       |src$t AS MATERIALIZED (SELECT id, v FROM fe
       |  WHERE ${BatchResidues.drop(t).map(r => s"id % 10 <> $r").mkString(" AND ")}),
       |sund$t AS MATERIALIZED (SELECT i, j FROM $prevGraph
       |  UNION SELECT j AS i, i AS j FROM $prevGraph),
       |${if (t == 0) "" // src0 = the old chain: its member set IS m1a
          else s"""m1s$t AS MATERIALIZED (SELECT id, v FROM src$t
       |  WHERE ${GraphServe.entryPickSql("id", "SELECT se FROM sprm")}),
       |${if (walk) layerStateCtes(t) + ",\n" else ""}"""}${
          GraphIndex.insertEntryCtes(s"s$t", if (t == 0) "m1a" else s"m1s$t",
          s"qn$t", "SELECT se FROM sprm", "SELECT count(*) FROM m1a",
          undRel = Some(if (t == 0) "und1a" else s"unds$t"), walk = walk)},
       |ib${t}0 AS MATERIALIZED (SELECT q, j, sim FROM ibs${t}0),
       |${rounds.mkString(",\n")},
       |newe$t AS MATERIALIZED (SELECT q AS i, j, sim FROM (
       |    SELECT q, j, sim, row_number() OVER (PARTITION BY q ORDER BY sim DESC, j) AS rn
       |    FROM ib$t${GraphIndex.InsertRounds}) WHERE rn <= ${GraphIndex.Degree}),
       |mrg$t AS MATERIALIZED (SELECT i, j, sim FROM $prevGraph
       |  UNION ALL SELECT i, j, sim FROM newe$t),
       |nb$t AS (SELECT i AS mid FROM newe$t UNION SELECT j AS mid FROM newe$t),
       |mund$t AS MATERIALIZED (SELECT i, j FROM mrg$t UNION SELECT j AS i, i AS j FROM mrg$t),
       |mgm$t AS MATERIALIZED ${KnnGraph.gammaSql(s"mund$t")},
       |mcand$t AS (SELECT DISTINCT a.j AS i, b.j AS j FROM mgm$t a
       |  JOIN nb$t ON nb$t.mid = a.i
       |  JOIN mgm$t b ON b.i = a.i
       |  WHERE a.j <> b.j),
       |fe2$t AS MATERIALIZED (SELECT id, v FROM fe
       |  WHERE ${BatchResidues.drop(t + 1).map(r => s"id % 10 <> $r").mkString(" AND ") match {
           case "" => "TRUE"; case s => s }}),
       |msc$t AS (SELECT p.i, p.j, round(list_cosine_similarity(a.v, b.v), 6) AS sim
       |  FROM mcand$t p JOIN fe2$t a ON a.id = p.i JOIN fe2$t b ON b.id = p.j),
       |mpool$t AS (SELECT i, j, sim FROM msc$t UNION SELECT i, j, sim FROM mrg$t),
       |gs$t AS MATERIALIZED (SELECT i, j, sim FROM (
       |    SELECT i, j, sim, row_number() OVER (PARTITION BY i ORDER BY sim DESC, j) AS rn
       |    FROM mpool$t) WHERE rn <= ${GraphIndex.Degree})""".stripMargin
  }

  /** The layer-1 edge state batch `t` descends (walk branch): the
    * previous state (batch 1: the build's exact subgraph `l1ga`) plus
    * batch t−1's new members' incremental out-edges — each new member's
    * exact top-[[GraphServe.L1Degree]] against the members AFTER that
    * batch (`m1s$t`), exactly the rows [[GraphIndex.append]] wrote into
    * `l1edges` at that batch's commit. Dead (CASE-pruned) below the
    * brute bar, like every walk CTE. */
  private def layerStateCtes(t: Int): String =
    s"""nm${t - 1} AS (SELECT id, v FROM fe WHERE id % 10 = ${BatchResidues(t - 1)}
       |  AND ${GraphServe.entryPickSql("id", "SELECT se FROM sprm")}),
       |nlp${t - 1} AS (SELECT a.id AS i, b.id AS j,
       |    round(list_cosine_similarity(a.v, b.v), 6) AS sim
       |  FROM nm${t - 1} a CROSS JOIN m1s$t b WHERE a.id <> b.id),
       |nle${t - 1} AS (SELECT i, j FROM (
       |    SELECT i, j, row_number() OVER (PARTITION BY i ORDER BY sim DESC, j) AS rn
       |    FROM nlp${t - 1}) WHERE rn <= ${GraphServe.L1Degree}),
       |st$t AS (SELECT i, j FROM ${if (t == 1) "l1ga" else s"st${t - 1}"}
       |  UNION ALL SELECT i, j FROM nle${t - 1}),
       |unds$t AS MATERIALIZED (SELECT i, j FROM st$t
       |  UNION SELECT j AS i, i AS j FROM st$t)""".stripMargin

  private def phaseRow(ord: Int, name: String, g: String): String =
    s"""SELECT $ord AS phase_ord, '$name' AS phase,
       |  (SELECT count(*) FROM $g) AS n_edges,
       |  (SELECT n_eval FROM nev) AS n_eval,
       |  round(CAST((SELECT count(*) FROM $g JOIN exactf USING (i, j)) AS DOUBLE)
       |        / ((SELECT n_eval FROM nev) * $K), 6) AS recall""".stripMargin

  override def oracles: Map[String, String] = Map.empty

  /** Dynamic since r14: the chain emits only the corpus's actual entry
    * branch (see [[GraphIndex.insertEntryCtes]]) — on the brute branch
    * the member×member layer-state CTEs (`nlp`) are not generated at
    * all instead of CASE-pruned, which DuckDB still evaluated. */
  override def dynamicOracles(spark: SparkSession,
                              dir: String): Map[String, String] = {
    val walk = GraphIndex.buildWalkBranch(spark, dir)
    Map("q_graph_append_stream" ->
      s"""WITH ${KnnGraph.graphCtePrefix},
         |${GraphIndex.appendCtes(walk)},
         |${streamBatchCtes(0, s"og${KnnGraph.Rounds}", walk)},
         |${streamBatchCtes(1, "gs0", walk)},
         |evm AS (SELECT CASE WHEN m % ${GraphIndex.AppendMod} = 0 THEN m + 1 ELSE m END AS m FROM prm),
         |ev AS MATERIALIZED (SELECT id, v FROM e WHERE id % (SELECT m FROM evm) = 0),
         |nev AS (SELECT count(*) AS n_eval FROM ev),
         |exactf AS MATERIALIZED ${KnnGraph.exactTopKSql("ev", "id", "v", "e", "i", "j", K)}
         |${phaseRow(0, "oneshot", "gapp")}
         |UNION ALL
         |${phaseRow(1, "streamed", "gs1")}
         |ORDER BY phase_ord""".stripMargin)
  }
}
