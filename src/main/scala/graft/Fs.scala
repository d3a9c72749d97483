package graft

import java.nio.file.{Files, Path}

/** Small local-filesystem helpers for the scratch dirs the persistent
  * index and streaming queries manage. */
object Fs {
  /** Staging format version, part of every stage key. Bump whenever the
    * staging LOGIC changes (not just the source): a staged dir written by
    * older code is otherwise served verbatim even though its contents are
    * wrong — exactly how round 7's funnel staging (written while the
    * events loader misread TIMESTAMP(MICROS) as nanos) would survive into
    * round 8 despite the loader fix. v2 = schema-adaptive events loader. */
  private val StageFormatVersion = 2

  /** Cache key for a staging dir derived from `dir/sourceFile`: the full
    * path plus the source's size and mtime plus [[StageFormatVersion]].
    * Sanitized-path keys alone are unsafe — distinct dirs can sanitize
    * identically, and a regenerated source at the same path would
    * silently serve stale staging. */
  def stageKey(dir: String, sourceFile: String): String = {
    val src = java.nio.file.Paths.get(dir, sourceFile)
    val sig = s"v$StageFormatVersion|$src|${Files.size(src)}|${Files.getLastModifiedTime(src).toMillis}"
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    md.map(b => f"$b%02x").mkString
  }

  /** Drop sibling staging dirs under `root` other than `keepKey` — stale
    * keys from earlier corpus generations or staging-format versions
    * would otherwise accumulate one full table copy each in tmp until
    * the disk fills (each key is content-derived, so nothing ever
    * reuses an old one). Call when staging a NEW key.
    *
    * Siblings modified within [[SweepMinAgeMillis]] are SKIPPED: the tmp
    * root is shared across JVMs, and a concurrently-running process on a
    * different corpus dir (or the same dir regenerated mid-run) has a
    * different key that is live — deleting it would fail or truncate that
    * run's stream. A live run's staging dir was by definition written
    * within its own lifetime, so the age guard protects it; genuinely
    * stale keys (prior corpus generations, old format versions) age past
    * the cutoff and are reaped by the next sweep. */
  val SweepMinAgeMillis: Long = 2L * 3600 * 1000
  def sweepStaleKeys(root: Path, keepKey: String): Unit =
    if (Files.isDirectory(root)) {
      val cutoff = System.currentTimeMillis() - SweepMinAgeMillis
      val listing = Files.list(root)
      try listing.forEach { p =>
        // unreadable mtime → assume live (deletion is the unsafe branch)
        val recent = try Files.getLastModifiedTime(p).toMillis >= cutoff
          catch { case _: java.io.IOException => true }
        if (p.getFileName.toString != keepKey && !recent)
          try deleteRecursively(p) catch { case _: java.io.IOException => () }
      } finally listing.close()
    }

  /** Stage `parts` as consecutively-numbered single parquet files with
    * strictly increasing mtimes under `stage` — the file-source ingest
    * layout every streaming query's staging uses (the source processes
    * oldest-first, so mtimes define arrival order). */
  def stageParts(stage: Path, parts: Seq[org.apache.spark.sql.DataFrame]): Unit = {
    Files.createDirectories(stage)
    parts.zipWithIndex.foreach { case (df, i) =>
      val scratch = Files.createTempDirectory(s"graft_stage_part$i")
      df.coalesce(1).write.mode("overwrite").parquet(scratch.toString)
      val listing = Files.list(scratch)
      val part = try listing.toArray.map(_.asInstanceOf[Path])
        .find(_.toString.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no parquet part in $scratch"))
      finally listing.close()
      val dst = stage.resolve(f"$i%05d.parquet")
      Files.move(part, dst, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dst.toFile.setLastModified(1700000000000L + i * 600000L)
      deleteRecursively(scratch)
    }
  }

  private lazy val atExit: java.util.Set[Path] = {
    val s = java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      s.forEach(p => try deleteRecursively(p) catch { case _: Throwable => () })))
    s
  }

  /** Register a scratch directory for recursive deletion at JVM exit —
    * for small result dirs a caller may still be lazily reading when the
    * producing query returns (File.deleteOnExit only handles files). */
  def deleteAtExit(p: Path): Unit = atExit.add(p)

  /** Delete a directory tree if it exists. Closes the walk stream
    * (Files.walk holds an open directory handle until closed). */
  def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
      finally s.close()
    }
  }
}
