package graft

import java.nio.file.{Files, Path}

/** Small local-filesystem helpers for the scratch dirs the persistent
  * index and streaming queries manage. */
object Fs {
  /** Cache key for a staging dir derived from `dir/sourceFile`: the full
    * path plus the source's size and mtime. Sanitized-path keys alone are
    * unsafe — distinct dirs can sanitize identically, and a regenerated
    * source at the same path would silently serve stale staging. */
  def stageKey(dir: String, sourceFile: String): String = {
    val src = java.nio.file.Paths.get(dir, sourceFile)
    val sig = s"$dir|${Files.size(src)}|${Files.getLastModifiedTime(src).toMillis}"
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    md.map(b => f"$b%02x").mkString
  }

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
