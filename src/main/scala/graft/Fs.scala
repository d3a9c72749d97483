package graft

import java.nio.file.{Files, Path}

/** Small local-filesystem helpers for the scratch dirs the persistent
  * index and streaming queries manage. */
object Fs {
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
