package graft.tools

/** Shared timing helper for the scratch profiler mains. */
object Prof {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $name%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }
}
