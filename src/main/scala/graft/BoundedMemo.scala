package graft

/** Insertion-ordered bounded memo for per-corpus pinned artifacts
  * (persisted / localCheckpoint'd frames shared by many lazy consumers —
  * the [[graft.operators.search.KnnGraph]] build, its beam serves, the
  * query-sample/exact-truth frames).
  *
  * Why not a [[RollingCache]]: those frames feed consumers that
  * interleave across queries and specs, so evicting on RE-ENTRY would
  * unpersist frames a live plan still references. Why not an unbounded
  * TrieMap (the pre-r10 shape): a long-lived JVM that touches many
  * corpora pins an unbounded set of block-manager copies. Middle ground:
  * evict only on OVERFLOW, oldest first, capped at `cap` keys — a
  * `getOrElseUpdate` for a live key always returns the SAME value and
  * never builds a second pinned copy (no double-pin, spec-asserted in
  * BoundedMemoSpec).
  *
  * Eviction hands the value to `onEvict` (unpersist for `persist()`ed
  * frames). localCheckpoint'd frames have no explicit unpin API — their
  * RDD blocks are reclaimed by Spark's ContextCleaner once the evicted
  * entry is unreachable, which dropping it from this map makes true.
  *
  * The build runs inside the memo lock: two threads asking for the same
  * key never build twice, at the cost of serializing concurrent builds —
  * the right trade for multi-minute graph builds.
  */
final class BoundedMemo[K, V](cap: Int, onEvict: V => Unit = (_: V) => ()) {
  require(cap > 0, s"BoundedMemo cap must be positive, got $cap")
  private val m = scala.collection.mutable.LinkedHashMap.empty[K, V]

  def getOrElseUpdate(k: K)(build: => V): V = synchronized {
    m.get(k) match {
      case Some(v) => v
      case None =>
        val v = build
        m.put(k, v)
        while (m.size > cap) {
          val (oldestK, oldestV) = m.head
          m.remove(oldestK)
          onEvict(oldestV)
        }
        v
    }
  }

  def size: Int = synchronized(m.size)
}
