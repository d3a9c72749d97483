package graft

import org.apache.spark.sql.DataFrame

/** Per-call-site cache holder for queries that persist an intermediate
  * frame feeding several branches of a LAZY result (pair-join sides,
  * anti-join left). An eager unpersist inside the query would drop the
  * cache before the caller ever executes the plan; never unpersisting
  * accumulates leaked blocks across repeated invocations (bench reps,
  * long sessions). Middle ground: each invocation unpersists the frame
  * the SAME site persisted last time, so at most one cached copy per
  * site is ever live, and the current invocation's plan keeps its cache
  * until the site is invoked again (or LRU eviction).
  */
final class RollingCache {
  private var last: Option[DataFrame] = None

  def persist(df: DataFrame): DataFrame = synchronized {
    last.foreach(_.unpersist(blocking = false))
    val p = df.persist()
    last = Some(p)
    p
  }
}
