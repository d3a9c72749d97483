package graft

/** Every declared query runs at sf0.001, returns rows, and every oracle key
  * points at a declared query. */
class QueriesSmokeSpec extends SparkSpec {

  test("oracle keys ⊆ query keys") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, SfDir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
