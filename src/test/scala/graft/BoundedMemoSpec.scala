package graft

import org.scalatest.funsuite.AnyFunSuite

class BoundedMemoSpec extends AnyFunSuite {

  test("a live key never double-builds or double-pins: same instance back") {
    val m = new BoundedMemo[String, Object](4)
    var builds = 0
    def build() = { builds += 1; new Object }
    val a = m.getOrElseUpdate("k")(build())
    val b = m.getOrElseUpdate("k")(build())
    assert(a eq b, "re-entry built a second pinned copy")
    assert(builds === 1)
    assert(m.size === 1)
  }

  test("overflow evicts OLDEST first, exactly once, and bounds the size") {
    val evicted = scala.collection.mutable.ArrayBuffer.empty[Int]
    val m = new BoundedMemo[Int, Int](3, (v: Int) => { evicted += v; () })
    (1 to 5).foreach(k => m.getOrElseUpdate(k)(k * 10))
    assert(m.size === 3)
    assert(evicted.toSeq === Seq(10, 20), "eviction order is not oldest-first")
    // survivors still served from the memo (no rebuild)
    assert(m.getOrElseUpdate(4)(fail("rebuilt a live key")) === 40)
    // an evicted key rebuilds (and evicts the now-oldest survivor)
    assert(m.getOrElseUpdate(1)(11) === 11)
    assert(evicted.toSeq === Seq(10, 20, 30))
  }

  test("re-entry does not refresh insertion order (eviction stays FIFO, not LRU)") {
    val evicted = scala.collection.mutable.ArrayBuffer.empty[Int]
    val m = new BoundedMemo[Int, Int](2, (v: Int) => { evicted += v; () })
    m.getOrElseUpdate(1)(10)
    m.getOrElseUpdate(2)(20)
    m.getOrElseUpdate(1)(99) // live-key hit — value unchanged
    m.getOrElseUpdate(3)(30) // overflow
    assert(evicted.toSeq === Seq(10),
      "FIFO contract changed — update the graph-memo sizing rationale")
  }

  test("cap must be positive") {
    intercept[IllegalArgumentException](new BoundedMemo[Int, Int](0))
  }
}
