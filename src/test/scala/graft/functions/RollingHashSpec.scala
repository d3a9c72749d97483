package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  private def fps(texts: String*): Seq[Set[Long]] =
    texts.toSeq.toDF("text")
      .select(RollingFingerprint(col("text")).as("f"))
      .collect().map(_.getSeq[Long](0).toSet).toSeq

  test("deterministic and non-empty for len >= k") {
    val Seq(a, b) = fps("hello world rolling hash", "hello world rolling hash")
    assert(a == b && a.nonEmpty)
  }

  test("short strings (< k) produce no fingerprints") {
    assert(fps("short").head.isEmpty)
  }

  test("winnowing containment: long shared substring shares a fingerprint") {
    // shared run of length >= k + w - 1 = 11 guarantees a shared fingerprint
    val shared = "abcdefghijklmnopqrstuvwxyz"
    val Seq(a, b) = fps(s"XXXX${shared}YYYY", s"QQ${shared}ZZZZZZ")
    assert((a & b).nonEmpty, "documents sharing a long substring must share a fingerprint")
  }

  test("disjoint alphabets share nothing") {
    val Seq(a, b) = fps("aaaa bbbb cccc dddd eeee", "1111 2222 3333 4444 5555")
    assert((a & b).isEmpty)
  }
}
