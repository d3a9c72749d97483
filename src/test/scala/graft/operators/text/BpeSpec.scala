package graft.operators.text

import graft.SparkSpec
import graft.functions.Bpe

class BpeSpec extends SparkSpec {

  test("learn reproduces the classic merge order on a hand-computed corpus") {
    // Sennrich's canonical example family: {low:5, lower:2, newest:6, widest:3}
    val freqs = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.learn(freqs, 4)
    // pair counts round 1: (e,s)=9 (newest 6 + widest 3), (s,t)=9, (t,</w>)=9,
    // (l,o)=7, (o,w)=7 ... → ties broken lexicographically: (e,s) first
    assert(merges(0) == ("e", "s"), s"got ${merges(0)}")
    assert(merges(1) == ("es", "t"), s"got ${merges(1)}")
    assert(merges(2) == ("est", "</w>"), s"got ${merges(2)}")
    assert(merges(3) == ("l", "o"), s"got ${merges(3)}")
  }

  test("encodeWord applies merges greedily by rank") {
    val freqs = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val ranks = Bpe.learn(freqs, 10).zipWithIndex.toMap
    // "lowest" was never seen whole, but shares subwords: l+o merged, est</w>
    val toks = Bpe.encodeWord("lowest", ranks).toSeq
    assert(toks.contains("est</w>") || toks.contains("west</w>"),
      s"expected the trained est suffix to fire, got $toks")
    assert(Bpe.encodeWord("", ranks).isEmpty)
    // unseen alphabet: falls back to characters + end mark, never fails
    assert(Bpe.encodeWord("zzz", ranks).toSeq == Seq("z", "z", "z", "</w>"))
  }

  test("training is deterministic and encoding round-trips concatenation") {
    val freqs = Seq(("abab", 4L), ("abc", 3L), ("cab", 2L))
    val m1 = Bpe.learn(freqs, 6)
    val m2 = Bpe.learn(freqs, 6)
    assert(m1 == m2)
    val ranks = m1.zipWithIndex.toMap
    for (w <- Seq("abab", "abc", "cab", "bac")) {
      val toks = Bpe.encodeWord(w, ranks)
      assert(toks.mkString == w + Bpe.EndMark,
        s"tokens must concatenate back to the word: $w -> ${toks.toSeq}")
    }
  }

  test("q_token_bpe: fertility bounded, more merges never increase tokens") {
    val df = BpeQueries.qTokenBpe(spark, SfDir).cache()
    import org.apache.spark.sql.functions._
    assert(df.count() == graft.Tables.documents(spark, SfDir).count())
    // every word yields at least 1 token and at most chars+1
    val bad = df.filter(col("n_bpe_tokens") < col("n_words")).count()
    assert(bad == 0, "each word must produce at least one token")
    val fertility = df.agg(avg("fertility")).head().getDouble(0)
    assert(fertility >= 1.0 && fertility < 10.0, s"implausible fertility $fertility")
  }
}
