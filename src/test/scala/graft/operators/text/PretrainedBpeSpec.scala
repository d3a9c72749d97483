package graft.operators.text

import graft.SparkSpec
import graft.functions.MarkedBpeTokens
import org.apache.spark.sql.functions._

/** Laws of the pretrained-vocabulary tokenizer path. */
class PretrainedBpeSpec extends SparkSpec {

  import spark.implicits._

  test("loadMerges parses the published merges.txt format: header skipped, rank = line order") {
    // a snippet in the exact shape of GPT-2's released file
    val file = Seq("#version: 0.2", "Ġ t", "h e", "Ġt he", "").iterator
    val m = PretrainedBpe.loadMerges(file)
    assert(m === Seq(("Ġ", "t"), ("h", "e"), ("Ġt", "he")))
  }

  test("loadMerges rejects malformed lines") {
    intercept[IllegalArgumentException] {
      PretrainedBpe.loadMerges(Seq("a b c").iterator)
    }
    intercept[IllegalArgumentException] {
      PretrainedBpe.loadMerges(Seq("noseparator").iterator)
    }
  }

  test("GPT-2 conventions: Ġ marks every non-initial word, first word unmarked, no </w>, case-sensitive") {
    val merges = Seq(("Ġ", "t"), ("h", "e"), ("Ġt", "he"))
    val out = Seq("the the The").toDF("text")
      .select(MarkedBpeTokens(col("text"), merges).as("t"))
      .head().getSeq[String](0)
    // word 1 "the": [t,h,e] -> he -> [t, he]
    // word 2 "Ġthe": [Ġ,t,h,e] -> Ġt -> he -> [Ġt, he] -> Ġthe
    // word 3 "ĠThe": capital T blocks every merge except h+e -> [Ġ, T, he]
    assert(out === Seq("t", "he", "Ġthe", "Ġ", "T", "he"))
  }

  test("leading non-space whitespace does not shift the unmarked first word") {
    // '\t' is stripped by the encoder's Java trim but NOT by SQL trim —
    // the oracle marks by first NON-EMPTY position for exactly this
    // case (r12 review); the engine law: the first real word is
    // unmarked whatever whitespace precedes it
    val merges = Seq(("Ġ", "t"))
    val out = Seq("\tthe tap").toDF("text")
      .select(MarkedBpeTokens(col("text"), merges).as("t"))
      .head().getSeq[String](0)
    assert(out === Seq("t", "h", "e", "Ġt", "a", "p"))
  }

  test("the frozen resource loads, is non-trivial, and the corpus query is exact and covering") {
    assert(PretrainedBpe.merges.nonEmpty, "frozen vocabulary is empty")
    val out = PretrainedBpe.qTokenPretrained(spark, SfDir).collect()
    val n = graft.Tables.documents(spark, SfDir).count()
    assert(out.length.toLong === n)
    out.foreach { r =>
      assert(r.getInt(2) >= 1, s"doc ${r.getLong(0)} got zero tokens")
      // a fixed vocabulary can never yield fewer tokens than words
      assert(r.getInt(2) >= r.getInt(1),
        s"doc ${r.getLong(0)}: tokens ${r.getInt(2)} < words ${r.getInt(1)}")
    }
    // the frozen vocabulary is NOT the corpus-trained one: same encoder
    // family, different (fixed) model — counts must come from the
    // resource, not from retraining (spot-check: the vocabulary's merge
    // count matches the committed artifact, not BpeQueries.NumMerges)
    assert(PretrainedBpe.merges.size !== BpeQueries.NumMerges)
  }
}
