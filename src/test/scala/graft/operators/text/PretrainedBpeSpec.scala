package graft.operators.text

import graft.SparkSpec
import graft.functions.{Gpt2, Gpt2BpeTokens}
import org.apache.spark.sql.functions._

/** Laws of the pretrained-vocabulary tokenizer path (full GPT-2
  * pipeline: regex pre-tokenization + byte-unicode remap + greedy
  * merges). */
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

  test("byte-unicode table matches GPT-2's published bytes_to_unicode") {
    // printable ASCII and the two latin-1 blocks keep their code point
    assert(Gpt2.ByteChar('A'.toInt) === 'A')
    assert(Gpt2.ByteChar(0x7e) === '~')
    assert(Gpt2.ByteChar(0xa1) === '¡')
    assert(Gpt2.ByteChar(0xff) === 'ÿ')
    // the 68 excluded bytes map to 256+n in ascending byte order — the
    // published table's fixed points: space→Ġ (U+0120), \n→Ċ (U+010A),
    // \t→ĉ (U+0109), byte 0→Ā (U+0100), DEL = the 34th → ġ (U+0121)
    assert(Gpt2.ByteChar(0x20) === 'Ġ')
    assert(Gpt2.ByteChar(0x0a) === 'Ċ')
    assert(Gpt2.ByteChar(0x09) === 'ĉ')
    assert(Gpt2.ByteChar(0x00) === 'Ā')
    assert(Gpt2.ByteChar(0x7f) === 'ġ')
    // exactly 68 bytes are remapped, covering U+0100..U+0143 densely
    val remapped = (0 until 256).filter(b => Gpt2.ByteChar(b) >= 256)
    assert(remapped.size === 68)
    assert(remapped.map(Gpt2.ByteChar(_).toInt).toSeq ===
      (0x100 until 0x144).toSeq)
    // multi-byte UTF-8 becomes one symbol per byte: é = C3 A9 → Ã©
    assert(Gpt2.remap("é") === "Ã©")
    assert(Gpt2.remap(" a") === "Ġa")
  }

  test("pre-tokenizer scan matches the published regex's behavior on its edge shapes") {
    def pt(s: String) = Gpt2.pretokenize(s)
    // contractions win at the apostrophe, lookahead-free
    assert(pt("Don't stop") === Seq("Don", "'t", " stop"))
    assert(pt("we're I'll") === Seq("we", "'re", " I", "'ll"))
    assert(pt("'street") === Seq("'s", "treet")) // the published pattern's quirk
    // ' ?X+' classes: letters / numbers / other split with one attached space
    assert(pt("x3 3x") === Seq("x", "3", " 3", "x"))
    assert(pt(" 42.7%") === Seq(" 42", ".", "7", "%"))
    assert(pt("¡hola! über") === Seq("¡", "hola", "!", " über"))
    // whitespace: a run before a token emits run-minus-last; the last
    // space attaches; non-space single ws stands alone; trailing run whole
    assert(pt("a  b") === Seq("a", " ", " b"))
    assert(pt("a \tb") === Seq("a", " ", "\t", "b"))
    assert(pt("a\tb") === Seq("a", "\t", "b"))
    assert(pt("end.  ") === Seq("end", ".", "  "))
    assert(pt("  ") === Seq("  "))
    assert(pt("") === Seq.empty)
    // space+apostrophe is a punctuation run, not a contraction — the
    // ` ?` branches carry no apostrophe alternatives
    assert(pt(" 'tis") === Seq(" '", "tis"))
    // Unicode whitespace classifies as \s (the 25-point White_Space
    // set, r13): NBSP/thin/ideographic spaces are ws, NOT punctuation —
    // and only a literal 0x20 can attach via the ` ?` branches
    assert(pt("a b") === Seq("a", " ", "b"))
    assert(pt("x  y") === Seq("x", " ", " y"))
    assert(pt("k　") === Seq("k", "　"))
  }

  test("Gpt2BpeTokens: Ġ falls out of the byte map, merges apply greedily by rank") {
    // vocabulary in the remapped alphabet: Ġ+t first, then h+e, then Ġt+he
    val merges = Seq(("Ġ", "t"), ("h", "e"), ("Ġt", "he"))
    val out = Seq("the the The").toDF("text")
      .select(Gpt2BpeTokens(col("text"), merges).as("t"))
      .head().getSeq[String](0)
    // pre-tokens: "the", " the", " The"
    // "the" → [t,h,e] → he → [t, he]
    // " the" → [Ġ,t,h,e] → Ġt → he → [Ġt, he] → Ġthe
    // " The" → [Ġ,T,h,e] → capital T blocks all but h+e → [Ġ, T, he]
    assert(out === Seq("t", "he", "Ġthe", "Ġ", "T", "he"))
  }

  test("leading/trailing whitespace becomes real tokens (no trim anywhere)") {
    val out = Seq("\tthe tap  ").toDF("text")
      .select(Gpt2BpeTokens(col("text"), Seq(("Ġ", "t"))).as("t"))
      .head().getSeq[String](0)
    // pre-tokens: "\t"(→ĉ), "the", " tap", "  "(→ĠĠ)
    assert(out === Seq("ĉ", "t", "h", "e", "Ġt", "a", "p", "Ġ", "Ġ"))
  }

  test("the frozen resource loads, is non-trivial, and the corpus query is exact and covering") {
    assert(PretrainedBpe.merges.nonEmpty, "frozen vocabulary is empty")
    val out = PretrainedBpe.qTokenPretrained(spark, SfDir).collect()
    val n = graft.Tables.documents(spark, SfDir).count()
    assert(out.length.toLong === n)
    out.foreach { r =>
      assert(r.getInt(2) >= 1, s"doc ${r.getLong(0)} got zero tokens")
      // every non-empty word is ≥1 pre-tokens, each ≥1 BPE tokens, and
      // whitespace tokens only add — so tokens ≥ non-empty words holds
      // for ANY corpus under the non-empty n_words (r12 advice)
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
