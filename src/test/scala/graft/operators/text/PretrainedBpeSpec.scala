package graft.operators.text

import graft.SparkSpec
import graft.functions.{Gpt2, Gpt2BpeTokens}
import org.apache.spark.sql.functions._

/** Laws of the pretrained-vocabulary tokenizer path (full GPT-2
  * pipeline: regex pre-tokenization + byte-unicode remap + greedy
  * merges). */
class PretrainedBpeSpec extends SparkSpec {

  import spark.implicits._

  // ------------------------------------------------------- golden fixture
  // Real GPT-2 tokenizer data, vendored by hand (public knowledge, zero
  // egress — r13 verdict #4): a subset of the published merges.txt
  // (src/test/resources/graft/bpe/gpt2_golden.merges.txt) plus the
  // matching vocab-id subset. The byte-alphabet ids are DERIVED from the
  // published bytes_to_unicode layout (printable 0x21-0x7E -> ids 0-93,
  // 0xA1-0xAC -> 94-105, 0xAE-0xFF -> 106-187, the 68 remapped bytes
  // ascending -> 188-255; anchors 'a'=64, '!'=0, Ġ=220, Ċ=198 are
  // widely published); merged-token ids follow GPT-2's id = 256 + merge
  // rank. The golden pairs below are the released tokenizer's actual
  // (text -> ids) outputs.
  private val GoldenVocab: Map[String, Int] = Map(
    // byte alphabet (derived; Ġ/Ċ/ĉ are bytes 0x20/0x0A/0x09's images)
    "!" -> 0, "," -> 11, "." -> 13, "0" -> 15, "9" -> 24, "?" -> 30,
    "A" -> 32, "T" -> 51, "a" -> 64, "z" -> 89, "Ġ" -> 220, "Ċ" -> 198,
    "ĉ" -> 197,
    // merged tokens (id = 256 + published merge rank)
    "Ġt" -> 256, "Ġa" -> 257, "he" -> 258, "in" -> 259, "re" -> 260,
    "on" -> 261, "Ġthe" -> 262, "er" -> 263, "at" -> 265, "Ġw" -> 266,
    "Ġo" -> 267, "it" -> 270, "is" -> 271, "an" -> 272, "or" -> 273,
    "Ġb" -> 275, "Ġf" -> 277, "Ġan" -> 281, "Ġto" -> 284, "Ġth" -> 285,
    "Ġof" -> 286, "Ġin" -> 287, "Ġh" -> 289, "Ġand" -> 290, "as" -> 292,
    "ll" -> 297, "Ġn" -> 299, "Ġbe" -> 307, "ot" -> 313, "ĠI" -> 314,
    "ut" -> 315, "Ġis" -> 318, "Ġon" -> 319, "Ġthat" -> 326, "Ġfor" -> 329,
    "'s" -> 338, "Ġhe" -> 339, "Ġit" -> 340, "ith" -> 342, "Ġwith" -> 351,
    "Ġas" -> 355, "nd" -> 358, "Ġwas" -> 373, "Ġat" -> 379, "Ġare" -> 389,
    "Ġor" -> 393, "th" -> 400, "Ġnot" -> 407, "Ġby" -> 416, "Ġthis" -> 428,
    "The" -> 464, "Ġhis" -> 465, "Ġbut" -> 475, "Ġall" -> 477,
    "the" -> 1169)

  /** Published-tokenizer outputs: text → GPT-2 token ids (as released;
    * single-token words verified against the public vocabulary, byte
    * tokens against the derived alphabet). */
  private val GoldenPairs: Seq[(String, Seq[Int])] = Seq(
    // byte-level singletons straight off the alphabet
    "!" -> Seq(0), "A" -> Seq(32), "a" -> Seq(64), "z" -> Seq(89),
    "0" -> Seq(15), "9" -> Seq(24), "?" -> Seq(30),
    " " -> Seq(220), "\n" -> Seq(198), "\t" -> Seq(197),
    // the earliest merges, as standalone words
    " t" -> Seq(256), " a" -> Seq(257), "he" -> Seq(258), "in" -> Seq(259),
    "re" -> Seq(260), "on" -> Seq(261), "er" -> Seq(263), "at" -> Seq(265),
    "an" -> Seq(272), "th" -> Seq(400),
    // multi-merge words (each a single token in the released vocab)
    " the" -> Seq(262), "the" -> Seq(1169), "The" -> Seq(464),
    " to" -> Seq(284), " of" -> Seq(286), " in" -> Seq(287),
    " and" -> Seq(290),
    // contraction split: published regex peels 's as its own pre-token
    "it's" -> Seq(270, 338),
    // punctuation, inner whitespace runs, trailing whitespace
    "it, the." -> Seq(270, 11, 262, 13),
    "the  the" -> Seq(1169, 220, 262),
    "the " -> Seq(1169, 220),
    "the.\n" -> Seq(1169, 13, 198),
    "The the and the" -> Seq(464, 262, 290, 262))

  /** r14 verdict #6: ONE ~100-token sample so the greedy loop is
    * verified at realistic merge depth (3-4 merges per word, competing
    * merges present at several steps — e.g. ` that` must pick at(9)
    * over Ġth(29) mid-word, ` for` must pick or(17) over Ġf(21)), not
    * only the 1-3-merge shorts above. Constrained writing: every word
    * is CHAIN-COMPLETE in the vendored merge subset (all merges of its
    * real GPT-2 derivation are present, in true relative order), so the
    * subset reproduces the released tokenizer's exact segmentation —
    * a word with missing chain merges would split differently than the
    * full released file and the ids would not be golden. */
  private val GoldenLongText: String =
    "The the of it all is that it is as it was, and all that is in it " +
    "is all that was in it, but it is not all that it was to be, for " +
    "all that was is not all that is, and as it was by the the of it, " +
    "this is his, and it's not for the the of it, but for all that it " +
    "is, and I was with it at the the of it all, was I not, and are " +
    "all that are not as all that was."

  private val GoldenLongIds: Seq[Int] = Seq(
    464, 262, 286, 340, 477, 318, 326, 340, 318, 355, 340, 373, 11, 290,
    477, 326, 318, 287, 340, 318, 477, 326, 373, 287, 340, 11, 475, 340,
    318, 407, 477, 326, 340, 373, 284, 307, 11, 329, 477, 326, 373, 318,
    407, 477, 326, 318, 11, 290, 355, 340, 373, 416, 262, 262, 286, 340,
    11, 428, 318, 465, 11, 290, 340, 338, 407, 329, 262, 262, 286, 340,
    11, 475, 329, 477, 326, 340, 318, 11, 290, 314, 373, 351, 340, 379,
    262, 262, 286, 340, 477, 11, 373, 314, 407, 11, 290, 389, 477, 326,
    389, 407, 355, 477, 326, 373, 13)

  test("GOLDEN: the pipeline reproduces released GPT-2 token ids on the vendored fixture") {
    // end-to-end: real merges subset in (the exact file format a user
    // drops in) → pretokenize → remap → greedy merges → vocab ids out.
    // Closes the "a released file drops in with no code change" claim
    // with released data instead of a stand-in.
    val in = getClass.getResourceAsStream("/graft/bpe/gpt2_golden.merges.txt")
    assert(in != null, "golden merges resource missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val merges = try PretrainedBpe.loadMerges(src.getLines()) finally src.close()
    assert(merges.size === 55)
    val ranks = merges.zipWithIndex.toMap
    for ((text, wantIds) <- GoldenPairs :+ (GoldenLongText -> GoldenLongIds)) {
      val toks = Gpt2.pretokenize(text)
        .flatMap(pt => Gpt2.encodePretoken(pt, ranks))
      val ids = toks.map { t =>
        assert(GoldenVocab.contains(t),
          s"'$text' produced token '$t' outside the golden vocab — " +
            "the merge path diverged from the released tokenizer")
        GoldenVocab(t)
      }
      assert(ids === wantIds, s"'$text' tokenized to $toks")
    }
  }

  test("GOLDEN: the same fixture through the Column expression (the query path)") {
    val in = getClass.getResourceAsStream("/graft/bpe/gpt2_golden.merges.txt")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val merges = try PretrainedBpe.loadMerges(src.getLines()) finally src.close()
    val all = GoldenPairs :+ (GoldenLongText -> GoldenLongIds)
    val df = all.map(_._1).toDF("txt")
      .select(col("txt"), Gpt2BpeTokens(col("txt"), merges).as("toks"))
    val got = df.collect().map(r =>
      r.getString(0) -> r.getSeq[String](1).map(GoldenVocab)).toMap
    for ((text, wantIds) <- all)
      assert(got(text) === wantIds, s"expression path diverged on '$text'")
  }

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
