package graft.operators.multimodal

import java.nio.charset.StandardCharsets

import graft.SparkSpec
import graft.operators.multimodal.MarkupDecode.MarkupExtractor

class MarkupDecodeSpec extends SparkSpec {

  private def html(s: String) = MarkupExtractor.extract("html", s.getBytes(StandardCharsets.UTF_8))
  private def md(s: String) = MarkupExtractor.extract("md", s.getBytes(StandardCharsets.UTF_8))
  private def txt(s: String) = MarkupExtractor.extract("txt", s.getBytes(StandardCharsets.UTF_8))

  test("html: tags, script/style blocks, and entities are stripped") {
    assert(html("<p>hello <b>world</b></p>") == "hello world")
    assert(html("<style>p{x}</style><script>var a = '<p>';</script>ok") == "ok")
    assert(html("a &amp; b &lt;c&gt; &quot;d&quot; &nbsp;e") == "a & b <c> \"d\" e")
    assert(html("a</p><p>b") == "a b", "tag removal must not glue words")
  }

  test("markdown: fences, images, links, emphasis are stripped") {
    assert(md("# Head\n\n**bold** _it_ `code`") == "Head bold it code")
    assert(md("see [docs](http://x.com/y) now") == "see docs now")
    assert(md("pic ![alt](img.png) end") == "pic end")
    assert(md("```\nx = 1\n```\nafter") == "after")
  }

  test("plaintext passes through with collapsed whitespace") {
    assert(txt("  a\t\tb\n\nc  ") == "a b c")
    assert(txt("") == "")
  }

  test("wrapped corpus round-trips: extraction recovers the original words") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, SfDir)
      .select(col("doc_id"), col("text")).limit(60).cache()
    val got = MarkupDecode.extractText(spark, SfDir)
      .select(col("doc_id"), col("n_words")).limit(0) // plan compiles
    // per-format invariant on a sample: extracted word count >= original's
    // (scaffolding adds words: Title/intro/source/more), never less
    val sample = MarkupDecode.extractText(spark, SfDir)
      .join(docs.select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("orig_words")), "doc_id")
    val bad = sample.filter(col("n_words") < col("orig_words")).count()
    assert(bad == 0, "decode must never lose payload words")
    assert(got.columns.sameElements(Array("doc_id", "n_words")))
  }

  test("q_media_decode rolls up all three formats") {
    val r = MarkupDecode.qMediaDecode(spark, SfDir).collect()
    assert(r.map(_.getString(0)).toSeq == Seq("html", "md", "txt"))
    r.foreach { row =>
      assert(row.getLong(1) > 0)
      val overhead = if (row.getString(0) == "txt") 0L else 1L
      assert(row.getLong(2) >= row.getLong(3) + overhead,
        s"markup overhead: raw must exceed extracted for ${row.getString(0)}")
    }
  }
}
