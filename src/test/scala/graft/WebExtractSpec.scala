package graft

import graft.operators.WebExtract

/** HTML main-content extraction: the synthetic page is structurally
  * real (script/style in head, nav/footer chrome outside `<main>`,
  * every 7th word linkified), and the extraction is graded by round
  * trip — stripping the markup must recover the original text
  * byte-for-byte after whitespace normalization. */
class WebExtractSpec extends SparkTestBase {

  private def fixture = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "plain words only here now", "web"),
      // 8 words: word 1 and word 8 linkified (1-based every-7th rule)
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8", "web"),
      // punctuation and digits survive the trip untouched
      (3L, "a, b; c: 42 (x) [y] {z} d.", "wiki"),
      // single word: still one link, still recovered
      (4L, "solo", "wiki"))
      .toDF("doc_id", "text", "source")
  }

  test("htmlExtract: every doc round-trips (recovered=1), link count " +
    "follows the every-7th-word rule, tag census = fixed chrome + 2 " +
    "per link, and main-selection beats naive stripping") {
    val out = WebExtract.htmlExtract(fixture).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size === 4)
    out.values.foreach { r =>
      assert(r.getAs[Int]("recovered") === 1,
        s"doc ${r.getLong(0)} must round-trip")
      // chrome the naive strip leaks: nav (4 words) + footer + title
      assert(r.getAs[Long]("full_text_len") >
        r.getAs[Long]("n_chars_main"),
        "whole-page strip must retain boilerplate the main strip drops")
      val d = r.getAs[Double]("density")
      assert(d > 0.0 && d < 1.0)
    }
    // words 1..n: links at 1, 8, 15, ... = ceil(n/7)
    def links(n: Int): Long = ((n + 6) / 7).toLong
    assert(out(1L).getAs[Long]("n_links") === links(5))
    assert(out(2L).getAs[Long]("n_links") === links(8)) // words 1 AND 8
    assert(out(3L).getAs[Long]("n_links") === links(8)) // 8 tokens
    assert(out(4L).getAs[Long]("n_links") === links(1))
    // fixed chrome: html,head,title,/title,script,/script,style,/style,
    // /head,body,nav,/nav,main,/main,footer,/footer,/body,/html = 18,
    // plus <a>+</a> per link
    out.values.foreach { r =>
      assert(r.getAs[Long]("n_tags") ===
        18L + 2L * r.getAs[Long]("n_links"),
        s"doc ${r.getLong(0)} tag census")
    }
  }

  test("htmlExtractReport: per-source rollup sums the per-doc report; " +
    "recovery is total on the synthetic corpus") {
    val rep = WebExtract.htmlExtractReport(fixture).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rep.keySet === Set("web", "wiki"))
    assert(rep("web").getAs[Long]("n_docs") === 2L)
    assert(rep("web").getAs[Long]("n_recovered") === 2L)
    assert(rep("wiki").getAs[Long]("n_recovered") === 2L)
    assert(rep.values.forall(_.getAs[Long]("boilerplate_chars") > 0L))
  }
}
