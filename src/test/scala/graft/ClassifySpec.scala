package graft

import graft.operators.Classify

class ClassifySpec extends SparkTestBase {

  private def docs(rows: (Long, String, String)*) = {
    val s = spark
    import s.implicits._
    rows.map { case (id, lang, text) =>
      (id, text, lang, "srcA", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("nbLangidConfusion learns a separable vocabulary: held-out docs " +
    "land on the diagonal") {
    // ids 0,5,10,15 are the held-out fifth; both classes appear in train
    // AND test; vocabularies are disjoint, so NB must get both right
    val d = docs(
      (0L, "aa", "alpha beta gamma alpha"),
      (1L, "aa", "alpha beta beta gamma"),
      (2L, "aa", "gamma alpha beta"),
      (3L, "aa", "beta gamma gamma alpha"),
      (5L, "bb", "delta epsilon zeta zeta"),
      (6L, "bb", "delta delta epsilon zeta"),
      (7L, "bb", "zeta epsilon delta"),
      (8L, "bb", "epsilon zeta delta delta"))
    val cm = Classify.nbLangidConfusion(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(cm == Map(("aa", "aa") -> 1L, ("bb", "bb") -> 1L))
  }

  test("unseen-vocabulary test doc falls back to smoothing + prior; " +
    "empty test doc drops out") {
    // train: 3 aa docs vs 1 bb doc → prior favors aa; the test doc's words
    // are unseen by BOTH classes, so per-token default weights differ only
    // via class totals and the prior decides
    val d = docs(
      (1L, "aa", "alpha beta"),
      (2L, "aa", "alpha gamma"),
      (3L, "aa", "beta gamma"),
      (4L, "bb", "delta epsilon"),
      (0L, "??", "omega psi"), // unseen words
      (5L, "??", ""))          // no tokens → no evidence → absent
    val cm = Classify.nbLangidConfusion(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // identical per-class token totals (3×2 vs 1×2? no: aa has 6 tokens,
    // bb has 2 — smaller ct ⇒ LARGER default weight, favoring bb per
    // token; two tokens of advantage ln((2+V)/(6+V)) vs prior ln(3/1):
    // with V=6 vocab, 2·ln(8/12) = −0.81 < ln(3) = 1.10 ⇒ aa wins
    assert(cm == Map(("??", "aa") -> 1L))
  }
}
