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

  test("nbQualityScores learns the rule gate from separable feature " +
    "buckets: held-out predictions match, margin sign tracks the " +
    "prediction, confusion aggregates the per-doc rows") {
    val s = spark
    import s.implicits._
    // two clearly separated populations: 'good' docs are 30 DISTINCT
    // stopword-led tokens (passes every Gopher rule incl. rep_2gram=0 →
    // cls 1, nt/st/ml buckets far from the bad ones); 'bad' docs are 5
    // short tokens (fails min-tokens AND stopword evidence → cls 0).
    // Train sees both classes; the held-out fifth sees both too.
    val goodText =
      (Seq("the", "of", "and") ++ (1 to 27).map(i => s"word$i"))
        .mkString(" ")
    val good = (1 to 6).map(_ => goodText)
    val bad = (1 to 6).map(_ => "x y z w v")
    val rows = (good ++ bad).zipWithIndex.map { case (t, i) =>
      (i.toLong, t.trim, "en", "srcA", t.trim.length.toLong)
    }
    val d = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Classify.nbQualityScores(d).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    // held-out fifth: ids 0,5 (good), 10 (bad)
    assert(out.keySet === Set(0L, 5L, 10L))
    assert(out(0L)._1 === 1 && out(5L)._1 === 1 && out(10L)._1 === 0)
    out.foreach { case (id, (actual, predicted, margin)) =>
      assert(predicted === actual, s"doc $id misclassified")
      assert((margin > 0) === (predicted == 1),
        s"doc $id margin sign disagrees with the argmax")
    }
    val cm = Classify.nbQualityConfusion(d).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(cm === Map((1, 1) -> 2L, (0, 0) -> 1L))

    // calibration curve over the same held-out set: buckets partition
    // the docs, counters reconcile with the per-doc rows, the rate is
    // the exact bucket mean, and on this separable fixture the keep
    // docs sit in strictly higher margin buckets than the drop doc
    val cal = Classify.nbQualityCalibration(d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(cal.values.map(_._1).sum === 3L, "buckets partition held-out")
    assert(cal.values.map(_._2).sum === 2L, "actual keeps reconcile")
    assert(cal.values.map(_._3).sum === 2L, "predicted keeps reconcile")
    cal.foreach { case (b, (n, keep, _, rate)) =>
      assert(b >= -10L && b <= 10L)
      assert(rate ===
        BigDecimal(keep.toDouble / n).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"bucket $b rate must be the exact mean")
    }
    val keepBuckets = cal.filter(_._2._2 > 0).keys
    val dropBuckets = cal.filter { case (_, (n, k, _, _)) => k < n }.keys
    assert(keepBuckets.min > dropBuckets.max,
      "separable fixture: keep buckets sit above drop buckets")

    // ROC sweep over the same scored frame: one row per threshold, the
    // four counters partition the held-out set everywhere, predicted-keep
    // mass is non-increasing in the threshold, and t = 0 reproduces the
    // argmax confusion matrix exactly (ties go to drop)
    val roc = Classify.nbQualityRoc(d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(roc.keySet === (-10L to 10L).toSet)
    roc.values.foreach { case (tp, fp, fn, tn) =>
      assert(tp + fp + fn + tn === 3L, "counters partition held-out")
    }
    (-10L to 9L).foreach { t =>
      val lo = roc(t); val hi = roc(t + 1)
      assert(hi._1 <= lo._1 && hi._2 <= lo._2,
        s"predicted keeps must not grow from t=$t to ${t + 1}")
    }
    assert(roc(0L) === ((2L, 0L, 0L, 1L)),
      "t=0 is the argmax operating point")
  }
}
