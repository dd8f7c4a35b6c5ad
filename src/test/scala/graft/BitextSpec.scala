package graft

import graft.operators.Similarity

/** Margin-based bitext mining: the LASER ratio criterion must beat raw
  * cosine exactly where raw cosine fails — hub vectors that are
  * everyone's nearest neighbor. */
class BitextSpec extends SparkTestBase {

  test("bitextMarginMine: a hub that wins every raw-cosine contest " +
    "loses the margin contest to the dedicated partner; one row per " +
    "A vector; margins deterministic") {
    val s = spark
    import s.implicits._
    // A side (even ids): three orthogonal directions.
    // B side (odd ids): one HUB equally close to every A vector
    // (cos 0.577 to each — the best RAW match for all of them), and
    // three dedicated partners at cos 0.55 to exactly one A vector
    // (the 4th dimension pads the norm so the partner cosine stays
    // BELOW the hub's). Raw argmax pairs everything to the hub;
    // the margin denominator (the hub's own high k-NN mean) demotes
    // it below the partners.
    val r3 = 0.57735f
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)),
      (4L, Array(0f, 0f, 1f, 0f)),
      (1L, Array(r3, r3, r3, 0f)),          // hub
      (3L, Array(0.55f, 0f, 0f, 0.83516f)), // partner of 0
      (5L, Array(0f, 0.55f, 0f, 0.83516f)), // partner of 2
      (7L, Array(0f, 0f, 0.55f, 0.83516f))  // partner of 4
    ).toDF("vec_id", "embedding")
    // raw-cosine sanity: the hub IS the best raw match for every A vec
    val rawBest = Similarity.knnBrute(
        emb, org.apache.spark.sql.functions.col("vec_id") % 2 === 0, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rawBest === Map(0L -> 1L, 2L -> 1L, 4L -> 1L),
      "fixture must make the hub the raw-cosine winner everywhere")
    val got = Similarity.bitextMarginMine(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(0L, 2L, 4L), "one row per A vec")
    assert(got.map(t => t._1 -> t._2).toMap ===
      Map(0L -> 3L, 2L -> 5L, 4L -> 7L),
      "margin must pick each dedicated partner over the hub")
    got.foreach { case (_, _, cosMicro, margin) =>
      assert(math.abs(cosMicro - 550000L) <= 100L, "partner cos ~0.55")
      assert(margin > 1.0, "mined pairs sit above the unit margin")
    }
  }

  test("bitextMarginEval: label-aligned partners mine at precision 1 " +
    "with the matched margin above the mismatched; LSH variant mines " +
    "a subset of brute pairs") {
    val s = spark
    import s.implicits._
    val r3 = 0.57735f
    // the hub fixture with labels: each dedicated partner shares its
    // A vector's label; the hub carries a label no A vector has
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 10),
      (2L, Array(0f, 1f, 0f, 0f), 20),
      (4L, Array(0f, 0f, 1f, 0f), 30),
      (1L, Array(r3, r3, r3, 0f), 99),
      (3L, Array(0.55f, 0f, 0f, 0.83516f), 10),
      (5L, Array(0f, 0.55f, 0f, 0.83516f), 20),
      (7L, Array(0f, 0f, 0.55f, 0.83516f), 30)
    ).toDF("vec_id", "embedding", "label")
    val ev = Similarity.bitextMarginEval(emb).collect().head
    assert(ev.getAs[Long]("n_mined") === 3L)
    assert(ev.getAs[Long]("n_label_match") === 3L)
    assert(ev.getAs[Double]("label_precision") === 1.0)
    assert(ev.isNullAt(ev.fieldIndex("mean_margin_mismatch")),
      "no mismatched pairs -> null mean, never a division blowup")
    assert(ev.getAs[Double]("mean_margin_match") > 1.0)
    // the LSH form mines only bucket-sharing candidates: every mined
    // pair must be a (a_id, b_id) the brute form could also see, and
    // margins stay deterministic
    val brutePairs = Similarity.bitextMarginMine(emb).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    Similarity.bitextMarginMineLsh(emb).collect().foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(a % 2 === 0L && b % 2 === 1L)
      assert(brutePairs.contains(a), s"LSH mined unknown anchor $a")
    }
  }

  test("bitextMarginMine: degenerate side with no positive " +
    "neighborhood mines nothing instead of dividing by zero") {
    val s = spark
    import s.implicits._
    // one A vector, one B vector, anti-aligned: the only cross cosine
    // is negative, so every k-NN sum (and the denominator) is negative
    val emb = Seq(
      (0L, Array(1f, 0f)),
      (1L, Array(-1f, 0f))).toDF("vec_id", "embedding")
    assert(Similarity.bitextMarginMine(emb).count() === 0L)
  }
}
