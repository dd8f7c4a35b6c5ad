package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Specs for the layout / sketch / mining operators added in round 11:
  * Z-order data skipping, CMS heavy hitters, contrastive triplet mining,
  * segment-voted language mix, and mergeable corpus-stats state. */
class LayoutSketchSpec extends SparkTestBase {

  private def docsDf(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.map { case (id, text) =>
      (id, text, "en", "srcA", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def embDf(rows: Seq[(Long, Seq[Float])]) = {
    val s = spark
    import s.implicits._
    rows.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
  }

  test("Layout.zValue: hand-checked Morton interleave — a=0b101, b=0b011 " +
    "→ 0b011011 = 27") {
    val s = spark
    import s.implicits._
    val out = Seq((5L, 3L)).toDF("qa", "qb")
      .select(Layout.zValue(col("qa"), col("qb"), 3).as("z"))
      .collect()(0).getLong(0)
    assert(out == 27L)
  }

  test("Layout.zorderSkippingReport: on a full 16×16 grid, the linear " +
    "layout prunes perfectly on its own column and not at all on the " +
    "other; z-order reads half the files for either column") {
    val s = spark
    import s.implicits._
    val grid = (0 until 256).map(i => (i % 16, i / 16))
      .toDF("a", "b")
    val out = Layout.zorderSkippingReport(grid, "a", "b",
      bits = 4, filePrefixBits = 2, nProbes = 4)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(("linear_a", "a")) == ((4L, 1.0, 0.25)))
    assert(out(("linear_a", "b")) == ((4L, 4.0, 1.0)))
    assert(out(("zorder", "a")) == ((4L, 2.0, 0.5)))
    assert(out(("zorder", "b")) == ((4L, 2.0, 0.5)))
  }

  test("TextAnalysis.tokenCmsAccuracy: estimates are never below exact " +
    "counts (CMS overestimate theorem); exact counts are right; row " +
    "count is min(topK, vocab)") {
    val docs = docsDf(Seq(
      1L -> "a a a b b c",
      2L -> "a b c d e f g h"))
    val rows = TextAnalysis.tokenCmsAccuracy(docs, depth = 4,
      width = 8, topK = 5).collect()
    assert(rows.length == 5) // vocab has 8 tokens, topK caps at 5
    val byTok = rows.map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(byTok("a")._1 == 4L && byTok("b")._1 == 3L)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"under-estimate at $r")
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1))
    }
    // a narrow width=2 table still never under-estimates
    TextAnalysis.tokenCmsAccuracy(docs, depth = 2, width = 2, topK = 8)
      .collect().foreach(r => assert(r.getLong(2) >= r.getLong(1)))
  }

  test("TextAnalysis.mgSummary: every token above N/(k+1) survives " +
    "(deterministic membership guarantee), estimates sit in " +
    "[true - N/(k+1), true], and the merged summary honors the bound " +
    "across adversarial partitioning; tokenHeavyExact agrees on the " +
    "threshold test") {
    val s = spark
    import s.implicits._
    // skewed stream: 'hot' 40x, 'warm' 12x, 30 singletons -> N = 82.
    // k=4: threshold N/5 = 16.4 — hot MUST survive; singletons can't.
    val toks = Seq.fill(40)("hot") ++ Seq.fill(12)("warm") ++
      (1 to 30).map(i => s"rare$i")
    def docs(parts: Int) = toks.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "srcA", 1L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(parts)
    for (parts <- Seq(1, 3, 7)) {
      val out = TextAnalysis.mgSummary(docs(parts), k = 4).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3)))).toMap
      assert(out.contains("hot"), s"hot survives at parts=$parts")
      val (est, n, bound) = out("hot")
      assert(n === 82L && bound === 82L / 5)
      assert(est <= 40L && est + bound >= 40L,
        s"hot estimate $est within [true-bound, true] at parts=$parts")
      assert(out.size <= 4, "never more than k survivors")
      out.foreach { case (tok, (e, _, b)) =>
        val truth = toks.count(_ == tok).toLong
        assert(e <= truth && e + b >= truth, s"$tok bound at $parts")
      }
    }
    // exact twin: integer-exact threshold membership
    val heavy = TextAnalysis.tokenHeavyExact(docs(3), k = 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(heavy === Set(("hot", 40L, 82L)),
      "only 'hot' exceeds N/5 = 16.4 exactly")
  }

  test("StreamingHeavy: the online MG summary honors the guarantee over " +
    "everything ingested — heavy token present, bounds hold vs exact " +
    "counts, state stays <= k+1 rows; replay refuses") {
    import graft.streaming.StreamingHeavy
    val s = spark
    import s.implicits._
    val toks = Seq.fill(40)("hot") ++ Seq.fill(12)("warm") ++
      (1 to 30).map(i => s"rare$i")
    def docs(ts: Seq[String]) = ts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "srcA", 1L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val stateDir = tmpDir("mg_state")
    // three uneven batches; 'hot' occurrences straddle all of them
    val batches = Seq(toks.take(20), toks.slice(20, 55), toks.drop(55))
    batches.zipWithIndex.foreach { case (b, i) =>
      assert(StreamingHeavy.applyBatch(spark, stateDir, docs(b), i.toLong,
        k = 4))
    }
    val out = StreamingHeavy.report(spark, stateDir, k = 4).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(out.size <= 4, "never more than k survivors")
    assert(out.contains("hot"), "the heavy token survives the stream")
    val (est, n, bound) = out("hot")
    assert(n === 82L && bound === 82L / 5)
    assert(est >= 40L - bound && est <= 40L, "hot online estimate")
    out.foreach { case (tok, (e, _, b)) =>
      val truth = toks.count(_ == tok).toLong
      assert(e <= truth && e + b >= truth, s"$tok online bound")
    }
    assert(!StreamingHeavy.applyBatch(spark, stateDir,
      docs(batches.last), 2L, k = 4), "replay refuses")
  }

  test("Similarity.hardNegatives: picks the nearest above-threshold " +
    "positive, the top-k below-threshold negatives in score order, " +
    "skips the dead band, and drops anchors with no positive") {
    val emb = embDf(Seq(
      0L -> Seq(1f, 0f),                        // anchor
      1L -> Seq(0.995f, 0.0999f),               // cos≈0.995 → positive
      2L -> Seq(0.4f, math.sqrt(0.84).toFloat), // cos=0.4 → dead band
      3L -> Seq(0.1f, math.sqrt(0.99).toFloat), // cos=0.1 → hardest neg
      4L -> Seq(0f, 1f),                        // cos=0 → neg rank 2
      5L -> Seq(-0.2f, -0.98f),                 // cos≈−0.2 → neg rank 3
      6L -> Seq(-1f, 0f)))                      // cos=−1 → beyond k=3
    val out = Similarity.hardNegatives(emb, col("vec_id") === 0,
      posThreshold = 0.5, negThreshold = 0.3, nNeg = 3)
      .orderBy("neg_rank").collect()
    assert(out.length == 3)
    assert(out.forall(_.getLong(1) == 1L)) // shared positive
    assert(out.map(r => r.getLong(4)).toSeq == Seq(3L, 4L, 5L))
    val negCos = out.map(_.getDouble(5)).toSeq
    assert(negCos == negCos.sorted.reverse && negCos.forall(_ < 0.3))
    // an anchor whose best candidate sits below posThreshold mines
    // nothing: no positive → no triplet rows at all
    val lonely = embDf(Seq(
      0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f), 2L -> Seq(-1f, 0f)))
    assert(Similarity.hardNegatives(lonely, col("vec_id") === 0,
      posThreshold = 0.5, negThreshold = 0.3, nNeg = 3).count() == 0)
  }

  test("Rfm.rfm: ten customers with staircase recency/frequency/spend " +
    "land in clean quintiles; best recency scores 5, heaviest spender " +
    "scores 5") {
    val s = spark
    import s.implicits._
    def d(day: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(2020, 1, 10).minusDays(day))
    // customer i: i orders, latest i-1 days before the corpus max date,
    // 10.00 per order → recency i-1, frequency i, monetary 1000·i
    val rows = (1 to 10).flatMap { i =>
      (d(i - 1) +: (1 until i).map(j => d(20 + j)).toSeq)
        .map(dt => (i.toLong, dt, 10.0))
    }
    val out = Rfm.rfm(rows.toDF("o_custkey", "o_orderdate", "o_totalprice"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(out(1L) == ((0L, 1L, 1000L, 5L, 1L, 1L, 511L)))
    assert(out(10L) == ((9L, 10L, 10000L, 1L, 5L, 5L, 155L)))
    assert(out(5L) == ((4L, 5L, 5000L, 3L, 3L, 3L, 333L)))
    // quintile histogram: each score band holds exactly two customers
    val fScores = out.values.map(_._5).groupBy(identity)
      .view.mapValues(_.size).toMap
    assert(fScores == Map(1L -> 2, 2L -> 2, 3L -> 2, 4L -> 2, 5L -> 2))
  }

  test("CorpusOps.lengthGini: an all-equal corpus reads exactly 0; a " +
    "one-doc-owns-everything corpus approaches (n-1)/n; hand-checked " +
    "two-value case") {
    val equal = CorpusOps.lengthGini(docsDf(
      (1L to 5L).map(i => i -> "a b c"))).collect().head
    assert(equal.getDouble(2) == 0.0)
    // 4 docs of 1 token + 1 doc of 96: G = [2Σi·x − 6·100]/(5·100)
    // ranks: 1..4 on the ones (avg rank formula), 5 on the giant
    // 2Σi·x = 1·1·(0+4+1)·... = Σ_v v·c·(2F+c+1): v=1: 1·4·(0+4+1)=20;
    // v=96: 96·1·(8+1+1)=960 → num = 980 − 600 = 380 → G = 0.76
    val skewed = CorpusOps.lengthGini(docsDf(Seq(
      1L -> "x", 2L -> "y", 3L -> "z", 4L -> "w",
      5L -> Seq.fill(96)("t").mkString(" ")))).collect().head
    assert((skewed.getLong(0), skewed.getLong(1)) == ((5L, 100L)))
    assert(skewed.getDouble(2) == 0.76)
  }

  test("TextAnalysis.splitShift: identical distributions across the " +
    "hash split read ~zero shift; disjoint vocabularies read a large " +
    "one") {
    val ids = (1L to 60L)
    val sameText = ids.map(_ -> "alpha beta gamma delta")
    val same = TextAnalysis.splitShift(docsDf(sameText.toSeq))
      .collect().head
    assert(math.abs(same.getDouble(5)) < 0.01,
      s"same-distribution shift: ${same.getDouble(5)}")
    // discover the hash split, then give each side its own vocabulary
    val assign = TextAnalysis.splitAssign(docsDf(sameText.toSeq),
      Seq("train" -> 0.8, "test" -> 0.2)).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(assign.values.toSet == Set("train", "test"))
    val disjoint = ids.map(i => i ->
      (if (assign(i) == "train") "aaa bbb ccc" else "xxx yyy zzz"))
    val out = TextAnalysis.splitShift(docsDf(disjoint.toSeq))
      .collect().head
    assert(out.getDouble(5) > 1.0,
      s"disjoint-vocab shift: ${out.getDouble(5)}")
    assert(out.getDouble(3) > out.getDouble(4)) // h_cross > h_self
  }

  test("Similarity.knnIvfPqRefined: exact re-scoring of the ADC " +
    "shortlist never loses a hit the raw ADC ranking had (a true " +
    "neighbor in the shortlist always outranks non-neighbors exactly)") {
    val s = spark
    import s.implicits._
    val emb = (0 until 24).map { i =>
      (i.toLong, (0 until 8).map(j =>
        (((i * 7 + j * 13) % 19) / 19.0f - 0.5f)), 0)
    }.toDF("vec_id", "embedding", "label")
    val pred = col("vec_id") < 4
    def hits(ann: org.apache.spark.sql.DataFrame) =
      Similarity.recallAtK(ann,
        Similarity.knnBrute(emb, pred, k = 3), k = 3).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val raw = hits(Similarity.knnIvfPq(emb, pred, k = 3,
      nlist = 4, nprobe = 2, m = 2, ksub = 4))
    val refined = hits(Similarity.knnIvfPqRefined(emb, pred, k = 3,
      refineK = 6, nlist = 4, nprobe = 2, m = 2, ksub = 4))
    raw.foreach { case (q, h) =>
      assert(refined(q) >= h, s"refine lost hits for query $q") }
  }

  test("Dedup.simhashPairs: banded candidates + exact bit_count equal " +
    "the brute-force hamming<=3 pair set (Manku completeness); " +
    "identical docs read distance 0") {
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo"
    val docs = docsDf(Seq(
      1L -> base, 2L -> base, // identical → distance 0
      3L -> (base + " sierra"), // one-token delta → small distance
      4L -> base.replace("alpha", "zulu"),
      5L -> "completely different words entirely here nothing shared",
      6L -> "another unrelated document with its own vocabulary set"))
    val fps = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- fps.keys; b <- fps.keys if a < b
      h = java.lang.Long.bitCount(fps(a) ^ fps(b)) if h <= 3
    } yield (a, b, h.toLong)).toSet
    val got = Dedup.simhashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute)
    assert(got.contains((1L, 2L, 0L))) // the identical pair is present
  }

  test("Basket.basketLift: hand-checked lift over deduped baskets; " +
    "sub-threshold pairs drop; duplicate lines collapse") {
    val s = spark
    import s.implicits._
    val li = Seq(
      (1L, 1L), (1L, 1L), (1L, 2L),  // o1 {1,2} (dup line collapses)
      (2L, 1L), (2L, 2L),            // o2 {1,2}
      (3L, 1L), (3L, 3L),            // o3 {1,3} → pair (1,3) support 1
      (4L, 2L),                      // o4 {2}
      (5L, 1L), (5L, 2L))            // o5 {1,2}
      .toDF("l_orderkey", "l_partkey")
    val out = Basket.basketLift(li, minPairSupport = 2).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((1L, 2L, 4L, 4L, 3L)))
    assert(r.getDouble(5) == 0.9375) // 3·5/(4·4)
  }

  test("Similarity.ivfClusterPurity: majority label per cell with " +
    "deterministic ties; a label-respecting cell reads purity 1.0") {
    val s = spark
    import s.implicits._
    val emb = Seq(
      (0L, Seq(1f, 0f), 0),   // centroid cell 0
      (1L, Seq(0f, 1f), 1),   // centroid cell 1
      (2L, Seq(0.9f, 0.1f), 0),
      (3L, Seq(0.8f, 0.2f), 1), // impure member of cell 0
      (4L, Seq(0.1f, 0.9f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.ivfClusterPurity(emb,
      Similarity.ivfSeedCentroids(emb, 2)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2),
        r.getLong(3), r.getDouble(4)))).toMap
    assert(out(0L) == ((3L, 0, 2L, 0.6667)))
    assert(out(1L) == ((2L, 1, 2L, 1.0)))
  }

  test("Similarity.pcaPower: recovers the dominant variance axis of an " +
    "anisotropic cloud despite a large mean offset; sign convention " +
    "makes the peak loading positive; the axis explains ~all variance") {
    val emb = embDf((0 until 21).map { i =>
      val t = (i % 7 - 3) / 3.0  // dominant axis, amplitude 3
      val u = (i % 5 - 2) / 2.0  // minor axis, amplitude 0.4
      i.toLong -> Seq((3 * t + 100).toFloat, (0.4 * u - 5).toFloat,
        0f, 0f)
    })
    val out = Similarity.pcaPower(emb, iters = 5).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(out.size == 4)
    assert(out(0L)._1 > 0.99, s"dominant loading: ${out(0L)._1}")
    assert(math.abs(out(1L)._1) < 0.1)
    assert(out(0L)._2 > 0.9) // explained share of total variance
  }

  test("Similarity.ivfOutliers: a vector orthogonal to every centroid " +
    "surfaces first; centroid members score exactly 1.0") {
    val emb = embDf(Seq(
      0L -> Seq(1f, 0f),      // centroid cell 0
      1L -> Seq(0f, 1f),      // centroid cell 1
      2L -> Seq(0.9f, 0.1f),  // near cell 0
      3L -> Seq(-1f, 0f)))    // closest cell is 1; cos to (0,1) = 0
    val out = Similarity.ivfOutliers(emb,
      Similarity.ivfSeedCentroids(emb, 2), k = 4).collect()
    assert(out.head.getLong(0) == 3L && out.head.getDouble(2) == 0.0)
    val byId = out.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(byId(0L) == 1.0 && byId(1L) == 1.0)
    assert(out.map(_.getDouble(2)).toSeq == // bottom-k ascending
      out.map(_.getDouble(2)).toSeq.sorted)
  }

  test("TextAnalysis.langMix: a doc with an English and a Spanish " +
    "segment is code-switched with a 0.5 minority share; monolingual " +
    "and all-unknown docs are not") {
    val docs = docsDf(Seq(
      1L -> "the the the que los los", // en segment + es segment
      2L -> "the the the",             // one en segment
      3L -> "1 2 3"))                  // unknown
    val out = TextAnalysis.langMix(docs, segTokens = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4), r.getBoolean(5)))).toMap
    assert(out(1L) == ((2L, 2L, "en", 0.5, true))) // tie → lexicographic
    assert(out(2L) == ((1L, 1L, "en", 0.0, false)))
    assert(out(3L) == ((1L, 0L, "unknown", 0.0, false)))
  }

  test("TextAnalysis.bpeTrain: the classic Sennrich corpus learns " +
    "(e,s) → (es,t) → (l,o) → (lo,w), ties broken lexicographically; " +
    "a shorter run is a prefix of a longer one") {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = docsDf(Seq(1L -> words.mkString(" ")))
    val got4 = TextAnalysis.bpeTrain(docs, nMerges = 4)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(got4 == Seq(
      (1, "e", "s", 9L),   // ties (e,s)/(s,t) at 9 → left asc
      (2, "es", "t", 9L),
      (3, "l", "o", 7L),   // ties (l,o)/(o,w) at 7 → left asc
      (4, "lo", "w", 7L)))
    val got2 = TextAnalysis.bpeTrain(docs, nMerges = 2)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(got2 == got4.take(2)) // merge r depends only on merges 1..r−1
  }

  test("TextAnalysis.zipfFit: an exact power-law corpus (cnt = 12/rank) " +
    "fits slope −1.0 to 4dp; an all-hapax corpus fits slope 0") {
    val words = Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")
    val out = TextAnalysis.zipfFit(docsDf(Seq(1L -> words.mkString(" "))))
      .collect().head
    assert(out.getLong(0) == 4L && out.getDouble(1) == -1.0)
    val flat = TextAnalysis.zipfFit(
      docsDf(Seq(1L -> "p q r s t"))).collect().head
    assert(flat.getLong(0) == 5L && flat.getDouble(1) == 0.0)
  }

  test("TextAnalysis.bpeEncode: under the classic fixture's merges, " +
    "'lowest' segments to [low, est] and 'newest' to [n, e, w, est]; " +
    "every encoding concatenates back to its word (round-trip)") {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val train = docsDf(Seq(1L -> words.mkString(" ")))
    val merges = TextAnalysis.bpeTrain(train, nMerges = 4)
    val s = spark
    import s.implicits._
    val enc = TextAnalysis.bpeEncodeWords(
      Seq("lowest", "newest", "q").toDF("word"), merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(enc("lowest") == Seq("low", "est"))
    assert(enc("newest") == Seq("n", "e", "w", "est"))
    assert(enc("q") == Seq("q")) // out-of-vocab char: untouched singleton
    enc.foreach { case (w, syms) => assert(syms.mkString == w) }
    // the per-doc rollup: "lowest newest" = 2 words, 12 chars, 2+4 tokens
    val out = TextAnalysis.bpeEncode(
      docsDf(Seq(7L -> "lowest newest")), merges).collect().head
    assert(out.getLong(1) == 2L && out.getLong(2) == 12L)
    assert(out.getLong(3) == 6L && out.getDouble(4) == 2.0)
  }

  test("StreamingStats: per-batch state merge equals the full recompute; " +
    "a replayed batch id is a no-op (idempotent apply)") {
    import graft.streaming.StreamingStats
    val s = spark
    import s.implicits._
    def docs(rows: (Long, String, String, String)*) =
      rows.map { case (id, text, lang, src) =>
        (id, text, lang, src, text.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val b0 = docs((1L, "a b c", "en", "s1"), (2L, "d e", "fr", "s1"))
    val b1 = docs((3L, "f g h i", "en", "s2"), (4L, "j", "en", "s1"))
    val stateDir = tmpDir("ss_state")
    assert(StreamingStats.applyBatch(spark, stateDir, b0, 0L))
    assert(StreamingStats.applyBatch(spark, stateDir, b1, 1L))
    val live = StreamingStats.report(spark, stateDir)
      .orderBy("source", "lang").collect().toSeq
    val full = CorpusOps.corpusStats(b0.unionByName(b1))
      .orderBy("source", "lang").collect().toSeq
    assert(live == full)
    // replay of batch 1 must refuse and leave the state untouched
    assert(!StreamingStats.applyBatch(spark, stateDir, b1, 1L))
    assert(StreamingStats.report(spark, stateDir)
      .orderBy("source", "lang").collect().toSeq == full)
    // and the streaming wiring end-to-end over a MemoryStream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, String, String, String, Long)]
    val stateDir2 = tmpDir("ss_state2")
    val q = StreamingStats.maintain(
      in.toDF().toDF("doc_id", "text", "lang", "source", "n_chars"),
      stateDir2, tmpDir("ss_ckpt"), Trigger.ProcessingTime(0))
    in.addData((1L, "a b c", "en", "s1", 5L), (2L, "d e", "fr", "s1", 3L))
    q.processAllAvailable()
    in.addData((3L, "f g h i", "en", "s2", 7L), (4L, "j", "en", "s1", 1L))
    q.processAllAvailable()
    q.stop()
    assert(StreamingStats.report(spark, stateDir2)
      .orderBy("source", "lang").collect().toSeq == full)
  }

  test("StreamingSample: the maintained weighted reservoir is " +
    "row-identical to a batch weightedSample over everything seen; a " +
    "replayed batch id refuses; the reservoir never exceeds k per source") {
    import graft.streaming.StreamingSample
    val s = spark
    import s.implicits._
    def docs(rows: (Long, String, Long)*) =
      rows.map { case (id, src, w) => (id, "x", "en", src, w) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    // enough docs per source that k=2 actually selects
    val b0 = docs((1L, "s1", 10L), (2L, "s1", 500L), (3L, "s2", 7L),
      (4L, "s1", 90L))
    val b1 = docs((5L, "s2", 1000L), (6L, "s1", 3L), (7L, "s2", 40L),
      (8L, "s2", 2L))
    val stateDir = tmpDir("wsample_state")
    assert(StreamingSample.applyBatch(spark, stateDir, b0, 0L,
      kPerSource = 2))
    assert(StreamingSample.applyBatch(spark, stateDir, b1, 1L,
      kPerSource = 2))
    val live = StreamingSample.report(spark, stateDir)
      .orderBy("source", "doc_id").collect().toSeq
    val full = CorpusOps.weightedSample(b0.unionByName(b1), kPerSource = 2)
      .orderBy("source", "doc_id").collect().toSeq
    assert(live == full, s"live $live\nfull $full")
    assert(live.groupBy(_.getString(1)).forall(_._2.size <= 2))
    // replay of batch 1 must refuse and leave the state untouched
    assert(!StreamingSample.applyBatch(spark, stateDir, b1, 1L,
      kPerSource = 2))
    assert(StreamingSample.report(spark, stateDir)
      .orderBy("source", "doc_id").collect().toSeq == full)
    // and the streaming wiring end-to-end over a MemoryStream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, String, String, String, Long)]
    val stateDir2 = tmpDir("wsample_state2")
    val q = StreamingSample.maintain(
      in.toDF().toDF("doc_id", "text", "lang", "source", "n_chars"),
      stateDir2, tmpDir("wsample_ckpt"), kPerSource = 2,
      Trigger.ProcessingTime(0))
    in.addData((1L, "x", "en", "s1", 10L), (2L, "x", "en", "s1", 500L),
      (3L, "x", "en", "s2", 7L), (4L, "x", "en", "s1", 90L))
    q.processAllAvailable()
    in.addData((5L, "x", "en", "s2", 1000L), (6L, "x", "en", "s1", 3L),
      (7L, "x", "en", "s2", 40L), (8L, "x", "en", "s2", 2L))
    q.processAllAvailable()
    q.stop()
    assert(StreamingSample.report(spark, stateDir2)
      .orderBy("source", "doc_id").collect().toSeq == full)
  }

  test("StreamingCms: the maintained sketch is bit-identical to the " +
    "batch-built sketch over everything seen; estimates never fall below " +
    "exact counts; a replayed batch id refuses (no double-counting)") {
    import graft.streaming.StreamingCms
    val s = spark
    import s.implicits._
    val b0 = docsDf(Seq(1L -> "a a a b b c", 2L -> "d e f"))
    val b1 = docsDf(Seq(3L -> "a b c d", 4L -> "g h"))
    val all = b0.unionByName(b1)
    val stateDir = tmpDir("cms_state")
    assert(StreamingCms.applyBatch(spark, stateDir, b0, 0L,
      depth = 4, width = 8))
    assert(StreamingCms.applyBatch(spark, stateDir, b1, 1L,
      depth = 4, width = 8))
    // merge(sketch(b0), sketch(b1)) ≡ sketch(b0 ∪ b1), counter for counter
    val live = spark.read
      .parquet(graft.streaming.MergeableState.current(spark, stateDir).get._2)
      .orderBy("d", "bucket").collect().toSeq
    val full = TextAnalysis.cmsState(all, depth = 4, width = 8)
      .orderBy("d", "bucket").collect().toSeq
    assert(live == full)
    // point estimates from the maintained state: >= exact, and for this
    // corpus the estimate of 'a' is at least its 4 occurrences
    val probes = Seq("a", "b", "g", "zzz").toDF("token")
    val est = StreamingCms.estimate(spark, stateDir, probes,
      depth = 4, width = 8).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Map("a" -> 4L, "b" -> 3L, "g" -> 1L, "zzz" -> 0L)
    exact.foreach { case (tok, n) =>
      assert(est(tok) >= n, s"under-estimate for $tok: ${est(tok)} < $n") }
    // replay of batch 1 must refuse — a double-counted batch would
    // inflate every touched counter
    assert(!StreamingCms.applyBatch(spark, stateDir, b1, 1L,
      depth = 4, width = 8))
    assert(spark.read
      .parquet(graft.streaming.MergeableState.current(spark, stateDir).get._2)
      .orderBy("d", "bucket").collect().toSeq == full)
    // and the estimate path agrees with tokenCmsAccuracy's n_est on the
    // same geometry (two formulations of the same counters)
    val acc = TextAnalysis.tokenCmsAccuracy(all, depth = 4, width = 8,
      topK = 10).select("token", "n_est").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est2 = StreamingCms.estimate(spark, stateDir,
      acc.keys.toSeq.toDF("token"), depth = 4, width = 8).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est2 == acc)
    // end-to-end over a MemoryStream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, String, String, String, Long)]
    val stateDir2 = tmpDir("cms_state2")
    val q = StreamingCms.maintain(
      in.toDF().toDF("doc_id", "text", "lang", "source", "n_chars"),
      stateDir2, tmpDir("cms_ckpt"), depth = 4, width = 8,
      trigger = Trigger.ProcessingTime(0))
    in.addData((1L, "a a a b b c", "en", "s1", 11L),
      (2L, "d e f", "en", "s1", 5L))
    q.processAllAvailable()
    in.addData((3L, "a b c d", "en", "s2", 7L), (4L, "g h", "en", "s1", 3L))
    q.processAllAvailable()
    q.stop()
    assert(spark.read
      .parquet(graft.streaming.MergeableState.current(spark, stateDir2).get._2)
      .orderBy("d", "bucket").collect().toSeq == full)
  }

  test("Dedup.pageRank: a symmetric duplicate pair is a fixed point at " +
    "the initial mass; an isolated doc sits at the damping baseline") {
    val dup = "alpha beta gamma delta epsilon"
    val docs = docsDf(Seq(
      1L -> dup, 2L -> dup, // identical → LSH pair in every band
      3L -> "zeta eta theta iota kappa")) // no shared shingles
    val out = Dedup.pageRank(docs, iterations = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // pair: each round v receives (85·10⁶) DIV (100·1) = 850000, plus
    // the 150000 baseline → exactly 10⁶ again: a fixed point
    assert(out(1L) == ((1L, 1000000L)))
    assert(out(2L) == ((1L, 1000000L)))
    // isolated: degree 0, no inflow, baseline only
    assert(out(3L) == ((0L, 150000L)))
  }

  test("CorpusOps.statsState/Merge/Finalize: merging disjoint shard " +
    "states equals the full recompute — the MV-maintenance identity") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c", "en", "s1", 5L), (2L, "d e", "en", "s1", 3L),
      (3L, "f", "fr", "s1", 1L), (4L, "g h i j", "en", "s2", 7L),
      (5L, "k", "fr", "s2", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val full = CorpusOps.corpusStats(docs)
      .orderBy("source", "lang").collect().toSeq
    val merged = CorpusOps.statsFinalize(CorpusOps.statsMerge(Seq(
      CorpusOps.statsState(docs.filter(col("doc_id") <= 2)),
      CorpusOps.statsState(docs.filter(col("doc_id") === 3)),
      CorpusOps.statsState(docs.filter(col("doc_id") >= 4)))))
      .orderBy("source", "lang").collect().toSeq
    assert(merged == full)
  }

  test("Layout.withHilbert: the staged xy2d walk is a bijection onto " +
    "[0, 4^bits) whose d-order neighbors are ALWAYS grid-adjacent (the " +
    "property Morton lacks), and matches the reference walk per point") {
    val s = spark
    import s.implicits._
    // reference implementation (Wikipedia xy2d), evaluated driver-side
    def xy2d(n: Int, x0: Int, y0: Int): Long = {
      var (x, y, d) = (x0, y0, 0L)
      var sBit = n / 2
      while (sBit > 0) {
        val rx = if ((x & sBit) > 0) 1 else 0
        val ry = if ((y & sBit) > 0) 1 else 0
        d += sBit.toLong * sBit * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
          val t = x; x = y; y = t
        }
        sBit /= 2
      }
      d
    }
    // full 16×16 grid at bits=4
    val grid = (for (a <- 0 until 16; b <- 0 until 16)
      yield (a.toLong, b.toLong)).toDF("qa", "qb")
    val out = Layout.withHilbert(grid, "qa", "qb", bits = 4, "d")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    assert(out.map(_._2).sorted.toSeq === (0L until 256L),
      "bijection onto [0, 256)")
    out.foreach { case ((a, b), d) =>
      assert(d === xy2d(16, a.toInt, b.toInt),
        s"($a,$b) matches the reference walk") }
    // the Hilbert property: consecutive d → Manhattan distance exactly 1
    val byD = out.sortBy(_._2).map(_._1)
    byD.sliding(2).foreach { case Array((a1, b1), (a2, b2)) =>
      assert((a1 - a2).abs + (b1 - b2).abs === 1L,
        "d-order neighbors are grid-adjacent") }
    // Morton, for contrast, has seams: at least one consecutive pair of
    // z-values jumps more than 1 step in the grid
    val mort = grid.select(col("qa"), col("qb"),
        Layout.zValue(col("qa"), col("qb"), 4).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .sortBy(_._2).map(_._1)
    assert(mort.sliding(2).exists { case Array((a1, b1), (a2, b2)) =>
      (a1 - a2).abs + (b1 - b2).abs > 1L })
  }
}
