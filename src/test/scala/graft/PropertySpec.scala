package graft

import org.apache.spark.sql.functions._

import graft.operators.CdrOps

/** Property-style tests over the CDR field algebra (SURVEY §5.1), using
  * seeded random records (the offline cache has no scalatest↔scalacheck
  * bridge): masking preserves arity and non-target fields; drops remove
  * exactly the targets; parse/rejoin round-trips. */
class PropertySpec extends SparkTestBase {
  import CdrOps._

  private val rnd = new scala.util.Random(42)

  private def token(): String = {
    val n = rnd.nextInt(9)
    (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
  }
  private def record(): List[String] =
    List.fill(1 + rnd.nextInt(20))(token())

  private def df(fields: Seq[Seq[String]]) = {
    val s = spark
    import s.implicits._
    fields.map(_.mkString("|")).toDF("value")
  }

  test("property: masking preserves arity and every non-target field " +
    "(20 random trials, incl. out-of-range indexes)") {
    for (_ <- 1 to 20) {
      val recs = List.fill(5)(record())
      val idx = rnd.nextInt(26)
      val out = rejoin(maskFields(parseDelim(df(recs), "|"), Seq(idx)),
        "|").select("value").collect().map(_.getString(0))
      out.zip(recs).foreach { case (masked, orig) =>
        val mf = masked.split("\\|", -1)
        assert(mf.length == orig.length)
        orig.zipWithIndex.foreach { case (f, i) =>
          if (i == idx) assert(mf(i) == md5hex(f))
          else assert(mf(i) == f)
        }
      }
    }
  }

  test("property: dropFields removes exactly the targeted positions") {
    for (_ <- 1 to 20) {
      val recs = List.fill(5)(record())
      val idx = rnd.nextInt(26)
      val out = rejoin(dropFields(parseDelim(df(recs), "|"), Seq(idx)),
        "|").select("value").collect().map(_.getString(0))
      out.zip(recs).foreach { case (dropped, orig) =>
        val expect = orig.zipWithIndex.filterNot(_._2 == idx).map(_._1)
        assert(dropped.split("\\|", -1).toSeq == expect ||
          (expect.isEmpty && dropped == ""))
      }
    }
  }

  test("property: parse/rejoin round-trips any record") {
    for (_ <- 1 to 10) {
      val recs = List.fill(8)(record())
      val out = rejoin(parseDelim(df(recs), "|"), "|")
        .select("value").collect().map(_.getString(0)).toSeq
      assert(out == recs.map(_.mkString("|")))
    }
  }

  test("SQL users get dot_product via GraftExtensions injection") {
    val r = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head.getDouble(0)
    assert(r == 11.0)
    // null on length mismatch, through SQL
    assert(spark.sql(
      "SELECT dot_product(array(1.0D), array(1.0D, 2.0D)) AS d")
      .head.isNullAt(0))
  }

  test("property: lineDedup matches a driver-side reference on random " +
    "multi-line corpora (5 seeded trials)") {
    val s = spark
    import s.implicits._
    val linePool = Vector("shared banner one", "shared banner two",
      "common footer", "x", "  padded line  ")
    for (trial <- 1 to 5) {
      val docs = (1 to 12).map { id =>
        val n = 1 + rnd.nextInt(5)
        val lines = (0 until n).map { _ =>
          if (rnd.nextBoolean()) linePool(rnd.nextInt(linePool.size))
          else s"unique $trial $id ${token()}"
        }
        (id.toLong, lines.mkString("\n"))
      }
      val maxDocs = 1 + rnd.nextInt(3)
      val minChars = 1 + rnd.nextInt(3)
      // driver-side reference: same contract, scala collections
      val eligible = (l: String) => l.trim.length >= minChars
      val firstDoc = docs
        .flatMap { case (id, t) => t.split("\n", -1).map(l => (l.trim, id)) }
        .filter { case (l, _) => eligible(l) }
        .groupBy(_._1)
        .collect { case (l, xs) if xs.map(_._2).distinct.size > maxDocs =>
          l -> xs.map(_._2).min }
      val expect = docs.map { case (id, t) =>
        val ls = t.split("\n", -1)
        val kept = ls.filter(l => !eligible(l) ||
          firstDoc.get(l.trim).forall(_ == id))
        id -> ((kept.mkString("\n"), ls.length.toLong,
          (ls.length - kept.length).toLong))
      }.toMap
      val got = graft.operators.Dedup.lineDedup(
        docs.map { case (id, t) => (id, t, "en", "srcA", t.length.toLong) }
          .toDF("doc_id", "text", "lang", "source", "n_chars"),
        sep = "\n", maxDocs = maxDocs, minChars = minChars)
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
          r.getLong(3)))).toMap
      assert(got == expect, s"trial $trial maxDocs=$maxDocs " +
        s"minChars=$minChars")
    }
  }

  test("property: spanDedup matches a driver-side reference on random " +
    "corpora with planted copied spans (5 seeded trials)") {
    val s = spark
    import s.implicits._
    val pool = Vector("alpha", "beta", "gamma", "delta", "eps")
    for (trial <- 1 to 5) {
      val L = 3 + rnd.nextInt(3) // 3..5
      val planted = Vector.fill(L + rnd.nextInt(3))(
        s"span$trial${rnd.nextInt(3)}")
      val docs = (1 to 10).map { id =>
        // >= 1 draw: an empty text would round-trip as one empty token
        // through split, which the array-side reference can't mirror
        val n = 1 + rnd.nextInt(12)
        val toks = (0 until n).flatMap { _ =>
          if (rnd.nextInt(4) == 0) planted // plant the copy mid-doc
          else Seq(pool(rnd.nextInt(pool.size)))
        }
        (id.toLong, toks.toArray)
      }
      // driver-side reference: window census → canonical → coverage
      val wins = docs.flatMap { case (id, toks) =>
        if (toks.length >= L)
          (0 to toks.length - L).map(st =>
            (toks.slice(st, st + L).mkString(" "), (id, st)))
        else Nil
      }
      val dupStarts = wins.groupBy(_._1).values.filter(_.size > 1)
        .flatMap { occs =>
          val canon = occs.map(_._2)
            .minBy { case (id, st) => id * 1000000000L + st }
          occs.map(_._2).filterNot(_ == canon)
        }
        .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).toSet }
      val expect = docs.map { case (id, toks) =>
        val starts = dupStarts.getOrElse(id, Set.empty[Int])
        val removed = toks.indices
          .map(p => starts.exists(st => st <= p && p <= st + L - 1))
        val kept = toks.indices.filterNot(removed).map(toks)
        id -> ((kept.mkString(" "), toks.length.toLong,
          removed.count(identity).toLong))
      }.toMap
      val got = graft.operators.Dedup.spanDedup(
        docs.map { case (id, toks) =>
          val t = toks.mkString(" ")
          (id, t, "en", "srcA", t.length.toLong)
        }.toDF("doc_id", "text", "lang", "source", "n_chars"),
        spanTokens = L)
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
          r.getLong(3)))).toMap
      assert(got == expect, s"trial $trial L=$L")
    }
  }

  test("property: dsirWeights with the target covering the whole corpus " +
    "scores every bucket ratio 1 — all weights exactly zero") {
    val s = spark
    import s.implicits._
    val docs = (1 to 8).map { id =>
      val t = List.fill(3 + rnd.nextInt(5))(token()).mkString(" ")
      (id.toLong, t, "en", "srcA", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.operators.TextAnalysis.dsirWeights(docs,
      targetLang = "en").collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(2) == 0L && !r.getBoolean(4)))
  }

  test("property: incrementalDedup equals set-difference semantics on " +
    "random overlapping batches, bloom sized from 8 bits to defaults") {
    val s = spark
    import s.implicits._
    def mk(ids: Seq[Long], texts: Seq[String]) =
      ids.zip(texts).map { case (id, t) =>
        (id, t, "en", "srcA", t.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
    for (trial <- 1 to 5) {
      val pool = Vector.fill(12)(s"$trial ${token()} ${token()}")
      val knownTexts = Seq.fill(8)(pool(rnd.nextInt(pool.size)))
      val newTexts = Seq.fill(8)(pool(rnd.nextInt(pool.size)))
      val known = mk((1L to 8L), knownTexts)
      val fresh = mk((101L to 108L), newTexts)
      val expect = (101L to 108L).zip(newTexts)
        .collect { case (id, t) if !knownTexts.contains(t) => id }.toSet
      val bits = if (trial % 2 == 0) 8L else 1L << 23
      val got = graft.operators.Dedup.incrementalDedup(fresh, known,
        estimatedItems = 8, numBits = bits)
        .collect().map(_.getLong(0)).toSet
      assert(got == expect, s"trial $trial bits=$bits")
    }
  }

  test("property: retrieval and sweep results are invariant under " +
    "repartitioning (retry/speculation stability)") {
    val s = spark
    import s.implicits._
    val words = Seq("hash", "join", "window", "scan", "merge", "row",
      "batch", "sort", "filter")
    def text(): String =
      List.fill(5 + rnd.nextInt(30))(words(rnd.nextInt(words.size)))
        .mkString(" ")
    val docs = (1L to 60L).map(i => (i, text(), "en", "srcA"))
      .map { case (i, t, l, src) => (i, t, l, src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val terms = Seq("hash", "join", "window")
    val base = graft.operators.TextAnalysis
      .bm25Search(docs, terms, k = 10).collect().toSeq
    val shuffled = graft.operators.TextAnalysis
      .bm25Search(docs.repartition(7), terms, k = 10).collect().toSeq
    assert(base == shuffled, "bm25 ranking must not depend on layout")
    val sweepA = graft.operators.Dedup.thresholdSweep(docs)
      .collect().sortBy(_.getDouble(0)).toSeq
    val sweepB = graft.operators.Dedup.thresholdSweep(docs.repartition(5))
      .collect().sortBy(_.getDouble(0)).toSeq
    assert(sweepA == sweepB, "sweep counts must not depend on layout")
  }

  test("property: bm25Search matches a driver-side reference " +
    "implementation on random corpora (20 trials)") {
    val s = spark
    import s.implicits._
    val pool = Seq("hash", "join", "window", "scan", "merge", "row",
      "batch", "sort", "filter", "agg")
    val terms = Seq("hash", "join", "window")
    val k1 = 1.2; val b = 0.75
    for (_ <- 1 to 20) {
      val corpus = (1L to (10 + rnd.nextInt(40)).toLong).map(i =>
        i -> List.fill(3 + rnd.nextInt(25))(pool(rnd.nextInt(pool.size)))
          .mkString(" "))
      val docs = corpus.map { case (i, t) =>
        (i, t, "en", "srcA", t.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      val got = graft.operators.TextAnalysis
        .bm25Search(docs, terms, k = corpus.size).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // independent reference: same formula, plain Scala over the seq
      val toks = corpus.map { case (id, t) => id -> t.split(" ", -1).toSeq }
      val n = toks.size.toDouble
      val avgdl = toks.map(_._2.size).sum.toDouble / n
      val dfs = terms.map(t =>
        t -> toks.count(_._2.contains(t)).toDouble).toMap
      val want = toks.flatMap { case (id, ws) =>
        val dl = ws.size.toDouble
        val score = terms.map { t =>
          val tf = ws.count(_ == t).toDouble
          val idf = math.log((n - dfs(t) + 0.5) / (dfs(t) + 0.5) + 1)
          idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        }.sum
        if (score > 0) Some(id -> math.rint(score * 1e4) / 1e4) else None
      }.toMap
      assert(got.keySet == want.keySet)
      got.foreach { case (id, v) =>
        assert(math.abs(v - want(id)) < 1e-9,
          s"doc $id: spark=$v ref=${want(id)}")
      }
    }
  }

  test("property: funnel matches a driver-side reference on random event " +
    "streams (20 trials)") {
    val s = spark
    import s.implicits._
    val types = Seq("view", "click", "purchase", "error", "signup")
    val steps = Seq("view", "click", "purchase")
    for (_ <- 1 to 20) {
      val ev = (1 to (30 + rnd.nextInt(120))).map { i =>
        (i.toLong, (1 + rnd.nextInt(12)).toLong,
          new java.sql.Timestamp(1700000000000L + rnd.nextInt(100000) * 100L),
          types(rnd.nextInt(types.size)))
      }
      val df = ev.toDF("event_id", "user_id", "ts", "event_type")
      val got = graft.operators.Funnels.funnel(df, steps).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      // reference: per user, walk steps taking the min qualifying ts
      // strictly after the previous step's chosen ts
      val byUser = ev.groupBy(_._2)
      val reached = steps.indices.map { upto =>
        byUser.count { case (_, rows) =>
          var prev = Long.MinValue
          var ok = true
          for (si <- 0 to upto if ok) {
            val cands = rows.filter(r => r._4 == steps(si) &&
              (si == 0 || r._3.getTime > prev)).map(_._3.getTime)
            if (cands.isEmpty) ok = false else prev = cands.min
          }
          ok
        }.toLong
      }
      assert(got == steps.indices.map(i => (i + 1).toLong -> reached(i))
        .toMap, s"events: ${ev.size}")
    }
  }

  test("property: transitionMatrix matches a driver-side reference on " +
    "random event streams (20 trials); p sums to 1 per from_type") {
    val s = spark
    import s.implicits._
    val types = Seq("view", "click", "purchase", "error")
    for (_ <- 1 to 20) {
      val ev = (1 to (20 + rnd.nextInt(100))).map { i =>
        (i.toLong, (1 + rnd.nextInt(8)).toLong,
          new java.sql.Timestamp(1700000000000L + rnd.nextInt(5000) * 100L),
          types(rnd.nextInt(types.size)))
      }
      val df = ev.toDF("event_id", "user_id", "ts", "event_type")
      val got = graft.operators.Funnels.transitionMatrix(df).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
      val ref = ev.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
        val sorted = rows.sortBy(r => (r._3.getTime, r._1))
        sorted.zip(sorted.drop(1)).map { case (a, b) => (a._4, b._4) }
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val fromTotals =
        ref.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      assert(got.keySet == ref.keySet)
      for ((k, (n, p)) <- got) {
        assert(n == ref(k), s"count mismatch at $k")
        // HALF_UP like Spark's round() — a 13/32-style quotient lands
        // exactly on a .5 boundary where rint's half-even disagrees
        val expect = BigDecimal(n.toDouble / fromTotals(k._1))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(p == expect, s"probability mismatch at $k")
      }
    }
  }

  test("property: containment bounds — each side's containment sits in " +
    "[jaccard, 1] on random docs (20 trials)") {
    val s = spark
    import s.implicits._
    val vocab = Seq("a", "b", "c", "d", "e", "f", "g", "h")
    for (_ <- 1 to 20) {
      val docs = (1L to 6L).map { id =>
        val text = (0 until (3 + rnd.nextInt(10)))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
        (id, text, "en", "src", text.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      val pairs = (for (a <- 1L to 6L; b <- (a + 1) to 6L) yield (a, b))
        .toDF("doc_a", "doc_b")
      val cont = graft.operators.Dedup.containmentOn(docs, pairs).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getDouble(2), r.getDouble(3)))).toMap
      val jac = graft.operators.Dedup.ngramJaccardOn(docs, pairs).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      for ((k, (ca, cb)) <- cont) {
        assert(ca <= 1.0 && cb <= 1.0)
        // both independently rounded 4dp: allow one rounding step of slack
        assert(ca >= jac(k) - 0.00011 && cb >= jac(k) - 0.00011,
          s"containment below jaccard at $k: $ca / $cb vs ${jac(k)}")
      }
    }
  }

  test("property: heavyUsers flag equals the exact integer predicate on " +
    "random user activity (20 trials)") {
    val s = spark
    import s.implicits._
    for (_ <- 1 to 20) {
      val ev = (1 to (30 + rnd.nextInt(200))).map { i =>
        ((1 + rnd.nextInt(10)).toLong,
          new java.sql.Timestamp(1700000000000L + i * 1000L))
      }
      val df = ev.toDF("user_id", "ts")
      val counts = ev.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val users = counts.size.toLong
      val total = counts.values.sum
      val got = graft.operators.Funnels.heavyUsers(df).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
      assert(got.keySet == counts.keySet)
      for ((u, (n, heavy)) <- got) {
        assert(n == counts(u))
        val expect = if (n * users * 4 > 5 * total) 1L else 0L
        assert(heavy == expect, s"flag mismatch for user $u")
      }
    }
  }

  test("property: abSignificance chi2 matches a driver-side computation " +
    "off the segmented funnel counts (20 trials, incl. degenerate arms)") {
    val s = spark
    import s.implicits._
    val types = Seq("view", "click", "purchase", "error")
    val steps = Seq("view", "click", "purchase")
    val seg = when(pmod(col("user_id"), lit(2)) === 0, lit("even"))
      .otherwise(lit("odd"))
    def round4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (_ <- 1 to 20) {
      val ev = (1 to (20 + rnd.nextInt(100))).map { i =>
        (i.toLong, (1 + rnd.nextInt(10)).toLong,
          new java.sql.Timestamp(1700000000000L + rnd.nextInt(100000) * 100L),
          types(rnd.nextInt(types.size)))
      }
      val df = ev.toDF("event_id", "user_id", "ts", "event_type")
      val f = graft.operators.Funnels.funnelBySegment(df, steps, seg)
        .collect().map(r => (r.getLong(0), r.getString(2)) -> r.getLong(3))
        .toMap
      val segs = f.keys.map(_._2).toSeq.distinct.sorted
      val out = graft.operators.Funnels.abSignificance(df, steps, seg)
        .collect().head
      assert(out.getLong(10) == segs.size.toLong)
      val (sa, sb) = (segs.head, segs.last)
      val (na, ca) = (f((1L, sa)), f.getOrElse((3L, sa), 0L))
      val (nb, cb) = (f((1L, sb)), f.getOrElse((3L, sb), 0L))
      assert(out.getString(0) == sa && out.getString(1) == sb)
      assert(out.getLong(2) == na && out.getLong(3) == ca)
      assert(out.getLong(4) == nb && out.getLong(5) == cb)
      val (a, b, c, d) = (ca.toDouble, (na - ca).toDouble,
        cb.toDouble, (nb - cb).toDouble)
      val den = (a + b) * (c + d) * ((a + c) * (b + d))
      if (den == 0.0) assert(out.isNullAt(8), "chi2 must be null on a " +
        s"zero margin: a=$a b=$b c=$c d=$d")
      else {
        val chi2 = round4((na + nb).toDouble *
          ((a * d - b * c) * (a * d - b * c)) / den)
        assert(out.getDouble(8) == chi2,
          s"chi2 ${out.getDouble(8)} != $chi2 for a=$a b=$b c=$c d=$d")
        assert(chi2 >= 0.0)
        assert(out.getBoolean(9) == (chi2 >= 3.8415))
      }
    }
  }

  test("property: bigramLogProb matches a driver-side reference model " +
    "on random small-vocab corpora (20 trials)") {
    val s = spark
    import s.implicits._
    val vocab = Seq("a", "b", "c")
    def round0(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def round4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (_ <- 1 to 20) {
      val docs = (1 to (3 + rnd.nextInt(6))).map { id =>
        (id.toLong, List.fill(1 + rnd.nextInt(8))(
          vocab(rnd.nextInt(vocab.size))).mkString(" "),
          "en", "srcA", 0L)
      }
      val df = docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      val got = graft.operators.TextAnalysis.bigramLogProb(df).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
          r.getDouble(3))).toMap
      // reference model over the same corpus
      val bigrams = docs.flatMap { case (id, text, _, _, _) =>
        val w = text.split(" ", -1)
        w.zip(w.drop(1)).map { case (x, y) => (id, x, s"$x $y") }
      }
      val pairCnt = bigrams.groupBy(_._3).view.mapValues(_.size).toMap
      val prefCnt = bigrams.groupBy(_._2).view.mapValues(_.size).toMap
      val expect = bigrams.groupBy(_._1).map { case (id, bs) =>
        val micros = bs.map { case (_, w1, bg) =>
          round0(math.log(pairCnt(bg).toDouble / prefCnt(w1)) * 1e8)
        }
        id -> ((bs.size.toLong, micros.sum,
          round4(micros.sum.toDouble / (bs.size * 1e8))))
      }
      assert(got == expect, s"docs: ${docs.map(_._2)}")
    }
  }

  test("property: lshBandCurve probabilities stay in [0, 1] micro-units " +
    "with expected catch bounded by the pair count, monotone in bands") {
    val s = spark
    import s.implicits._
    for (_ <- 1 to 5) {
      // near-dup-rich corpus so candidates exist: pairs of mutated twins
      val base = List.fill(8)(List.fill(6 + rnd.nextInt(6))(
        ('a' + rnd.nextInt(4)).toChar.toString).mkString(" "))
      val docs = base.zipWithIndex.flatMap { case (t, i) =>
        Seq((i * 2L, t), (i * 2L + 1, t + " tail" + rnd.nextInt(2)))
      }.map { case (id, t) => (id, t, "en", "srcA", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val rows = graft.operators.Dedup
        .lshBandCurve(docs, configs = Seq((2, 2), (4, 2), (8, 2)))
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      if (rows.nonEmpty) {
        rows.foreach { case ((bds, rpb), (np, ex, nl)) =>
          assert(ex >= 0L && ex <= 10000L * np,
            s"($bds,$rpb): expected_x10k $ex outside [0, ${10000 * np}]")
          assert(nl >= 0L && nl <= np)
        }
        assert(rows((2L, 2L))._2 <= rows((4L, 2L))._2)
        assert(rows((4L, 2L))._2 <= rows((8L, 2L))._2)
      }
    }
  }

  test("property: interarrivalHist gap count equals sum over users of " +
    "(n_events - 1); shares are each bucket's exact integral quotient") {
    val s = spark
    import s.implicits._
    for (_ <- 1 to 10) {
      val ev = (1 to (20 + rnd.nextInt(80))).map { i =>
        (i.toLong, (1 + rnd.nextInt(8)).toLong,
          new java.sql.Timestamp(1700000000000L +
            rnd.nextInt(10000000).toLong * 10L))
      }
      val df = ev.toDF("event_id", "user_id", "ts")
      val rows = graft.operators.Funnels.interarrivalHist(df).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      val expectGaps = ev.groupBy(_._2).map(_._2.size - 1).sum.toLong
      assert(rows.map(_._2).sum == expectGaps)
      def round4(x: Double) = BigDecimal(x)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      rows.foreach { case (_, n, share) =>
        assert(share == round4(n.toDouble / expectGaps))
      }
    }
  }

  test("property: vocabCoverage counts are exact on random corpora and " +
    "invariant under doc order") {
    val s = spark
    import s.implicits._
    for (_ <- 1 to 10) {
      val vocab = Seq("a", "b", "c", "d", "e")
      val docs = (1 to (3 + rnd.nextInt(6))).map { id =>
        (id.toLong, List.fill(1 + rnd.nextInt(10))(
          vocab(rnd.nextInt(vocab.size))).mkString(" "),
          "en", "srcA", 0L)
      }
      val df = docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      val out = graft.operators.TextAnalysis.vocabCoverage(df, k = 3)
        .collect().head
      val toks = docs.flatMap(_._2.split(" ", -1))
      val counts = toks.groupBy(identity).view.mapValues(_.size).toMap
      assert(out.getLong(0) == toks.size.toLong)
      assert(out.getLong(1) == counts.size.toLong)
      assert(out.getLong(4) == counts.values.count(_ == 1).toLong)
      val topk = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(3)
        .map(_._2).sum
      def round4(x: Double) = BigDecimal(x)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out.getDouble(3) == round4(topk.toDouble / toks.size))
      // doc order must not matter (the cut is (cnt DESC, token)-total)
      val shuffled = scala.util.Random.javaRandomToRandom(
        new java.util.Random(7)).shuffle(docs)
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      assert(graft.operators.TextAnalysis.vocabCoverage(shuffled, k = 3)
        .collect().head.toSeq == out.toSeq)
    }
  }

  test("property: CMS estimates dominate exact counts on random corpora " +
    "at every geometry, and a reference CMS built driver-side agrees") {
    val s = spark
    import s.implicits._
    val prnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val vocabSize = 3 + prnd.nextInt(10)
      val words = (0 until vocabSize).map(i => s"w${i}t$trial")
      val docs = (1L to 4L).map(id => (id,
        List.fill(5 + prnd.nextInt(20))(
          words(prnd.nextInt(words.size))).mkString(" "),
        "en", "srcA", 1L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val (depth, width) = (1 + prnd.nextInt(4), 2 + prnd.nextInt(30))
      val got = graft.operators.TextAnalysis
        .tokenCmsAccuracy(docs, depth, width, topK = vocabSize).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      // driver-side reference: identical hash family over exact counts
      val exact = docs.collect().flatMap(_.getString(1).split(" "))
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      def bucket(d: Int, tok: String): Long =
        java.lang.Long.parseLong(md5hex(s"$d:$tok").take(8), 16) % width
      val cms = Array.fill(depth, width)(0L)
      exact.foreach { case (tok, n) =>
        (0 until depth).foreach(d => cms(d)(bucket(d, tok).toInt) += n) }
      got.foreach { case (tok, (nExact, nEst)) =>
        assert(nExact == exact(tok))
        val ref = (0 until depth)
          .map(d => cms(d)(bucket(d, tok).toInt)).min
        assert(nEst == ref, s"estimate mismatch for $tok")
        assert(nEst >= nExact)
      }
    }
  }

  test("property: zValue is a bijection on the quantized grid — distinct " +
    "(qa, qb) pairs always get distinct z, and z stays within 2·bits bits") {
    val s = spark
    import s.implicits._
    val bits = 5
    val grid = for (a <- 0 until 32; b <- 0 until 32) yield (a.toLong, b.toLong)
    val zs = grid.toDF("qa", "qb")
      .select(graft.operators.Layout.zValue(col("qa"), col("qb"), bits)
        .as("z")).collect().map(_.getLong(0))
    assert(zs.distinct.length == grid.length)
    assert(zs.forall(z => z >= 0 && z < (1L << (2 * bits))))
  }

  test("property: pageRank mass and floors — every node is at least the " +
    "damping baseline and total mass never exceeds the initial total " +
    "(integer floors only leak mass, never mint it)") {
    val s = spark
    import s.implicits._
    val prnd = new scala.util.Random(5)
    // random corpus with planted duplicate groups of varying size
    val texts = (0 until 6).map(g =>
      List.fill(8)(s"g$g w${prnd.nextInt(3)}").mkString(" "))
    val docs = (0L until 18L).map(id =>
      (id, texts(prnd.nextInt(texts.size)), "en", "srcA", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.operators.Dedup.pageRank(docs, iterations = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.forall(_._2 >= 150000L))
    assert(out.map(_._2).sum <= 18L * 1000000L)
    // isolated nodes (degree 0) sit exactly at the baseline
    out.filter(_._1 == 0L).foreach(p => assert(p._2 == 150000L))
  }

  test("salted aggregation equals the direct aggregation") {
    val s = spark
    import s.implicits._
    // skewed: 90% of rows on one key
    val rows = (1 to 900).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"cold${i % 7}", i.toLong))
    val df = rows.toDF("k", "v")
    val direct = df.groupBy("k").agg(count(lit(1)).as("n"),
      sum("v").as("total")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val sc = graft.operators.Skew.saltedCount(df, col("k"), col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ss = graft.operators.Skew.saltedSum(df, col("k"), col("v"), col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    direct.foreach { case (k, (n, total)) =>
      assert(sc(k) == n)
      assert(ss(k) == total)
    }
  }
}
