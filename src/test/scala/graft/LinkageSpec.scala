package graft

import org.apache.spark.sql.functions._
import graft.operators.Linkage

class LinkageSpec extends SparkTestBase {

  private def dict(names: String*) = {
    val s = spark
    import s.implicits._
    names.toDF("name")
  }

  private def queries(rows: (Long, String, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("q_id", "q_name", "true_name")
  }

  test("linkEntities: best match within block, deterministic tie-break, " +
    "no cross-block candidates") {
    val d = dict("red widget", "red wedge", "blue bolt")
    val q = queries(
      (1L, "red widgett", "red widget"), // 1 edit from red widget
      (2L, "red wodge", "red wedge"),    // 1 edit from red wedge
      (3L, "zinc plate", "zinc plate"))  // block 'z' empty → unmatched
    val out = Linkage.linkEntities(q, d).collect()
      .map(r => r.getAs[Long]("q_id") -> (r.getAs[String]("matched_name"),
        r.getAs[Long]("lev"))).toMap
    assert(out(1L) == ("red widget", 1L))
    assert(out(2L) == ("red wedge", 1L))
    assert(!out.contains(3L)) // blocking means no candidate, not a bad match
    // equidistant tie → lexicographically smaller name wins (portable order)
    val tie = Linkage.linkEntities(
      queries((9L, "red wadge", "n/a")), d).collect()
    // lev(red wadge, red wedge) = 1; lev(red wadge, red widget) = 2
    assert(tie.head.getAs[String]("matched_name") == "red wedge")
  }

  test("linkEntities honors maxLev; linkEval keeps unmatched queries in " +
    "the denominator") {
    val d = dict("alpha particle")
    val q = queries(
      (0L, "alpha particl", "alpha particle"),  // lev 1, class 0
      (3L, "alpha pebble", "alpha particle"),   // lev > 3, class 0
      (1L, "alpha particle", "alpha particle")) // lev 0, class 1
    assert(Linkage.linkEntities(q, d, maxLev = 0).count() == 1)
    val ev = Linkage.linkEval(q, d).collect()
      .map(r => r.getAs[Long]("mangle") ->
        (r.getAs[Long]("n_queries"), r.getAs[Long]("n_matched"),
          r.getAs[Long]("n_correct"), r.getAs[Long]("accuracy_e4"))).toMap
    assert(ev(0L) == (2L, 1L, 1L, 5000L)) // the lev-4 query still counted
    assert(ev(1L) == (1L, 1L, 1L, 10000L))
  }

  test("snmCandidates: pairs within the rank window only; the reverse-key " +
    "second pass recovers a head edit the first-pass sort displaces") {
    val s = spark
    import s.implicits._
    // dictionary spans the alphabet so a head-edited key sorts far from
    // its clean form; its TAIL is untouched, so the reversed-key pass
    // puts them adjacent
    val d = dict("banana split", "beet salad", "berry fool",
      "bilberry gin", "blood orange", "bramble whip", "brioche bun",
      "butter tart", "cherry tart", "damson jam")
    val q = queries((1L, "bnana split", "banana split")) // 'a' deleted:
    // 'bn…' sorts 7 dictionary keys past 'ba…', beyond window = 3; the
    // reversed keys share the long 'tilps anan' prefix and are adjacent
    val one = Linkage.snmCandidates(q, d, window = 3, passes = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val two = Linkage.snmCandidates(q, d, window = 3, passes = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(!one.contains(("bnana split", "banana split")),
      "single pass displaced beyond the window")
    assert(two.contains(("bnana split", "banana split")),
      "reversed-key pass recovers the tail-preserving edit")
    // and the link lands via the second pass
    val m = Linkage.snmLink(q, d, window = 3).collect()
    assert(m.length == 1 &&
      m.head.getAs[String]("matched_name") == "banana split")
  }

  test("the salted distributed global rank is bit-identical to a single " +
    "global row_number over (k, role)") {
    val s = spark
    import s.implicits._
    // keys crossing many first-char salts, with a cross-role tie ('fig
    // roll' in both) to exercise the role tie-break
    val q = queries((1L, "fig roll", "fig roll"),
      (2L, "apple pi", "apple pie"), (3L, "zebra cake", "zebra cake"))
    val d = dict("apple pie", "fig roll", "zebra cake", "banana split")
    // rank adjacency over the union: compare pair sets from the engine's
    // salted decomposition against a brute single-window computation
    val keys = (Seq("fig roll", "apple pi", "zebra cake").map((_, "q")) ++
      Seq("apple pie", "fig roll", "zebra cake", "banana split")
        .map((_, "d"))).sortBy(identity)
    val brute = keys.zipWithIndex.flatMap { case ((k, r), i) =>
      keys.zipWithIndex.collect {
        case ((k2, r2), j) if j > i && j <= i + 2 && r != r2 =>
          if (r == "q") (k, k2) else (k2, k)
      }
    }.toSet
    val got = Linkage.snmCandidates(q, d, window = 2, passes = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == brute)
  }

  test("goldenRecords: mentions consolidate transitively through their " +
    "shared registry node; survivorship tie-breaks are pinned — longest " +
    "name then lexicographic, mode count then lexicographic") {
    val s = spark
    import s.implicits._
    val q = Seq(
      // five mentions of 'apple pie' (entity A), one of 'banana split'
      (1L, "apple pi", "B1", "T1"),   // lev 1
      (2L, "aple pie", "B2", "T2"),   // lev 1
      (3L, "apple piex", "B2", "T3"), // lev 1, length 10
      (5L, "apple piey", "B1", "T1"), // lev 1, length 10 -> name tie
      (4L, "banana splitz", "B9", "T9"))
      .toDF("q_id", "q_name", "brand", "ptype")
    val d = Seq("apple pie", "banana split").toDF("name")
    val out = Linkage.goldenRecords(q, d, Seq("brand", "ptype"))
      .collect()
      .map(r => r.getAs[String]("entity_id") ->
        (r.getAs[Long]("n_members"), r.getAs[String]("canonical_name"),
          r.getAs[String]("brand"), r.getAs[String]("ptype")))
      .toMap
    assert(out.size == 2)
    // entity id = lexicographically smallest node in the component
    // ('aple pie' sorts before every 'apple …' and the registry name);
    // canonical = longest name, the 10-char tie broken to 'apple piex';
    // brand mode ties B1=2 vs B2=2 -> lexicographic B1; ptype T1 wins 2-1-1
    assert(out("aple pie") == ((4L, "apple piex", "B1", "T1")))
    // the banana entity: dirty form is LONGER than the registry name and
    // wins canonical (longest-wins keeps the most complete string, even
    // a suffixed one — the documented heuristic, pinned here)
    assert(out("banana split") == ((1L, "banana splitz", "B9", "T9")))
  }

  test("mangle never touches the blocking character and stays within " +
    "lev 3 of the original") {
    val s = spark
    import s.implicits._
    val names = Seq("small ring", "red widget", "hot gear", "beige sleeve")
    val df = names.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("id", "name")
      .select(col("id"), col("name"),
        Linkage.mangle(col("name"), col("id")).as("dirty"))
      .withColumn("lev", levenshtein(col("name"), col("dirty")))
      .collect()
    df.foreach { r =>
      assert(r.getAs[String]("name").head == r.getAs[String]("dirty").head)
      assert(r.getAs[Int]("lev") >= 1 && r.getAs[Int]("lev") <= 3)
    }
  }
}
