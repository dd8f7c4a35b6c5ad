package graft

import org.apache.spark.sql.functions._
import graft.operators.{Cdc, CorpusOps, TextAnalysis}

/** Change-data-capture shapes (Cdc.scala) plus the round's corpus-health
  * additions: SCD2 run collapse, latest-wins upsert, encoding audit, and
  * the per-language fertility rollup. */
class CdcSpec extends SparkTestBase {

  test("Cdc.scd2: consecutive equal attrs collapse into one interval; " +
    "intervals chain valid_from→valid_to; same-ts rows order by tie; " +
    "exactly one open current row per key") {
    val s = spark
    import s.implicits._
    // key 1: A(10), A(20) [merge], B(30), A(40) — A again after B is a
    //   NEW run, the type-2 contract (history, not distinct states)
    // key 2: same-ts pair (t=10, ties 1<2) — tie order decides the run
    //   boundary deterministically: X then Y → two runs
    // key 3: single change → single open-ended current row
    val changes = Seq(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"), (1L, 30L, 3L, "B"),
      (1L, 40L, 4L, "A"),
      (2L, 10L, 1L, "X"), (2L, 10L, 2L, "Y"),
      (3L, 99L, 1L, "Z")
    ).toDF("k", "ts", "tie", "attr")
    val out = Cdc.scd2(changes, col("k"), col("ts"), col("tie"),
        col("attr"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4)))
      .sortBy(t => (t._1, t._3))
    assert(out.filter(_._1 == 1L) === Seq(
      (1L, "A", 10L, Some(30L), 0L),
      (1L, "B", 30L, Some(40L), 0L),
      (1L, "A", 40L, None, 1L)))
    assert(out.filter(_._1 == 2L) === Seq(
      (2L, "X", 10L, Some(10L), 0L), // closed by the same-ts successor
      (2L, "Y", 10L, None, 1L)))
    assert(out.filter(_._1 == 3L) === Seq((3L, "Z", 99L, None, 1L)))
    // invariant: exactly one current row per key
    val cur = out.filter(_._5 == 1L).map(_._1)
    assert(cur.sorted === Seq(1L, 2L, 3L))
  }

  test("Cdc.upsertLatest: highest seq wins (delete beats earlier upsert " +
    "and vice versa); tombstone for an absent key is a no-op; untouched " +
    "base rows survive as origin=base") {
    val s = spark
    import s.implicits._
    val base = Seq((1L, "v1", "s0"), (2L, "v1", "s0"), (3L, "v1", "s0"))
      .toDF("id", "payload", "src")
    val changes = Seq(
      (1L, 1L, "u", "v2", "s1"),  // plain edit
      (2L, 1L, "u", "v2", "s1"),  // edit...
      (2L, 2L, "d", null, null),  // ...then deleted: delete wins
      (4L, 1L, "d", null, null),  // tombstone for a key base never had
      (5L, 1L, "d", null, null),  // ...
      (5L, 2L, "u", "new", "s2")  // ...then (re)inserted: upsert wins
    ).toDF("id", "seq", "op", "payload", "src")
    val out = Cdc.upsertLatest(base, changes, "id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).sortBy(_._1)
    assert(out === Seq(
      (1L, "v2", "s1", "upsert"),
      (3L, "v1", "s0", "base"),
      (5L, "new", "s2", "upsert")))
  }

  test("TextAnalysis.encodingAudit: clean text is clean; the injected " +
    "twin flags exactly the 11- and 17-divisible docs with the right " +
    "damage class counts") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "plain ascii text", "s0"),   // %11 and %17 → both damages
      (11L, "once upon a time", "s0"),  // mojibake + U+FFFD only
      (17L, "hello world", "s0"),       // control char only
      (5L, "untouched", "s0")
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.encodingAudit(TextAnalysis.mojibakeInject(docs))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toMap
    assert(out(5L) === ((0L, 0L, 0L, 1L)))   // clean
    assert(out(11L) === ((1L, 1L, 0L, 0L)))  // repl + moji
    assert(out(17L) === ((0L, 0L, 1L, 0L)))  // ctrl
    assert(out(0L) === ((1L, 1L, 1L, 0L)))   // both injections
  }

  test("CorpusOps.fertilityByLang: exact integral chars-per-token; one " +
    "row per language") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "aa bb", "en", 5L),   // 2 tokens, 5 chars
      (2L, "cccc", "en", 4L),    // 1 token, 4 chars
      (3L, "x y z", "fr", 5L)
    ).toDF("doc_id", "text", "lang", "n_chars")
    val out = CorpusOps.fertilityByLang(docs)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    // en: 3 tokens, 9 chars → (10000*9) div 3 = 30000
    assert(out("en") === ((2L, 3L, 9L, 30000L)))
    // fr: 3 tokens, 5 chars → 16666 (floor, exact integer div)
    assert(out("fr") === ((1L, 3L, 5L, 16666L)))
  }
}
