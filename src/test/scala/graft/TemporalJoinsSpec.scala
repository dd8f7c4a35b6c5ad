package graft

import org.apache.spark.sql.functions._
import graft.operators.TemporalJoins

class TemporalJoinsSpec extends SparkTestBase {

  test("asOfJoin: latest prior right row per key; <= at equal ts; null " +
    "when no prior row") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, 10L, 100L), // key 10 at t=100
      (2L, 10L, 50L),  // before any snapshot → null
      (3L, 10L, 60L),  // exactly at snapshot t=60 → inclusive
      (4L, 20L, 100L)  // key with no snapshots at all
    ).toDF("id", "k", "ms")
    val right = Seq(
      (10L, 60L, "s60"), (10L, 90L, "s90"), (10L, 150L, "s150"),
      (30L, 10L, "other")
    ).toDF("rk", "rms", "snap")
    val out = TemporalJoins.asOfJoin(left, right,
      col("k"), col("rk"), col("ms"), col("rms"), Seq("snap"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(out(1L).contains("s90"))  // latest ≤ 100
    assert(out(2L).isEmpty)          // nothing before 50
    assert(out(3L).contains("s60"))  // equal ts is a match
    assert(out(4L).isEmpty)          // unseen key
  }

  test("rangeJoinBucketed: pairs across bucket boundaries, half-open " +
    "interval, exactly-once per pair") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, 5L, 100L), (2L, 5L, 999L), (3L, 5L, 1000L), // 1000 = excluded end
      (4L, 5L, 2500L), (5L, 6L, 100L) // wrong key
    ).toDF("id", "k", "ms")
    // interval [0, 1000) spans many 300-wide buckets
    val right = Seq((5L, 0L, 1000L, "w1"), (5L, 2000L, 3000L, "w2"))
      .toDF("rk", "s", "e", "win")
    val out = TemporalJoins.rangeJoinBucketed(left, right,
      col("k"), col("rk"), col("ms"), col("s"), col("e"), bucketMs = 300L)
      .select("id", "win").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.sorted.toSeq == Seq((1L, "w1"), (2L, "w1"), (4L, "w2")))
    assert(out.length == out.distinct.length) // no duplicate pairs
  }

  test("rangeJoinBucketSweep: n_matches constant across widths and equal " +
    "to the deployed join's pair count; fanout falls and candidates rise " +
    "with width") {
    val s = spark
    import s.implicits._
    val left = (1L to 40L).map(i => (i, i % 3, i * 97L))
      .toDF("id", "k", "ms")
    val right = (1L to 10L).map(i => (i, i % 3, i * 311L, i * 311L + 500L))
      .toDF("rid", "rk", "s", "e")
    val widths = Seq(100L, 500L, 5000L)
    val rows = TemporalJoins.rangeJoinBucketSweep(left, right,
      col("k"), col("rk"), col("ms"), col("s"), col("e"), widths)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.keySet == widths.toSet)
    val exact = TemporalJoins.rangeJoinBucketed(left, right,
      col("k"), col("rk"), col("ms"), col("s"), col("e"), bucketMs = 100L)
      .count()
    // exactness invariant: every width reports the same final pair count,
    // and it is the deployed join's count
    assert(rows.values.map(_._4).toSet == Set(exact))
    // wider buckets: less explode fanout, never fewer candidates
    val byW = widths.map(rows)
    assert(byW.map(_._2).sliding(2).forall(p => p(0) >= p(1))) // n_exploded ↓
    assert(byW.map(_._3).sliding(2).forall(p => p(0) <= p(1))) // n_cand ↑
    // n_right identical on every row
    assert(rows.values.map(_._1).toSet == Set(10L))
  }
}
