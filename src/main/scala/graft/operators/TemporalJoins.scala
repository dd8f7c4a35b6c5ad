package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks natively — as-of and range — composed from
  * built-ins so Catalyst keeps optimizing them (the guide's preference (a):
  * compose before dropping to custom plans).
  *
  * Both avoid the naive non-equi join (BroadcastNestedLoop — quadratic and
  * broadcast-bound at scale):
  *
  *  - **as-of** uses the union + last-observation-carried-forward window:
  *    one shuffle on the key, one sort per key partition — the classic
  *    scalable formulation.
  *  - **range** buckets the time axis: intervals explode into the buckets
  *    they overlap, probes equi-join on (key, bucket), then an exact filter
  *    removes false candidates. Shuffle is equi on (key, bucket), so skew
  *    and parallelism behave like any hash join; bucket width trades
  *    explode-fanout vs candidate-filter selectivity.
  *
  * Timestamps are compared at millisecond precision (both engines floor) —
  * callers pass epoch-ms columns.
  */
object TemporalJoins {

  /** For each left row, the single latest right row of the same key with
    * `rightMs <= leftMs`. `rightRows` must be unique per (key, ts) —
    * pre-aggregate if not. Output: all left columns + `valueCols` from the
    * right (null when no prior right row exists). */
  def asOfJoin(left: DataFrame, right: DataFrame,
               leftKey: Column, rightKey: Column,
               leftMs: Column, rightMs: Column,
               valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_k", leftKey).withColumn("_ms", leftMs)
      .withColumn("_side", lit(1))
      .select((leftCols.map(col) ++ valueCols.map(c => lit(null).as(c)) ++
        Seq(col("_k"), col("_ms"), col("_side"))): _*)
    val r = right
      .withColumn("_k", rightKey).withColumn("_ms", rightMs)
      .withColumn("_side", lit(0))
      .select((leftCols.map(c => lit(null).as(c)) ++ valueCols.map(col) ++
        Seq(col("_k"), col("_ms"), col("_side"))): _*)
    // at equal ts the right (snapshot) row sorts first ⇒ `<=` semantics
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ms"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1).drop("_k", "_ms", "_side")
  }

  /** INTERVAL-OVERLAP join — all (left, right) pairs of the same key
    * whose half-open intervals [lStartMs, lEndMs) and [rStartMs, rEndMs)
    * overlap: `lStart < rEnd && rStart < lEnd`. With an equi key the
    * overlap test is just a join RESIDUAL riding a hash join — shuffle
    * and skew behave like any equi join, per-key fanout is bounded by
    * each key's interval count (the caller's data contract, like the
    * transition matrix's per-user bound). For KEYLESS interval overlap,
    * bucket the time axis first and use (bucket) as the key, the
    * [[rangeJoinBucketed]] pattern — a keyless version here would plan a
    * BroadcastNestedLoopJoin, exactly what this module exists to avoid. */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          leftKey: Column, rightKey: Column,
                          lStart: Column, lEnd: Column,
                          rStart: Column, rEnd: Column): DataFrame =
    left.join(right,
      leftKey === rightKey && lStart < rEnd && rStart < lEnd)

  /** All (left, right) pairs of the same key with `leftMs` in
    * `[rightStartMs, rightEndMs)`. Scalable via time-bucketing: equi-join on
    * (key, bucket) then exact range filter. */
  def rangeJoinBucketed(left: DataFrame, right: DataFrame,
                        leftKey: Column, rightKey: Column,
                        leftMs: Column, rightStartMs: Column,
                        rightEndMs: Column,
                        bucketMs: Long = 86400000L): DataFrame = {
    val l = left.withColumn("_k", leftKey).withColumn("_ms", leftMs)
      .withColumn("_bucket", floor(col("_ms") / bucketMs))
    val r = right.withColumn("_k", rightKey)
      .withColumn("_s", rightStartMs).withColumn("_e", rightEndMs)
      .withColumn("_bucket",
        explode(sequence(floor(col("_s") / bucketMs),
          floor((col("_e") - 1) / bucketMs))))
    l.join(r, Seq("_k", "_bucket"))
      .filter(col("_ms") >= col("_s") && col("_ms") < col("_e"))
      .drop("_k", "_bucket", "_ms", "_s", "_e")
  }

  /** Bucket-width TUNING TABLE for [[rangeJoinBucketed]] — the dial that
    * scaladoc documents ("bucket width trades explode-fanout vs
    * candidate-filter selectivity"), measured instead of asserted, the way
    * the dedup sweeps tune their thresholds. One row per candidate width:
    *
    *   - `n_exploded` / `fanout`: right-side row blowup from the bucket
    *     explode (storage + shuffle cost of the build side) — computed
    *     arithmetically per interval (buckets spanned), no explode needed
    *   - `n_candidates` / `cand_ratio`: equi-join candidates and the share
    *     surviving the exact range filter (wasted probe work when low)
    *   - `n_matches`: the final pair count — IDENTICAL for every width (the
    *     filter is exact), which is the correctness invariant the sweep
    *     rides on
    *
    * Reading the table: narrow buckets pay explode fanout to keep
    * candidates selective; wide buckets explode less but probe more. Pick
    * the width where cand_ratio stops falling faster than fanout rises.
    *
    * Scale shape: per width, one arithmetic aggregate over the intervals
    * plus one (key, bucket) equi-join aggregated to a single row — the
    * corpus is never cross-joined, and the |widths| legs union to a
    * |widths|-row table (run-once-read-many). */
  def rangeJoinBucketSweep(left: DataFrame, right: DataFrame,
                           leftKey: Column, rightKey: Column,
                           leftMs: Column, rightStartMs: Column,
                           rightEndMs: Column,
                           widths: Seq[Long]): DataFrame = {
    require(widths.nonEmpty, "rangeJoinBucketSweep: need at least one width")
    val legs = widths.map { w =>
      val l = left.select(leftKey.as("_k"), leftMs.as("_ms"))
        .withColumn("_bucket", floor(col("_ms") / w))
      val r = right.select(rightKey.as("_k"),
        rightStartMs.as("_s"), rightEndMs.as("_e"))
      val rAgg = r.agg(
        count(lit(1)).as("n_right"),
        sum(floor((col("_e") - 1) / w) - floor(col("_s") / w) + 1)
          .as("n_exploded"))
        .withColumn("bucket_ms", lit(w))
      val rx = r.withColumn("_bucket",
        explode(sequence(floor(col("_s") / w), floor((col("_e") - 1) / w))))
      val cAgg = l.join(rx, Seq("_k", "_bucket"))
        .agg(
          count(lit(1)).as("n_candidates"),
          sum(when(col("_ms") >= col("_s") && col("_ms") < col("_e"), 1L)
            .otherwise(0L)).as("n_matches"))
        .withColumn("bucket_ms", lit(w))
      // two 1-row frames, equi-keyed on the width literal → broadcast hash
      rAgg.join(cAgg, "bucket_ms")
    }
    legs.reduce(_.unionByName(_))
      .select(col("bucket_ms"), col("n_right"), col("n_exploded"),
        col("n_candidates"), col("n_matches"),
        round(col("n_exploded").cast("double") / col("n_right"), 4)
          .as("fanout"),
        round(col("n_matches").cast("double") / col("n_candidates"), 4)
          .as("cand_ratio"))
  }
}
