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
}
