package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture shapes: the two merge primitives every warehouse
  * ingests with — SCD type-2 history build (an ordered change stream per
  * key collapsed into validity intervals) and latest-wins upsert (a base
  * snapshot merged with a change batch carrying upserts and delete
  * tombstones). The reference has no counterpart (SURVEY §2.8 — no joins
  * beyond the enrich lookup, no state); these are the north-star pipeline
  * ops that keep a dimension table and a corpus snapshot maintainable
  * incrementally instead of rebuilt from scratch.
  *
  * Scale posture: both ops shuffle exactly once, on the key — the same
  * partitioning a bucketed dimension table would already have, so at
  * 100 TB the window/groupBy runs map-side-local after one exchange.
  * Nothing is collected; no op is quadratic in history length.
  */
object Cdc {

  /** SCD type-2 history: collapse an ordered per-key change stream into
    * validity intervals. Input rows are (key, ts, tie, attr) — `tie`
    * makes same-timestamp ordering deterministic. Consecutive rows with
    * an unchanged `attr` merge into one interval; each emitted row is
    * (key, attr, valid_from = first ts of the run, valid_to = next run's
    * valid_from or NULL, is_current = 1 iff valid_to is NULL). The
    * classic formulation: a lag-based change flag, a running sum turning
    * flags into run ids (the sessionize gap→session trick on attribute
    * identity instead of time distance), one groupBy per run, and a lead
    * for the interval close. One shuffle on `key`; runs ≤ changes, so
    * the second aggregate only shrinks data. */
  def scd2(changes: DataFrame, key: Column, ts: Column, tie: Column,
           attr: Column): DataFrame = {
    val base = changes.select(key.as("k"), ts.as("ts"), tie.as("tie"),
      attr.as("attr"))
    val wOrd = Window.partitionBy(col("k")).orderBy(col("ts"), col("tie"))
    val flagged = base.withColumn("chg",
      when(lag(col("attr"), 1).over(wOrd).isNull
        || lag(col("attr"), 1).over(wOrd) =!= col("attr"), 1L)
        .otherwise(0L))
      .withColumn("run", sum(col("chg")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = flagged.groupBy(col("k"), col("run"))
      .agg(min(col("attr")).as("attr"), // constant within a run
        min(struct(col("ts"), col("tie"))).getField("ts").as("valid_from"))
    val wRun = Window.partitionBy(col("k")).orderBy(col("run"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wRun))
      .withColumn("is_current",
        when(col("valid_to").isNull, 1L).otherwise(0L))
      .select(col("k"), col("attr"), col("valid_from"), col("valid_to"),
        col("is_current"))
  }

  /** Latest-wins upsert merge: apply a change batch to a base snapshot.
    * `changes` rows are (key, seq, op, payload...) with op ∈ {'u','d'};
    * per key the highest-`seq` change wins (a later delete beats an
    * earlier upsert and vice versa), base rows with no change survive
    * untouched, and a winning 'd' removes the key even if it never
    * existed (tombstones are idempotent). Payload columns are everything
    * in `changes` except (key, seq, op) and must also exist in `base`.
    * Emits the merged snapshot plus `origin` ('base' or 'upsert') so the
    * churn is auditable. Change batches are increments — typically
    * orders of magnitude smaller than the base — so the winner pick is
    * cheap and the final merge is one key-shuffle join of base vs a
    * small frame (broadcastable when the batch fits; left to the
    * planner/AQE, which sees the post-aggregate size). */
  def upsertLatest(base: DataFrame, changes: DataFrame, keyCol: String,
                   seqCol: String = "seq", opCol: String = "op")
  : DataFrame = {
    val payload = changes.columns.filterNot(
      c => c == keyCol || c == seqCol || c == opCol).toSeq
    require(payload.forall(base.columns.contains),
      s"payload columns $payload must exist in base")
    val wKey = Window.partitionBy(col(keyCol))
      .orderBy(col(seqCol).desc)
    val winner = changes
      .withColumn("rn", row_number().over(wKey))
      .filter(col("rn") === 1).drop("rn", seqCol)
    val joined = base.select(col(keyCol) +: payload.map(col): _*)
      .join(winner.select(
        col(keyCol) +: col(opCol) +: payload.map(c => col(c).as(s"u_$c"))
          : _*),
        Seq(keyCol), "full")
    joined
      .filter(col(opCol).isNull || col(opCol) === "u")
      .select(
        col(keyCol) +:
          payload.map(c => when(col(opCol) === "u", col(s"u_$c"))
            .otherwise(col(c)).as(c)) :+
          when(col(opCol) === "u", lit("upsert")).otherwise(lit("base"))
            .as("origin"): _*)
  }
}
