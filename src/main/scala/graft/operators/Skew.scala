package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY §7.4 "salted keys for skew on
  * record_type"). At 100 TB a prefix-routed CDR stream concentrates most
  * records in a few record types; a plain `groupBy(record_type)` sends each
  * hot key to a single reducer. Two mitigations, to be combined with AQE's
  * runtime skew handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default):
  *
  *  - [[saltedAgg]]: two-phase aggregation — pre-aggregate on
  *    (key, salt) so each hot key fans across `buckets` reducers, then
  *    combine the partials. Correct for any decomposable aggregate
  *    (count/sum/min/max).
  *  - Spark's own partial (map-side) aggregation covers most of this for
  *    hash aggregates; explicit salting matters when the per-key state is
  *    large (collect_list-style) or the combine is user-defined.
  */
object Skew {

  /** Deterministic salt in [0, buckets) from an arbitrary discriminator
    * column (use a high-cardinality column like an id; `hash` is Spark's
    * Murmur3). */
  def salt(discriminator: Column, buckets: Int): Column =
    pmod(hash(discriminator), lit(buckets))

  /** Two-phase salted count per key: groupBy(key, salt) → partial counts →
    * groupBy(key) → sum. Identical result to `groupBy(key).count()` with the
    * hot-key reduce fanned `buckets`-wide. */
  def saltedCount(df: DataFrame, key: Column, discriminator: Column,
                  buckets: Int = 16): DataFrame =
    df.groupBy(key.as("key"), salt(discriminator, buckets).as("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col("key"))
      .agg(sum(col("_partial")).as("n"))

  /** Two-phase salted sum of `value` per key. */
  def saltedSum(df: DataFrame, key: Column, value: Column,
                discriminator: Column, buckets: Int = 16): DataFrame =
    df.groupBy(key.as("key"), salt(discriminator, buckets).as("_salt"))
      .agg(sum(value).as("_partial"))
      .groupBy(col("key"))
      .agg(sum(col("_partial")).as("total"))

  /** SALTED equi-join — the skew mitigation for a shuffle join whose
    * probe side concentrates on a few hot keys and whose build side is
    * too big to broadcast (AQE's skew-join split handles the post-shuffle
    * case; explicit salting is the pre-partitioned / non-AQE form). The
    * fact side appends a deterministic salt in [0, buckets); the dim side
    * REPLICATES ×buckets (one row per salt value) so every (key, salt)
    * combination still meets its match — a hot key's rows now spread
    * across `buckets` reducers instead of one. Inner-join identical to
    * `fact ⋈ dim` on `key` by construction (value-proven by
    * `cdr_enrich_join_salted` against the plain join's oracle); the cost
    * is the ×buckets dim replication, which is why the dial is a
    * parameter and not a default. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 discriminator: Column, buckets: Int = 16): DataFrame =
    fact.withColumn("_salt", salt(discriminator, buckets))
      .join(dim.withColumn("_salt",
        explode(sequence(lit(0), lit(buckets - 1)))), Seq(key, "_salt"))
      .drop("_salt")

  /** Join-key skew DIAGNOSIS — the one-row report read BEFORE deciding
    * whether [[saltedAgg]]/[[saltedJoin]]/AQE skew handling is worth its
    * overhead: per-key counts reduced to row/key totals, the hottest
    * key's count + identity (min key on ties), its share of all rows, the
    * p99 per-key count (exact rank selection off the COUNT histogram —
    * window over distinct count values only, never over keys), and the
    * skew factor max/mean in 1e-4 integral units. skew_e4 = 10000 means
    * perfectly uniform; the salting decision threshold is a number, not a
    * guess. Everything after the per-key aggregate runs on histogram-
    * sized frames; every reported value is decided in integer
    * arithmetic. */
  def keySkewReport(df: DataFrame, key: Column): DataFrame = {
    val k = df.groupBy(key.as("key")).agg(count(lit(1)).as("c"))
    val mx = k.agg(max(col("c")).as("max_cnt"))
    val top = k.crossJoin(broadcast(mx))
      .filter(col("c") === col("max_cnt"))
      .agg(min(col("key")).as("top_key"))
    val nk = k.agg(count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"))
    // The count-of-counts histogram is bounded by distinct per-key
    // multiplicities — orders of magnitude below key cardinality on any
    // real skew profile (r18: measured the two-level cumHist here and
    // reverted it — +0.3 s of extra stages for a provably tiny window).
    val ch = k.groupBy(col("c").as("v")).agg(count(lit(1)).as("ck"))
    val cum = ch.withColumn("cum", sum(col("ck")).over(
      org.apache.spark.sql.expressions.Window.orderBy(col("v"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
    val p99 = cum.crossJoin(broadcast(nk.select("n_keys")))
      .filter(col("cum") >= expr("(99 * n_keys + 99) div 100"))
      .agg(min(col("v")).as("p99_cnt"))
    nk.crossJoin(broadcast(mx)).crossJoin(broadcast(top))
      .crossJoin(broadcast(p99))
      .select(col("n_rows"), col("n_keys"), col("max_cnt"),
        col("top_key"), col("p99_cnt"),
        expr("(10000 * max_cnt) div n_rows").as("max_share_e4"),
        expr("(10000 * max_cnt * n_keys) div n_rows").as("skew_e4"))
  }
}
