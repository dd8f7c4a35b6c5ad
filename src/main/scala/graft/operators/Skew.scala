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
}
