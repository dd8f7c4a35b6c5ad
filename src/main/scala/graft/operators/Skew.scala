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
}
