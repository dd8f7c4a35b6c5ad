package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WATERMARKED STREAM-STREAM JOIN — the one Structured Streaming join
  * capability the rest of this module's state operators don't exercise:
  * two live streams (a trigger stream and a conversion stream) joined
  * per user under a bounded time condition, with BOTH sides watermarked
  * so Spark's join-state store can evict rows the condition can never
  * match again. This is the online form of [[graft.operators.Funnels]]'
  * click→purchase analytics: batch re-joins history per run, the
  * stream matches conversions as they arrive and holds only the
  * in-window tail of each side in state.
  *
  * The time condition (`0 ≤ conv.ts − trig.ts ≤ windowSeconds`) is what
  * makes the state BOUNDED: with the watermarks it gives Spark a proof
  * that a trigger row older than watermark − window is dead, so state
  * size tracks the window, not the stream — the difference between a
  * join and a leak at 100 TB/day. Spec-proven (StreamingSpec): results
  * row-identical to the batch join on the same data, and a row arriving
  * AFTER the watermark passed its window finds its partner evicted —
  * the eviction is observed, not assumed.
  */
object StreamingJoin {

  /** Join a trigger stream to a conversion stream: same `user_id`,
    * conversion at or after the trigger, within `windowSeconds`. Both
    * inputs need columns (user_id, event_id, ts); `delayThreshold` is
    * the watermark lateness bound applied to each side. Output:
    * (user_id, trig_id, conv_id, trig_ts, conv_ts). */
  def within(triggers: DataFrame, conversions: DataFrame,
             windowSeconds: Long,
             delayThreshold: String = "10 seconds"): DataFrame =
    joined(triggers, conversions, windowSeconds, delayThreshold, "inner")

  /** LEFT-OUTER form — the "abandoned trigger" detector: a trigger row
    * whose conversion never arrives is emitted with null conversion
    * columns, but only AFTER the watermark passes trigger.ts + window —
    * i.e. only once Spark can PROVE no in-window conversion can still
    * arrive. This is the semantics a timeout/abandonment alert needs
    * (an inner join just never says anything), and it is exactly the
    * state-store timeout machinery made visible: the null row IS the
    * eviction, observed downstream. Spec-proven: the unmatched trigger
    * emits null-padded once the watermark clears its window, and never
    * before. */
  def withinOuter(triggers: DataFrame, conversions: DataFrame,
                  windowSeconds: Long,
                  delayThreshold: String = "10 seconds"): DataFrame =
    joined(triggers, conversions, windowSeconds, delayThreshold,
      "left_outer")

  private def joined(triggers: DataFrame, conversions: DataFrame,
                     windowSeconds: Long, delayThreshold: String,
                     joinType: String): DataFrame = {
    val t = triggers
      .select(col("user_id").as("t_user"), col("event_id").as("trig_id"),
        col("ts").as("trig_ts"))
      .withWatermark("trig_ts", delayThreshold)
    val c = conversions
      .select(col("user_id").as("c_user"), col("event_id").as("conv_id"),
        col("ts").as("conv_ts"))
      .withWatermark("conv_ts", delayThreshold)
    t.join(c,
        col("t_user") === col("c_user") &&
          col("conv_ts") >= col("trig_ts") &&
          col("conv_ts") <= col("trig_ts") +
            expr(s"INTERVAL $windowSeconds SECONDS"),
        joinType)
      .select(col("t_user").as("user_id"), col("trig_id"), col("conv_id"),
        col("trig_ts"), col("conv_ts"))
  }
}
