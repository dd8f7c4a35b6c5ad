package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental deduplication for a DOCUMENT STREAM — the streaming twin of
  * `operators.Dedup.exact`: a training-data pipeline doesn't re-scan its
  * 100 TB corpus when new crawl batches arrive; it streams the new docs,
  * drops what the corpus already contains, and drops within-stream repeats
  * across micro-batches. No reference counterpart (SURVEY §2.8 north-star).
  */
object StreamingDedup {

  /** New-docs stream → md5 fingerprint → anti-join the static known-corpus
    * fingerprints (stream-static anti join: the static side is re-broadcast
    * per micro-batch, the stream is never shuffled against the corpus) →
    * `dropDuplicates(fp)` for exactly-once emission of each novel
    * fingerprint ACROSS batches (state-store backed, so a crash/restart
    * from the checkpoint keeps the guarantee).
    *
    * State note: dropDuplicates keys state by fp with NO eviction — right
    * for a bounded backfill, wrong for an unbounded stream. For unbounded
    * use, [[incrementalDedupWatermarked]] bounds state by event-time
    * watermark (a repeat arriving later than the watermark delay is then
    * emitted again — dedup across an unbounded window needs an external
    * fingerprint store, e.g. periodically folding emitted fps back into the
    * static side). */
  def incrementalDedup(newDocs: DataFrame, knownFps: DataFrame): DataFrame =
    newDocs
      .withColumn("fp", md5(col("text")))
      .join(knownFps.select(col("fp")).distinct(), Seq("fp"), "left_anti")
      .dropDuplicates("fp")

  /** [[incrementalDedup]] with state BOUNDED by an event-time watermark on
    * `tsCol`: duplicate fingerprints arriving within `delay` of the stream's
    * max event time are dropped; state for older fingerprints is evicted.
    * The production configuration for an unbounded crawl stream. */
  def incrementalDedupWatermarked(newDocs: DataFrame, knownFps: DataFrame,
                                  tsCol: String, delay: String): DataFrame =
    newDocs
      .withColumn("fp", md5(col("text")))
      .withWatermark(tsCol, delay)
      .join(knownFps.select(col("fp")).distinct(), Seq("fp"), "left_anti")
      .dropDuplicatesWithinWatermark("fp")
}
