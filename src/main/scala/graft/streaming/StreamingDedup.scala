package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.{StringType, StructField, StructType}

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

  /** Per-micro-batch NEAR-dedup of a document stream against a static
    * corpus — the streaming face of
    * [[graft.operators.Dedup.incrementalNearDedup]]. Runs inside
    * `foreachBatch` because the LSH chain aggregates (minhash, banding),
    * which is natural over a completed micro-batch and unsupported
    * mid-stream in append mode; each batch's survivors go to `deliver`
    * (idempotent delivery expected, standard foreachBatch contract). At
    * scale the corpus side reads a PERSISTED (band, bucket)-bucketed
    * [[graft.operators.Dedup.bandTable]] rather than re-signing the corpus
    * per batch — same production note as the batch operator. */
  def incrementalNearDedupBatched(newDocs: DataFrame, knownDocs: DataFrame,
      jaccardThreshold: Double = 0.8)(
      deliver: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    newDocs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      deliver(graft.operators.Dedup.incrementalNearDedup(
        batch, knownDocs, jaccardThreshold), batchId)
    }

  /** Per-micro-batch SPAN SCRUB of a document stream against a static
    * corpus — the streaming face of [[graft.operators.Dedup.spanScrub]]:
    * each arriving batch is REWRITTEN, not filtered — its docs lose every
    * span the corpus already contains and keep their novel prose. Runs in
    * `foreachBatch` (the scrub aggregates: window census, coverage pass,
    * reassembly). At scale the corpus side is the DISTINCT window-fp set,
    * which the operator recomputes from `knownDocs` per batch here —
    * production persists that fp table once per corpus version and passes
    * a read of it, the same note as the near-dedup band index. Delivery
    * contract is the standard foreachBatch at-least-once: deliver
    * idempotently. */
  def spanScrubBatched(newDocs: DataFrame, knownDocs: DataFrame,
      spanTokens: Int = 8)(
      deliver: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    newDocs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      deliver(graft.operators.Dedup.spanScrub(batch, knownDocs, spanTokens),
        batchId)
    }

  /** The unbounded-stream answer the watermarked variant's scaladoc names:
    * watermark-bounded state catches SHORT-window repeats cheaply, and a
    * per-batch fp-store COMPACTION catches the long tail — every delivered
    * batch's fingerprints are appended to the store at `fpStorePath`, and
    * each batch anti-joins the store read FRESH (so a duplicate arriving
    * AFTER the watermark delay, when its dropDuplicates state is long
    * evicted, is still dropped by the store probe). State is bounded by the
    * watermark; the store is bounded by the number of DISTINCT documents
    * ever seen — the right asymptote for an unbounded crawl stream.
    *
    * Delivery is `deliver(novelDocs, batchId)` BEFORE the store append:
    * a crash between the two replays the batch and delivers again
    * (at-least-once, the standard foreachBatch contract — deliver
    * idempotently, e.g. FtpLikeSink's tmp+rename); the reverse order would
    * LOSE the batch on replay (fps already in the store would anti-join the
    * docs away before their only delivery). Store appends after a crash may
    * duplicate fp rows — harmless: the probe `.distinct()`s, and a
    * periodic rewrite can compact the store files offline.
    *
    * Scale shape per batch: one fresh store scan, prefiltered by a bloom
    * over the BATCH's fingerprints ([[graft.operators.Dedup.bloomAntiJoinFp]]
    * — the store scan is a map-only codegen'd `might_contain` probe that
    * emits only fps colliding with the batch, so the store is never
    * shuffled and never broadcast whole; the exact anti-join against the
    * ≤|batch|+FP survivors settles it), one batch-local dedup, one append
    * of ≤|batch| fp rows. The stream is never shuffled against the corpus
    * text — only 32-char fingerprints ever cross stages.
    *
    * Returns the configured `DataStreamWriter` — caller sets checkpoint /
    * trigger and starts it. */
  def incrementalDedupCompacted(newDocs: DataFrame, fpStorePath: String,
      tsCol: String, delay: String)(
      deliver: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val deduped = newDocs
      .withColumn("fp", md5(col("text")))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("fp")
    deduped.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val s = batch.sparkSession
      val storePath = new org.apache.hadoop.fs.Path(fpStorePath)
      val fs = storePath.getFileSystem(s.sparkContext.hadoopConfiguration)
      val known =
        if (fs.exists(storePath))
          s.read.parquet(fpStorePath).select(col("fp")).distinct()
        else
          s.createDataFrame(s.sparkContext.emptyRDD[Row],
            StructType(Seq(StructField("fp", StringType))))
      val novel = graft.operators.Dedup
        .bloomAntiJoinFp(batch.dropDuplicates("fp"), known)
        .persist()
      try {
        deliver(novel, batchId)
        novel.select(col("fp")).write.mode("append").parquet(fpStorePath)
      } finally novel.unpersist()
    }
  }
}
