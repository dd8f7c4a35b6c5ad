package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Dedup

/** The portable bloom export ([[Dedup.bloomExport]]) maintained ONLINE —
  * the missing half of the serving-layer story: the exported filter is
  * only useful at the ingest door if it stays CURRENT as the corpus
  * grows, and a bloom filter is the textbook mergeable state (set bits
  * only ever turn on; per-word OR is associative, commutative,
  * idempotent). Each micro-batch of documents reduces to ITS word table
  * and ORs into the persisted state via [[MergeableState]]'s idempotent
  * tmp+rename commit; [[report]] is bit-for-bit the batch export over
  * everything ingested (spec-proven, including a duplicate fp appearing
  * in two different batches — idempotent OR makes re-insertion
  * invisible).
  *
  * At 100 TB the state is mBits/64 rows forever — corpus-size-
  * independent — and shipping the current filter to the admission proxy
  * is a full-table read of ≤ mBits/8 bytes, any time, no corpus scan. */
object StreamingBloom {

  /** Apply one batch of raw documents to the persisted word-table state
    * under `stateDir`; returns false when `batchId` was already applied
    * (replay no-op).
    *
    * The filter geometry (mBits, k) is persisted next to the state on
    * first apply and ENFORCED on every later one: two filters with
    * different geometries live in different bit-position spaces, so a
    * caller who changed either dial between batches would silently OR
    * incompatible word tables into a filter with FALSE NEGATIVES — the
    * one failure mode a bloom filter must never have. */
  def applyBatch(spark: SparkSession, stateDir: String, batch: DataFrame,
                 batchId: Long, mBits: Long = 1L << 16,
                 k: Int = 4): Boolean = {
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val geomPath = new org.apache.hadoop.fs.Path(root, "GEOMETRY")
    val geom = s"$mBits,$k"
    if (fs.exists(geomPath)) {
      val in = fs.open(geomPath)
      val existing =
        try scala.io.Source.fromInputStream(in).mkString.trim
        finally in.close()
      require(existing == geom,
        s"bloom geometry mismatch at $stateDir: state built with " +
          s"(mBits,k)=($existing), caller passed ($geom) — merging " +
          "would corrupt the filter with false negatives")
    }
    val applied = MergeableState.applyBatch(spark, stateDir, batchId,
      Dedup.bloomExport(
        batch.select(md5(col("text")).as("fp")).distinct(), mBits, k),
      (cur, inc) => Dedup.bloomMergeWords(Seq(cur, inc)))
    if (applied && !fs.exists(geomPath)) {
      val tmp = new org.apache.hadoop.fs.Path(root, "GEOMETRY.tmp")
      val out = fs.create(tmp, true)
      out.write(geom.getBytes("UTF-8"))
      out.close()
      fs.rename(tmp, geomPath)
    }
    applied
  }

  /** The live word table off the maintained state — the state IS the
    * export (empty frame with the right schema before the first batch). */
  def report(spark: SparkSession, stateDir: String): DataFrame =
    MergeableState.current(spark, stateDir) match {
      case Some((_, dir)) => spark.read.parquet(dir)
      case None =>
        spark.range(0).select(col("id").as("word_idx"),
          col("id").as("bits")).limit(0)
    }

  /** Maintain the filter state from a streaming `documents` frame. */
  def maintain(docs: DataFrame, stateDir: String, checkpointDir: String,
               mBits: Long = 1L << 16, k: Int = 4,
               trigger: Trigger = Trigger.ProcessingTime("20 seconds"))
      : StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, stateDir, batch, batchId, mBits, k)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
