package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.CorpusOps

/** The A-ES weighted reservoir ([[CorpusOps.weightedSample]]) maintained
  * ONLINE — weighted sampling without replacement over a stream, the
  * original reservoir setting of Efraimidis & Spirakis: each micro-batch
  * reduces to its own per-source top-k by the ln(u)/w key, and merging
  * that reservoir into the persisted one is just re-taking the top-k of
  * the union (topk(A ∪ B) = topk(topk(A) ∪ topk(B))), so the maintained
  * sample over everything ever seen is row-identical to a batch
  * [[CorpusOps.weightedSample]] over the concatenated stream — no
  * approximation enters anywhere (spec-proven, the StreamingStats parity
  * pattern). At 100 TB the state table is k·|sources| rows regardless of
  * how much has streamed past, and because the key is a pure function of
  * the document's own id hash, replays and reorderings of the input
  * cannot change what the sample converges to.
  *
  * Exactly-once by idempotent apply via [[MergeableState]]: replayed
  * batch ids refuse (critical here — a double-applied batch is harmless
  * to this particular merge since re-top-k of the same rows is a no-op,
  * but the refusal keeps the contract uniform with the additive states
  * where replay WOULD corrupt).
  */
object StreamingSample {

  /** Apply one batch of documents to the reservoir under `stateDir`;
    * returns false when `batchId` was already applied (replay no-op). */
  def applyBatch(spark: SparkSession, stateDir: String, batch: DataFrame,
                 batchId: Long, kPerSource: Int = 5): Boolean =
    MergeableState.applyBatch(spark, stateDir, batchId,
      CorpusOps.weightedSample(batch, kPerSource),
      (cur, inc) => CorpusOps.weightedSampleMerge(Seq(cur, inc),
        kPerSource))

  /** (applied batch id, state parquet path) of the current state. */
  def current(spark: SparkSession,
              stateDir: String): Option[(Long, String)] =
    MergeableState.current(spark, stateDir)

  /** The live sample from the maintained reservoir (empty frame with the
    * right schema when nothing has arrived yet). */
  def report(spark: SparkSession, stateDir: String): DataFrame =
    current(spark, stateDir) match {
      case Some((_, dir)) => spark.read.parquet(dir)
      case None =>
        import org.apache.spark.sql.functions.{col, lit}
        spark.range(0).select(col("id").as("doc_id"),
          lit("").as("source"), col("id").as("w"),
          lit(0.0).as("skey")).limit(0)
    }

  /** Maintain the reservoir from a streaming `documents` frame. */
  def maintain(docs: DataFrame, stateDir: String, checkpointDir: String,
               kPerSource: Int = 5,
               trigger: Trigger = Trigger.ProcessingTime("20 seconds"))
      : StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, stateDir, batch, batchId,
          kPerSource); ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
