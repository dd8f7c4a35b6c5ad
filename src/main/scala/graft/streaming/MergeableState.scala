package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The persisted-mergeable-state commit protocol shared by every online
  * materialized-view maintainer ([[StreamingStats]], [[StreamingCms]]):
  * a state directory holds one parquet state table plus a `CURRENT`
  * marker naming the last applied batch id. Apply = merge the batch's
  * additive increment into the current state, write the result under the
  * NEW batch id, then repoint the marker tmp+rename style (the
  * [[graft.sinks.FtpLikeSink]] discipline) — a reader never sees a
  * half-written state, and a `foreachBatch` REPLAY of an already-applied
  * batch observes `CURRENT >= batchId` and no-ops, which is what makes
  * the at-least-once callback exactly-once in effect.
  *
  * The state semantics (what an increment is, how two states merge) stay
  * with the caller as functions — this object owns only the idempotence
  * and atomicity of the apply.
  */
object MergeableState {

  private val Current = "CURRENT"

  /** Merge `increment` (the batch already reduced to its additive state
    * form) into the state under `stateDir` with `merge`; returns false
    * when `batchId` was already applied (replay no-op). */
  def applyBatch(spark: SparkSession, stateDir: String, batchId: Long,
                 increment: => DataFrame,
                 merge: (DataFrame, DataFrame) => DataFrame): Boolean = {
    val root = new Path(stateDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = current(spark, stateDir)
    if (cur.exists(_._1 >= batchId)) return false // replayed batch
    val inc = increment
    val merged = cur match {
      case Some((_, dir)) => merge(spark.read.parquet(dir), inc)
      case None => inc
    }
    val next = new Path(root, s"state-$batchId")
    merged.coalesce(1).write.mode("overwrite").parquet(next.toString)
    // repoint atomically: tmp marker + rename over the old one
    val tmp = new Path(root, s"$Current.tmp")
    val out = fs.create(tmp, true)
    out.write(batchId.toString.getBytes("UTF-8"))
    out.close()
    fs.delete(new Path(root, Current), false)
    fs.rename(tmp, new Path(root, Current))
    // Retain exactly ONE superseded version: a reader that resolved
    // `current()` just before this commit may still be mid-read on the
    // previous state parquet — deleting it here would yank the files out
    // from under that read. Keep {new, just-superseded}, delete anything
    // older; the dir never holds more than two versions.
    val keep = cur.map(_._1).toSet + batchId
    fs.listStatus(root).map(_.getPath)
      .filter(p => p.getName.startsWith("state-") &&
        !keep.contains(p.getName.stripPrefix("state-").toLong))
      .foreach(p => fs.delete(p, true))
    true
  }

  /** (applied batch id, state parquet path) of the current state, if any. */
  def current(spark: SparkSession,
              stateDir: String): Option[(Long, String)] = {
    val root = new Path(stateDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(root, Current)
    if (!fs.exists(marker)) return None
    val in = fs.open(marker)
    val id = try scala.io.Source.fromInputStream(in).mkString.trim.toLong
    finally in.close()
    Some((id, new Path(root, s"state-$id").toString))
  }
}
