package graft.sinks

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.util.SerializableConfiguration

/** Transactional "FTP-style" file sink: visibility-atomic commit via
  * tmp+rename, bounded retry, and a dead-letter fallback directory — the
  * reference's partner-delivery protocol re-expressed over a Hadoop
  * FileSystem (local `file://` in tests, `hdfs://`/object stores in prod):
  *
  *  - upload as `<name>@tmp`, then rename to the final name so downstream
  *    pollers never observe partial files (reference `FTPWrite`,
  *    src/ProcessSum1.scala:114-182 — tmp suffix at :122, rename at
  *    :152-158);
  *  - retry each commit up to `maxRetries` times (reference retry loop w/
  *    reconnect, src/ProcessSums.scala:153-200);
  *  - on give-up, persist the payload to a dead-letter directory instead of
  *    dropping it (reference `FTPErrorWriteToHDFS`,
  *    src/ProcessSum1.scala:187-239);
  *  - dual-partner fan-out: one upstream write, N partner commits
  *    (reference dual-write, src/ProcessSums.scala:334-418).
  *
  * Idempotence: every batch lands under `batch=<id>/`, so Structured
  * Streaming's at-least-once `foreachBatch` redelivery overwrites rather than
  * duplicates (SURVEY §7.4 "At-least-once → exactly-once").
  *
  * Scale posture: the Spark job writes the batch ONCE (executors, in
  * parallel) into a staging dir; the (partner × staged-file) commit fan-out
  * then runs as a distributed Spark job — each copy+tmp+rename executes on an
  * executor, so no batch byte ever funnels through the driver JVM (the
  * reference's `repartition(1)`-plus-driver-FTP bottleneck is the
  * anti-pattern this replaces). The driver only performs metadata operations:
  * listing the staged files and preparing/deleting batch directories.
  */
class FtpLikeSink(
    targetRoot: String,
    deadLetterRoot: String,
    partners: Seq[String],
    maxRetries: Int = 3,
    /** Test seam: rename interceptor — returns true on success. Defaults to
      * the real FileSystem rename. Must be serializable: it is shipped to
      * executors inside the commit tasks. */
    renameOp: Option[(FileSystem, Path, Path) => Boolean] = None)
    extends Serializable {

  private def fs(conf: org.apache.hadoop.conf.Configuration,
                 p: String): FileSystem =
    new Path(p).getFileSystem(conf)

  /** `foreachBatch` handler: write `df` (single string column `value`) once,
    * then commit to every partner with tmp+rename; failed partners fall back
    * to the dead-letter dir. Commits are a distributed `foreach` over the
    * (partner × staged-file) work list — executor-parallel, driver-free. */
  def writeBatch(df: DataFrame, batchId: Long): Unit = {
    val sc = df.sparkSession.sparkContext
    val conf = sc.hadoopConfiguration
    val staging = s"$targetRoot/_staging/batch=$batchId"
    df.write.mode("overwrite").text(staging)
    val filesystem = fs(conf, targetRoot)
    val staged = filesystem.listStatus(new Path(staging))
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(_.getPath.toString)
    // Driver: metadata-only prep. Overwrite each whole batch dir: redelivered
    // batches (at-least-once foreachBatch) replace rather than accumulate —
    // part-file names carry fresh UUIDs per delivery, so append would
    // duplicate.
    partners.foreach { partner =>
      val dstDir = new Path(s"$targetRoot/$partner/batch=$batchId")
      filesystem.delete(dstDir, true)
      filesystem.mkdirs(dstDir)
    }
    // Executors: the data plane. One task per (partner, staged file).
    val work = for (p <- partners; s <- staged) yield (p, s)
    if (work.nonEmpty) {
      val serConf = new SerializableConfiguration(conf)
      val root = targetRoot
      val slices = math.min(work.length, sc.defaultParallelism).max(1)
      sc.parallelize(work, slices).foreach { case (partner, srcStr) =>
        val src = new Path(srcStr)
        val taskFs = src.getFileSystem(serConf.value)
        commitOne(taskFs, src,
          new Path(s"$root/$partner/batch=$batchId"), batchId)
      }
    }
    filesystem.delete(new Path(staging), true)
  }

  /** Copy `src` into `dstDir` as `<name>@tmp`, then rename to `<name>`;
    * retry up to `maxRetries`; dead-letter on give-up. Runs inside an
    * executor task (one invocation per staged file per partner). */
  private def commitOne(filesystem: FileSystem, src: Path, dstDir: Path,
                        batchId: Long): Unit = {
    val tmp = new Path(dstDir, src.getName + "@tmp")
    val fin = new Path(dstDir, src.getName)
    val rename = renameOp.getOrElse(
      (f: FileSystem, a: Path, b: Path) => f.rename(a, b))
    var attempt = 0
    var done = false
    while (!done && attempt < maxRetries) {
      attempt += 1
      try {
        if (filesystem.exists(tmp)) filesystem.delete(tmp, false)
        FileUtil.copy(filesystem, src, filesystem, tmp, false, true,
          filesystem.getConf)
        done = rename(filesystem, tmp, fin)
      } catch { case _: Exception => done = false }
    }
    if (!done) {
      // Data preserved on the fallback path, never dropped
      // (reference logs 数据丢失…写入HDFS and writes to HDFS instead).
      val partner = dstDir.getParent.getName
      val dl = new Path(
        s"$deadLetterRoot/batch=$batchId/${partner}_${src.getName}")
      filesystem.mkdirs(dl.getParent)
      FileUtil.copy(filesystem, src, filesystem, dl, false, true,
        filesystem.getConf)
    }
  }
}
