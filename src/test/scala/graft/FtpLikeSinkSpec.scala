package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.{FileSystem, Path}

import graft.sinks.FtpLikeSink

class FtpLikeSinkSpec extends SparkTestBase {

  private def df(lines: Seq[String]) = {
    val s = spark
    import s.implicits._
    lines.toDF("value")
  }

  test("happy path: per-partner batch dirs, tmp+rename, staging cleaned") {
    val target = tmpDir("sink")
    val dead = tmpDir("dl")
    val sink = new FtpLikeSink(target, dead, Seq("yaxin", "yiyang"))
    sink.writeBatch(df(Seq("r1", "r2", "r3")), 7L)
    Seq("yaxin", "yiyang").foreach { p =>
      val lines = spark.read.textFile(s"$target/$p/batch=7").collect().sorted
      assert(lines.toSeq == Seq("r1", "r2", "r3"))
    }
    assert(!Files.exists(Paths.get(target, "_staging", "batch=7")))
    val tmps = Files.walk(Paths.get(target)).toArray.map(_.toString)
      .filter(_.endsWith("@tmp"))
    assert(tmps.isEmpty)
  }

  test("idempotent redelivery: rewriting the same batchId overwrites, " +
    "no duplicates") {
    val target = tmpDir("sink2")
    val sink = new FtpLikeSink(target, tmpDir("dl2"), Seq("yaxin"))
    sink.writeBatch(df(Seq("a", "b")), 1L)
    sink.writeBatch(df(Seq("a", "b")), 1L) // at-least-once redelivery
    val lines = spark.read.textFile(s"$target/yaxin/batch=1").collect()
    assert(lines.sorted.toSeq == Seq("a", "b"))
  }

  test("transient rename failures are retried to success") {
    val target = tmpDir("sink3")
    val dead = tmpDir("dl3")
    val failures = new AtomicInteger(2) // fail first two attempts
    val flaky = (fs: FileSystem, a: Path, b: Path) =>
      if (failures.getAndDecrement() > 0) false else fs.rename(a, b)
    val sink = new FtpLikeSink(target, dead, Seq("yaxin"),
      maxRetries = 3, renameOp = Some(flaky))
    sink.writeBatch(df(Seq("x")).coalesce(1), 2L)
    assert(spark.read.textFile(s"$target/yaxin/batch=2").collect().toSeq ==
      Seq("x"))
    assert(!Files.exists(Paths.get(dead, "batch=2")) ||
      Files.list(Paths.get(dead, "batch=2")).toArray.isEmpty)
  }

  test("multi-file batches commit executor-parallel: every staged part " +
    "reaches every partner") {
    val target = tmpDir("sink5")
    val sink = new FtpLikeSink(target, tmpDir("dl5"), Seq("yaxin", "yiyang"))
    val rows = (1 to 40).map(i => f"r$i%02d")
    // repartition(8): eight staged part files × two partners = 16 commit
    // tasks, all running as a distributed foreach (no driver copy path)
    sink.writeBatch(df(rows).repartition(8), 11L)
    Seq("yaxin", "yiyang").foreach { p =>
      val dir = Paths.get(target, p, "batch=11")
      val parts = Files.list(dir).toArray.map(_.toString)
        .filter(f => f.split("/").last.startsWith("part-"))
      assert(parts.length == 8)
      val lines = spark.read.textFile(s"$target/$p/batch=11").collect().sorted
      assert(lines.toSeq == rows)
    }
  }

  test("give-up falls back to the dead-letter dir — data never dropped") {
    val target = tmpDir("sink4")
    val dead = tmpDir("dl4")
    val alwaysFail = (_: FileSystem, _: Path, _: Path) => false
    val sink = new FtpLikeSink(target, dead, Seq("yaxin"),
      maxRetries = 2, renameOp = Some(alwaysFail))
    sink.writeBatch(df(Seq("x", "y")).coalesce(1), 3L)
    val dl = Files.list(Paths.get(dead, "batch=3")).toArray.map(_.toString)
      .filter(p => !p.split("/").last.startsWith(".")) // hadoop .crc files
    assert(dl.nonEmpty)
    val content = dl.flatMap(p =>
      new String(Files.readAllBytes(Paths.get(p))).split("\n")).sorted
    assert(content.toSeq == Seq("x", "y"))
    assert(dl.forall(_.contains("yaxin_")))
  }
}
