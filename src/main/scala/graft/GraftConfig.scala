package graft

import java.io.FileInputStream
import java.util.Properties

/** Typed job configuration loaded from a `.properties` file — parity with
  * the reference's Properties-driven jobs (reference:
  * src/StreamingSocketProcess.scala:80-99, src/StreamingFlumeProcess.scala:37-63;
  * property names kept recognizable, semantics documented per field). */
final case class GraftConfig(
    /** Micro-batch trigger interval, ms (`spark.streaming.batchInterval`). */
    batchIntervalMs: Long = 20000L,
    /** Records per output file — the reference's size-based flush
      * granularity (`spark.streaming.write-cache`) → `maxRecordsPerFile`. */
    writeCacheRecords: Int = 100000,
    /** Sink commit retries before dead-lettering (`retryTime`). */
    sinkRetries: Int = 3,
    /** Downstream partner names for the dual-write fan-out. */
    partners: Seq[String] = Seq("yaxin", "yiyang"),
    /** Socket source endpoint. */
    socketHost: String = "localhost",
    socketPort: Int = 9999,
    /** Checkpoint root (`spark.streaming.checkpoint.path`). */
    checkpointRoot: String = "/tmp/graft-checkpoints")

object GraftConfig {

  def load(path: String): GraftConfig = {
    val p = new Properties()
    val in = new FileInputStream(path)
    try p.load(in) finally in.close()
    fromProperties(p)
  }

  def fromProperties(p: Properties): GraftConfig = {
    val d = GraftConfig()
    def get(k: String, dflt: String): String =
      Option(p.getProperty(k)).map(_.trim).filter(_.nonEmpty).getOrElse(dflt)
    GraftConfig(
      batchIntervalMs =
        get("spark.streaming.batchInterval", d.batchIntervalMs.toString)
          .toLong,
      writeCacheRecords =
        get("spark.streaming.write-cache", d.writeCacheRecords.toString)
          .toInt,
      sinkRetries = get("retryTime", d.sinkRetries.toString).toInt,
      partners = get("partners", d.partners.mkString(","))
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      socketHost = get("socket.host", d.socketHost),
      socketPort = get("socket.port", d.socketPort.toString).toInt,
      checkpointRoot = get("spark.streaming.checkpoint.path",
        d.checkpointRoot))
  }
}
