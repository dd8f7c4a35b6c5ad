package graft.sources

import java.net.InetSocketAddress
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.avro.Protocol
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.ipc.{SaslSocketServer, SaslSocketTransceiver, Server}
import org.apache.avro.ipc.generic.{GenericRequestor, GenericResponder}

/** A LIVE Avro-RPC receiver speaking Flume's `AvroSourceProtocol` — the
  * protocol the reference's polling stream consumes from Flume agents
  * (`FlumeUtils.createPollingStream`, reference:
  * src/StreamingFlumeProcess.scala:89-101). The protocol definition
  * (record `AvroFlumeEvent {headers: map<string>, body: bytes}`, messages
  * `append`/`appendBatch` returning `Status {OK, FAILED, UNKNOWN}`,
  * namespace `org.apache.flume.source.avro`) is public Flume API, declared
  * here verbatim as Avro protocol JSON and served by a
  * [[org.apache.avro.ipc.generic.GenericResponder]] — no Flume jars
  * involved.
  *
  * This closes the RPC-semantics half of the documented connector
  * boundary (SURVEY §7.4): the schema, message set, and Status handshake
  * are real and E2E-proven over avro-ipc's SASL socket transport
  * (anonymous mechanism — the stock plain-socket framing avro-ipc ships).
  * The ONE remaining delta to a stock Flume agent is the wire framing:
  * Flume's default RPC client frames over Netty, and the Netty transport
  * lives in a separate artifact (`avro-ipc-netty`) not present in this
  * environment. Protocol-compatible, transport-pluggable.
  *
  * Received events land as spool files in [[FlumeLikeSource]]'s contract
  * (one event body per line, originating filename carried by the [sic]
  * `flieName` header), so the EXISTING ingestion pipeline — the
  * Structured Streaming file source with exactly-once file tracking, or
  * the full DataSource V2 [[FlumeEventSource]] with admission control —
  * picks them up unchanged: network RPC → durable spool → streaming
  * query, with the spool as the replayable hand-off point (a receiver
  * that feeds memory instead would re-introduce the receiver-loss
  * semantics the SURVEY's redesign removed). Files commit tmp+rename
  * (the [[graft.sinks.FtpLikeSink]] discipline) so the file source never
  * lists a partial file; spool names get a per-receiver uniquifying
  * suffix — the reference itself salts its output names (SURVEY F9), and
  * the downstream `flieName` header keeps the original name as its stem.
  *
  * Bodies are treated as UTF-8 single-line records (the reference
  * pipeline's own assumption — its events are delimited CDR lines); a
  * body containing '\n' would split into multiple events downstream and
  * is the caller's contract violation, matching the line-oriented spool.
  */
object FlumeAvroReceiver {

  /** Flume's `AvroSourceProtocol`, from the public Flume API
    * (flume-ng-sdk's avro/flume.avdl), as Avro protocol JSON. */
  val ProtocolJson: String =
    """{
      |  "protocol": "AvroSourceProtocol",
      |  "namespace": "org.apache.flume.source.avro",
      |  "types": [
      |    {"type": "enum", "name": "Status",
      |     "symbols": ["OK", "FAILED", "UNKNOWN"]},
      |    {"type": "record", "name": "AvroFlumeEvent", "fields": [
      |      {"name": "headers", "type": {"type": "map", "values": "string"}},
      |      {"name": "body", "type": "bytes"}
      |    ]}
      |  ],
      |  "messages": {
      |    "append": {
      |      "request": [{"name": "event", "type": "AvroFlumeEvent"}],
      |      "response": "Status"
      |    },
      |    "appendBatch": {
      |      "request": [{"name": "events",
      |        "type": {"type": "array", "items": "AvroFlumeEvent"}}],
      |      "response": "Status"
      |    }
      |  }
      |}""".stripMargin

  val protocol: Protocol = Protocol.parse(ProtocolJson)
  private val StatusSchema =
    protocol.getType("org.apache.flume.source.avro.Status")
  private val EventSchema =
    protocol.getType("org.apache.flume.source.avro.AvroFlumeEvent")

  /** One Flume event, Scala-side. */
  final case class Event(headers: Map[String, String], body: Array[Byte])

  /** The responder: decode append/appendBatch, group the batch's events
    * by their `flieName` header, commit one spool file per group. Any
    * failure (unwritable spool, malformed request) answers `FAILED` —
    * Flume's own contract, letting a well-behaved client retry — rather
    * than tearing down the connection. */
  final class SpoolingResponder(spoolDir: String)
      extends GenericResponder(protocol) {
    private val seq = new AtomicLong(0L)

    override def respond(message: Protocol#Message,
                         request: AnyRef): AnyRef =
      try {
        val req = request.asInstanceOf[GenericRecord]
        val events: Seq[GenericRecord] = message.getName match {
          case "append" =>
            Seq(req.get("event").asInstanceOf[GenericRecord])
          case "appendBatch" =>
            req.get("events").asInstanceOf[java.lang.Iterable[AnyRef]]
              .asScala.toSeq.map(_.asInstanceOf[GenericRecord])
          case _ =>
            return new GenericData.EnumSymbol(StatusSchema, "UNKNOWN")
        }
        spool(events)
        new GenericData.EnumSymbol(StatusSchema, "OK")
      } catch {
        case NonFatal(_) =>
          new GenericData.EnumSymbol(StatusSchema, "FAILED")
      }

    private def headerMap(ev: GenericRecord): Map[String, String] =
      ev.get("headers").asInstanceOf[java.util.Map[AnyRef, AnyRef]]
        .asScala.map { case (k, v) => k.toString -> v.toString }.toMap

    private def bodyLine(ev: GenericRecord): String = {
      val buf = ev.get("body").asInstanceOf[ByteBuffer]
      val bytes = new Array[Byte](buf.remaining())
      buf.duplicate().get(bytes)
      new String(bytes, StandardCharsets.UTF_8)
    }

    private def spool(events: Seq[GenericRecord]): Unit = {
      val dir = Paths.get(spoolDir)
      Files.createDirectories(dir)
      val byName: Map[String, Seq[GenericRecord]] = events.groupBy(ev =>
        headerMap(ev).getOrElse(FlumeLikeSource.HeaderFileName, "events"))
      byName.foreach { case (name, evs) =>
        val stem = name.replaceAll("[^A-Za-z0-9._-]", "_")
        val content = evs.map(bodyLine).mkString("", "\n", "\n")
        commit(dir, stem, content.getBytes(StandardCharsets.UTF_8))
      }
    }

    /** tmp+rename into a not-yet-existing `<stem>.<n>` name. */
    private def commit(dir: Path, stem: String, bytes: Array[Byte]): Unit = {
      val tmpDir = dir.resolve(".tmp")
      Files.createDirectories(tmpDir)
      var target: Path = null
      do target = dir.resolve(s"$stem.${seq.incrementAndGet()}")
      while (Files.exists(target))
      val tmp = tmpDir.resolve(target.getFileName.toString)
      Files.write(tmp, bytes)
      try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
        Files.move(tmp, target) }
    }
  }

  /** Start a receiver on `port` (0 = ephemeral; read it back from
    * [[org.apache.avro.ipc.Server#getPort]]), spooling into `spoolDir`.
    * Caller owns the returned server's lifecycle (`close()`). */
  def serve(spoolDir: String, port: Int = 0): Server = {
    val server = new SaslSocketServer(new SpoolingResponder(spoolDir),
      new InetSocketAddress("127.0.0.1", port))
    server.start()
    server
  }

  /** A protocol-exact client (what a Flume agent's sink would be, minus
    * the Netty framing) — drives the receiver in specs and serves as the
    * reference emitter for anything wanting to push events in-process. */
  final class Client(port: Int, host: String = "127.0.0.1")
      extends AutoCloseable {
    private val transceiver =
      new SaslSocketTransceiver(new InetSocketAddress(host, port))
    private val requestor = new GenericRequestor(protocol, transceiver)

    private def toRecord(e: Event): GenericRecord = {
      val r = new GenericData.Record(EventSchema)
      val headers = new java.util.HashMap[CharSequence, CharSequence]()
      e.headers.foreach { case (k, v) => headers.put(k, v) }
      r.put("headers", headers)
      r.put("body", ByteBuffer.wrap(e.body))
      r
    }

    /** Send one event; returns the wire Status symbol ("OK"/"FAILED"). */
    def append(e: Event): String = {
      val msg = protocol.getMessages.get("append")
      val req = new GenericData.Record(msg.getRequest)
      req.put("event", toRecord(e))
      requestor.request("append", req).toString
    }

    /** Send a batch; one Status for the whole batch, per the protocol. */
    def appendBatch(es: Seq[Event]): String = {
      val msg = protocol.getMessages.get("appendBatch")
      val req = new GenericData.Record(msg.getRequest)
      val arr = new java.util.ArrayList[GenericRecord](es.size)
      es.foreach(e => arr.add(toRecord(e)))
      req.put("events", arr)
      requestor.request("appendBatch", req).toString
    }

    override def close(): Unit = transceiver.close()
  }
}
