package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Funnels.transitionMatrix]] — emits
  * each (from_type → to_type) handoff AS IT HAPPENS via
  * `flatMapGroupsWithState`, so the live Markov dashboard is a
  * `groupBy(from_type, to_type).count` over the emitted rows instead of a
  * per-report rescan of the event log.
  *
  * Semantics match the batch op on in-order input (spec-proven): within a
  * micro-batch events are processed in (ts, event_id) order, and the
  * transition crossing a batch boundary is emitted because the state
  * carries each user's LAST event. Late events that arrive after a later
  * event was already consumed are a streaming reality the batch twin
  * doesn't have; the watermark bounds how late data can matter.
  *
  * Scale/state contract: state is ONE tiny (ts, event_id, event_type)
  * record per user — the previous event and nothing else; no history
  * accumulates (the same O(1)-per-user shape as [[Sessionize]], vs
  * topPaths' deliberately capped buffering). Without a timeout that is
  * one record per EVER-SEEN user; `idleTimeoutSeconds` reaps users idle
  * past the bound (an event-time timeout against the watermark), at the
  * documented cost that a handoff spanning a longer gap than the timeout
  * is not counted — the standard retention/memory dial, and a gap that
  * long is usually a new session, not a transition. */
object StreamingTransitions {

  case class TEvt(user_id: Long, ts: Timestamp, event_id: Long,
                  event_type: String)
  /** The user's last event: epoch-ms, tie-break id, type. */
  case class LastEvt(tsMs: Long, eventId: Long, eventType: String)
  case class Transition(user_id: Long, from_type: String, to_type: String,
                        ts: Timestamp)

  implicit val evtEnc: Encoder[TEvt] = Encoders.product[TEvt]
  implicit val stEnc: Encoder[LastEvt] = Encoders.product[LastEvt]
  implicit val outEnc: Encoder[Transition] = Encoders.product[Transition]
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  /** `events` must be a streaming Dataset[TEvt] with a watermark on `ts`
    * (required by the event-time timeout when `idleTimeoutSeconds` is
    * set). Emits one Transition row per consecutive event pair, stamped
    * with the LATER event's time. */
  def transitions(events: Dataset[TEvt],
                  idleTimeoutSeconds: Option[Long] = None)
      : Dataset[Transition] =
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEvt, Transition](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[TEvt], state: GroupState[LastEvt]) =>
          if (state.hasTimedOut) {
            // idle past the bound — the next event starts a fresh chain
            state.remove()
            Iterator.empty
          } else {
            val out = List.newBuilder[Transition]
            var last = state.getOption
            rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              last.foreach(l =>
                out += Transition(user, l.eventType, e.event_type, e.ts))
              last = Some(LastEvt(e.ts.getTime, e.event_id, e.event_type))
            }
            last.foreach { l =>
              state.update(l)
              // reap clamped above the watermark — a stale ts must not throw
              idleTimeoutSeconds.foreach { t =>
                state.setTimeoutTimestamp(math.max(l.tsMs + t * 1000L,
                  state.getCurrentWatermarkMs() + 1))
              }
            }
            out.result().iterator
          }
      }
}
