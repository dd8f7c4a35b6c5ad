package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Funnels.attribution]] — last-touch
  * conversion attribution emitted AS EACH CONVERSION ARRIVES via
  * `flatMapGroupsWithState`: the live per-channel conversion dashboard is
  * a `groupBy(attributed_type).count` over the emitted rows instead of a
  * per-report window pass over the whole event log.
  *
  * Semantics match the batch op on in-order input (spec-proven,
  * including the touch that crosses a micro-batch boundary): state
  * carries each user's latest non-conversion touch — one tiny
  * (tsMs, eventId, eventType) record per user, the
  * [[StreamingTransitions]] O(1)-state shape — and a conversion reads it,
  * applies the same integral epoch-ms window test, and emits
  * `attributed_type` (or 'none' when there is no touch or it aged out).
  * A conversion is NOT a touch for the next conversion, exactly the
  * batch rule.
  *
  * `idleTimeoutSeconds` reaps users idle past the bound. Any timeout
  * ≥ windowMs/1000 is attribution-lossless by construction: a touch
  * reaped after the timeout could only have attributed conversions
  * inside its window, which the timeout outlives — so unlike the
  * transition reaper, this dial trades memory against nothing once it
  * clears the window. */
object StreamingAttribution {

  case class AEvt(user_id: Long, ts: Timestamp, event_id: Long,
                  event_type: String)
  case class Touch(tsMs: Long, eventId: Long, eventType: String)
  case class Attribution(user_id: Long, conv_id: Long, conv_ts: Timestamp,
                         attributed_type: String)

  implicit val evtEnc: Encoder[AEvt] = Encoders.product[AEvt]
  implicit val stEnc: Encoder[Touch] = Encoders.product[Touch]
  implicit val outEnc: Encoder[Attribution] = Encoders.product[Attribution]
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  /** `events` must be a streaming Dataset[AEvt] with a watermark on `ts`
    * (required by the event-time timeout when `idleTimeoutSeconds` is
    * set). Emits one Attribution row per `conversionType` event. */
  def attributions(events: Dataset[AEvt],
                   conversionType: String = "purchase",
                   windowMs: Long = 24L * 3600 * 1000,
                   idleTimeoutSeconds: Option[Long] = None)
      : Dataset[Attribution] =
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Touch, Attribution](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[AEvt], state: GroupState[Touch]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val out = List.newBuilder[Attribution]
            var touch = state.getOption
            rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              if (e.event_type == conversionType) {
                val attributed = touch match {
                  case Some(t) if e.ts.getTime - t.tsMs <= windowMs =>
                    t.eventType
                  case _ => "none"
                }
                out += Attribution(user, e.event_id, e.ts, attributed)
              } else {
                touch = Some(Touch(e.ts.getTime, e.event_id, e.event_type))
              }
            }
            touch match {
              case Some(t) =>
                state.update(t)
                idleTimeoutSeconds.foreach { s =>
                  state.setTimeoutTimestamp(math.max(t.tsMs + s * 1000L,
                    state.getCurrentWatermarkMs() + 1))
                }
              case None => // only conversions this batch: keep prior state
            }
            out.result().iterator
          }
      }
}
