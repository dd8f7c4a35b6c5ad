package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization over an event stream — custom keyed state via
  * `flatMapGroupsWithState` (the Structured Streaming state primitive; the
  * reference keeps no stream state at all, SURVEY §2.6 T8 — this is a
  * north-star capability a training-data/clickstream pipeline needs).
  *
  * A session = consecutive events of one user with gaps < `gapSeconds`.
  * The streaming variant emits a session when event time passes its
  * gap-timeout (watermark-driven, append mode — late data beyond the
  * watermark is dropped deterministically). The batch twin computes the same
  * sessions with window functions and is DuckDB-oracle-checkable.
  *
  * Scale: state is one small record per ACTIVE user (not per event);
  * partitioning is by user key, so state shards across executors.
  */
object Sessionize {

  case class Evt(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  case class SessionOut(user_id: Long, session_start: Timestamp,
                        session_end: Timestamp, n_events: Long,
                        sum_value: Double)

  implicit val evtEnc: Encoder[Evt] = Encoders.product[Evt]
  implicit val stEnc: Encoder[SessionState] = Encoders.product[SessionState]
  implicit val outEnc: Encoder[SessionOut] = Encoders.product[SessionOut]
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  /** Streaming sessionize: `events` must be a streaming Dataset[Evt] with a
    * watermark already applied on `ts`. */
  def sessions(events: Dataset[Evt], gapSeconds: Long): Dataset[SessionOut] =
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Evt],
         state: GroupState[SessionState]) =>
          val gapMs = gapSeconds * 1000
          def toOut(s: SessionState) = SessionOut(user,
            new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum)
          if (state.hasTimedOut) {
            val out = state.getOption.map(toOut).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var emitted = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.last, t),
                    s.n + 1, s.sum + e.value))
                case Some(s) => // gap exceeded: close previous session
                  emitted ::= toOut(s)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            emitted.reverseIterator
          }
      }

  /** Batch twin: identical session boundaries via window functions
    * (new-session flag on gap > threshold, running sum as session id). */
  def sessionsBatch(events: DataFrame, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    // microsecond-precision gap compare (a seconds-truncated compare would
    // disagree with the oracle at fractional-second boundaries)
    val us = unix_micros(col("ts"))
    val newSession = when(
      us - lag(us, 1).over(byUser) > gapSeconds * 1000000L ||
        lag(us, 1).over(byUser).isNull, 1).otherwise(0)
    events
      .withColumn("new_s", newSession)
      .withColumn("sid",
        sum(col("new_s")).over(byUser.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("session_end"))
  }

  /** NATIVE session-window twin — the same gap sessionization through
    * Spark's built-in `session_window` aggregate (its dedicated
    * merging-sessions physical path) instead of the lag/cumsum window
    * formulation. Merge semantics MEASURED, not assumed: session_window
    * merges INCLUSIVELY — an event arriving exactly `gapSeconds` after
    * the previous one joins its session (windows [t, t+gap] touch ⇒
    * merge), which is precisely [[sessionsBatch]]'s `gap > threshold`
    * split rule — so the two formulations share one contract and one
    * oracle shape, and the exact-boundary case is spec-pinned as
    * MERGING in both rather than left to folklore.
    *
    * Scale shape: no user-keyed sort window at all — session merging
    * runs inside the aggregate (partial merge then final), the shape
    * Spark ships for exactly this job. */
  def sessionsNative(events: DataFrame, gapSeconds: Long): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapSeconds seconds").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("session_end"))
      .select(col("user_id"), col("n_events"), col("session_start"),
        col("session_end"))

  /** One-row session-health summary over [[sessionsBatch]]'s gap-split
    * sessions: how many sessions, how many users, and the mean/max session
    * length in events and duration — the dashboard headline the per-session
    * frame is too big to read. Durations are integral epoch-ms deltas
    * (exact, engine-portable); the two means are 4dp quotients of integral
    * sums, the standard portability contract. A single-event session has
    * duration 0, not null.
    *
    * Scale shape: [[sessionsBatch]]'s user-keyed window + aggregate, then
    * ONE global 1-row aggregate (partial-agg; nothing else moves). */
  def sessionStatsBatch(events: DataFrame, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val us = unix_micros(col("ts"))
    val newSession = when(
      us - lag(us, 1).over(byUser) > gapSeconds * 1000000L ||
        lag(us, 1).over(byUser).isNull, 1).otherwise(0)
    events
      .withColumn("new_s", newSession)
      .withColumn("sid",
        sum(col("new_s")).over(byUser.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_events"),
        (unix_millis(max(col("ts"))) - unix_millis(min(col("ts"))))
          .as("dur_ms"))
      .agg(
        count(lit(1)).cast("long").as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("n_events")).cast("double") / count(lit(1)), 4)
          .as("avg_events"),
        max(col("n_events")).cast("long").as("max_events"),
        round(sum(col("dur_ms")).cast("double") / count(lit(1)), 4)
          .as("avg_duration_ms"),
        max(col("dur_ms")).cast("long").as("max_duration_ms"))
  }

  /** Gap-threshold sweep for the sessionization dial: session counts and
    * mean session length at each candidate gap, read off ONE user-keyed
    * lag pass (a session starts where the user's inter-event gap is null
    * or exceeds the threshold, so n_sessions is a conditional count — no
    * per-gap re-sessionization). The companion table to
    * `events_interarrival_hist`: the histogram shows where think-time
    * mass sits, this sweep shows what each cutoff DOES to the session
    * frame before a gap is committed. All counts exact integers; the
    * mean is an integral-count quotient rounded 4dp. */
  def sessionGapSweep(events: DataFrame,
                      gapsSeconds: Seq[Long] = Seq(300, 1800, 3600, 86400))
      : DataFrame = {
    require(gapsSeconds.nonEmpty, "sessionGapSweep: at least one gap")
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val us = unix_micros(col("ts"))
    val g = events.withColumn("gap_us", us - lag(us, 1).over(byUser))
    val aggCols = gapsSeconds.map { s =>
      sum(when(col("gap_us").isNull || col("gap_us") > s * 1000000L, 1L)
        .otherwise(0L)).as(s"ns_$s")
    } :+ count(lit(1)).as("n_events")
    g.agg(aggCols.head, aggCols.tail: _*)
      .select(explode(array(gapsSeconds.map(s =>
        struct(lit(s).as("gap_seconds"), col(s"ns_$s").as("n_sessions"),
          col("n_events"))): _*)).as("r"))
      .select(col("r.gap_seconds").as("gap_seconds"),
        col("r.n_sessions").as("n_sessions"),
        col("r.n_events").as("n_events"),
        round(col("r.n_events").cast("double") / col("r.n_sessions"), 4)
          .as("mean_events_per_session"))
  }
}
