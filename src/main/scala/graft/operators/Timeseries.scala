package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series shapes over the event stream: gap-filled
  * resampling and a trailing-window rate-anomaly scan. The reference's
  * only temporal notion is the 200 s processing-time window
  * (reference: src/StreamingSocketProcess60.scala:121 — no event time,
  * no grids, no baselines); these are the monitoring ops an ingest
  * pipeline runs on its own throughput: "did source X go quiet at 3am"
  * is invisible in a plain groupBy because an EMPTY hour produces no
  * row at all — the gap IS the signal, and only a materialized grid
  * shows it.
  *
  * Scale posture: the aggregate shrinks the stream to (types × hours)
  * rows before anything else happens; the grid is built by exploding a
  * `sequence()` against the one-row global bounds frame (broadcast — the
  * centroid-table pattern), so nothing event-sized is ever joined wide.
  * The anomaly window runs per type over hours — thousands of rows per
  * partition at century scale, never data-sized.
  *
  * Staged as counts → grid → test so the ONLINE maintainer
  * ([[graft.streaming.StreamingRate]]) can keep the (type, hour) count
  * state additively per micro-batch and serve the identical report off
  * it — counts are the mergeable state, grid and test are display-time.
  */
object Timeseries {

  private val HourMs = 3600L * 1000

  /** (event_type, hour_ms, n) — hourly counts, the ADDITIVE state form:
    * two count frames over disjoint event slices merge by summing `n`
    * per cell, which is what lets a stream maintain it per batch. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"),
        (expr(s"unix_millis(ts) div $HourMs") * HourMs).as("hour_ms"))
      .agg(count(lit(1)).as("n"))

  /** Gap-fill a [[hourlyCounts]] frame: every (event_type, hour) cell
    * between the observed first and last hour (inclusive, shared across
    * types) carries its count, zero when no event landed. The grid is a
    * long-range `sequence` exploded against the broadcast 1-row bounds
    * frame × the distinct types. */
  def gapfillFromCounts(counts: DataFrame): DataFrame = {
    val bounds = counts.agg(min(col("hour_ms")).as("h0"),
      max(col("hour_ms")).as("h1"))
    val grid = counts.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds)) // 1-row frame
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"), lit(HourMs)))
          .as("hour_ms"))
    grid.join(counts, Seq("event_type", "hour_ms"), "left")
      .select(col("event_type"), col("hour_ms"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Hourly event counts per type on a GAP-FILLED grid — the resample
    * step every rate monitor starts from. Hours are epoch millis
    * (engine-portable, no timestamp formatting contract). */
  def hourlyGapfill(events: DataFrame): DataFrame =
    gapfillFromCounts(hourlyCounts(events))

  /** The anomaly test over an already gap-filled (event_type, hour_ms, n)
    * grid — see [[rateAnomaly]] for the contract. Split out so the
    * online path scores the maintained state with the IDENTICAL code. */
  def anomalyOnGrid(grid: DataFrame, window: Int = 24, z: Int = 3,
                    minWindow: Int = 12): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_ms"))
      .rowsBetween(-window, -1)
    grid
      .withColumn("w", count(lit(1)).over(w))
      .withColumn("s", coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("ss",
        coalesce(sum(col("n") * col("n")).over(w), lit(0L)))
      .withColumn("dev2", {
        val d = col("w") * col("n") - col("s")
        d * d
      })
      .withColumn("bound",
        lit(z.toLong * z) * (col("w") * col("ss") - col("s") * col("s")))
      .withColumn("is_anomaly",
        when(col("w") >= minWindow && col("dev2") > col("bound"), 1L)
          .otherwise(0L))
      .select(col("event_type"), col("hour_ms"), col("n"), col("w"),
        col("dev2"), col("bound"), col("is_anomaly"))
  }

  /** Quiet-feed gap report — the summary the gap-filled grid exists to
    * enable: per event type, the number of MAXIMAL zero-count runs, the
    * longest run's length and start, and total quiet hours. A feed that
    * "mostly works" hides its 6-hour nightly outage inside per-hour
    * noise; the maximal-run view names it. Zero-runs are found with the
    * lag-flag → run-id chain ([[graft.operators.Cdc.scd2]]'s run
    * collapse applied to the is-zero bit), everything on the
    * (types × hours) grid — hours-sized frames, never event-sized. */
  def gapReport(events: DataFrame): DataFrame = {
    val grid = hourlyGapfill(events)
      .withColumn("is_zero", when(col("n") === 0L, 1L).otherwise(0L))
    val wOrd = Window.partitionBy(col("event_type"))
      .orderBy(col("hour_ms"))
    val runs = grid
      .withColumn("chg",
        when(lag(col("is_zero"), 1).over(wOrd).isNull
          || lag(col("is_zero"), 1).over(wOrd) =!= col("is_zero"), 1L)
          .otherwise(0L))
      .withColumn("run", sum(col("chg")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("is_zero") === 1L)
      .groupBy(col("event_type"), col("run"))
      .agg(count(lit(1)).as("len"), min(col("hour_ms")).as("start_ms"))
    val perType = runs.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        max(col("len")).as("longest_gap_hours"),
        sum(col("len")).as("quiet_hours"))
    // the longest gap's start (ties -> earliest): runs-sized join back
    val longestStart = runs
      .join(perType.select(col("event_type"),
        col("longest_gap_hours").as("len")), Seq("event_type", "len"))
      .groupBy(col("event_type"))
      .agg(min(col("start_ms")).as("longest_gap_start_ms"))
    perType.join(longestStart, "event_type")
  }

  /** Trailing-window rate anomaly over the [[hourlyGapfill]] grid: per
    * type, each hour's count is compared to the mean/variance of the
    * PREVIOUS `window` hours (a ROWS frame — the current hour never
    * contaminates its own baseline), and flagged when it sits more than
    * `z` standard deviations out. The test is the z-score inequality
    * cleared of divisions — with S = Σ baseline counts, SS = Σ counts²,
    * w = baseline rows: |x − S/w| > z·σ  ⇔  (w·x − S)² > z²·(w·SS − S²)
    * — every term an exact BIGINT, so both engines decide every flag on
    * integer arithmetic with no float/rounding contract at all (the
    * PageRank discipline applied to monitoring). Warm-up rows with fewer
    * than `minWindow` baseline hours report is_anomaly = 0 (their `w`
    * says why). A zero-variance baseline flags ANY deviation — a feed
    * that produced exactly 7 events per hour for a day and then 8 IS
    * news. Emits the decision inputs (n, w, dev2 = (w·x−S)²,
    * bound = z²·(w·SS−S²)) so a dashboard can show margins, not just
    * bits. */
  def rateAnomaly(events: DataFrame, window: Int = 24, z: Int = 3,
                  minWindow: Int = 12): DataFrame =
    anomalyOnGrid(hourlyGapfill(events), window, z, minWindow)

  /** CUSUM change-point scan over the gap-filled hourly grid — the
    * SEQUENTIAL drift detector that complements [[rateAnomaly]]'s
    * per-point z-test: a feed that shifts from 100/h to 115/h never
    * trips a 3σ point test, but the shift ACCUMULATES, and Page's CUSUM
    * (Page, Biometrika 1954) is the classic sequential statistic for it:
    * S⁺_i = max(0, S⁺_{i−1} + (x_i − μ − k)) for upward drifts, the
    * mirrored S⁻ for downward, alarm when S crosses h.
    *
    * The max(0, ·) recursion looks inherently sequential, but it has a
    * closed windowed form: with C_i the running sum of d_j = x_j − μ − k,
    * S_i = C_i − min(0, min_{j≤i} C_j) — so the whole scan is two
    * cumulative window passes per direction over the (types × hours)
    * grid, no iteration, no driver loop, partition size independent of
    * event volume.
    *
    * Numeric discipline: all terms in 1e-6 integer units. Per-type mean
    * μ_e6 = (10⁶·Σn) div hours; slack k = μ/`slackDenom` (the classic
    * "half the shift you want to detect"); threshold h = `threshMul`·μ.
    * Every comparison is exact BIGINT — no float/rounding contract.
    * Emits the full grid with decision inputs (n, s_up_e6, s_dn_e6) and
    * alarm bits, so a dashboard shows margins and onset hours, not just
    * flags. */
  def cusumOnGrid(grid: DataFrame, slackDenom: Int = 20,
                  threshMul: Int = 2): DataFrame = {
    val stats = grid.groupBy("event_type")
      .agg(sum("n").as("tot"), count(lit(1)).as("nh"))
      .select(col("event_type"),
        expr("(1000000 * tot) DIV nh").as("mu_e6"))
    val w = Window.partitionBy("event_type").orderBy("hour_ms")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(broadcast(stats), "event_type")
      .withColumn("k_e6", expr(s"mu_e6 DIV $slackDenom"))
      .withColumn("h_e6", expr(s"$threshMul * mu_e6"))
      .withColumn("c_up", sum(expr("1000000 * n - mu_e6 - k_e6")).over(w))
      .withColumn("c_dn", sum(expr("mu_e6 - k_e6 - 1000000 * n")).over(w))
      .withColumn("s_up_e6", col("c_up") - least(lit(0L), min("c_up").over(w)))
      .withColumn("s_dn_e6", col("c_dn") - least(lit(0L), min("c_dn").over(w)))
      .select(col("event_type"), col("hour_ms"), col("n"),
        col("s_up_e6"), col("s_dn_e6"),
        when(col("s_up_e6") > col("h_e6"), 1L).otherwise(0L)
          .as("alarm_up"),
        when(col("s_dn_e6") > col("h_e6"), 1L).otherwise(0L)
          .as("alarm_dn"))
  }

  /** [[cusumOnGrid]] over [[hourlyGapfill]] — the batch entry point; the
    * grid split keeps the online state-maintenance path
    * ([[graft.streaming.StreamingRate]]) able to serve the identical
    * scan off its maintained counts. */
  def cusum(events: DataFrame, slackDenom: Int = 20,
            threshMul: Int = 2): DataFrame =
    cusumOnGrid(hourlyGapfill(events), slackDenom, threshMul)

  /** HOUR-OF-WEEK seasonal profile over the gap-filled grid — the
    * baseline [[rateAnomaly]] can't provide: a trailing-24h window
    * calls every Monday-morning surge an anomaly because its baseline
    * is Sunday; the seasonal profile compares each hour to ITS OWN
    * week-slot peers across weeks. Week-slot = epoch-hour mod 168
    * (slot 0 = Thursday 00:00 UTC — the epoch's own alignment, no
    * timezone contract). Empty hours participate (the gap-fill
    * discipline: a feed that is quiet every Sunday 03:00 has a LOW
    * baseline there, not a missing one). mean_e4 is the exact integer
    * quotient (10⁴·Σn) div slots — engine-portable, no float path.
    *
    * Scale shape: events collapse to the (types × hours) grid first;
    * the profile is a (types × 168)-row aggregate of that grid. */
  def seasonalProfileOnGrid(grid: DataFrame): DataFrame =
    grid
      .withColumn("week_slot", expr(s"(hour_ms div $HourMs) % 168"))
      .groupBy(col("event_type"), col("week_slot"))
      .agg(count(lit(1)).as("n_slots"), sum(col("n")).as("n_events"),
        expr("(10000 * sum(n)) DIV count(1)").as("mean_e4"))

  /** [[seasonalProfileOnGrid]] over [[hourlyGapfill]]. */
  def seasonalProfile(events: DataFrame): DataFrame =
    seasonalProfileOnGrid(hourlyCounts(events)
      .transform(gapfillFromCounts))

  /** The hours that deviate MOST from their own week-slot baseline —
    * top `k` by |10⁴·n − mean_e4|, deterministic total order (residual
    * magnitude desc, then type, then hour). The profile side of the
    * join is (types × 168) rows — broadcast; the grid never shuffles.
    * The hour's own count is inside its slot baseline (a profile is a
    * description of the corpus, not a held-out forecast; the residual
    * ranking is unaffected because every hour in a slot shares the
    * same baseline). */
  def seasonalResiduals(events: DataFrame, k: Int = 20): DataFrame = {
    val grid = hourlyGapfill(events)
    val prof = seasonalProfileOnGrid(grid)
      .select(col("event_type"), col("week_slot"), col("mean_e4"))
    grid
      .withColumn("week_slot", expr(s"(hour_ms div $HourMs) % 168"))
      .join(broadcast(prof), Seq("event_type", "week_slot"))
      .withColumn("resid_e4", lit(10000L) * col("n") - col("mean_e4"))
      .orderBy(abs(col("resid_e4")).desc, col("event_type"),
        col("hour_ms"))
      .limit(k)
      .select(col("event_type"), col("hour_ms"), col("week_slot"),
        col("n"), col("mean_e4"), col("resid_e4"))
  }
}
