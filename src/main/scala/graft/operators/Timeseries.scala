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
  */
object Timeseries {

  /** Hourly event counts per type on a GAP-FILLED grid: every
    * (event_type, hour) cell between the corpus's first and last hour
    * (inclusive, shared across types) carries its count, zero when no
    * event landed — the resample step every rate monitor starts from.
    * Hours are emitted as epoch millis (engine-portable, no timestamp
    * formatting contract). One count aggregate over the stream + one
    * one-row bounds aggregate; the grid (types × hours) left-joins the
    * counts, so missing cells surface as exact zeros. */
  def hourlyGapfill(events: DataFrame): DataFrame = {
    val counts = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    val bounds = events.agg(
      date_trunc("hour", min(col("ts"))).as("h_min"),
      date_trunc("hour", max(col("ts"))).as("h_max"))
    val grid = events.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds)) // 1-row frame
      .select(col("event_type"),
        explode(sequence(col("h_min"), col("h_max"),
          expr("INTERVAL 1 HOUR"))).as("hour"))
    grid.join(counts, Seq("event_type", "hour"), "left")
      .select(col("event_type"),
        unix_millis(col("hour")).as("hour_ms"),
        coalesce(col("n"), lit(0L)).as("n"))
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
                  minWindow: Int = 12): DataFrame = {
    val grid = hourlyGapfill(events)
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
}
