package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-behavior analytics over an event stream — the funnel and
  * retention reports every product-analytics engine ships and the
  * reference's CDR world would call usage analysis. Both are composed from
  * equi-joins and aggregates keyed on the user, so they scale like any
  * hash-partitioned pipeline: no window over the whole stream, nothing
  * quadratic, nothing collected. */
object Funnels {

  /** Strict-order funnel: for each step i, the users whose FIRST qualifying
    * occurrence of step i happens strictly AFTER their first qualifying
    * occurrence of step i−1 (the classic "view → click → purchase within
    * the account's own timeline" report). Emits one row per step:
    * (step_idx, step, n_users), n_users non-increasing by construction.
    *
    * `within` adds the CONVERSION-WINDOW variant every real funnel report
    * uses ("click within 2 hours of the view"): step i qualifies only when
    * its first strictly-later occurrence lands at most `within` after the
    * user's step-(i−1) reach time — e.g.
    * `within = Some(expr("INTERVAL 2 HOURS"))`. The bound applies between
    * CONSECUTIVE steps (each measured from the previous step's first
    * qualifying time), not from the funnel's start; n_users stays
    * non-increasing by construction since the window only filters.
    *
    * Scale shape: step i is one equi-join (user) of the step-i events
    * against the step-(i−1) reach frame plus a per-user min — S joins for
    * an S-step funnel, each keyed on user_id, shuffle-partitioned like any
    * hash join; the window bound is a post-join filter on already-joined
    * rows (no extra shuffle); the unioned count rows are 1-row aggregates.
    * Each step's reach frame is lazily localCheckpoint-ed, so step i+1
    * consumes step i's MATERIALIZED result instead of re-inlining the
    * whole join prefix — each step-events scan runs exactly once (S
    * scans, not S²/2), and the plan stays lazy until the first action. */
  def funnel(events: DataFrame, steps: Seq[String],
             userCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type",
             within: Option[Column] = None): DataFrame = {
    require(steps.nonEmpty, "funnel: at least one step")
    var reached: DataFrame = null
    val counts = steps.zipWithIndex.map { case (st, i) =>
      val occ = events.filter(col(typeCol) === st)
        .select(col(userCol).as("u"), col(tsCol).as("t"))
      reached =
        if (i == 0) occ.groupBy("u").agg(min(col("t")).as("t"))
        else occ.join(reached.select(col("u"), col("t").as("tp")), Seq("u"))
          .filter(col("t") > col("tp") &&
            within.map(w => col("t") <= col("tp") + w).getOrElse(lit(true)))
          .groupBy("u").agg(min(col("t")).as("t"))
      // lazy cut: step i+1 (and the union'd count legs) reuse this frame's
      // materialized rows instead of re-running the whole join prefix
      reached = reached.localCheckpoint(eager = false)
      reached.agg(count(lit(1)).cast("long").as("n_users"))
        .select(lit((i + 1).toLong).as("step_idx"), lit(st).as("step"),
          col("n_users"))
    }
    counts.reduce(_ unionByName _)
  }

  /** Segmented funnel — the A/B-comparison form of [[funnel]]: the same
    * strict-order per-user reach chain, reported PER SEGMENT (experiment
    * arm, country, platform…). Emits one row per (step, segment):
    * (step_idx, step, seg, n_users); within each segment n_users is
    * non-increasing by construction. `segment` must be constant per user
    * (an arm assignment is a pure function of the user); it is evaluated
    * on each event row and resolved per user as `min(seg)`, so a
    * non-constant column degrades deterministically instead of
    * double-counting users.
    *
    * Scale shape: identical to [[funnel]] — S user-keyed equi-joins; the
    * segment tag rides the reach frames (no extra join, no extra shuffle:
    * the per-user min(seg) folds into the same aggregate that computes
    * the reach time); the counts are ≤|segments|-row aggregates. */
  def funnelBySegment(events: DataFrame, steps: Seq[String],
                      segment: Column,
                      userCol: String = "user_id", tsCol: String = "ts",
                      typeCol: String = "event_type",
                      within: Option[Column] = None): DataFrame = {
    require(steps.nonEmpty, "funnelBySegment: at least one step")
    var reached: DataFrame = null
    val counts = steps.zipWithIndex.map { case (st, i) =>
      val occ = events.filter(col(typeCol) === st)
        .select(col(userCol).as("u"), col(tsCol).as("t"), segment.as("seg"))
      reached =
        if (i == 0)
          occ.groupBy("u")
            .agg(min(col("t")).as("t"), min(col("seg")).as("seg"))
        else occ.drop("seg")
          .join(reached.select(col("u"), col("t").as("tp"), col("seg")),
            Seq("u"))
          .filter(col("t") > col("tp") &&
            within.map(w => col("t") <= col("tp") + w).getOrElse(lit(true)))
          .groupBy("u")
          .agg(min(col("t")).as("t"), min(col("seg")).as("seg"))
      reached = reached.localCheckpoint(eager = false)
      reached.groupBy("seg")
        .agg(count(lit(1)).cast("long").as("n_users"))
        .select(lit((i + 1).toLong).as("step_idx"), lit(st).as("step"),
          col("seg"), col("n_users"))
    }
    counts.reduce(_ unionByName _)
  }

  /** Time-to-convert for each consecutive funnel transition: among the
    * users who reach step i (same strict-order first-qualifying-occurrence
    * semantics as [[funnel]], including the optional `within` bound), the
    * gap between their step-(i−1) reach time and their step-i reach time.
    * Emits one row per transition: (step_idx, from_step, to_step, n_users,
    * avg_ms, min_ms, max_ms) — the "how long does the funnel take", which
    * the step-count report can't answer. Deltas are integral epoch-ms
    * (exact, engine-portable); only the avg is a rounded quotient (4dp,
    * same contract as [[retention]].share). A transition nobody completes
    * reports n_users=0 with null avg/min/max (an aggregate over zero rows,
    * not a fabricated zero).
    *
    * Scale shape: identical to [[funnel]] — S user-keyed equi-joins; the
    * previous reach time rides the same per-user aggregate that computes
    * the reach time (min over a per-user-constant column — no extra join,
    * no extra shuffle); each transition row is a 1-row aggregate. */
  def funnelLatency(events: DataFrame, steps: Seq[String],
                    userCol: String = "user_id", tsCol: String = "ts",
                    typeCol: String = "event_type",
                    within: Option[Column] = None): DataFrame = {
    require(steps.size >= 2, "funnelLatency: need at least two steps")
    var reached: DataFrame = null
    val rows = steps.zipWithIndex.map { case (st, i) =>
      val occ = events.filter(col(typeCol) === st)
        .select(col(userCol).as("u"), col(tsCol).as("t"))
      if (i == 0) {
        reached = occ.groupBy("u").agg(min(col("t")).as("t"))
          .localCheckpoint(eager = false)
        None
      } else {
        reached = occ
          .join(reached.select(col("u"), col("t").as("tp")), Seq("u"))
          .filter(col("t") > col("tp") &&
            within.map(w => col("t") <= col("tp") + w).getOrElse(lit(true)))
          .groupBy("u")
          // tp is per-user constant (it came out of a groupBy on u), so
          // min() just carries it through the reach aggregate
          .agg(min(col("t")).as("t"), min(col("tp")).as("tp"))
          .localCheckpoint(eager = false)
        val ms = (unix_millis(col("t")) - unix_millis(col("tp"))).as("ms")
        Some(reached.select(ms)
          .agg(count(lit(1)).cast("long").as("n_users"),
            round(avg(col("ms")), 4).as("avg_ms"),
            min(col("ms")).as("min_ms"), max(col("ms")).as("max_ms"))
          .select(lit(i.toLong).as("step_idx"),
            lit(steps(i - 1)).as("from_step"), lit(st).as("to_step"),
            col("n_users"), col("avg_ms"), col("min_ms"), col("max_ms")))
      }
    }
    rows.flatten.reduce(_ unionByName _)
  }

  /** Most common length-`n` behavior sequences: each user's events in
    * (ts, event_id) order yield their consecutive `n`-step paths
    * ("view>click>purchase"), counted globally, top `k` by (count desc,
    * path asc) — the exploratory report that tells an analyst WHICH
    * funnels are worth defining before [[funnel]] measures one. The
    * per-user ordering key includes event_id, so ties at the same
    * timestamp order deterministically across engines and layouts.
    *
    * Scale shape: per-user state is HARD-BOUNDED at `maxEvents` — a
    * row_number() over (user, ts, event_id) keeps each user's FIRST
    * `maxEvents` events BEFORE the sequence aggregate, so a firehose/bot
    * user with 10M events contributes a capped array, not a single-row
    * memory spike. The bound must sit before collect_list, not after: the
    * window's per-partition sort spills to disk under pressure, while an
    * aggregation buffer holding an unbounded list cannot — slicing the
    * collected array would bound the OUTPUT but not the buffer that
    * builds it. Truncated (cap-hitting) users are observable via the
    * `metricName` metric (`n_capped_users`); Spark requires observed-metric
    * names to be UNIQUE per query, so composing two topPaths invocations in
    * one plan (e.g. a union over two event frames) needs distinct names —
    * same contract as `ngramJaccard`'s metricName parameter. The window's
    * user-hash shuffle is the same distribution the sequence aggregate
    * needs, so the cap costs a sort, not an extra exchange; the path count
    * is an ordinary partial-agg shuffle on the path key; top-k is a
    * TakeOrdered. */
  def topPaths(events: DataFrame, n: Int = 3, k: Int = 10,
               userCol: String = "user_id", tsCol: String = "ts",
               typeCol: String = "event_type",
               eventIdCol: String = "event_id",
               maxEvents: Int = 10000,
               metricName: String = "top_paths_input"): DataFrame = {
    require(n >= 2, "topPaths: need length >= 2")
    require(maxEvents >= n, s"topPaths: maxEvents ($maxEvents) must cover " +
      s"at least one $n-step path")
    val ordered = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(eventIdCol))
    val bounded = events
      .select(col(userCol), col(tsCol), col(eventIdCol), col(typeCol))
      .withColumn("rn", row_number().over(ordered))
      .filter(col("rn") <= maxEvents)
      .observe(metricName,
        sum(when(col("rn") === maxEvents, 1L).otherwise(0L))
          .as("n_capped_users"))
    val seqs = bounded.groupBy(col(userCol))
      .agg(transform(
        array_sort(collect_list(struct(col(tsCol), col(eventIdCol),
          col(typeCol).as("et")))),
        s => s.getField("et")).as("seq"))
    seqs.filter(size(col("seq")) >= n)
      .select(explode(transform(
        sequence(lit(1), size(col("seq")) - (n - 1)),
        i => concat_ws(">", slice(col("seq"), i, lit(n))))).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(k)
  }

  /** Daily engagement: per calendar day, DAU (distinct active users),
    * trailing-`windowDays` WAU (distinct users active in the window ENDING
    * that day), and stickiness = DAU/WAU — the DAU/MAU-style health metric
    * every analytics engine reports. Output per day with any activity:
    * (day, dau, wau, stickiness); counts exact BIGINT, stickiness the
    * usual 4dp integral-count quotient.
    *
    * The trailing window is computed WITHOUT a distinct-over-window (which
    * no engine does distributively): each distinct (user, day) activity row
    * "covers" days d..d+W−1 via a W-element explode, and WAU(x) is then a
    * plain distinct count per covered day — turning a windowed distinct
    * into two ordinary partial-agg shuffles at a ×W row cost (W is 7;
    * the exploded frame is user-day-scale, tiny next to the event stream).
    *
    * Scale shape: one distinct (user, day) projection off the stream (the
    * only event-scale scan), a ×W explode + distinct on user-keyed
    * shuffles, two per-day aggregates (≤days keys), and a day-keyed join
    * of two day-sized frames (AQE broadcasts). */
  def engagement(events: DataFrame, windowDays: Int = 7,
                 userCol: String = "user_id",
                 tsCol: String = "ts"): DataFrame = {
    require(windowDays >= 1, "engagement: window must be >= 1 day")
    val ud = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("d")).distinct()
    val dau = ud.groupBy("d").agg(count(lit(1)).cast("long").as("dau"))
    val wau = ud
      .select(col("u"), col("d"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("off"))
      .select(col("u"), date_add(col("d"), col("off")).as("d")).distinct()
      .groupBy("d").agg(count(lit(1)).cast("long").as("wau"))
    dau.join(wau, Seq("d"))
      .select(col("d").as("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 4).as("stickiness"))
  }

  /** KAPLAN-MEIER retention/survival curve — the censoring-aware answer
    * to "how long do users stay?" that [[retention]]'s fixed offsets
    * can't give: a user's observed lifetime is their last-seen day minus
    * their first-seen day, and users still active near the corpus edge
    * (last seen within `censorDays` of the max date) are CENSORED — they
    * tell us their lifetime is at least L, not that they churned at L.
    * Naive averages treat them as churned and systematically undercount
    * retention; the KM estimator uses them correctly: at each distinct
    * churn lifetime t, S(t) ·= (1 − d_t/n_t) with n_t = users whose
    * lifetime (churned or censored) is ≥ t.
    *
    * Portability: d_t and n_t are exact integers; each step's
    * ln(1 − d/n) is 1e-8 micro-rounded before the cumulative BIGINT sum
    * (the LM-family contract — the product becomes an
    * order-independent sum), and S(t) = exp(cum)/… rounds once to 4dp.
    * A step that empties its risk set (n = d) pins S to exactly 0 from
    * that point via an integer flag, not a −∞ ln. Output one row per
    * distinct CHURN lifetime: (lifetime_days, n_risk, n_churned,
    * n_censored_here, survival).
    *
    * Scale shape: one user-keyed aggregate (first/last), one
    * lifetime-keyed aggregate, then windows over DISTINCT lifetimes —
    * histogram-sized (bounded by the corpus's day span), never
    * user-sized. */
  def survivalCurve(events: DataFrame, censorDays: Int = 7,
                    userCol: String = "user_id",
                    tsCol: String = "ts"): DataFrame = {
    val users = events.groupBy(col(userCol).as("u"))
      .agg(to_date(min(col(tsCol))).as("first_d"),
        to_date(max(col(tsCol))).as("last_d"))
    val maxD = events.agg(to_date(max(col(tsCol))).as("max_d"))
    val lifetimes = users.crossJoin(broadcast(maxD))
      .select(datediff(col("last_d"), col("first_d")).cast("long")
          .as("lifetime"),
        (datediff(col("max_d"), col("last_d")) < censorDays).as("censored"))
    val byLife = lifetimes.groupBy("lifetime").agg(
      sum(when(!col("censored"), 1L).otherwise(0L)).as("d"),
      sum(when(col("censored"), 1L).otherwise(0L)).as("c"))
    val wAsc = Window.orderBy(col("lifetime"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = Window.orderBy(col("lifetime"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withRisk = byLife
      .crossJoin(broadcast(byLife.agg(sum(col("d") + col("c")).as("tot"))))
      .withColumn("n_risk",
        col("tot") - coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
      .withColumn("step_micro",
        when(col("d") === 0, lit(0L))
          .when(col("n_risk") > col("d"),
            round(log((col("n_risk") - col("d")).cast("double") /
              col("n_risk").cast("double")) * 1e8, 0).cast("long"))
          .otherwise(lit(0L)))
      .withColumn("dead",
        when(col("d") > 0 && col("n_risk") <= col("d"), 1L).otherwise(0L))
    withRisk
      .withColumn("cum_micro", sum(col("step_micro")).over(wAsc))
      .withColumn("cum_dead", sum(col("dead")).over(wAsc))
      .filter(col("d") > 0)
      .select(col("lifetime").as("lifetime_days"), col("n_risk"),
        col("d").as("n_churned"), col("c").as("n_censored_here"),
        when(col("cum_dead") > 0, lit(0.0))
          .otherwise(round(exp(col("cum_micro").cast("double") / 1e8), 4))
          .as("survival"))
  }

  /** LAST-TOUCH ATTRIBUTION — for each conversion event, the latest
    * PRIOR non-conversion event by the same user within `windowMs`, and
    * the per-channel conversion counts that result: the report that says
    * which behavior actually precedes purchase (the marketing twin of
    * [[transitionMatrix]]'s unconditional handoffs). Conversions with no
    * qualifying touch (first-ever event, or the last touch aged out of
    * the window) land in an explicit 'none' row instead of vanishing.
    *
    * Both the touch TYPE and its TIMESTAMP come from the same running
    * `last(..., ignoreNulls)` frame over (ms, event_id) order — one
    * ordered row, read twice — so the window test can never pair one
    * event's type with another's time. Integral epoch-ms deltas decide
    * the window (the funnel-latency contract); ordering ties break on
    * event_id, so the attribution is deterministic.
    *
    * Scale shape: one user-keyed window pass (the transition-matrix
    * shape — per-user state, never a global window) + a ≤|event types|
    * aggregate with a 1-row broadcast total. */
  def attribution(events: DataFrame, conversionType: String = "purchase",
                  windowMs: Long = 24L * 3600 * 1000,
                  userCol: String = "user_id",
                  tsCol: String = "ts"): DataFrame = {
    val base = events.select(col(userCol).as("u"),
      col("event_id").as("eid"), unix_millis(col(tsCol)).as("ms"),
      col("event_type").as("et"))
    val w = Window.partitionBy("u").orderBy(col("ms"), col("eid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("et") =!= conversionType, col("et"))
    val touchMs = when(col("et") =!= conversionType, col("ms"))
    val g = base
      .withColumn("prev_et", last(touch, ignoreNulls = true).over(w))
      .withColumn("prev_ms", last(touchMs, ignoreNulls = true).over(w))
      .filter(col("et") === conversionType)
      .select(when(col("prev_ms").isNotNull &&
          col("ms") - col("prev_ms") <= windowMs, col("prev_et"))
        .otherwise(lit("none")).as("attributed_type"))
      .groupBy("attributed_type")
      .agg(count(lit(1)).as("n_conversions"))
    g.crossJoin(broadcast(g.agg(sum(col("n_conversions")).as("tot"))))
      .select(col("attributed_type"), col("n_conversions"),
        round(col("n_conversions").cast("double") / col("tot"), 4)
          .as("share"))
  }

  /** DAU by HyperLogLog++ next to the exact count — [[engagement]]'s
    * production twin for the distinct that dominates its cost: exact
    * per-day distinct users shuffles every (day, user) pair, while the
    * sketch is one map-side-mergeable aggregate (the `vocab_hll_x10`
    * scale cell measures the same estimator's drift on the ×10 corpus:
    * rsd 0.01 read rel_err 0.0). Reported as exact | estimate | 4dp
    * relative error per day, so the rsd dial is measured against this
    * corpus the way the CMS/quality sketches measure theirs. Default
    * rsd 0.02 = 2^12 HLL registers: rsd 0.01 quadruples the register
    * file to 2^14, whose declarative-aggregate buffer bloats the
    * generated stage code past Spark's 1000 KiB task-binary warning —
    * a real dial at 1000 groups × 12 KB of partial-agg state each, and
    * needless precision for a daily-active report whose exact twin
    * rides in the same row. Estimator internals are engine-specific →
    * no SQL oracle; the gate is the spec (estimate exact at fixture
    * cardinalities, error column arithmetic) + the in-row exact
    * column. */
  def dauApprox(events: DataFrame, rsd: Double = 0.02,
                userCol: String = "user_id",
                tsCol: String = "ts"): DataFrame =
    events.select(to_date(col(tsCol)).as("day"), col(userCol).as("u"))
      .groupBy("day")
      .agg(countDistinct(col("u")).as("dau_exact"),
        approx_count_distinct(col("u"), rsd).as("dau_est"))
      .select(col("day"), col("dau_exact"), col("dau_est"),
        round(abs(col("dau_est") - col("dau_exact")).cast("double") /
          col("dau_exact"), 4).as("rel_err"))

  /** Traffic-anomaly days: per calendar day, the event count vs the sum
    * over the `window` PRIOR active days (the trailing baseline, current
    * day excluded), flagging days whose volume exceeds `factor`× the
    * baseline mean. The monitoring report the reference's record-count
    * metrics (F10/F11) feed in production — "which days blew past their
    * own trailing week".
    *
    * The spike predicate is EXACT integer arithmetic:
    * `n_events * baseline_days > factor * baseline_sum` — no mean, no
    * stddev, no double anywhere near the flag, so the flag can never flip
    * on a last-ulp division difference between engines. Days with no
    * prior activity in the window report baseline 0/0 and never spike
    * (there is nothing to compare against). Output: (day, n_events,
    * baseline_sum, baseline_days, spike 0/1).
    *
    * Scale shape: one event-scale scan into a per-day aggregate (≤days
    * keys); the baseline is the same coverage-explode trick as
    * [[engagement]] — each day's count covers the NEXT `window` days via
    * a ×W explode over the tiny per-day frame — then a day-keyed left
    * join of two day-sized frames (AQE broadcasts). */
  def spikeDays(events: DataFrame, window: Int = 7, factor: Int = 2,
                tsCol: String = "ts"): DataFrame = {
    require(window >= 1 && factor >= 1, "spikeDays: window, factor >= 1")
    val daily = events.select(to_date(col(tsCol)).as("d"))
      .groupBy("d").agg(count(lit(1)).cast("long").as("n_events"))
    val base = daily
      .select(col("d"), col("n_events"),
        explode(sequence(lit(1), lit(window))).as("off"))
      .select(date_add(col("d"), col("off")).as("d"), col("n_events"))
      .groupBy("d")
      .agg(sum(col("n_events")).cast("long").as("baseline_sum"),
        count(lit(1)).cast("long").as("baseline_days"))
    val bd = coalesce(col("baseline_days"), lit(0L))
    val bs = coalesce(col("baseline_sum"), lit(0L))
    daily.join(base, Seq("d"), "left")
      .select(col("d").as("day"), col("n_events"),
        bs.as("baseline_sum"), bd.as("baseline_days"),
        when(bd > 0 &&
          col("n_events") * bd > lit(factor.toLong) * bs, 1L)
          .otherwise(0L).as("spike"))
  }

  /** Heavy-user (bot/firehose) report: each user's event count against the
    * corpus mean, flagging users above `factorNum/factorDen` × mean — the
    * report that tells an operator WHERE to set [[topPaths]]' `maxEvents`
    * cap and which accounts to quarantine before a per-user aggregate eats
    * a 10M-event bot as one row. Output per user: (user_id, n_events,
    * ratio_to_mean, heavy 0/1). The flag is EXACT integer arithmetic —
    * `n·|users|·factorDen > factorNum·Σn` — same contract as
    * [[spikeDays]]: no double anywhere near the decision; ratio_to_mean
    * is the usual 4dp integral-count quotient, reported for humans only.
    * The products are evaluated in Decimal(38,0), not Long: at the 100 TB
    * scale this targets (e.g. 1e10 events on one bot, 1e9 users) a Long
    * triple product wraps silently with ANSI off and flips the flag,
    * while 38 decimal digits hold any n·U·factorDen up to 1e38 — beyond
    * even zetta-scale corpora (n ≤ Σn ≤ 2^63, U ≤ Σn/1, so the realistic
    * bound is orders of magnitude inside the exact range; the same cast
    * guards the ratio numerator).
    *
    * Scale shape: one user-keyed partial-agg aggregate off the stream and
    * a 1-row corpus total broadcast back onto the (user-sized) counts —
    * nothing windowed, nothing collected. */
  def heavyUsers(events: DataFrame, factorNum: Int = 5, factorDen: Int = 4,
                 userCol: String = "user_id"): DataFrame = {
    require(factorNum > 0 && factorDen > 0, "heavyUsers: factor > 0")
    val pu = events.groupBy(col(userCol).as("user_id"))
      .agg(count(lit(1)).cast("long").as("n_events"))
    val tot = pu.agg(count(lit(1)).cast("long").as("n_users"),
      sum(col("n_events")).cast("long").as("total_events"))
    // Decimal(38,0) promotes the whole product chain to exact decimal
    // arithmetic (see scaladoc: Long wraps at bot-scale × user-scale).
    val dEvents = col("n_events").cast("decimal(38,0)")
    pu.crossJoin(broadcast(tot))
      .select(col("user_id"), col("n_events"),
        round((dEvents * col("n_users")).cast("double") /
          col("total_events"), 4).as("ratio_to_mean"),
        when(dEvents * col("n_users") * lit(factorDen.toLong) >
          lit(factorNum.toLong).cast("decimal(38,0)") * col("total_events"),
          1L).otherwise(0L).as("heavy"))
  }

  /** Markov transition matrix over event types: for every CONSECUTIVE pair
    * of events in a user's (ts, event_id)-ordered timeline, how often does
    * `from_type` hand off to `to_type`, and with what probability among all
    * of `from_type`'s outgoing transitions. Output one row per observed
    * (from_type, to_type): (from_type, to_type, n, p) — n exact BIGINT,
    * p = n / Σ n over the same from_type, the usual 4dp integral-count
    * quotient. The report behind "what do users do AFTER a view": the
    * one-step version of [[topPaths]] with probabilities instead of raw
    * path strings. Each user's LAST event has no successor and contributes
    * no pair (lead is null, filtered).
    *
    * Scale shape: ONE user-keyed window (lead over (ts, event_id) — the
    * same hash-shuffle + per-partition sort sessionization pays; per-row
    * state is O(1), nothing collected per user), then a partial-agg
    * shuffle on (from, to) into a ≤|types|²-row frame; the probability
    * denominator is a window over THAT tiny frame partitioned by
    * from_type, not over the event stream. */
  def transitionMatrix(events: DataFrame,
                       userCol: String = "user_id", tsCol: String = "ts",
                       typeCol: String = "event_type",
                       eventIdCol: String = "event_id"): DataFrame = {
    val ordered = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(eventIdCol))
    val pairs = events
      .select(col(userCol), col(tsCol), col(eventIdCol),
        col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(ordered))
      .filter(col("to_type").isNotNull)
    val counts = pairs.groupBy("from_type", "to_type")
      .agg(count(lit(1)).cast("long").as("n"))
    val wFrom = Window.partitionBy(col("from_type"))
    counts.select(col("from_type"), col("to_type"), col("n"),
      round(col("n").cast("double") / sum(col("n")).over(wFrom), 4).as("p"))
  }

  /** TRAILING-WINDOW activity count — per event, how many events the
    * same user produced in the preceding `windowMs` (inclusive of
    * simultaneous peers): the per-event rate signal behind velocity
    * rules (rate limiting, fraud burst detection) that the per-DAY
    * aggregates can't give. This is the one window MODE the suite's
    * many ROWS-frame windows don't exercise: a RANGE frame over integral
    * epoch-ms, where the frame is defined by value distance, not row
    * count — and both engines give equal-timestamp peers identical
    * membership (RANGE includes ties), so the count is deterministic
    * without an event_id tiebreak. User-keyed window, per-user state
    * bounded by the window's event count. */
  def rollingActivity(events: DataFrame, windowMs: Long = 86400000L,
                      userCol: String = "user_id",
                      tsCol: String = "ts"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col("ms"))
      .rangeBetween(-windowMs, 0)
    events
      .select(col(userCol).as("user_id"), col("event_id"),
        unix_millis(col(tsCol)).as("ms"))
      .withColumn("n_trailing", count(lit(1)).over(w))
      .select(col("user_id"), col("event_id"), col("n_trailing"))
  }

  /** STATIONARY DISTRIBUTION of the [[transitionMatrix]] Markov chain —
    * the long-run share of activity each event type commands if users
    * keep behaving like this, the one-vector summary a capacity/ranking
    * dashboard reads over the full matrix. Computed by `rounds` power
    * steps ENTIRELY in integer micro-units (the `doc_pagerank`
    * discipline): π starts uniform at 10⁶ DIV n_types and each step is
    * π'(t) = Σ_f (π(f)·n(f→t)) DIV n(f→·) — integer DIV per term, so
    * there is NO rounding contract anywhere and the oracle unrolls the
    * same rounds in chained CTEs bit-for-bit. Truncation bleeds ≤1 micro
    * per term per round (reported via the mass column, not hidden by
    * renormalizing).
    *
    * Scale shape: the (from, to) count aggregate is the only
    * corpus-sized work (one user-keyed lead window — the
    * transitionMatrix shape); every power step joins frames bounded by
    * |event types|². */
  def markovStationary(events: DataFrame, rounds: Int = 3,
                       userCol: String = "user_id", tsCol: String = "ts",
                       typeCol: String = "event_type",
                       eventIdCol: String = "event_id"): DataFrame = {
    require(rounds >= 1, "need at least one power step")
    val ordered = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(eventIdCol))
    val pairs = events
      .select(col(userCol), col(tsCol), col(eventIdCol),
        col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(ordered))
      .filter(col("to_type").isNotNull)
    val counts = pairs.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = false)
    val tots = counts.groupBy("from_type").agg(sum(col("n")).as("tot"))
    val trans = broadcast(counts.join(tots, "from_type"))
    val types = counts.select(col("from_type").as("t")).distinct()
    val nTypes = broadcast(types.agg(count(lit(1)).as("k")))
    var pi = types.crossJoin(nTypes)
      .select(col("t"), expr("1000000 DIV k").as("mass"))
    for (_ <- 1 to rounds) {
      pi = pi.join(trans, pi("t") === trans("from_type"))
        .select(col("to_type").as("t"),
          expr("(mass * n) DIV tot").as("term"))
        .groupBy("t").agg(sum(col("term")).as("mass"))
        .localCheckpoint(eager = false)
    }
    pi.select(col("t").as("event_type"), col("mass").as("stationary_micro"),
      round(col("mass").cast("double") / 1e6, 4).as("stationary"))
  }

  /** Weekly cohort retention matrix — [[retention]] with the cohort
    * dimension every growth report actually plots: users are grouped by
    * the ISO week (Monday) of their FIRST active day, and each cohort's
    * activity is bucketed by whole-week offset from that first day.
    * Output one row per (cohort_week, week_offset) with any activity:
    * (cohort_week, week_offset, n_active, n_cohort, share) — counts exact
    * BIGINT, share the 4dp integral-count quotient. week_offset is
    * floor(days-since-first / 7), measured from each user's OWN first day
    * (not the cohort week's Monday), so offset 0 is always "their first
    * week" regardless of which weekday they arrived.
    *
    * Scale shape: one distinct (user, day) projection off the stream, a
    * per-user min, one user-keyed equi-join of day rows to first-days, a
    * ≤cohorts×offsets-key aggregate, and a cohort-week-keyed join of two
    * cohort-sized frames (AQE broadcasts) — stream-sized scans, user-keyed
    * shuffles only, nothing windowed over the stream. */
  def cohortRetention(events: DataFrame,
                      userCol: String = "user_id",
                      tsCol: String = "ts"): DataFrame = {
    val ud = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("d")).distinct()
    val first = ud.groupBy("u").agg(min(col("d")).as("d0"))
      .withColumn("cw", date_trunc("week", col("d0")).cast("date"))
    val sizes = first.groupBy("cw")
      .agg(count(lit(1)).cast("long").as("n_cohort"))
    val active = ud.join(first, Seq("u"))
      .groupBy(col("cw"),
        floor(datediff(col("d"), col("d0")) / 7).cast("long")
          .as("week_offset"))
      .agg(countDistinct(col("u")).as("n_active"))
    active.join(sizes, Seq("cw"))
      .select(col("cw").as("cohort_week"), col("week_offset"),
        col("n_active"), col("n_cohort"),
        round(col("n_active").cast("double") / col("n_cohort"), 4)
          .as("share"))
  }

  /** Inter-arrival (think-time) histogram: the distribution of gaps
    * between each user's consecutive events, log-bucketed — the report
    * that separates humans (seconds-to-minutes gaps) from scripts
    * (sub-second metronomes) and feeds the sessionization gap parameter
    * (the bucket where mass collapses is where the session cut belongs).
    * One row per non-empty bucket: (bucket, n, share) — gap deltas are
    * integral epoch-ms (exact), bucket edges integer compares, share the
    * usual 4dp integral-count quotient. Consecutive = (ts, event_id)
    * order within user, same total order the sessionizer and
    * transitionMatrix use; each user's first event has no predecessor
    * and contributes no gap.
    *
    * Scale shape: ONE user-keyed window (lag — the sessionization
    * shuffle, O(1) per-row state) then a ≤|buckets|-key aggregate and a
    * 1-row total broadcast back. Nothing collected, nothing quadratic. */
  def interarrivalHist(events: DataFrame,
                       userCol: String = "user_id", tsCol: String = "ts",
                       eventIdCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(eventIdCol))
    val gap = (unix_millis(col(tsCol)) -
      unix_millis(lag(col(tsCol), 1).over(w))).as("gap_ms")
    val gaps = events.select(col(userCol), col(tsCol), col(eventIdCol))
      .select(gap).filter(col("gap_ms").isNotNull)
    val bucket = when(col("gap_ms") < 1000L, "0000-0s")
      .when(col("gap_ms") < 10000L, "0001-10s")
      .when(col("gap_ms") < 60000L, "0010-60s")
      .when(col("gap_ms") < 600000L, "0060-10m")
      .when(col("gap_ms") < 3600000L, "0600-60m")
      .otherwise("3600-inf")
    val counts = gaps.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).cast("long").as("n"))
    counts.crossJoin(broadcast(
        counts.agg(sum(col("n")).cast("long").as("total"))))
      .select(col("bucket"), col("n"),
        round(col("n").cast("double") / col("total"), 4).as("share"))
  }

  /** A/B SIGNIFICANCE on the segmented funnel — the question
    * [[funnelBySegment]]'s count table poses but can't answer: is the
    * variant's end-to-end conversion difference real or noise? Runs the
    * same reach chain, then tests the 2×2 contingency table
    * (converted vs not × arm A vs arm B) with Pearson's chi-squared
    * (1 dof, no continuity correction — the two-proportion z² test):
    * χ² = N(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)). One row out:
    * (seg_a, seg_b, n_a, conv_a, n_b, conv_b, rate_a, rate_b, chi2,
    * significant, n_segs). Arms are ordered lexicographically
    * (seg_a = min). `significant` compares the 4dp-ROUNDED χ² to the 95%
    * critical value 3.8415 — the decision is made on the reported number,
    * same portability contract as doc_gopher_filter's verdict. χ² itself
    * is one fixed-order double expression over four exact integers
    * (counts stay integral end-to-end; a double product is deterministic
    * and never wraps, unlike the Long products heavyUsers guards
    * against), null when any margin is zero (no conversions anywhere, or
    * an empty arm) — "not enough signal", not a fabricated 0. n_segs
    * audits the two-arm assumption: > 2 means this compared only the
    * lexicographic extremes, and the segment column needs fixing — the
    * report says so instead of silently blending arms.
    *
    * Scale shape: [[funnelBySegment]]'s S user-keyed equi-joins, then
    * aggregates over the ≤|segments|·S-row count frame — everything after
    * the reach chain is constant-size. */
  def abSignificance(events: DataFrame, steps: Seq[String],
                     segment: Column,
                     userCol: String = "user_id", tsCol: String = "ts",
                     typeCol: String = "event_type",
                     within: Option[Column] = None): DataFrame = {
    require(steps.size >= 2, "abSignificance: a funnel needs ≥ 2 steps")
    val f = funnelBySegment(events, steps, segment, userCol, tsCol,
      typeCol, within)
    val lastIdx = steps.size.toLong
    // per segment: entrants (step 1) and converters (last step; a segment
    // with zero converters has no last-step row — coalesce to 0)
    val per = f.filter(col("step_idx") === 1L || col("step_idx") === lastIdx)
      .groupBy("seg")
      .agg(max(when(col("step_idx") === 1L, col("n_users")))
        .as("entered"),
        coalesce(max(when(col("step_idx") === lastIdx, col("n_users"))),
          lit(0L)).as("converted"))
    val row = per.agg(
      min(col("seg")).as("seg_a"), max(col("seg")).as("seg_b"),
      min_by(col("entered"), col("seg")).as("n_a"),
      min_by(col("converted"), col("seg")).as("conv_a"),
      max_by(col("entered"), col("seg")).as("n_b"),
      max_by(col("converted"), col("seg")).as("conv_b"),
      count(lit(1)).cast("long").as("n_segs"))
    val a = col("conv_a").cast("double")
    val b = (col("n_a") - col("conv_a")).cast("double")
    val c = col("conv_b").cast("double")
    val d = (col("n_b") - col("conv_b")).cast("double")
    val n = (col("n_a") + col("n_b")).cast("double")
    val den = (a + b) * (c + d) * ((a + c) * (b + d))
    val chi2 = round(n * ((a * d - b * c) * (a * d - b * c)) /
      nullif(den, lit(0.0)), 4)
    row.select(col("seg_a"), col("seg_b"),
      col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      round(col("conv_a").cast("double") /
        nullif(col("n_a").cast("double"), lit(0.0)), 4).as("rate_a"),
      round(col("conv_b").cast("double") /
        nullif(col("n_b").cast("double"), lit(0.0)), 4).as("rate_b"),
      chi2.as("chi2"),
      (chi2 >= 3.8415).as("significant"),
      col("n_segs"))
  }

  /** Day-offset retention: share of the user base active again k days
    * after their own first-seen day, for each requested offset. Output per
    * offset: (day_offset, n_active, n_cohort, share) — the share an
    * integral-count quotient, so the 4dp rounding is engine-portable.
    * Offsets with zero active users are absent (the report reads "no one
    * came back", not a fabricated zero row).
    *
    * Scale shape: one distinct (user, day) projection, a per-user min, one
    * self-equi-join on user, a ≤|offsets|-key aggregate, and a 1-row
    * cohort total broadcast back — stream-sized scans, user-keyed
    * shuffles only. */
  def retention(events: DataFrame, offsets: Seq[Int] = Seq(0, 1, 3, 7, 14),
                userCol: String = "user_id",
                tsCol: String = "ts"): DataFrame = {
    require(offsets.nonEmpty, "retention: at least one offset")
    val days = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("d")).distinct()
    val first = days.groupBy("u").agg(min(col("d")).as("d0"))
    val offs = days.join(first, Seq("u"))
      .select(col("u"),
        datediff(col("d"), col("d0")).cast("long").as("day_offset"))
    val total = first.agg(count(lit(1)).cast("long").as("n_cohort"))
    offs.filter(col("day_offset").isInCollection(offsets.map(_.toLong)))
      .groupBy("day_offset")
      .agg(countDistinct(col("u")).as("n_active"))
      .crossJoin(broadcast(total))
      .select(col("day_offset"), col("n_active"), col("n_cohort"),
        round(col("n_active").cast("double") / col("n_cohort"), 4)
          .as("share"))
  }

  /** Semi-structured payload promotion + stats: events carry a JSON `props`
    * string (the universal "loose bag of attributes" column); extract a
    * numeric field by JSON path, then aggregate per event type — count,
    * null share (the schema-drift alarm: a producer that stopped sending
    * the field shows up as a rising null share, not a silent zero), sum /
    * min / max, and the mean as an integral-sum quotient rounded 4dp.
    *
    * Scale shape: `get_json_object` is a per-row codegen'd expression, so
    * the extraction rides the scan; the aggregate is ≤|event types| keys.
    * At 100 TB the right production layout is promoting hot JSON fields to
    * real columns at ingest — this operator IS that promotion step, fused
    * with the profiling report that says which fields are worth it. */
  def propsStats(events: DataFrame, path: String = "$.k",
                 propsCol: String = "props"): DataFrame = {
    val k = get_json_object(col(propsCol), path).cast("long")
    events
      .select(col("event_type"), k.as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_null"),
        sum("k").as("sum_k"),
        min("k").as("min_k"),
        max("k").as("max_k"))
      .select(col("event_type"), col("n"), col("n_null"),
        col("sum_k"), col("min_k"), col("max_k"),
        round(col("sum_k").cast("double") / (col("n") - col("n_null")), 4)
          .as("mean_k"))
  }
}
