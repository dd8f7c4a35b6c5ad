package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * emits ONE JSON line {"metric":"total","value":N,"unit":"sec",
  * "queries":{...},"errors":{...},"warm_total":...,"sf":...} — to stdout AND
  * to a file (SPARK_GRAFT_BENCH_OUT, default `BENCH.out.json` in the cwd),
  * so the artifact survives stdout truncation by log collectors.
  *
  * Methodology:
  *   - Each query is materialized with a `noop`-format write, which forces
  *     every output column through the full plan. A bare `count()` (round-1
  *     harness) lets Catalyst prune deterministic projections, so map-only
  *     operators timed as a parquet row-count — fiction for
  *     `cdr_mask`-class queries.
  *   - `value` (the headline metric) is the COLD first-run total: Catalyst
  *     planning + janino codegen included, matching how a fresh job would
  *     see it. Steady state is measured as the MEDIAN of `WarmTrials` (3)
  *     further passes per query — a background-load spike on one trial
  *     (r5's phantom 19 s `enrich_s66`) lands in `warm_max`, never in the
  *     reported `warm_queries`/`warm_total`; the per-query min/max spread
  *     is published so contention is visible instead of silently absorbed.
  *   - A FAILED query makes the bench worse, never better, under a floor
  *     guarantee: it is charged `max(elapsed-at-failure, 60 s)` in the
  *     totals AND reported verbatim under "errors" with its exception.
  *     (The floor is not a ceiling-proof: a query whose healthy cost
  *     exceeds 60 s could in principle fail fast for less than its true
  *     cost — at ~1-5 s per query here the floor is >10× any healthy
  *     time, and `n_err != 0` disqualifies the artifact regardless. The
  *     pre-r5 harness recorded failures as -1.0 and filtered them out of
  *     the total — a broken query improved the headline, exactly
  *     backwards.)
  */
object Bench {

  /** Penalty charged to the totals per failed query (seconds), if larger
    * than the time actually spent before the failure. */
  private val FailurePenaltySec = 60.0

  /** Steady-state trials per query; the reported warm time is their median
    * (odd count → a true element, no averaging of unlike trials). */
  private val WarmTrials = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.out.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** (charged seconds, error message if the query failed) */
    def once(name: String): (Double, Option[String]) = {
      val t0 = System.nanoTime()
      def elapsed = (System.nanoTime() - t0) / 1e9
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (elapsed, None)
      } catch {
        case e: Throwable =>
          val msg = s"${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").take(300)
          (math.max(elapsed, FailurePenaltySec), Some(msg))
      }
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
    val cold = names.map(n => n -> once(n))
    // Warm trials are grouped per PASS (all queries, then repeat), not per
    // query back-to-back: a transient machine-wide load spike then taints
    // one trial of many queries instead of all trials of one, and the
    // median discards it.
    val warmTrials: Seq[Seq[(String, (Double, Option[String]))]] =
      (1 to WarmTrials).map(_ => names.map(n => n -> once(n)))
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    /** (median seconds, first error if any trial failed) per query. */
    val warm: Seq[(String, (Double, Option[String]))] = names.zipWithIndex
      .map { case (n, i) =>
        val trials = warmTrials.map(_(i)._2)
        n -> (median(trials.map(_._1)), trials.flatMap(_._2).headOption)
      }
    val warmMin = names.zipWithIndex.map { case (n, i) =>
      n -> warmTrials.map(_(i)._2._1).min }
    val warmMax = names.zipWithIndex.map { case (n, i) =>
      n -> warmTrials.map(_(i)._2._1).max }

    def jsonStr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    def timesObj(kvs: Seq[(String, (Double, Option[String]))]): String =
      kvs.map { case (k, (v, _)) => jsonStr(k) + ":" + v }
        .mkString("{", ",", "}")
    def numsObj(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => jsonStr(k) + ":" + v }.mkString("{", ",", "}")
    def errsObj(kvs: Seq[(String, (Double, Option[String]))]): String =
      kvs.collect { case (k, (_, Some(e))) => jsonStr(k) + ":" + jsonStr(e) }
        .mkString("{", ",", "}")
    def total(kvs: Seq[(String, (Double, Option[String]))]): Double =
      kvs.map(_._2._1).sum
    val nErr = (cold ++ warm).count(_._2._2.isDefined)

    val line =
      s"""{"metric":"total","value":${total(cold)},"unit":"sec"""" +
        s""","queries":${timesObj(cold)},"errors":${errsObj(cold)}""" +
        s""","warm_total":${total(warm)},"warm_queries":${timesObj(warm)}""" +
        s""","warm_errors":${errsObj(warm)},"n_err":$nErr""" +
        s""","warm_trials":$WarmTrials,"warm_min":${numsObj(warmMin)}""" +
        s""","warm_max":${numsObj(warmMax)}""" +
        s""","failure_penalty_sec":$FailurePenaltySec,"sf":${jsonStr(sfDir)}}"""
    println(line)
    Files.write(Paths.get(outPath),
      (line + "\n").getBytes(StandardCharsets.UTF_8))
    spark.stop()
  }
}
