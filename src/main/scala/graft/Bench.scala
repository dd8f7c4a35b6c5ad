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
  *     see it. The steady-state second pass is reported under `warm_total` /
  *     `warm_queries` (the reference's own SLO is steady-state per-batch
  *     time, but the headline stays comparable across rounds).
  *   - A FAILED query must make the bench WORSE, never better: it is charged
  *     `max(elapsed-at-failure, 60 s)` in the totals (a failure can never
  *     undercut a slow success) AND reported verbatim under "errors" with
  *     its exception. The pre-r5 harness recorded failures as -1.0 and
  *     filtered them out of the total — a broken query improved the
  *     headline, which was exactly backwards.
  */
object Bench {

  /** Penalty charged to the totals per failed query (seconds), if larger
    * than the time actually spent before the failure. */
  private val FailurePenaltySec = 60.0

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
    val warm = names.map(n => n -> once(n))

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
        s""","failure_penalty_sec":$FailurePenaltySec,"sf":${jsonStr(sfDir)}}"""
    println(line)
    Files.write(Paths.get(outPath),
      (line + "\n").getBytes(StandardCharsets.UTF_8))
    spark.stop()
  }
}
