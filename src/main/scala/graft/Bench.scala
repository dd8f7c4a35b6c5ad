package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":"total","value":N,"unit":"sec",
  * "queries":{...},"sf":...}.
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
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      } catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
    val cold = names.map(n => n -> once(n))
    val warm = names.map(n => n -> once(n))
    def obj(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    def total(kvs: Seq[(String, Double)]): Double =
      kvs.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":${total(cold)},"unit":"sec","queries":${obj(cold)},"warm_total":${total(warm)},"warm_queries":${obj(warm)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
