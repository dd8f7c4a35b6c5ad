package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratch main — plan dumps and one-off timings while iterating.
  * Not part of the library surface; the driver never runs this. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String, n: Int = 2)(df: => DataFrame): Unit = {
      for (i <- 1 to n) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"SCRATCH $label trial$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    import org.apache.spark.sql.Column
    val cols: Seq[(String, Column)] = Seq(
      "o_orderkey" -> col("o_orderkey"),
      "o_custkey" -> col("o_custkey"),
      "o_orderstatus" -> col("o_orderstatus"),
      "o_orderpriority" -> col("o_orderpriority"),
      "o_orderdate_ms" -> unix_millis(col("o_orderdate").cast("timestamp")),
      "o_totalprice_c" ->
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))

    time("full_profile") {
      graft.operators.DataQuality.columnProfile(o, cols)
    }
    // how much is the multi-distinct expand?
    time("six_distinct_only") {
      o.agg(countDistinct(col("o_orderkey")),
        countDistinct(col("o_custkey")),
        countDistinct(col("o_orderstatus")),
        countDistinct(col("o_orderpriority")),
        countDistinct(unix_millis(col("o_orderdate").cast("timestamp"))),
        countDistinct((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long")))
    }
    time("one_distinct") {
      o.agg(countDistinct(col("o_orderkey")))
    }
    time("minmax_nulls_only") {
      o.agg(count(lit(1)), cols.flatMap { case (n, c) => Seq(
        sum(when(c.isNull, 1L).otherwise(0L)), min(c), max(c)) }: _*)
    }
    time("split_form", 3) {
      val base = o.agg(count(lit(1)).as("n_rows"),
        cols.flatMap { case (n, c) => Seq(
          sum(when(c.isNull, 1L).otherwise(0L)).as(s"nn_$n"),
          min(c).cast("string").as(s"mn_$n"),
          max(c).cast("string").as(s"mx_$n")) }: _*)
      cols.foldLeft(base) { case (acc, (n, c)) =>
        acc.crossJoin(broadcast(
          o.agg(countDistinct(c).as(s"nd_$n"))))
      }
    }
    spark.stop()
  }
}
