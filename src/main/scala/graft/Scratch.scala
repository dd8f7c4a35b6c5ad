package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch main — plan dumps and one-off timings while iterating.
  * Not part of the library surface; the driver never runs this. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1 && args(1) == "ALL") SparkEntry.queries.keys.toSeq.sorted
      else if (args.length > 1) args.tail.toSeq
      else Seq("doc_winnow_pairs")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      // marker interleaves with Spark's stderr WARNs so a combined-stream
      // capture attributes each warning to the query that emitted it
      System.err.println(s"SCRATCH-BEGIN $n")
      val df = SparkEntry.queries(n)(spark, sfDir)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val cold = (System.nanoTime() - t0) / 1e9
      val plan = df.queryExecution.executedPlan.toString
      val gen = "(?m)Generate ".r.findAllIn(plan).length
      val win = "(?m)Window ".r.findAllIn(plan).length
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val warm = (System.nanoTime() - t1) / 1e9
      println(f"SCRATCH $n cold=$cold%.2f warm=$warm%.2f Generate=$gen Window=$win")
    }
    spark.stop()
  }
}
