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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))

    def time(label: String)(df: => DataFrame): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"SCRATCH $label trial$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    val gram = 8; val w = 4
    val mC = greatest(length(col("text")) - (gram - 1), lit(1))
    def blockArr(b: org.apache.spark.sql.Column) = filter(
      transform(sequence(b * w + 1, b * w + lit(w)),
        i => when(i <= mC, md5(col("text").substr(i, lit(gram))))),
      x => x.isNotNull)
    val nblk = floor((mC + lit(w - 1)) / lit(w)).cast("int")

    // A: digest explode only (the md5 cost floor, 1x per gram)
    time("A_flat_md5_1x") {
      docs.select(col("doc_id"),
        posexplode(transform(sequence(lit(1), mC),
          i => md5(col("text").substr(i, lit(gram))))).as(Seq("g", "h")))
    }
    // B: block explode with cur only (md5 1x, nested arrays)
    time("B_blocks_cur_only") {
      docs.select(col("doc_id"), mC.as("m"),
        posexplode(transform(sequence(lit(0), nblk - 1), b =>
          blockArr(b))).as(Seq("blk", "cur")))
    }
    // C: block explode with cur+nxt (md5 2x)
    time("C_blocks_pair") {
      docs.select(col("doc_id"), mC.as("m"),
        posexplode(transform(sequence(lit(0), nblk - 1), b =>
          struct(blockArr(b).as("cur"), blockArr(b + 1).as("nxt"))))
          .as(Seq("blk", "cells")))
    }
    // D: the full current winnowingSelected
    time("D_full_selected") {
      graft.operators.TextAnalysis.winnowingSelected(docs, gram, w)
    }
    spark.stop()
  }
}
