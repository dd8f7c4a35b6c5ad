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

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    import graft.operators.{Dedup, Multimodal}

    time("video_fp_only") {
      Multimodal.videoFingerprint(Multimodal.synthVideoPayload(docs))
    }
    time("video_pairs_only") {
      Multimodal.videoDupPairs(Multimodal.synthVideoPayload(docs))
    }
    time("video_cc_only") {
      val pairs = Multimodal.videoDupPairs(
        Multimodal.synthVideoPayload(docs)).localCheckpoint(eager = false)
      Dedup.clustersFromEdges(pairs.select("doc_a", "doc_b"))
    }
    time("video_full_clusters") {
      Multimodal.videoDupClusters(Multimodal.synthVideoPayload(docs))
    }
    spark.stop()
  }
}
