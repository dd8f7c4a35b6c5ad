package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Invariants of the ScaleBench corpus generator — these are what make the
  * 10×/100× scale-stress ratios MEANINGFUL (a naive row-replication would put
  * every doc in an f-wide exact-dup cluster and the LSH pair count would grow
  * ×f², measuring the workload's shape instead of the engine's).
  */
class ScaleCorpusSpec extends SparkTestBase {

  private val base = "/root/testdata/sf0.001"

  test("scaleDocuments: f× rows, copy-0 verbatim, per-copy word counts " +
    "equal base, cross-copy shingle sets disjoint") {
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val n = docs.count()
    val scaled = ScaleBench.scaleDocuments(docs, 3)
    assert(scaled.count() === n * 3)

    // copy 0 is byte-identical to the base corpus
    val copy0 = scaled.filter(col("doc_id") < ScaleBench.IdStride)
      .select("doc_id", "text", "lang", "source", "n_chars")
    assert(copy0.exceptAll(
      docs.select("doc_id", "text", "lang", "source", "n_chars")).count()
      === 0L)

    // word count per doc is preserved in every copy → shingle volume scales
    // exactly ×f, so runtime ratios measure the engine, not longer documents
    val wc = scaled
      .withColumn("base_id", col("doc_id") % ScaleBench.IdStride)
      .withColumn("copy", (col("doc_id") / ScaleBench.IdStride).cast("long"))
      .withColumn("n_words", size(split(col("text"), " ", -1)))
      .groupBy("base_id").agg(countDistinct(col("n_words")).as("distinct_wc"))
    assert(wc.filter(col("distinct_wc") > 1).count() === 0L)

    // cross-copy shingle sets are disjoint (every word carries a per-copy
    // suffix) → cross-copy Jaccard 0, candidate pairs grow ×f not ×f²
    val sh = Dedup.shingles(scaled)
      .select(
        (col("doc_id") / ScaleBench.IdStride).cast("long").as("copy"),
        explode(col("shingle_arr")).as("shingle"))
      .groupBy("shingle").agg(countDistinct(col("copy")).as("n_copies"))
    assert(sh.filter(col("n_copies") > 1).count() === 0L)
  }

  test("scaleEmbeddings: f× rows, probe set untouched, jitter bounded") {
    val embs = spark.read.parquet(s"$base/embeddings.parquet")
    val n = embs.count()
    val scaled = ScaleBench.scaleEmbeddings(embs, 3)
    assert(scaled.count() === n * 3)

    // the fixed probe set (vec_id < 8) is exactly the base one: corpus-side
    // scaling, the question a 100 TB cluster actually asks
    val probes = scaled.filter(col("vec_id") < 8)
      .select("vec_id", "embedding")
    assert(probes.exceptAll(
      embs.filter(col("vec_id") < 8).select("vec_id", "embedding")).count()
      === 0L)

    // jitter is deterministic and bounded: |scaled - base| ≤ 0.05 per dim
    val dev = scaled
      .withColumn("base_id", col("vec_id") % ScaleBench.IdStride)
      .alias("s")
      .join(embs.select(col("vec_id").as("base_id"),
        col("embedding").as("base_emb")), "base_id")
      .select(aggregate(
        zip_with(col("embedding"), col("base_emb"), (a, b) => abs(a - b)),
        lit(0.0f), (acc, x) => greatest(acc, x)).as("max_dev"))
      .agg(max(col("max_dev")).as("max_dev"))
      .head().getFloat(0)
    assert(dev <= 0.0501f)
  }
}
