package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Forget, Multimodal, Similarity, TextAnalysis}

/** Round-17: the unified FORGET orchestrator — one tombstone frame,
  * every persisted serving index rewritten, one audit frame out
  * (r16 verdict item 6). The per-index round-trip contracts are pinned
  * on the underlying ops (NorthStarSpec, SearchIndexSpec,
  * MultimodalValueBandSpec); this spec pins the ONE-CALL surface:
  * every index equals a never-held build afterwards, and the audit
  * frame reports exactly what each rewrite did. */
class ForgetSpec extends SparkTestBase {

  test("Forget.forgetUnified: one call rewrites bands/sets/winnow/" +
    "postings+stats/ivf/image/audio/video — every table row-count-equal " +
    "to a never-held build, serves match never-held, and the audit " +
    "frame carries one honest (index, rows_before, rows_after) row per " +
    "rewritten table in rewrite order") {
    val s = spark
    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 200).localCheckpoint()
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 200).localCheckpoint()
    val live = docs.filter(col("doc_id") % 10 =!= 0)
    val liveEmb = emb.filter(col("vec_id") % 10 =!= 0)
    val tomb = docs.filter(col("doc_id") % 10 === 0).select("doc_id")
    // centroids fixed from the FULL corpus for both builds: forget does
    // not refit (the ivfIndexForget contract)
    val cents = Similarity.ivfSeedCentroids(emb, 16)
      .localCheckpoint()
    val tF = Seq("fgu_bands", "fgu_sets", "fgu_win", "fgu_post",
      "fgu_stats", "fgu_ivf", "fgu_img", "fgu_aud", "fgu_vid")
    val tN = tF.map(_ + "_nh")
    def build(ts: Seq[String], d: org.apache.spark.sql.DataFrame,
              e: org.apache.spark.sql.DataFrame): Unit = {
      Dedup.nearDupWriteIndex(d, ts(0), ts(1), buckets = 8)
      TextAnalysis.winnowWriteIndex(d, ts(2), buckets = 8)
      TextAnalysis.searchWriteIndex(d, ts(3), ts(4), buckets = 8)
      Similarity.ivfWriteIndex(e, cents, ts(5), buckets = 8)
      Multimodal.phashWriteIndex(Multimodal.synthBmpPayload(d), ts(6),
        buckets = 8)
      Multimodal.audioWriteIndex(Multimodal.synthWavPayload(d), ts(7),
        buckets = 8)
      Multimodal.videoWriteIndex(Multimodal.synthVideoPayload(d), ts(8),
        buckets = 8)
    }
    (tF ++ tN).foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      build(tF, docs, emb)
      build(tN, live, liveEmb)
      val audit = Forget.forgetUnified(s, tomb, tF(0), tF(1), tF(2),
        tF(3), tF(4), tF(5), tF(6), tF(7), tF(8))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      // one row per rewritten table, in rewrite order (stats is re-derived
      // inside the postings forget, not separately audited)
      val audited = Seq(tF(0), tF(1), tF(2), tF(3), tF(5), tF(6), tF(7),
        tF(8))
      assert(audit.map(_._1).toSeq === audited)
      // the audit's before/after are the real table counts: before =
      // full build, after = never-held build — and the tombstoned slice
      // actually held rows in every index
      audit.foreach { case (t, before, after) =>
        val nh = tN(tF.indexOf(t))
        assert(after === s.table(nh).count(),
          s"$t must be row-count-equal to never-held $nh")
        assert(before > after, s"$t: the tombstoned slice held rows")
      }
      // serve checks: BM25 off the forgotten index ≡ inline over the
      // live corpus (idf/avgdl shifts included)...
      val terms = Seq("hash", "join", "window")
      val inline = TextAnalysis.bm25Search(live, terms, k = 10).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val served = TextAnalysis.bm25Indexed(s, terms, tF(3), tF(4),
        k = 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(served === inline)
      // ...and a forgotten asset matches NOTHING on the image serve
      assert(Multimodal.mediaTakedownStatusByIds(s, tF(6), tomb)
        .count() === 0L, "no ghost matches after the unified forget")
    } finally (tF ++ tN).foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
