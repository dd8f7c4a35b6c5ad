package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkTestBase {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq((1L, "abcdefgh" * 40), (2L, "short"), (3L, ""))
      .toDF("doc_id", "text")
  }

  test("binary payload plumbing: bytes survive the round trip; decodeMeta " +
    "is deterministic and typed") {
    val withP = Multimodal.withBinaryPayload(docs)
    assert(withP.schema("payload").dataType.typeName == "binary")
    val meta = Multimodal.decodeMeta(withP).collect()
      .map(m => m.doc_id -> m).toMap
    assert(meta(1L).n_bytes == 320L)
    assert(meta(1L).width == 64 + 320 % 32)
    assert(meta(1L).height == 64 + (320 / 32) % 32)
    assert(meta(3L).n_bytes == 0L && meta(3L).format == "img")
    // determinism: run twice, same rows
    val again = Multimodal.decodeMeta(withP).collect()
      .map(m => m.doc_id -> m).toMap
    assert(meta == again)
  }

  test("extractFeatures: fixed dim, L1-normalized, empty payload safe") {
    val f = Multimodal.extractFeatures(
      Multimodal.withBinaryPayload(docs), dim = 8).collect()
      .map(m => m.doc_id -> m.features).toMap
    assert(f.values.forall(_.length == 8))
    assert(math.abs(f(1L).sum - 1.0f) < 1e-5)
    assert(f(3L).sum == 0.0f) // empty payload → zero vector, no NaN
  }

  test("resize and frameSample: payload transforms preserve row/frame " +
    "contracts") {
    val withP = Multimodal.withBinaryPayload(docs)
    val resized = Multimodal.resize(withP, 16, 16)
    val lens = resized.select(col("doc_id"), length(col("payload")))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(lens(1L) == 32) // 16*16/8, cropped
    assert(lens(2L) == 5)  // shorter payload unchanged
    val frames = Multimodal.frameSample(withP, every = 2, frameBytes = 64)
    val byDoc = frames.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1: 320 bytes → 5 frames → idx 0,2,4 kept = 3
    assert(byDoc(1L) == 3L)
    val idx = frames.filter(col("doc_id") === 1L)
      .select("frame_idx").collect().map(_.getInt(0)).sorted
    assert(idx.toSeq == Seq(0, 2, 4))
  }
}
