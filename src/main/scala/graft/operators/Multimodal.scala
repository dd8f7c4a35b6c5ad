package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling for a training-data pipeline: media
  * (image/audio/video) as opaque `binary` columns with typed metadata, plus
  * decode / feature-extract / resize / frame-sample operators.
  *
  * No codec libraries exist in this container, so the DECODE STEP IS A
  * DETERMINISTIC FAKE (clearly marked below) — everything around it is the
  * real Spark plumbing this pipeline needs at scale: binary columns travel
  * through parquet scans/shuffles untouched, per-partition batched
  * processing via `mapPartitions` (the Scala analogue of `mapInPandas`
  * batch shape), typed outputs via case-class Encoders, and
  * partition-count-preserving plans (no shuffle introduced by any operator
  * here).
  */
object Multimodal {

  /** Typed metadata extracted from a media payload. */
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int,
                       n_frames: Int, format: String)

  /** A fixed-size feature vector per payload. */
  case class MediaFeatures(doc_id: Long, features: Array[Float])

  implicit val metaEnc: Encoder[MediaMeta] = Encoders.product[MediaMeta]
  implicit val featEnc: Encoder[MediaFeatures] =
    Encoders.product[MediaFeatures]

  /** Attach an opaque binary payload column. In production this is the
    * media-bytes column read from parquet/object storage; here it is derived
    * from `text` so the testdata tables can exercise the plumbing. */
  def withBinaryPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "UTF-8"))

  // ───────────────────────────────────────────────────────────────────
  // STUB DECODER — deterministic fake in place of a real codec.
  // A production build swaps `decodeOne` for an actual image/audio
  // decoder; nothing else changes.
  // ───────────────────────────────────────────────────────────────────
  private[operators] def decodeOne(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    MediaMeta(
      doc_id = id,
      n_bytes = n,
      width = (64 + n % 32).toInt,
      height = (64 + (n / 32) % 32).toInt,
      n_frames = (1 + n % 7).toInt,
      format = if (n % 2 == 0) "img" else "vid")
  }

  /** Decode payloads to typed metadata. `mapPartitions` so a real decoder
    * can amortize per-batch init (codec contexts, GPU handles) across the
    * partition — the same batch shape `mapInPandas` gives Python. */
  def decodeMeta(withPayload: DataFrame): Dataset[MediaMeta] =
    withPayload.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        // per-partition init would go here (open codec once)
        rows.map(r => decodeOne(r.getLong(0), r.getAs[Array[Byte]](1)))
      }

  /** Feature extraction: fixed-width vector per payload (stub: byte
    * histogram folded to `dim` buckets, L1-normalized — deterministic, and
    * shaped exactly like an embedding-model output). */
  def extractFeatures(withPayload: DataFrame, dim: Int = 16)
      : Dataset[MediaFeatures] =
    withPayload.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val hist = new Array[Float](dim)
          var i = 0
          while (i < bytes.length) {
            hist((bytes(i) & 0xff) % dim) += 1f
            i += 1
          }
          val total = math.max(1f, bytes.length.toFloat)
          MediaFeatures(r.getLong(0), hist.map(_ / total))
        }
      }

  /** Resize: deterministic payload transform (stub: crop/pad the byte
    * stream to `w*h/8` — stands in for pixel resampling; the plumbing —
    * binary in, binary out, same row count, no shuffle — is the contract). */
  def resize(withPayload: DataFrame, w: Int, h: Int): DataFrame = {
    val target = w * h / 8
    withPayload.withColumn("payload",
      substring(col("payload"), 1, target))
      .withColumn("resized_to", lit(s"${w}x$h"))
  }

  /** Frame sampling for video-shaped payloads: split the byte stream into
    * fixed-size frames and keep every `every`-th (stub frame boundary =
    * 256 bytes). One row per sampled frame — the explode is the real shape
    * a frame-level pipeline has. */
  def frameSample(withPayload: DataFrame, every: Int = 2,
                  frameBytes: Int = 256): DataFrame = {
    val frames = withPayload
      .withColumn("n_frames_total",
        ceil(length(col("payload")) / lit(frameBytes)).cast("int"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("n_frames_total") - 1,
          lit(0)))))
      .filter(col("frame_idx") % every === 0)
    frames.withColumn("frame",
      col("payload").substr(col("frame_idx") * frameBytes + 1,
        lit(frameBytes)))
      .drop("payload", "n_frames_total")
  }
}
