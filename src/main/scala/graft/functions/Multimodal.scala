package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (BASELINE.json north_star): media as an
  * opaque `binary` payload column plus typed metadata, with
  * decode/feature-extract as a per-partition codec pass.
  *
  * The Spark-side shape is the real contract — schema, batch shape
  * (one codec instance per partition, amortizing model/library init
  * exactly like the classifier client of json_classification.py:160-192
  * is amortized in `mapPartitions`), partition-friendly narrow plan. The
  * codec itself is pluggable: `StubCodec` is a deterministic fake
  * (image/audio libraries are unavailable in this environment); a real
  * deployment binds a JNI/JavaCV decoder behind the same trait.
  */
object Multimodal {

  /** One media row entering the decoder. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded features: fake "dimensions", sampled frame count, and an
    * 8-bucket byte histogram as the feature vector.
    */
  final case class DecodedRow(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      features: Array[Double])

  /** A codec decodes one payload; instances are created per partition
    * and may hold heavyweight native state.
    */
  trait MediaCodec extends Serializable {
    def decode(row: MediaRow): DecodedRow
  }

  /** Deterministic stand-in for a real decoder: every output is a pure
    * function of the payload bytes, so tests can golden it.
    */
  final class StubCodec extends MediaCodec {
    override def decode(r: MediaRow): DecodedRow = {
      val bytes = r.payload
      val hist = new Array[Double](8)
      var i = 0
      while (i < bytes.length) {
        hist((bytes(i) & 0xff) >> 5) += 1.0
        i += 1
      }
      val first = if (bytes.nonEmpty) bytes(0) & 0xff else 0
      DecodedRow(
        media_id = r.media_id,
        kind = r.kind,
        n_bytes = bytes.length.toLong,
        width = 1 + first % 64,
        height = 1 + (bytes.length % 64).toInt,
        n_frames = 1 + bytes.length / 1024,
        features = hist)
    }
  }

  /** Decode a media Dataset with one codec instance per partition —
    * the batched enrichment shape (O17) for binary columns.
    */
  def decodeBatch(
      media: Dataset[MediaRow],
      mkCodec: () => MediaCodec)(implicit spark: SparkSession): Dataset[DecodedRow] = {
    import spark.implicits._
    media.mapPartitions { it =>
      val codec = mkCodec() // heavyweight init amortized per partition
      it.map(codec.decode)
    }
  }

  /** Fabricate a media table from the documents corpus: UTF-8 payload
    * bytes, kind keyed by language — the plumbing's stand-in for real
    * image/audio ingestion.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("lang") === "zh", lit("audio")).otherwise(lit("image")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"))
}
