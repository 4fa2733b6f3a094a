package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.Multimodal

/** Multimodal binary-column queries (north star). `multimodal_meta` is
  * oracle-checked binary handling in pure built-ins; the stub-decode
  * pipeline runs per-partition typed code, but the stub's outputs are
  * deterministic byte functions, so its aggregate is oracle-checked too
  * (and golden-tested byte-for-byte in MultimodalSpec).
  */
object MultimodalQ {
  import QDef._

  val all: Seq[QDef] = Seq(

    QDef("multimodal_meta",
      // Opaque binary payload + typed metadata, all codegen'd built-ins:
      // UTF-8 byte length, payload md5, base64 prefix.
      (s, dir) => {
        val m = Multimodal.mediaFromDocuments(t(s, dir, "documents"))
        m.select(col("media_id"), col("kind"),
          length(col("payload")).cast("long").as("n_bytes"),
          md5(col("payload")).as("payload_md5"),
          substring(base64(col("payload")), 1, 24).as("b64_prefix"))
          .orderBy("media_id")
      },
      Some("""SELECT doc_id AS media_id,
          CASE WHEN lang = 'zh' THEN 'audio' ELSE 'image' END AS kind,
          octet_length(encode(text)) AS n_bytes,
          md5(text) AS payload_md5,
          substr(to_base64(encode(text)), 1, 24) AS b64_prefix
        FROM documents ORDER BY media_id""")),

    QDef("multimodal_decode_stub",
      // The decode pipeline: binary payloads through a per-partition
      // codec (StubCodec — deterministic fake; see Multimodal scaladoc),
      // then a relational aggregate over the extracted features. The
      // stub's outputs are pure functions of the payload bytes, so the
      // oracle reproduces them in closed form (the 8-bucket histogram
      // partitions every byte exactly once, hence feature mass ==
      // byte count); byte-level goldens live in MultimodalSpec.
      (s, dir) => {
        implicit val spark = s
        import s.implicits._
        val media = Multimodal.mediaFromDocuments(t(s, dir, "documents"))
          .as[Multimodal.MediaRow]
        Multimodal.decodeBatch(media, () => new Multimodal.StubCodec())
          .toDF()
          .groupBy("kind")
          .agg(count(lit(1)).as("n"),
            sum(col("n_bytes")).as("total_bytes"),
            avg(col("width")).as("avg_width"),
            max(col("n_frames")).cast("long").as("max_frames"),
            sum(aggregate(col("features"), lit(0.0), (a, x) => a + x))
              .cast("long").as("total_feature_mass"))
          .orderBy("kind")
      },
      Some("""SELECT CASE WHEN lang = 'zh' THEN 'audio' ELSE 'image' END AS kind,
          count(*) AS n,
          CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
          avg(CASE WHEN octet_length(encode(text)) = 0 THEN 1
                   ELSE 1 + CAST(('0x' || substr(hex(encode(text)), 1, 2)) AS INT) % 64
              END) AS avg_width,
          CAST(max(1 + octet_length(encode(text)) // 1024) AS BIGINT) AS max_frames,
          CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_feature_mass
        FROM documents GROUP BY 1 ORDER BY kind"""))
  )
}
