package graft.multimodal

import graft.core._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column battery — SURVEY.md §2.10 row L5.
  *
  * Design: media payloads are opaque `binary` columns with a typed
  * metadata struct alongside (the lakehouse-standard layout — the 100 TB
  * of pixels never leaves the executors; only metadata and extracted
  * features shuffle). Decoding runs batch-at-a-time inside
  * `mapPartitions` so a real decoder would amortize codec init per
  * partition, not per row.
  *
  * The container has no image/audio codecs, so [[StubDecoder]] is a
  * clearly-marked deterministic fake; the Spark-side plumbing (schema,
  * partitioning, batch shape) is real and oracled via byte-level
  * functions DuckDB shares (octet_length, md5).
  */
object MultimodalOps extends QueryModule {

  /** Typed record for the media pipeline. */
  final case class MediaRecord(doc_id: Long, payload: Array[Byte], media_type: String, width: Int, height: Int)
  final case class MediaFeature(doc_id: Long, media_type: String, byte_len: Long, head_byte: Int, gray_mean: Double)

  /** STUB: stands in for an image/audio decoder (none installed in this
    * environment). Deterministic: derives a fake "gray mean" from payload
    * bytes so tests have stable expectations. A real deployment swaps
    * this one function for e.g. a JNI codec; the pipeline shape is
    * unchanged. */
  object StubDecoder {
    def decode(payload: Array[Byte]): Double =
      if (payload.isEmpty) 0.0
      else payload.map(b => (b & 0xff).toDouble).sum / payload.length
  }

  /** The library pipeline: binary + metadata in, per-row features out,
    * decoding batched per partition. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (codec contexts, model weights)
      rows.map { r =>
        MediaFeature(
          r.doc_id, r.media_type, r.payload.length.toLong,
          if (r.payload.nonEmpty) r.payload(0) & 0xff else 0,
          StubDecoder.decode(r.payload))
      }
    }
  }

  /** L5: end-to-end multimodal query — documents become fake media blobs
    * (utf-8 payload + metadata struct), flow through the typed
    * mapPartitions pipeline, and features aggregate per media type.
    * Oracle sticks to byte-exact features (octet_length, md5 head) that
    * DuckDB can reproduce; the stub gray_mean is checked in unit tests
    * instead. */
  val l5Pipeline = QueryDef(
    "l5_multimodal",
    (s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d)
        .select(
          col("doc_id"),
          encode(col("text"), "utf-8").as("payload"),
          when(col("doc_id") % 2 === 0, "image/png").otherwise("audio/wav").as("media_type"),
          (col("n_chars") % 640).cast("int").as("width"),
          lit(480).as("height"),
        )
        .as[MediaRecord]
      extractFeatures(media).toDF()
        .select(
          col("doc_id"), col("media_type"), col("byte_len"),
          col("head_byte").cast("long").as("head_byte"),
        )
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
        CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS media_type,
        CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS head_byte
      FROM documents
      ORDER BY doc_id
    """.stripMargin.trim),
  )

  def defs: Seq[QueryDef] = Seq(l5Pipeline)
}
