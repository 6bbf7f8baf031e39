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

  final case class Frame(doc_id: Long, frame_idx: Int, frame_len: Long)

  /** STUB resize: a real implementation re-encodes the payload pixels;
    * here only the metadata changes and the payload passes through
    * untouched. The pipeline position (a typed map between decode and
    * feature extraction, batched per partition) is the real part. */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(rows => rows.map(r => r.copy(width = w, height = h)))
  }

  /** Frame sampling: treat the payload as fixed-size frames and emit
    * every n-th one — the one→many (generator) batch shape a video
    * pipeline needs, expressed as a typed flatMap inside mapPartitions so
    * a real demuxer would init once per partition. Only frame INDEX and
    * LENGTH leave the executor here; a real pipeline would attach the
    * frame bytes (and they would shuffle only if the next stage needs
    * them grouped). */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int, everyNth: Int): Dataset[Frame] = {
    // fail fast at call time, not as an ArithmeticException/"step cannot
    // be 0" buried in an executor task
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    require(everyNth > 0, s"everyNth must be positive, got $everyNth")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val total = r.payload.length
        val nFrames = (total + frameBytes - 1) / frameBytes
        (0 until nFrames by everyNth).iterator.map { i =>
          val len = math.min(frameBytes, total - i * frameBytes).toLong
          Frame(r.doc_id, i, len)
        }
      }
    }
  }

  /** L5b: video-style frame sampling — every 3rd 100-byte frame of each
    * payload, aggregated back per document. The sampled-frame count and
    * byte total are pure integer arithmetic on the payload length, so
    * DuckDB reproduces them exactly from the source text. */
  val l5bFrameSample = QueryDef(
    "l5b_frame_sample",
    (s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d)
        // mirror of the oracle's WHERE: a null text would NPE the typed
        // pipeline, and a zero-byte payload yields NO frames on the Spark
        // side while a per-document oracle row would still exist
        .filter(col("text").isNotNull && length(col("text")) > 0)
        .select(
          col("doc_id"),
          encode(col("text"), "utf-8").as("payload"),
          lit("video/mp4").as("media_type"),
          lit(640).as("width"),
          lit(480).as("height"),
        )
        .as[MediaRecord]
      sampleFrames(resize(media, 320, 240), frameBytes = 100, everyNth = 3).toDF()
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_sampled"),
          sum(col("frame_len")).as("sampled_bytes"),
          max(col("frame_idx")).cast("long").as("last_idx"),
        )
        .orderBy("doc_id")
    },
    Some("""
      WITH m AS (
        SELECT doc_id,
          octet_length(encode(text)) AS total,
          CAST(ceil(octet_length(encode(text)) / 100.0) AS BIGINT) AS n_frames
        FROM documents
        WHERE text IS NOT NULL AND length(text) > 0
      ), f AS (
        SELECT doc_id, total, n_frames,
          CAST((n_frames + 2) // 3 AS BIGINT) AS n_sampled,
          CAST(3 * ((n_frames + 2) // 3 - 1) AS BIGINT) AS last_idx
        FROM m
      )
      SELECT doc_id,
        n_sampled,
        CAST(CASE WHEN last_idx = n_frames - 1
             THEN 100 * (n_sampled - 1) + (total - 100 * (n_frames - 1))
             ELSE 100 * n_sampled END AS BIGINT) AS sampled_bytes,
        last_idx
      FROM f
      ORDER BY doc_id
    """.stripMargin.trim),
  )

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
        // mirrored in the oracle's WHERE: a null text would NPE the typed
        // pipeline (payload null), and head_byte (first UTF-8 byte) only
        // equals DuckDB's ascii() codepoint for an ASCII-leading text —
        // the guard makes the parity hold on ANY corpus, not just the
        // current ASCII fixture
        .filter(col("text").isNotNull && length(col("text")) > 0 &&
          ascii(substring(col("text"), 1, 1)) < 128)
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
      WHERE text IS NOT NULL AND length(text) > 0 AND ascii(substring(text, 1, 1)) < 128
      ORDER BY doc_id
    """.stripMargin.trim),
  )

  def defs: Seq[QueryDef] = Seq(l5Pipeline, l5bFrameSample)
}
