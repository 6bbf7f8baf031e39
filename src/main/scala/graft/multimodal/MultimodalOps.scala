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
  * IMAGE decode is REAL: [[Png]] renders and decodes actual PNGs through
  * javax.imageio (ships in the JDK — no new dependency), and
  * l5c_image_decode proves the decoded per-pixel statistics against a
  * closed-form DuckDB oracle. Audio/video codecs do not exist in this
  * container, so [[StubDecoder]] remains a clearly-marked deterministic
  * fake for those media types only — same pipeline shape, one function
  * to swap.
  */
object MultimodalOps extends QueryModule {

  /** Typed record for the media pipeline. */
  final case class MediaRecord(doc_id: Long, payload: Array[Byte], media_type: String, width: Int, height: Int)
  final case class MediaFeature(doc_id: Long, media_type: String, byte_len: Long, head_byte: Int, gray_mean: Double)

  /** STUB: stands in for an AUDIO/VIDEO decoder (no such codecs in this
    * environment; images decode for real via [[Png]]). Deterministic:
    * derives a fake "gray mean" from payload bytes so tests have stable
    * expectations. A real deployment swaps this one function for e.g. a
    * JNI codec; the pipeline shape is unchanged. */
  object StubDecoder {
    def decode(payload: Array[Byte]): Double =
      if (payload.isEmpty) 0.0
      else payload.map(b => (b & 0xff).toDouble).sum / payload.length
  }

  /** REAL image codec on javax.imageio (in the JDK — no external
    * dependency, works headless). [[Png.render]] draws the deterministic
    * test card `pixel(x,y) = (id·31 + 7x + 13y) mod 256` as 8-bit gray
    * and encodes a genuine PNG; [[Png.decode]] parses the container and
    * reads every pixel back. PNG is lossless, so decoded statistics
    * equal the closed-form arithmetic a SQL oracle can compute — which
    * is how l5c proves the decode read real pixels, not container
    * bytes. */
  object Png {
    def render(id: Long, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = ((id * 31 + x * 7 + y * 13) % 256).toInt
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    final case class Decoded(width: Int, height: Int, graySum: Long)

    def decode(payload: Array[Byte]): Decoded = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, "payload is not a decodable image")
      val (w, h) = (img.getWidth, img.getHeight)
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          sum += (img.getRGB(x, y) & 0xff).toLong // gray: all channels equal
          x += 1
        }
        y += 1
      }
      Decoded(w, h, sum)
    }
  }

  final case class ImageFeature(doc_id: Long, width: Int, height: Int, gray_sum: Long, byte_len: Long)

  /** Typed REAL-decode stage: every payload through javax.imageio inside
    * mapPartitions — the codec-handle-per-partition shape; only decoded
    * features (not pixels) leave the executor. */
  def decodeImages(media: Dataset[MediaRecord]): Dataset[ImageFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec/reader init would go here
      rows.map { r =>
        val dec = Png.decode(r.payload)
        ImageFeature(r.doc_id, dec.width, dec.height, dec.graySum, r.payload.length.toLong)
      }
    }
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

  /** L5c: REAL image decode, oracled on decoded-not-synthetic features —
    * each doc_id becomes a genuine PNG (rendered on the executors by
    * [[Png.render]], varying widths), flows through the typed
    * mapPartitions decode stage, and the DECODED width/height/pixel sum
    * must equal the closed-form arithmetic DuckDB computes from doc_id
    * alone. A decoder that didn't parse the container and read actual
    * pixels cannot produce these numbers (the old byte-stats stub sums
    * compressed PNG bytes and fails this oracle by construction). Fixed
    * 200-image slice: decode cost is bounded at any sf; at 100 TB the
    * same stage fans out per partition with pixels never shuffling. */
  val l5cImageDecode = QueryDef(
    "l5c_image_decode",
    (s, d) => {
      import s.implicits._
      val render = udf((id: Long) => Png.render(id, (8 + id % 5).toInt, 8))
      val media = Tables.documents(s, d)
        .filter(col("doc_id") < 200)
        .select(
          col("doc_id"),
          render(col("doc_id")).as("payload"),
          lit("image/png").as("media_type"),
          lit(0).as("width"),
          lit(0).as("height"),
        )
        .as[MediaRecord]
      decodeImages(media).toDF()
        .select(col("doc_id"), col("width"), col("height"), col("gray_sum"))
        .orderBy("doc_id")
    },
    Some("""
      WITH imgs AS (
        SELECT doc_id, 8 + doc_id % 5 AS w, 8 AS h
        FROM documents WHERE doc_id < 200
      ), px AS (
        SELECT i.doc_id, i.w, i.h, g1.x, g2.y
        FROM imgs i
        JOIN (SELECT unnest(generate_series(0, 11)) AS x) g1 ON g1.x < i.w
        JOIN (SELECT unnest(generate_series(0, 7)) AS y) g2 ON g2.y < i.h
      )
      SELECT doc_id,
        CAST(max(w) AS INT) AS width,
        CAST(max(h) AS INT) AS height,
        CAST(sum((doc_id * 31 + x * 7 + y * 13) % 256) AS BIGINT) AS gray_sum
      FROM px
      GROUP BY doc_id
      ORDER BY doc_id
    """.stripMargin.trim),
  )

  /** Real RIFF/WAVE (PCM s16le mono) encode + decode — pure JVM byte
    * layout, no codec library: WAV is a container format, and parsing
    * it IS the audio-ingest work (magic validation, chunk walk, format
    * fields, little-endian samples). Samples are an integer sawtooth
    * derived from (docId, index) so a closed-form SQL oracle can
    * reproduce every decoded statistic exactly — FP-free. */
  object Wav {
    def sampleAt(docId: Long, i: Long): Int =
      ((docId * 31L + i * 37L) % 65536L).toInt - 32768

    /** A complete WAV file: RIFF header, fmt chunk (PCM, mono, 8 kHz,
      * 16-bit), data chunk of `n` samples. */
    def render(docId: Long, n: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1) // PCM, mono
        .putInt(8000).putInt(8000 * 2).putShort(2).putShort(16)
      bb.put("data".getBytes("US-ASCII")).putInt(2 * n)
      var i = 0
      while (i < n) { bb.putShort(sampleAt(docId, i.toLong).toShort); i += 1 }
      bb.array()
    }

    /** Chunk-walking decode: validates the container magics, reads the
      * fmt fields, and returns (sampleRate, nSamples, sumSquares,
      * peak). Refuses loudly on anything that is not PCM s16 mono —
      * silently mis-parsing audio would poison every feature
      * downstream. */
    def decode(bytes: Array[Byte]): (Int, Long, Long, Int) = {
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def ascii(n: Int): String = { val a = new Array[Byte](n); bb.get(a); new String(a, "US-ASCII") }
      require(ascii(4) == "RIFF", "Wav: not a RIFF container")
      bb.getInt()
      require(ascii(4) == "WAVE", "Wav: not a WAVE form")
      var rate = -1
      var out: Option[(Int, Long, Long, Int)] = None
      while (out.isEmpty && bb.remaining() >= 8) {
        val id = ascii(4); val sz = bb.getInt()
        // RIFF rule: a chunk's declared size must fit the container,
        // and chunks are WORD-aligned — an odd-sized chunk (a LIST/INFO
        // text payload, commonly) is followed by one pad byte that is
        // NOT part of the size. Skipping without the pad would misread
        // every later chunk id by one byte. Sloppy encoders omit the
        // FINAL pad byte when the odd chunk is the last one — skip the
        // pad only when a byte actually remains past the payload, so an
        // otherwise-decodable file doesn't throw on the clamp.
        require(sz >= 0 && sz <= bb.remaining(),
          s"Wav: chunk '$id' declares $sz bytes but only ${bb.remaining()} remain")
        val pad = if ((sz & 1) == 1 && bb.remaining() > sz) 1 else 0
        id match {
          case "fmt " =>
            // the PCM fmt payload is 16 bytes; a smaller declared size is
            // malformed and would move the cursor BACKWARDS (sz - 16 < 0),
            // re-reading bytes forever
            require(sz >= 16, s"Wav: fmt chunk declares $sz bytes, need >= 16")
            val fmt = bb.getShort(); val ch = bb.getShort()
            rate = bb.getInt(); bb.getInt(); bb.getShort()
            val bits = bb.getShort()
            require(fmt == 1 && ch == 1 && bits == 16,
              s"Wav: only PCM s16 mono is implemented (fmt=$fmt ch=$ch bits=$bits)")
            bb.position(bb.position() + (sz - 16) + pad)
          case "data" =>
            require(rate > 0, "Wav: data chunk before fmt")
            val n = sz / 2
            var sumSq = 0L; var peak = 0; var i = 0
            while (i < n) {
              val v = bb.getShort().toInt
              sumSq += v.toLong * v; if (math.abs(v) > peak) peak = math.abs(v)
              i += 1
            }
            out = Some((rate, n.toLong, sumSq, peak))
          case _ => bb.position(bb.position() + sz + pad)
        }
      }
      out.getOrElse(throw new IllegalArgumentException("Wav: no data chunk"))
    }
  }

  /** L5d: AUDIO ingest — the second real media modality (PNG images
    * being l5c): per-document PCM WAV payloads are built and then
    * DECODED by an actual container parse (magic validation, chunk
    * walk, little-endian sample read — [[Wav]]); the decoded sample
    * count, energy (sum of squares), and peak must equal the
    * closed-form integer arithmetic DuckDB computes from doc_id alone —
    * a "decoder" that didn't parse the real byte layout cannot pass.
    * Fixed 200-clip slice bounds decode cost at any sf; at 100 TB the
    * payload bytes never shuffle — only the extracted features do. */
  val l5dAudioPcm = QueryDef(
    "l5d_audio_pcm",
    (s, d) => {
      val render = udf((id: Long) => Wav.render(id, (64 + id % 64).toInt))
      val decode = udf((b: Array[Byte]) => Wav.decode(b))
      Tables.documents(s, d)
        .filter(col("doc_id") < 200)
        .select(col("doc_id"), render(col("doc_id")).as("payload"))
        .select(col("doc_id"),
          length(col("payload")).cast("long").as("byte_len"),
          decode(col("payload")).as("f"))
        .select(col("doc_id"), col("byte_len"),
          col("f._1").as("sample_rate"), col("f._2").as("n_samples"),
          col("f._3").as("sum_sq"), col("f._4").as("peak"))
        .orderBy("doc_id")
    },
    Some("""
      WITH clips AS (
        SELECT doc_id, 64 + doc_id % 64 AS n FROM documents WHERE doc_id < 200
      ), samples AS (
        SELECT c.doc_id, c.n,
          (c.doc_id * 31 + g.i * 37) % 65536 - 32768 AS v
        FROM clips c
        JOIN (SELECT unnest(generate_series(0, 127)) AS i) g ON g.i < c.n
      )
      SELECT doc_id,
        CAST(44 + 2 * max(n) AS BIGINT) AS byte_len,
        CAST(8000 AS INT) AS sample_rate,
        CAST(max(n) AS BIGINT) AS n_samples,
        CAST(sum(v * v) AS BIGINT) AS sum_sq,
        CAST(max(abs(v)) AS INT) AS peak
      FROM samples
      GROUP BY doc_id
      ORDER BY doc_id
    """.stripMargin.trim),
  )

  def defs: Seq[QueryDef] = Seq(l5Pipeline, l5bFrameSample, l5cImageDecode, l5dAudioPcm)
}
