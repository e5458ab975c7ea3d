package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (SURVEY.md §2.11): images/audio/video as opaque
  * `binary` columns with a typed metadata struct, plus the Spark-side
  * plumbing for decode / feature-extract / resize / frame-sample.
  *
  * ALL THREE modalities run REAL containers end-to-end, zero external
  * dependencies:
  *  - image: genuine PNG/BMP via JDK `javax.imageio`
  *    ([[synthesizeImages]]/[[decodeImages]] — decode, brightness,
  *    nearest-neighbor resize);
  *  - audio: genuine RIFF/WAVE, pure byte math
  *    ([[synthesizeAudio]]/[[decodeAudio]] — chunk-walking parser,
  *    PCM stats, decimation = downsampling);
  *  - video: genuine YUV4MPEG2 ([[synthesizeVideo]]/[[decodeVideo]] —
  *    tagged-header parse, FRAME walk, frame-sampling).
  * Payload contents are deterministic formulas, so every decoded fact is
  * arithmetically reproducible by the DuckDB oracle (q33/q52/q53).
  * [[synthesizeFromText]] + [[sampleBytes]] cover the
  * byte-level/opaque-payload operators (frame sampling, metadata reads).
  *
  * Scale design: media bytes are the heaviest column in any multimodal
  * table — every operator here either prunes it (metadata-only reads
  * never touch `bytes` thanks to parquet column pruning) or streams it
  * once per partition (`mapPartitions`, no per-row task overhead, no
  * shuffle of the binary payload).
  */
object Multimodal {

  /** Media-table schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType), // image | audio | video
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", IntegerType),
      StructField("sample_rate", IntegerType))))))

  /** Deterministic synthetic media table derived from a text corpus
    * (no real media in the testdata): payload = UTF-8 bytes, kind cycles
    * by id, metadata derived arithmetically. Gives the multimodal
    * operators a reproducible input at any scale factor.
    */
  def synthesizeFromText(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col(idCol) % 3 + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("bytes"),
      struct(
        (col(idCol) % 640 + 64).cast("int").as("width"),
        (col(idCol) % 480 + 48).cast("int").as("height"),
        (col(idCol) % 90000).cast("int").as("duration_ms"),
        lit(16000).cast("int").as("sample_rate")).as("meta"))

  /** `substring` with a dynamic (per-row) start position — the public
    * `functions.substring` only takes literal pos/len; the Catalyst
    * `Substring` expression itself is fine with expressions.
    */
  private def substrDyn(bin: Column, pos: Column, len: Int): Column =
    call_function("substring", bin, pos, lit(len))

  /** Frame/sample extraction: every `stride`-th byte as an int array —
    * the shape of video frame-sampling / audio downsampling, expressed on
    * the raw payload. Pure expressions: no data leaves the row.
    */
  def sampleBytes(bin: Column, stride: Int, maxSamples: Int = 16): Column = {
    val m = least(floor(octet_length(bin) / lit(stride)).cast("long"),
      lit(maxSamples.toLong))
    // guard: Spark's sequence(1, 0) is a descending [1, 0], not empty
    when(m < 1, array().cast("array<int>"))
      .otherwise(transform(sequence(lit(1L), greatest(m, lit(1L))),
        i => conv(hex(substrDyn(bin, (i - 1) * stride + 1, 1)), 16, 10)
          .cast("int")))
  }

  /** DuckDB twin of [[sampleBytes]] over a VARCHAR source: the payload
    * is the text's UTF-8 BYTES, so the twin must index bytes too — an
    * earlier char-substring formulation (`ascii(substring(...))`)
    * matched only while every char was one byte, and the fuzz corpus's
    * astral-plane docs exposed it (code point 128640 vs lead byte 240).
    * DuckDB has no blob subscript; hex-pair extraction is the portable
    * byte accessor.
    */
  def sampleBytesSql(textE: String, stride: Int, maxSamples: Int = 16): String =
    s"list_transform(generate_series(1, " +
      s"least(octet_length(encode($textE)) // $stride, $maxSamples)), " +
      s"i -> CAST('0x' || substr(hex(encode($textE)), " +
      s"((i-1)*$stride)*2 + 1, 2) AS INTEGER))"

  /** One synthesized real image: genuine encoded PNG/BMP payload. */
  case class MediaImage(media_id: Long, fmt: String, bytes: Array[Byte])

  /** Decoded-feature record: true dimensions and pixel statistics from
    * the actual decoded raster, plus a nearest-neighbor resize.
    */
  case class DecodedImage(media_id: Long, fmt: String, width: Int,
      height: Int, n_pixels: Long, brightness: Double,
      resized_w: Int, resized_h: Int, resized_brightness: Double)

  /** Synthesized-image dimension formulas (shared by encode, decode spec
    * and the SQL oracle twin): w ∈ [2,8], h ∈ [2,6], gray value
    * v(x,y) = (id·31 + x·7 + y·13) mod 256. Ids are expected non-negative
    * (`floorMod` here; the oracle's `%` agrees on non-negatives).
    */
  private[graft] def synthWidth(id: Long): Int =
    (Math.floorMod(id, 7L) + 2).toInt
  private[graft] def synthHeight(id: Long): Int =
    (Math.floorMod(id, 5L) + 2).toInt
  private[graft] def synthPixel(id: Long, x: Int, y: Int): Int =
    Math.floorMod(id * 31L + x * 7L + y * 13L, 256L).toInt

  /** Deterministic REAL image table derived from an id column: each row
    * carries an actual PNG or BMP payload (format cycles by id) encoded
    * with JDK `ImageIO` from the [[synthPixel]] gray pattern. Both formats
    * are lossless 24-bit RGB, so any decoder recovers the exact pixel
    * values — which is what makes [[decodeImages]] oracle-checkable.
    *
    * `mapPartitions`: one encoder pass per partition; the payload is born
    * on the executor and never shuffles.
    */
  def synthesizeImages(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val fmt = if (id % 2 == 0) "png" else "bmp"
        val w = synthWidth(id)
        val h = synthHeight(id)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = synthPixel(id, x, y)
            raster.setSample(x, y, 0, v)
            raster.setSample(x, y, 1, v)
            raster.setSample(x, y, 2, v)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        require(javax.imageio.ImageIO.write(img, fmt, bos),
          s"no ImageIO writer for format $fmt")
        MediaImage(id, fmt, bos.toByteArray)
      }
    }.toDF()
  }

  /** Once-per-JVM ImageIO configuration. `setUseCache(false)` is a
    * JVM-global switch (it makes `createImageInputStream` wrap byte
    * streams in memory instead of spilling each one to a temp file);
    * setting it from a deterministic one-shot initializer instead of
    * every partition task keeps the global side effect intentional,
    * race-free, and visible in one place.
    */
  private object DecoderJvmInit {
    javax.imageio.ImageIO.setUseCache(false)
    def ensure(): Unit = ()
  }

  /** Per-partition decoder with reader reuse — the "decoder setup
    * amortized per partition" contract made real: `ImageIO.read` per
    * image pays a registry lookup + format sniff every call and, with
    * the default stream cache, spills each stream wrapper to a TEMP
    * FILE. One call per partition instead turns off the disk cache and
    * keeps one `ImageReader` per container format, dispatched on the
    * payload's own magic bytes (PNG `PNG`, BMP `BM`);
    * unrecognized magics fall back to plain `ImageIO.read`, so the
    * path stays decoder-general. Exactly the shape a CNN decode stage
    * uses: expensive per-format machinery lives partition-long, each
    * row only streams its bytes through it.
    */
  private def partitionDecoder()
      : (Array[Byte], => String) => java.awt.image.BufferedImage = {
    DecoderJvmInit.ensure()
    val readers =
      scala.collection.mutable.Map.empty[String, javax.imageio.ImageReader]
    // Reader instances hold native/heap decode buffers; free them when
    // the task ends (covers both exhaustion and early termination).
    Option(org.apache.spark.TaskContext.get()).foreach {
      _.addTaskCompletionListener[Unit] { _ =>
        readers.valuesIterator.foreach(_.dispose())
        readers.clear()
      }
    }
    (bytes, what) => {
      val fmt =
        if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 &&
          bytes(1) == 'P'.toByte && bytes(2) == 'N'.toByte &&
          bytes(3) == 'G'.toByte) "png"
        else if (bytes.length >= 2 && bytes(0) == 'B'.toByte &&
          bytes(1) == 'M'.toByte) "bmp"
        else null
      val img =
        if (fmt == null)
          javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        else {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val r = readers.getOrElseUpdate(fmt, {
              val it =
                javax.imageio.ImageIO.getImageReadersByFormatName(fmt)
              require(it.hasNext, s"no ImageIO reader for format $fmt")
              it.next()
            })
            r.setInput(iis)
            try r.read(0) finally r.setInput(null)
          } finally iis.close()
        }
      require(img != null, s"undecodable payload for $what")
      img
    }
  }

  /** REAL decode + feature-extract + resize, batched per partition:
    * `ImageIO.read` parses the actual PNG/BMP payload; width/height and
    * brightness (mean of the first raster band — channels are equal by
    * construction) come from decoded pixels, and the resize is a true
    * nearest-neighbor resample of the raster (source pixel of output
    * (x',y') is (⌊x'·w/rw⌋, ⌊y'·h/rh⌋) — integer arithmetic, so the
    * oracle reproduces the resized statistics too).
    *
    * The `mapPartitions` shape is the contract at scale: decoder setup
    * amortized per partition, bytes streamed once, nothing shuffled.
    */
  def decodeImages(media: DataFrame, targetW: Int = 224,
      targetH: Int = 224): Dataset[DecodedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "fmt", "bytes").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        val decode = partitionDecoder()
        rows.map { case (id, fmt, bytes) =>
          val img = decode(bytes, s"media_id=$id")
          val w = img.getWidth
          val h = img.getHeight
          val raster = img.getRaster
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
            y += 1
          }
          val n = w.toLong * h
          val rw = math.min(w, targetW)
          val rh = math.min(h, targetH)
          var sumR = 0L
          var yp = 0
          while (yp < rh) {
            val sy = yp * h / rh
            var xp = 0
            while (xp < rw) {
              sumR += raster.getSample(xp * w / rw, sy, 0)
              xp += 1
            }
            yp += 1
          }
          DecodedImage(id, fmt, w, h, n, sum.toDouble / n, rw, rh,
            sumR.toDouble / (rw.toLong * rh))
        }
      }
  }

  /** Per-image feature record: 2×2 quadrant brightness sums from the
    * decoded raster (exact integers carried as doubles — the feature
    * vector the retrieval stage consumes).
    */
  case class ImageFeatures(media_id: Long, features: Array[Double])

  /** REAL decode → feature-extract: quadrant brightness sums as a
    * 4-dim embedding (the image-retrieval feature stage; a production
    * pipeline swaps the quadrant sum for a CNN forward pass inside the
    * SAME mapPartitions shape — decoder + model set up once per
    * partition, bytes streamed, nothing shuffled). Quadrants split at
    * the integer midpoints (`x < w/2`, `y < h/2`), so every feature is
    * an exact integer the oracle reproduces from the synthesis formula
    * — the decode path is verified THROUGH the feature pipeline.
    */
  def imageFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decode = partitionDecoder()
        rows.map { case (id, bytes) =>
          val img = decode(bytes, s"media_id=$id")
          val w = img.getWidth
          val h = img.getHeight
          val raster = img.getRaster
          val sums = new Array[Double](4)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val q = (if (y < h / 2) 0 else 2) + (if (x < w / 2) 0 else 1)
              sums(q) += raster.getSample(x, y, 0)
              x += 1
            }
            y += 1
          }
          ImageFeatures(id, sums)
        }
      }.toDF()
  }

  // ------------------------------------------------------- audio (WAV)

  /** One synthesized real audio clip: genuine RIFF/WAVE payload
    * (canonical 44-byte header + 8-bit mono PCM). WAV needs no codec —
    * the container is pure byte arithmetic — so unlike the image path
    * there is no library between the synthesis formula and the wire
    * format at all.
    */
  case class MediaAudio(media_id: Long, bytes: Array[Byte])

  /** Features extracted by genuinely parsing the WAV container. All
    * integers (PCM is integral), so the oracle reproduces every column
    * exactly: `duration_us = n·1e6 div rate`, `decim_sum` = sum of every
    * 4th sample (the audio-downsampling op).
    */
  case class DecodedAudio(media_id: Long, sample_rate: Int,
      bits_per_sample: Int, n_samples: Long, sum_samples: Long,
      max_sample: Int, duration_us: Long, decim_sum: Long)

  private[graft] val AudioRate = 8000
  private[graft] def synthSampleCount(id: Long): Int =
    (Math.floorMod(id, 50L) + 10).toInt
  private[graft] def synthSample(id: Long, i: Int): Int =
    Math.floorMod(id * 17L + i * 29L, 256L).toInt

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Deterministic REAL audio table: each row is a complete, valid WAV
    * file (any audio tool opens it) with samples from [[synthSample]].
    * Same scale shape as [[synthesizeImages]]: payloads are born on the
    * executor inside `mapPartitions` and never shuffle.
    */
  def synthesizeAudio(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val n = synthSampleCount(id)
        val bos = new java.io.ByteArrayOutputStream(44 + n)
        bos.write("RIFF".getBytes("US-ASCII")); bos.write(le32(36 + n))
        bos.write("WAVE".getBytes("US-ASCII"))
        bos.write("fmt ".getBytes("US-ASCII")); bos.write(le32(16))
        bos.write(le16(1))          // PCM
        bos.write(le16(1))          // mono
        bos.write(le32(AudioRate))
        bos.write(le32(AudioRate))  // byte rate (8-bit mono)
        bos.write(le16(1))          // block align
        bos.write(le16(8))          // bits/sample
        bos.write("data".getBytes("US-ASCII")); bos.write(le32(n))
        var i = 0
        while (i < n) { bos.write(synthSample(id, i)); i += 1 }
        MediaAudio(id, bos.toByteArray)
      }
    }.toDF()
  }

  private def rdLE16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def rdLE32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** REAL WAV parse + feature-extract, batched per partition: validates
    * the RIFF/WAVE magics, reads the fmt chunk, then WALKS the chunk
    * list to find `data` (not a fixed offset — extra chunks like LIST
    * are skipped correctly, as a real parser must).
    */
  def decodeAudio(media: DataFrame): Dataset[DecodedAudio] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, b) =>
          require(b.length >= 44 &&
            new String(b, 0, 4, "US-ASCII") == "RIFF" &&
            new String(b, 8, 4, "US-ASCII") == "WAVE",
            s"not a RIFF/WAVE payload for media_id=$id")
          var off = 12
          var rate = -1; var bits = -1; var channels = -1
          var dataOff = -1; var dataLen = -1
          // Walk until BOTH chunks are found: the spec does not order
          // `fmt ` before `data`, so stopping at the first `data` would
          // reject a legal WAV whose fmt chunk comes second.
          while (off + 8 <= b.length && (dataOff < 0 || rate < 0)) {
            val ckId = new String(b, off, 4, "US-ASCII")
            val ckLen = rdLE32(b, off + 4)
            if (ckId == "fmt ") {
              require(rdLE16(b, off + 8) == 1, "not PCM")
              channels = rdLE16(b, off + 10)
              rate = rdLE32(b, off + 12)
              bits = rdLE16(b, off + 22)
            } else if (ckId == "data") {
              dataOff = off + 8; dataLen = ckLen
            }
            off += 8 + ckLen + (ckLen & 1) // chunks are word-aligned
          }
          require(rate > 0 && bits == 8 && channels == 1 && dataOff >= 0,
            s"unsupported WAV layout for media_id=$id")
          require(dataLen >= 0 && dataOff.toLong + dataLen <= b.length,
            s"truncated data chunk for media_id=$id: " +
              s"declared $dataLen bytes at $dataOff, have ${b.length}")
          var sum = 0L; var max = 0; var decim = 0L
          var i = 0
          while (i < dataLen) {
            val v = b(dataOff + i) & 0xff
            sum += v
            if (v > max) max = v
            if (i % 4 == 0) decim += v
            i += 1
          }
          DecodedAudio(id, rate, bits, dataLen.toLong, sum, max,
            dataLen.toLong * 1000000L / rate, decim)
        }
      }
  }

  // ------------------------------------------------------- video (Y4M)

  /** One synthesized real video clip: genuine YUV4MPEG2 (y4m) payload —
    * a plain-text stream header (`YUV4MPEG2 W.. H.. F25:1 Cmono`), then
    * `FRAME\n` + raw luma plane per frame. Like WAV, the container is
    * codec-free, so the third modality is also real end-to-end (any
    * ffmpeg/mpv opens these bytes).
    */
  case class MediaVideo(media_id: Long, bytes: Array[Byte])

  /** Frame-sampled features from genuinely parsing the y4m stream. The
    * sampled-luma column IS the frame-sampling op: only every
    * `frameStride`-th frame contributes. All integers except nothing —
    * fully oracle-exact.
    */
  case class DecodedVideo(media_id: Long, width: Int, height: Int,
      n_frames: Long, duration_us: Long, total_luma: Long,
      sampled_luma: Long)

  private[graft] val VideoFps = 25
  private[graft] def synthFrames(id: Long): Int =
    (Math.floorMod(id, 5L) + 2).toInt
  private[graft] def synthVideoW(id: Long): Int =
    (Math.floorMod(id, 4L) * 2 + 2).toInt
  private[graft] def synthVideoH(id: Long): Int =
    (Math.floorMod(id, 3L) * 2 + 2).toInt
  private[graft] def synthLuma(id: Long, f: Int, x: Int, y: Int): Int =
    Math.floorMod(id * 7L + f * 11L + x * 3L + y * 5L, 256L).toInt

  /** Deterministic REAL video table; `mapPartitions`, payloads never
    * shuffle (the scale contract shared by all three modalities).
    */
  def synthesizeVideo(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val w = synthVideoW(id); val h = synthVideoH(id)
        val n = synthFrames(id)
        val bos = new java.io.ByteArrayOutputStream()
        bos.write(s"YUV4MPEG2 W$w H$h F$VideoFps:1 Ip A1:1 Cmono\n"
          .getBytes("US-ASCII"))
        var f = 0
        while (f < n) {
          bos.write("FRAME\n".getBytes("US-ASCII"))
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { bos.write(synthLuma(id, f, x, y)); x += 1 }
            y += 1
          }
          f += 1
        }
        MediaVideo(id, bos.toByteArray)
      }
    }.toDF()
  }

  /** REAL y4m parse + frame-sample, batched per partition: reads the
    * stream header (tagged parameters, order-independent, as the format
    * specifies), then walks FRAME markers — tolerating per-frame
    * parameters after `FRAME` — accumulating total luma and the
    * `frameStride`-sampled luma.
    */
  def decodeVideo(media: DataFrame, frameStride: Int = 2): Dataset[DecodedVideo] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, b) =>
          var eol = 0
          while (eol < b.length && b(eol) != '\n') eol += 1
          val header = new String(b, 0, eol, "US-ASCII")
          val tags = header.split(" ")
          require(tags.headOption.contains("YUV4MPEG2"),
            s"not a YUV4MPEG2 stream for media_id=$id")
          def tag(p: Char): Option[String] =
            tags.tail.find(_.headOption.contains(p)).map(_.drop(1))
          val w = tag('W').map(_.toInt).getOrElse(
            sys.error(s"y4m missing width for media_id=$id"))
          val h = tag('H').map(_.toInt).getOrElse(
            sys.error(s"y4m missing height for media_id=$id"))
          val Array(fpsNum, fpsDen) =
            tag('F').getOrElse(s"$VideoFps:1").split(":").map(_.toLong)
          require(tag('C').forall(_.startsWith("mono")),
            s"only Cmono layout supported, media_id=$id")
          val frameLen = w * h
          var off = eol + 1
          var frames = 0L
          var total = 0L
          var sampled = 0L
          while (off < b.length) {
            // FRAME marker, possibly with parameters up to newline
            require(off + 5 <= b.length &&
              new String(b, off, 5, "US-ASCII") == "FRAME",
              s"corrupt frame marker at $off for media_id=$id")
            off += 5
            while (off < b.length && b(off) != '\n') off += 1
            off += 1
            require(off + frameLen <= b.length,
              s"truncated frame for media_id=$id")
            var s = 0L
            var i = 0
            while (i < frameLen) { s += b(off + i) & 0xff; i += 1 }
            total += s
            if (frames % frameStride == 0) sampled += s
            frames += 1
            off += frameLen
          }
          DecodedVideo(id, w, h, frames,
            frames * 1000000L * fpsDen / fpsNum, total, sampled)
        }
      }
  }
}
