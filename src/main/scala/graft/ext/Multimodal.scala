package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (SURVEY.md §2.11): images/audio/video as opaque
  * `binary` columns with a typed metadata struct, plus the Spark-side
  * plumbing for decode / feature-extract / resize / frame-sample.
  *
  * The actual codec step is STUBBED — image/audio libraries are not in
  * this container — as a deterministic fake over the raw bytes (clearly
  * marked below). Everything around it is real and tested: the schema,
  * the partitioning, the per-partition batch iteration shape, and the
  * byte-level sampling operators (those are pure Spark expressions and
  * ARE verified against the DuckDB oracle).
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

  /** DuckDB twin of [[sampleBytes]] over a VARCHAR source (the synthetic
    * payload is UTF-8 text; ascii() of the 1-char substring = byte value
    * and length = octet_length for ASCII corpora).
    */
  def sampleBytesSql(textE: String, stride: Int, maxSamples: Int = 16): String =
    s"list_transform(generate_series(1, least(length($textE) // $stride, $maxSamples)), " +
      s"i -> ascii(substring($textE, (i-1)*$stride + 1, 1)))"

  /** Decoded-feature record produced by the stubbed decoder. */
  case class DecodedFeatures(media_id: Long, kind: String, n_bytes: Int,
      brightness: Double, resized_w: Int, resized_h: Int)

  /** Decode + feature-extract + resize, batched per partition.
    *
    * The `mapPartitions` shape is the real contract at scale: one
    * decoder-context per partition (codecs are expensive to init), bytes
    * streamed once, nothing shuffled. ==== STUB ====: the codec call
    * itself is replaced by a deterministic fake (byte statistics) because
    * no image/audio codec ships in this container; swap `fakeDecode` for
    * a real decoder binding in production. ==============
    */
  def decodeFeatures(media: DataFrame, targetW: Int = 224,
      targetH: Int = 224): Dataset[DecodedFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "bytes").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // one decoder context per partition would be created HERE
        rows.map { case (id, kind, bytes) =>
          val (bright, w, h) = fakeDecode(bytes)
          DecodedFeatures(id, kind, bytes.length, bright,
            math.min(w, targetW), math.min(h, targetH))
        }
      }
  }

  /** ==== STUB ==== deterministic fake decoder: "brightness" = mean byte
    * value, "dimensions" derived from payload length. A real
    * implementation calls the image/audio codec here.
    */
  private def fakeDecode(bytes: Array[Byte]): (Double, Int, Int) = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    val brightness =
      if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length
    (brightness, 64 + bytes.length % 512, 48 + bytes.length % 384)
  }
}
