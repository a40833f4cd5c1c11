package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video as opaque `binary`
 * columns with typed metadata, plus decode / feature-extract /
 * frame-sample operators.
 *
 * The Spark-side plumbing is REAL — binary columns, metadata struct
 * schema, per-batch column expressions, partitioning — and fully
 * tested. The codec itself is STUBBED with a deterministic fake
 * (this container ships no image/audio libraries): "decoding" derives
 * width/height/duration from a hash of the bytes, and "features" are
 * positional byte hashes. Swapping in a real codec means replacing
 * the marked expressions with a `mapPartitions` (JVM codec) or
 * `mapInPandas`/`mapInArrow` (Python codec) of the SAME row schema —
 * no other part of the pipeline changes.
 */
object Multimodal {

  /** Synthesize a media table from `documents` (deterministic): the
   * text bytes stand in for an encoded blob; kind cycles by doc_id. */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet").select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("media"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      struct(
        length(col("text")).as("nbytes"),
        col("source").as("origin")).as("meta"))

  // ---------------------------------------------------------------
  // REAL codec path: RIFF/WAV. The container synthesizes genuine
  // 44-byte WAV headers (canonical PCM layout, little-endian fields)
  // and the decoder parses them BACK FROM THE BYTES — actual binary
  // format work, not a hash fake. Byte access is `hex(blob)` +
  // hex-string slicing (byte i ↔ hex chars 2i−1..2i), the one blob
  // primitive both engines share; every field rebuild is
  // whole-stage-codegen'd string/conv arithmetic, no UDF.
  // ---------------------------------------------------------------

  private def le32Hex(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(
      lpad(hex(pmod(x, lit(256L))), 2, "0"),
      lpad(hex(pmod(x.divide(lit(256L)).cast("long"), lit(256L))), 2, "0"),
      lpad(hex(pmod(x.divide(lit(65536L)).cast("long"), lit(256L))), 2, "0"),
      lpad(hex(pmod(x.divide(lit(16777216L)).cast("long"), lit(256L))), 2, "0"))

  private def le16Hex(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(
      lpad(hex(pmod(x, lit(256L))), 2, "0"),
      lpad(hex(pmod(x.divide(lit(256L)).cast("long"), lit(256L))), 2, "0"))

  /** Synthesize REAL WAV blobs from documents: canonical 44-byte PCM
   * header (RIFF/WAVE/fmt/data chunks, little-endian) + the text
   * bytes as sample payload. sample_rate/channels vary by doc_id. */
  def wavTable(docs: DataFrame): DataFrame = {
    val sr = element_at(
      array(lit(8000L), lit(16000L), lit(44100L)),
      (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
    val ch = pmod(col("doc_id"), lit(2)) + 1
    val payload = encode(col("text"), "UTF-8")
    val dataSize = length(payload).cast("long")
    val byteRate = sr * ch * 2
    val headerHex = upper(concat(
      lit("52494646"), le32Hex(dataSize + 36), // "RIFF", chunk size
      lit("57415645"), lit("666d7420"), // "WAVE", "fmt "
      lit("10000000"), lit("0100"), // fmt size 16, PCM
      le16Hex(ch), le32Hex(sr), le32Hex(byteRate),
      le16Hex(ch * 2), lit("1000"), // block align, 16 bits
      lit("64617461"), le32Hex(dataSize))) // "data", size
    docs.select(col("doc_id").as("media_id"),
      concat(unhex(headerHex), payload).as("wav"))
  }

  /** Decode the WAV header FROM THE BYTES: little-endian field
   * reconstruction over the blob's hex image, plus a payload digest
   * and validity flags for the RIFF/fmt magics. */
  def decodeWav(wavs: DataFrame): DataFrame = {
    // little-endian field at 1-based BYTE offset p: reversed byte-pair
    // slices of the hex image (byte i ↔ hex chars 2i−1..2i)
    def le32s(p: Int): String =
      s"cast(conv(concat(substring(hx, ${(p + 3) * 2 - 1}, 2), substring(hx, ${(p + 2) * 2 - 1}, 2)," +
        s" substring(hx, ${(p + 1) * 2 - 1}, 2), substring(hx, ${p * 2 - 1}, 2)), 16, 10) as bigint)"
    def le32(p: Int) = expr(le32s(p))
    def le16(p: Int) =
      expr(s"cast(conv(concat(substring(hx, ${(p + 1) * 2 - 1}, 2), substring(hx, ${p * 2 - 1}, 2)), 16, 10) as bigint)")
    wavs.select(col("media_id"), upper(hex(col("wav"))).as("hx"))
      .select(col("media_id"),
        (substring(col("hx"), 1, 8) === "52494646" &&
          substring(col("hx"), 17, 8) === "57415645" &&
          substring(col("hx"), 25, 8) === "666D7420").cast("long").as("valid"),
        le16(23).as("channels"),
        le32(25).as("sample_rate"),
        le32(29).as("byte_rate"),
        le16(35).as("bits"),
        le32(41).as("data_bytes"),
        expr(s"(${le32s(41)} * 1000) div ${le32s(29)}").as("duration_ms"),
        md5(substring(col("hx"), 89, 1000000000)).as("payload_md5"))
  }

  /** STUB DECODE — deterministic fake: dimensions/duration derived
   * from three disjoint 40-bit segments of the blob's md5, not a real
   * codec (see class doc). md5 segments (vs xxhash64) keep the fake
   * reproducible in the DuckDB oracle: `conv(substr(md5(x),p,10),16,10)`
   * ≡ DuckDB `('0x' || substr(md5(x),p,10))::BIGINT`. */
  def decode(media: DataFrame): DataFrame = {
    def seg(pos: Int): org.apache.spark.sql.Column =
      conv(substring(md5(col("media")), pos, 10), 16, 10).cast("long")
    media.select(
      col("media_id"), col("kind"), col("meta"),
      when(col("kind") === "image", pmod(seg(1), lit(1280L)) + 32).as("width"),
      when(col("kind") === "image", pmod(seg(11), lit(720L)) + 32).as("height"),
      when(col("kind") =!= "image",
        (pmod(seg(21), lit(300L)) + 1).cast("double")).as("duration_s"),
      col("media"))
  }

  /** Feature extraction: fixed-length float vector per blob — here
   * positional hashes (STUB; a real extractor would run the decoded
   * pixels/samples through a model in mapInArrow batches of the same
   * (media_id, features) schema). */
  def features(media: DataFrame, dim: Int = 16): DataFrame =
    media.select(
      col("media_id"),
      transform(
        sequence(lit(0), lit(dim - 1)),
        i => (pmod(xxhash64(col("media"), i), lit(2000001L)) - 1000000L).cast("double") / 1000000.0)
        .as("features"))

  /** Frame sampling for "video" blobs: n evenly spaced byte-slices as
   * the stand-in for decoded frames (STUB; plumbing — one output row
   * per frame with frame_idx — is the real contract). */
  def frameSample(media: DataFrame, n: Int = 4): DataFrame =
    media.where(col("kind") === "video")
      .select(
        col("media_id"),
        explode(sequence(lit(0), lit(n - 1))).as("frame_idx"),
        col("media"))
      .select(
        col("media_id"), col("frame_idx"),
        expr(s"substring(media, cast(frame_idx * (length(media) / $n) as int) + 1, 16)")
          .as("frame_bytes"))
      .withColumn("frame_hash", xxhash64(col("frame_bytes")))
}
