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
