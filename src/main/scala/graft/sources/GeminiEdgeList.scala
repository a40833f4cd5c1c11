package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.LinkGraph

/**
 * Reader for the reference engine's NATIVE on-disk graph format: a
 * raw binary edge list of `|E|` packed records `<src, dst[, weight]>`
 * (/root/reference/README.md:24-26) — `EdgeUnit` is a packed struct
 * of two uint32 plus an optional payload (core/type.hpp:27-41;
 * 8 bytes unweighted, 12 with a float weight), written natively on
 * x86 ⇒ little-endian. The reference infers `|E| = file_size /
 * record_size` (core/graph.hpp:358-359,780-781) and splits the file
 * by byte range across ranks (:788-795).
 *
 * Spark mapping: `binaryRecords` (FixedLengthBinaryInputFormat) gives
 * the same byte-range splitting across tasks — each task decodes its
 * slice of fixed-width records, so a 100 TB edge file fans out over
 * the cluster exactly like the reference's MPI ranks. This is the one
 * justified RDD use in the engine (per-record binary decode has no
 * DataFrame-native reader); everything downstream is the normal
 * Dataset pipeline.
 */
object GeminiEdgeList {

  /** Decode an edge file to (src, dst, weight) rows. Unweighted files
   * get weight 1.0. uint32 vertex ids land in Long (Spark has no
   * unsigned type — SURVEY §1.1). */
  def read(spark: SparkSession, path: String, weighted: Boolean = false): DataFrame = {
    import spark.implicits._
    val recLen = if (weighted) 12 else 8
    val recs = spark.sparkContext.binaryRecords(path, recLen)
    if (weighted)
      recs.map { b =>
        val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
        (bb.getInt.toLong & 0xFFFFFFFFL, bb.getInt.toLong & 0xFFFFFFFFL,
          bb.getFloat.toDouble)
      }.toDF("src", "dst", "weight")
    else
      recs.map { b =>
        val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
        (bb.getInt.toLong & 0xFFFFFFFFL, bb.getInt.toLong & 0xFFFFFFFFL, 1.0)
      }.toDF("src", "dst", "weight")
  }

  /** Deterministic test-fixture writer for the native format: packs
   * (src, dst) pairs as little-endian uint32 records at `path` — the
   * exact on-disk layout of /root/reference/README.md:24-26.
   * FIXTURE-ONLY (caller caps the row count): the engine never writes
   * this format at scale; it exists so the binary LOADER gets an
   * oracle-checked driver query without external binary data. */
  def writeFixture(rows: Array[(Long, Long)], path: String): Unit = {
    val bb = ByteBuffer.allocate(rows.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    rows.foreach { case (s, d) => bb.putInt(s.toInt); bb.putInt(d.toInt) }
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bb.array())
  }

  /** Full parity with the reference loaders: binary file + CLI-style
   * `|V|` → built LinkGraph (load_directed /
   * load_undirected_from_directed, core/graph.hpp:771-1338, :349-756). */
  def load(
      spark: SparkSession,
      path: String,
      numVertices: Long,
      symmetric: Boolean,
      weighted: Boolean = false,
      numPartitions: Int = 32): LinkGraph =
    LinkGraph.fromIdEdges(read(spark, path, weighted), numVertices, symmetric, numPartitions)
}
