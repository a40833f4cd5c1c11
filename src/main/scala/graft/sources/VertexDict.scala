package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic dense Long vertex ids `0..|V|-1` from string keys,
 * with NO global sort (reference analogue: dense `VertexId` space,
 * /root/reference/core/type.hpp:24).
 *
 * Two-phase distributed assignment:
 *   1. hash-bucket the distinct keys (`pmod(xxhash64(key), B)`), rank
 *      within each bucket by key (window partitioned by bucket — a
 *      per-bucket sort, never a global one);
 *   2. collect the B bucket counts (B ≈ shuffle parallelism, tiny),
 *      prefix-sum them on the driver, broadcast-join the offsets back.
 *
 * Deterministic: same keys ⇒ same ids, at any parallelism. At
 * 100 TB the per-bucket sort is the only cost and B scales with the
 * cluster; the driver only ever sees B integers.
 */
object VertexDict {

  /** @param keyEdges (src_key, dst_key, ...) — returns (id: long, key: string). */
  def build(keyEdges: DataFrame, numBuckets: Int): DataFrame = {
    val spark = keyEdges.sparkSession
    val keys = keyEdges.select(col("src_key").as("key"))
      .unionByName(keyEdges.select(col("dst_key").as("key")))
      .distinct()
    val bucketed = keys.withColumn(
      "b", pmod(xxhash64(col("key")), lit(numBuckets.toLong)).cast("int"))
    val ranked = bucketed
      .withColumn("r", row_number().over(Window.partitionBy(col("b")).orderBy(col("key"))))
      .persist()
    val counts: Array[(Int, Long)] = ranked.groupBy(col("b"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (b, c) => val o = (b, acc); acc += c; o }
    val offDf = spark.createDataFrame(offsets).toDF("b", "off")
    val dict = ranked
      .join(broadcast(offDf), "b")
      .select((col("off") + col("r") - 1).as("id"), col("key"))
    dict
  }
}
