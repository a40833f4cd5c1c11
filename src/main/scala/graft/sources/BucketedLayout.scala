package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Degree-aware range bucketing of the vertex id space — the Spark
 * realization of Gemini's locality-aware chunk partitioning
 * (/root/reference/core/graph.hpp:823-846: contiguous vertex ranges
 * balancing `α·|V_p| + |E_p|`, α = 8·(partitions−1) :213).
 *
 * Hash partitioning balances EXPECTED load but is blind to degree
 * skew: a bucket that happens to hold hub vertices carries their full
 * edge mass. This assigner walks the id space IN ORDER (preserving
 * locality — conversation turns stay contiguous) and cuts bucket
 * boundaries by a greedy prefix scan over `α + degree` weights, so
 * every bucket costs ≈ totalCost / numBuckets (a bucket exceeds the
 * budget only when a single vertex alone does — Gemini has the same
 * floor, one vertex is never split).
 *
 * Scale shape: the prefix scan is the VertexDict two-phase pattern —
 * per-range partial sums, driver prefix over `numRanges` scalars,
 * broadcast offsets back. No global sort, no driver data.
 *
 * [[writeBucketed]] persists the edge table partitioned by the
 * cluster-side bucket (`bucket=K/` directories + per-bucket sorted
 * parquet) — the Iceberg-style bucketed table write that the dual
 * in-memory persists stand in for on local[] (SURVEY.md §7.0; no
 * Iceberg runtime ships in this sandbox).
 */
object BucketedLayout {

  /** Reference α = 8·(partitions−1), core/graph.hpp:213. */
  def defaultAlpha(numBuckets: Int): Double = 8.0 * (numBuckets - 1)

  /**
   * Assign each vertex id a bucket by degree-aware greedy range scan.
   *
   * @param degrees (id, out_degree, in_degree)
   * @param degreeCol which degree drives the cost (out for the
   *                  src-clustered layout, in for dst-clustered)
   * @return (id, bucket) — bucket ∈ [0, numBuckets)
   */
  def assignBuckets(
      degrees: DataFrame,
      numBuckets: Int,
      degreeCol: String = "out_degree",
      alpha: Double = -1.0): DataFrame = {
    val spark = degrees.sparkSession
    val a = if (alpha < 0) defaultAlpha(numBuckets) else alpha
    val numRanges = math.max(numBuckets, degrees.rdd.getNumPartitions)
    val weighted = degrees
      .select(col("id"), (lit(a) + col(degreeCol)).as("w"))
      .repartitionByRange(numRanges, col("id"))
      .sortWithinPartitions(col("id"))
      .withColumn("part", spark_partition_id())
      .persist()
    // per-range partial sums → driver prefix (numRanges scalars only)
    val partials = weighted.groupBy(col("part"))
      .agg(sum(col("w")).as("pw"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    val total = partials.map(_._2).sum
    val budget = math.max(total / numBuckets, 1.0)
    var acc = 0.0
    val offsets = partials.map { case (p, w) => val o = (p, acc); acc += w; o }
    val offDf = spark.createDataFrame(offsets.toIndexedSeq).toDF("part", "off")
    // within-range running sum + broadcast offset = global prefix sum
    val cum = weighted
      .withColumn("rw",
        sum(col("w")).over(
          Window.partitionBy(col("part")).orderBy(col("id"))
            .rowsBetween(Window.unboundedPreceding, -1)))
      .join(broadcast(offDf), "part")
      .select(
        col("id"),
        least(
          floor((coalesce(col("rw"), lit(0.0)) + col("off")) / budget),
          lit(numBuckets - 1L)).cast("int").as("bucket"))
    val out = cum.persist()
    out.count()
    weighted.unpersist()
    out
  }

  /** Per-bucket (vertices, edges, cost) — the balance evidence the
   * reference gets from its chunk offsets (core/graph.hpp:849-858). */
  def histogram(
      buckets: DataFrame,
      edges: DataFrame,
      edgeKey: String = "src",
      alpha: Double = 0.0): DataFrame = {
    val e = edges.join(
      buckets.withColumnRenamed("id", edgeKey), edgeKey)
      .groupBy(col("bucket")).agg(count(lit(1)).as("edges"))
    buckets.groupBy(col("bucket")).agg(count(lit(1)).as("vertices"))
      .join(e, Seq("bucket"), "left")
      .select(
        col("bucket"), col("vertices"),
        coalesce(col("edges"), lit(0L)).as("edges"),
        (lit(alpha) * col("vertices") + coalesce(col("edges"), lit(0L))).as("cost"))
      .orderBy(col("bucket"))
  }

  /** Write the edge table as an Iceberg-style bucketed layout:
   * `bucket=K/` parquet directories, rows sorted by (src, dst) within
   * each bucket — the cluster-scale form of LinkGraph's dual persists. */
  def writeBucketed(
      edges: DataFrame,
      buckets: DataFrame,
      path: String,
      edgeKey: String = "src"): Unit =
    edges.join(buckets.withColumnRenamed("id", edgeKey), edgeKey)
      .repartition(col("bucket"))
      .sortWithinPartitions(edgeKey, if (edgeKey == "src") "dst" else "src")
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
}
