package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Transcripts → canonical string-keyed edge table `(src_key, dst_key,
 * kind, weight)`.
 *
 * Edge derivation rules (FIXTURES.md §2):
 *  - `adj`  : consecutive turns of a conversation — `lead` over
 *             `(partitionBy conv_id orderBy turn_idx)`.
 *  - `tool` : turn → tool *vertex* (star shape). Modeling the tool as
 *             a vertex instead of pairwise turn×turn joins keeps the
 *             edge count linear in the input — the pairwise variant is
 *             quadratic per tool and melts down on hub tools at
 *             10^12-turn scale.
 *
 * Vertex keys: turns are `"<conv_id>#<turn_idx>"`, tools are
 * `"T#<tool>"` (disjoint namespaces). Self-loops dropped, edges
 * deduped — mirroring the reference loader's canonicalization
 * (/root/reference/core/graph.hpp:771-1338 reads raw pairs; dedup is
 * ours, needed for exact triangle counts).
 */
object EdgeBuilder {

  def turnKey(transcripts: DataFrame): DataFrame =
    transcripts.withColumn(
      "vkey",
      concat(col("conv_id"), lit("#"), col("turn_idx").cast("string")))

  /** weight: adjacency edges 1.0, tool edges 2.0 (used only by the
   * weighted-parity algorithms, SSSP; unweighted algos ignore it). */
  def keyEdges(transcripts: DataFrame): DataFrame = {
    val keyed = turnKey(transcripts)
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    val adj = keyed
      .select(
        col("vkey").as("src_key"),
        lead(col("vkey"), 1).over(w).as("dst_key"))
      .where(col("dst_key").isNotNull)
      .select(col("src_key"), col("dst_key"), lit("adj").as("kind"), lit(1.0).as("weight"))
    val tool = keyed
      .where(col("tool").isNotNull)
      .select(
        col("vkey").as("src_key"),
        concat(lit("T#"), col("tool")).as("dst_key"),
        lit("tool").as("kind"),
        lit(2.0).as("weight"))
    adj.unionByName(tool)
      .where(col("src_key") =!= col("dst_key"))
      .dropDuplicates("src_key", "dst_key")
  }
}
