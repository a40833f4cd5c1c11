package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.LinkGraph

/**
 * Deterministic GraphSAGE-style neighbor sampling — the GNN
 * training-data primitive: for every vertex keep the `s` neighbors
 * with the smallest md5 priority of the (src, dst) KEY pair. The md5
 * trick (shared determinism contract with Mix/Matching) makes the
 * sample pseudo-random yet identical across engines, runs, and
 * parallelism — which is what lets a sampled mini-batch pipeline be
 * replayed exactly.
 *
 * Plan shape: one key join onto the resident edge set, one grouped
 * window (partitioned by src — bounded groups, no global sort). At
 * 10^12 edges the window is the standard per-vertex top-k; for
 * extreme hubs the two-level min-k aggregation would slot in, but
 * hub SAMPLING is exactly the case where s ≪ degree keeps the
 * output bounded regardless.
 */
object NeighborSample {

  /** @return (src_key, dst_key, r) — the ≤ s sampled out-neighbors of
   * every vertex, r = 1-based priority rank within the sample. */
  def sample(graph: LinkGraph, s: Int): DataFrame = {
    val vk = (idCol: String, keyCol: String) =>
      graph.vertices.select(col("id").as(idCol), col("key").as(keyCol))
    val keyed = graph.edgesBySrc
      .join(vk("src", "src_key"), "src")
      .join(vk("dst", "dst_key"), "dst")
      .select(col("src_key"), col("dst_key"))
      .withColumn("p",
        conv(substring(md5(concat_ws("|", col("src_key"), col("dst_key"))), 1, 15), 16, 10)
          .cast("long"))
    keyed
      .withColumn("r",
        row_number().over(
          Window.partitionBy(col("src_key")).orderBy(col("p"), col("dst_key"))))
      .where(col("r") <= s)
      .select(col("src_key"), col("dst_key"), col("r").cast("long").as("r"))
  }
}
