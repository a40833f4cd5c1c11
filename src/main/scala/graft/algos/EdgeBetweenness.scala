package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.LinkGraph

/**
 * Per-EDGE betweenness from a root — the Girvan-Newman scoring step
 * (edges with high betweenness are the inter-community bridges whose
 * removal peels communities apart).
 *
 * Pure composition, zero new machinery: Brandes' identity credits a
 * shortest-path-DAG edge (u,v) — lvl(v) = lvl(u)+1 — with
 *
 *   ebc(u→v) = σ(u)/σ(v) · (1 + δ(v)) = σ(u) · dep(v)
 *
 * and [[Betweenness]] already publishes everything on the right:
 * the fused vertex run returns σ(v), the backward-pass dep(v)
 * EXACTLY as computed (not re-derived from bc — inverting
 * (bc+1)/σ loses low double bits for large dep·σ), and the forward
 * BFS level. So edge betweenness is the vertex run + ONE
 * co-partitioned edge join — no second BFS, no extra backward pass.
 * Reference anchor: the dependency pair the vertex pass reports
 * (bc.cpp:184-190) is exactly the per-edge credit factored through
 * the DAG.
 *
 * Non-DAG edges (same level, or spanning >1 level — impossible for
 * BFS levels; equal-level edges are real) carry no shortest-path
 * flow and are correctly absent from the output.
 */
object EdgeBetweenness {

  /** @return (src, dst, ebc: double) over shortest-path-DAG edges */
  def run(graph: LinkGraph, rootId: Long): DataFrame = {
    val bc = Betweenness.run(graph, rootId).bc // (id, sigma, bc, dep, lvl)

    val srcState = bc
      .select(col("id").as("src"), col("sigma").as("s_sigma"),
        col("lvl").as("s_lvl"))
    val dstState = bc
      .select(col("id").as("dst"), col("dep"), col("lvl").as("d_lvl"))

    graph.edgesBySrc
      .join(srcState, "src") // co-partitioned on src
      .join(dstState.repartition(graph.numPartitions, col("dst")), "dst")
      .where(col("d_lvl") === col("s_lvl") + 1)
      .select(col("src"), col("dst"), (col("s_sigma") * col("dep")).as("ebc"))
  }
}
