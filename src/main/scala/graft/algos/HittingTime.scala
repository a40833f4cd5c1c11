package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.syntax._
import graft.LinkGraph

/**
 * Truncated absorbing-random-walk hitting time — "expected steps from
 * this vertex until the walk first reaches an absorbing vertex",
 * here the tool vertices of the transcript graph: a per-turn
 * *expected turns until the next tool interaction* readout, the
 * random-walk refinement of plain BFS distance-to-a-tool (a walk can
 * wander away; hitting time weights every escape route, which is why
 * it is the standard absorption feature in graph-ML pipelines).
 *
 * The exact hitting time solves a linear system; the engine runs the
 * standard truncated value iteration
 *
 *   h₀ ≡ 0,   hₖ₊₁(v) = 0 (absorbing) | 10⁴ + ⌊Σ_{u∈N(v)} hₖ(u) / d_v⌋
 *
 * which converges to it monotonically from below — `iters` bounds the
 * horizon (a vertex further than `iters` steps reads as "≥ iters").
 * Integer-exact (10⁴-scaled steps, floor division), so the DuckDB
 * oracle replays the rounds bit-for-bit.
 *
 * Scale shape: one dense co-partitioned gather (sum-combine) + one
 * degree join per round, fixed round count — the PageRank plan shape
 * with a pinned absorbing class; no windows, no driver state beyond
 * the loop counter.
 */
object HittingTime {

  val Scale = 10000L

  /** @param absorbing predicate over the vertex `key` column
   *  @return (id, key, h_e4) for every vertex (absorbing rows at 0) */
  def run(
      graph: LinkGraph,
      absorbing: org.apache.spark.sql.Column,
      iters: Int = 5): DataFrame = {
    require(graph.symmetric, "hitting time expects the symmetrized graph")
    val np = graph.numPartitions
    val verts = graph.vertices
      .select(col("id"), col("key"), absorbing.cast("boolean").as("absorb"))
      .repartition(np, col("id"))
      .persist()
    val deg = graph.degrees.select(col("id"), col("out_degree").as("d"))
    var h = verts.select(col("id"), lit(0L).as("h"))
      .repartition(np, col("id")).graftCut
    var prev: DataFrame = null
    for (_ <- 1 to iters) {
      val msgs = graph.edgesBySrc
        .join(h.select(col("id").as("src"), col("h")), "src")
        .groupBy(col("dst").as("id")).agg(sum(col("h")).as("m"))
      val next = verts
        .join(msgs, Seq("id"), "left")
        .join(deg, "id")
        .select(col("id"),
          when(col("absorb"), lit(0L))
            .otherwise(lit(Scale) + expr("coalesce(m, 0L) div d")).as("h"))
        .graftCut
      if (prev != null) prev.graftFree()
      prev = h
      h = next
    }
    if (prev != null) prev.graftFree()
    val out = h.join(verts.select(col("id"), col("key")), "id")
      .select(col("id"), col("key"), col("h").as("h_e4"))
    verts.unpersist(blocking = false)
    out
  }
}
