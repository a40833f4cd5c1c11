package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.syntax._
import graft.{LinkGraph, Superstep}

/**
 * Betweenness centrality from a root, transcribing
 * /root/reference/toolkits/bc.cpp:24-196 (the level-bitmap variant,
 * COMPACT=0):
 *
 * FORWARD (:36-100): level-synchronous BFS accumulating path counts —
 * frontier pushes `σ[src]`; unvisited dsts sum incoming messages into
 * their σ and form the next level; every level's (id, σ) is retained
 * (the reference keeps one bitmap per level, :49,96).
 *
 * BACKWARD (:102-168): on the TRANSPOSED graph (:121 — our dual
 * dst-clustered layout, LinkGraph.transpose), levels unwind deepest-
 * first: each level's members take `dep = 1/σ + Σ dep[child]` where
 * children are the next-deeper level's frontier; the visited guard
 * (reference `dense_selective`) means a vertex receives messages only
 * in the step before its own level pops — transcribed here as the
 * per-step restriction of the merge to that level's members.
 *
 * FINALIZE (:170-176): `bc = (dep − 1/σ) / (1/σ) = dep·σ − 1`.
 * Output restricted to REACHED vertices (the reference computes
 * 1/σ = ∞ → NaN for unreached ones, :184-190 prints them regardless;
 * a NaN column is not a useful contract).
 */
object Betweenness {

  final case class Result(bc: DataFrame, levels: Int)

  def run(graph: LinkGraph, rootId: Long): Result = {
    val spark = graph.spark
    import spark.implicits._

    // ---- forward: levels(k) = (id, sigma) of vertices at depth k
    var levels = List[DataFrame]()
    var frontier = Seq((rootId, 1.0)).toDF("id", "sigma")
      .repartition(graph.numPartitions, col("id")).graftCut
    var visited = frontier.select(col("id")).graftCut
    levels = frontier :: levels
    var frontierCount = 1L
    while (frontierCount > 0) {
      val mass = Superstep.massOrBound(graph, frontier, frontierCount)
      val msgs = Superstep.gather(
        graph, frontier, signal = col("sigma"), combine = sum,
        activeEdges = mass, activeCount = frontierCount)
      val next = msgs.join(visited, Seq("id"), "left_anti")
        .select(col("id"), col("msg").as("sigma")).graftCut
      frontierCount = next.count()
      if (frontierCount > 0) {
        // append-only: compact lazily (see Bfs) — the per-level
        // frontiers are already cut, so the union is cheap lineage
        visited = visited.unionByName(next.select(col("id")))
        if (levels.length % 8 == 0) visited = visited.graftCut
        frontier = next
        levels = next :: levels
      }
    }
    // levels head = deepest, last = root level
    val depth = levels.length - 1

    // ---- backward on the transposed graph
    val t = graph.transpose
    var depFrontier: DataFrame = null // (id, dep) of the level just processed
    var done: List[DataFrame] = Nil // finished (id, dep) per level
    levels.foreach { lvl =>
      val withInv = lvl.select(col("id"), (lit(1.0) / col("sigma")).as("inv"))
      val dep =
        if (depFrontier == null) withInv.select(col("id"), col("inv").as("dep"))
        else {
          val cnt = depFrontier.count()
          val mass = Superstep.massOrBound(t, depFrontier, cnt)
          val msgs = Superstep.gather(
            t, depFrontier, signal = col("dep"), combine = sum,
            activeEdges = mass, activeCount = cnt)
          // only THIS level's members may receive (visited guard,
          // bc.cpp:139,160): restrict the merge to lvl
          withInv.join(msgs, Seq("id"), "left")
            .select(col("id"), (col("inv") + coalesce(col("msg"), lit(0.0))).as("dep"))
        }
      val cut = dep.graftCut
      depFrontier = cut
      done = cut :: done
    }

    val allDeps = done.reduce(_ unionByName _)
    val sigmas = levels.reduce(_ unionByName _)
    val bc = allDeps.join(sigmas, "id")
      .select(col("id"), (col("dep") * col("sigma") - 1.0).as("bc"))
      .graftCut
    Result(bc, depth)
  }
}
