package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.syntax._
import graft.{LinkGraph, Superstep}

/**
 * BFS parent tree + levels from a root, transcribing
 * /root/reference/toolkits/bfs.cpp:22-109:
 *
 *  - `parent[root] = root`, everything else unvisited (:35-36); here
 *    the unvisited sentinel (`|V|`, bfs.cpp:35) becomes simply
 *    "absent row" — the sparse-state representation that scales.
 *  - frontier pushes; unvisited dsts are claimed. The reference claim
 *    is a CAS race (:49-59, parent choice nondeterministic); we pin
 *    `parent = min(src)` — deterministic, levels identical
 *    (SURVEY.md §7.4.3).
 *  - visited set grows each step; the anti-join against it is the
 *    reference's `dense_selective` skip bitmap (bfs.cpp:77,
 *    core/graph.hpp:1663-1689).
 *
 * Direction adaptivity is inherited from Superstep.gather: early and
 * late (small) frontiers broadcast, mid (dense) frontiers use the
 * co-partitioned join — re-evaluated every superstep like the
 * reference's |E|/20 switch.
 */
object Bfs {

  final case class Result(tree: DataFrame, iterations: Int, found: Long)

  /** @return tree: (id, parent, level) for REACHED vertices only. */
  def run(graph: LinkGraph, rootId: Long, maxIterations: Int = 100000): Result = {
    val spark = graph.spark
    import spark.implicits._
    var visited = Seq((rootId, rootId, 0)).toDF("id", "parent", "level")
      .repartition(graph.numPartitions, col("id"))
      .graftCut
    var frontier = visited // (id, parent, level)
    var level = 0
    var frontierCount = 1L
    while (frontierCount > 0 && level < maxIterations) {
      val mass = Superstep.massOrBound(graph, frontier, frontierCount)
      val msgs = Superstep.gather(
        graph, frontier.select(col("id")),
        signal = col("src"), combine = min,
        activeEdges = mass, activeCount = frontierCount)
      val claimed = msgs
        .join(visited, Seq("id"), "left_anti") // dense_selective
        .select(col("id"), col("msg").as("parent"), lit(level + 1).as("level"))
        .graftCut
      frontierCount = claimed.count()
      level += 1
      if (frontierCount > 0) {
        // append-only visited set: plain union per level, compacted
        // (materialized) only every 8 levels — re-materializing the
        // full set each superstep is O(diameter x |V|) on long
        // transcript chains
        visited = visited.unionByName(claimed)
        if (level % 8 == 0) visited = visited.graftCut
        frontier = claimed
      }
    }
    Result(visited, level, visited.count())
  }
}
