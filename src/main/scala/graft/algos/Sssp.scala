package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.syntax._
import graft.{LinkGraph, Superstep}

/**
 * Single-source shortest paths (weighted), transcribing
 * /root/reference/toolkits/sssp.cpp:24-105:
 *
 *  - `distance[root] = 0`, everything else the 1e9 sentinel (:33-34)
 *    — here "absent row" (sparse state; the 1e9 sentinel would
 *    materialize 10^12 rows of infinity at scale).
 *  - relax: `min(distance[src] + weight)` over the frontier's
 *    out-edges (`write_min`, :46-59); improved vertices form the next
 *    frontier; terminate on empty frontier (:37).
 *
 * Bellman-Ford-style label-correcting supersteps — identical
 * convergence to the reference (it is the same algorithm). Distances
 * are Double (the reference uses float; Double avoids accumulation
 * noise vs the oracle, SURVEY.md §7.4.3).
 */
object Sssp {

  final case class Result(distances: DataFrame, iterations: Int)

  /** @return distances: (id, dist) for REACHED vertices only. */
  def run(graph: LinkGraph, rootId: Long, maxIterations: Int = 100000): Result = {
    val spark = graph.spark
    import spark.implicits._
    var dist = Seq((rootId, 0.0)).toDF("id", "dist")
      .repartition(graph.numPartitions, col("id"))
      .graftCut
    var frontier = dist
    var prevCut: DataFrame = dist
    var active = 1L
    var i = 0
    while (active > 0 && i < maxIterations) {
      val mass = Superstep.massOrBound(graph, frontier, active)
      val msgs = Superstep.gather(
        graph, frontier,
        signal = col("dist") + col("weight"), combine = min,
        activeEdges = mass, activeCount = active)
      val merged = dist
        .join(msgs, Seq("id"), "full_outer")
        .select(
          col("id"),
          least(coalesce(col("dist"), col("msg")), coalesce(col("msg"), col("dist"))).as("d"),
          (col("dist").isNull || col("msg") < col("dist")).as("improved"))
        .graftCut
      if (prevCut ne null) { prevCut.graftFree(); }
      prevCut = merged
      dist = merged.select(col("id"), col("d").as("dist"))
      frontier = merged.where(col("improved")).select(col("id"), col("d").as("dist"))
      active = frontier.count()
      i += 1
    }
    Result(dist, i)
  }
}
