package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.syntax._
import graft.{LinkGraph, Superstep}

/**
 * Hop-bounded widest path (single-source max-bottleneck routing): the
 * capacity of a path is its MINIMUM edge weight, and cap(v) = the
 * maximum capacity over all root→v paths of at most `maxHops` edges —
 * the max-min dual of [[Sssp]]'s min-plus relaxation, the standard
 * QoS-routing / max-flow-bottleneck primitive.
 *
 * Why hop-BOUNDED: the unbounded widest path follows the maximum
 * spanning tree, whose root→v path can be Θ(|V|) hops — a
 * label-correcting frontier loop would then need Θ(|V|) supersteps
 * (one Spark job each). Bounding hops makes the superstep count a
 * CONSTANT of the query, independent of graph size — the shape that
 * survives 10^12 edges — and hop-bounded bottleneck is itself the
 * operationally meaningful variant (bandwidth within a latency
 * budget). Unbounded = compose with the MSF ([[Msf]]): widest paths
 * live on the maximum spanning forest.
 *
 * Frontier Bellman-Ford property (same argument as the reference's
 * sssp.cpp:46-59 relaxation): after superstep h, cap(v) equals the
 * best bottleneck over all ≤h-hop paths — an improvement found at
 * step h-1 is propagated at step h, and non-improving arrivals were
 * already dominated. So running EXACTLY `maxHops` supersteps (or
 * stopping early on an empty frontier) yields the exact hop-bounded
 * answer. Same improved-rows-only job budget as [[Sssp]]: one
 * cut+count job per superstep, lazy merge chain compacted every
 * [[Sssp.compactEvery]] steps.
 */
object WidestPath {

  final case class Result(caps: DataFrame, iterations: Int)

  /** Sentinel capacity of the root itself: 10^18 is exactly
   * representable in a double AND a long, so the export-as-bigint
   * compare is exact in both engines. */
  val RootCap = 1e18

  /** @return caps: (id, cap) for vertices REACHED within maxHops
   *          (root included, at [[RootCap]]). */
  def run(graph: LinkGraph, rootId: Long, maxHops: Int = 12): Result = {
    val spark = graph.spark
    import spark.implicits._

    var cap = Seq((rootId, RootCap)).toDF("id", "cap")
      .repartition(graph.numPartitions, col("id"))
      .graftCut
    var frontier = cap
    var active = 1L
    var i = 0
    var base = cap
    var pendingFree = List[DataFrame]()
    while (active > 0 && i < maxHops) {
      val mass = Superstep.massOrBound(graph, frontier, active)
      val msgs = Superstep.gather(
        graph, frontier,
        signal = least(col("cap"), col("weight")), combine = max,
        activeEdges = mass, activeCount = active)
      val (improved, n) = msgs
        .join(cap.select(col("id"), col("cap").as("old")), Seq("id"), "left")
        .where(col("old").isNull || col("msg") > col("old"))
        .select(col("id"), col("msg").as("cap"))
        .graftCutCount
      if (n > 0) {
        pendingFree = frontier :: pendingFree
        cap = cap
          .join(improved.select(col("id"), col("cap").as("nc")), Seq("id"), "full_outer")
          .select(col("id"), coalesce(col("nc"), col("cap")).as("cap"))
        frontier = improved
      }
      active = n
      i += 1
      if (active > 0 && i % Sssp.compactEvery == 0) {
        cap = cap.graftCut
        (base :: pendingFree).filter(_ ne frontier).foreach(_.graftFree())
        pendingFree = Nil
        base = cap
      }
    }
    val finalCap = cap.graftCut
    (base :: frontier :: pendingFree).filter(_ ne finalCap).distinct.foreach(_.graftFree())
    Result(finalCap, i)
  }
}
