package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.LinkGraph

/**
 * Greedy k-center over hop distance (Gonzalez farthest-first
 * traversal, the classic 2-approximation for minimax facility
 * placement): inside the LARGEST component (center placement is
 * trivial across disconnected pieces — one per piece — so the giant
 * component is where the minimax problem lives), seed at the minimum
 * key, then k−1 times add the vertex FARTHEST from the current
 * center set (max min-distance, ties by key). Every round is one
 * multi-source BFS pass and one argmax — the adaptive counterpart of
 * [[MultiSourceBfs]]'s fixed landmarks (q_voronoi), and the seeding
 * rule k-means-style pipelines borrow for spread-out initialization.
 *
 * Determinism: the seed and every argmax break ties in key space
 * ((−dist, key) lexicographic min), so the DuckDB oracle replays the
 * full adaptive trajectory with k chained label-correcting
 * recursions.
 *
 * Scale shape: k BFS passes (O(diameter) supersteps each, frontier
 * work linear) + k driver scalars (the argmax row — the Allreduce
 * analog); the assignment/radius readout is one grouped aggregate.
 * k is small by construction (facility count).
 *
 * @return one row per center: (center, n_assigned, radius) — every
 *         giant-component vertex assigned to its nearest center,
 *         ties by center key.
 */
object KCenter {

  def run(graph: LinkGraph, ccLabels: DataFrame, k: Int = 3): DataFrame = {
    require(graph.symmetric, "k-center expects the symmetrized graph")
    val keyed = ccLabels.join(graph.vertices, "id")
      .select(col("id"), col("key"), col("lbl"))
    // giant component: max size, ties by smallest member key
    val giantLbl = keyed.groupBy(col("lbl"))
      .agg(count(lit(1)).as("sz"), min(col("key")).as("mk"))
      .orderBy(col("sz").desc, col("mk").asc).limit(1)
      .select(col("lbl")).first().getLong(0)
    val comp = keyed.where(col("lbl") === giantLbl).select(col("id"), col("key"))
      .persist()

    var centers = List(comp.orderBy(col("key").asc).limit(1)
      .select(col("id")).first().getLong(0))
    for (_ <- 1 until k) {
      val d = MultiSourceBfs.run(graph, centers).dists
        .groupBy(col("id")).agg(min(col("dist")).as("dist"))
      // farthest giant-component vertex from the current center set
      val next = comp.join(d, "id")
        .orderBy(col("dist").desc, col("key").asc).limit(1)
        .select(col("id")).first().getLong(0)
      centers = centers :+ next
    }

    // nearest-center assignment (ties by center key), per-center census
    val perCenter = MultiSourceBfs.run(graph, centers).dists
      .join(graph.vertices.select(col("id").as("root"), col("key").as("center")), "root")
      .join(comp.select(col("id")), "id")
    val best = perCenter.groupBy(col("id"))
      .agg(min(struct(col("dist"), col("center"))).as("b"))
      .select(col("id"), col("b.center").as("center"), col("b.dist").as("dist"))
    val out = best.groupBy(col("center"))
      .agg(count(lit(1)).as("n_assigned"),
        max(col("dist")).cast("long").as("radius"))
    comp.unpersist(blocking = false)
    out
  }
}
