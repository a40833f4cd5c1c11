package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.LinkGraph

/**
 * GraphSAGE-style mean-pool neighbor aggregation (Hamilton et al.
 * 2017) — the feature-preparation layer a GNN training pipeline runs
 * over the transcript graph before any learning: each vertex's
 * representation is (own features ∥ mean of neighbor features).
 * No learned weights here (that's the trainer's job downstream);
 * the engine's contract is the exact aggregation.
 *
 * Structural input features, all integer-exact: dim 0 = degree,
 * dim 1 = is-tool-vertex indicator, dim 2 = triangle-free local mark
 * (degree bit length — a cheap log-degree embedding). Long format
 * (id, dim, f): adding dims never widens the shuffle schema, and one
 * edge join serves ALL dims — the join output groups by (dst, dim),
 * so this is the batched multi-value gather (same shape as
 * [[Betweenness.runBatch]]'s per-root grouping).
 *
 * Neighbor mean is floored (`div`), keeping the layer exact-integer
 * for the oracle. Scale shape: ONE co-partitioned edge join + one
 * grouped aggregate per layer — the edge side never re-shuffles;
 * feature rows move once.
 */
object Sage {

  /** Structural feature table (id, dim, f). */
  def features(graph: LinkGraph): DataFrame =
    graph.degrees.join(graph.vertices, "id")
      .select(col("id"),
        col("out_degree").as("f0"),
        when(col("key").startsWith("T#"), 1L).otherwise(0L).as("f1"),
        length(conv(col("out_degree"), 10, 2)).cast("long").as("f2"))
      .select(col("id"), explode(map(
        lit(0), col("f0"), lit(1), col("f1"), lit(2), col("f2")))
        .as(Seq("dim", "f")))

  /** One mean-pool layer: (id, dim, own, nbr_mean) with
   * nbr_mean = ⌊Σ_{v∈N(u)} f(v,dim) / deg(u)⌋. */
  def meanPoolLayer(graph: LinkGraph): DataFrame = {
    require(graph.symmetric, "mean-pool aggregates over undirected neighborhoods")
    val feat = features(graph)
    // batched gather: join dst-side features to the src-clustered
    // edges, combine per (src=receiver, dim)
    val nbrSums = graph.edgesBySrc
      .join(feat.select(col("id").as("dst"), col("dim"), col("f"))
        .repartition(graph.numPartitions, col("dst")), "dst")
      .groupBy(col("src").as("id"), col("dim"))
      .agg(sum(col("f")).as("s"))
    feat
      .join(nbrSums, Seq("id", "dim"), "left")
      .join(graph.degrees.select(col("id"), col("out_degree").as("deg")), "id")
      .select(col("id"), col("dim"), col("f").as("own"),
        expr("coalesce(s, 0L) div deg").as("nbr_mean"))
  }
}
