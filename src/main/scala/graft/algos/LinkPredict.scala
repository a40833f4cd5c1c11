package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.LinkGraph

/**
 * Neighborhood-overlap link prediction on the symmetric graph —
 * common-neighbor counts and the resource-allocation (RA) index
 * `Σ_{z ∈ N(u)∩N(v)} 1/deg(z)` over NON-adjacent pairs, the classic
 * web-graph "who should be linked" primitive (beyond-reference
 * component; the reference's surface stops at the toolkits,
 * /root/reference/toolkits/).
 *
 * Shape: z-centric wedge enumeration — the same join silhouette as
 * [[TriangleCount]] — `nbrs(z) × nbrs(z)` through each wedge center z,
 * then one grouped aggregation per candidate pair and a `left_anti`
 * against the edge table. Exact-integer export: each z contributes
 * `1000000 div deg(z)` per pair, so the RA sum is an order-independent
 * integer (`ra_e6`) the DuckDB oracle reproduces bit-for-bit.
 *
 * Scale: a hub of degree D would emit O(D²) wedges, so wedge centers
 * are capped at `maxHubDegree` (default 64). This is not a silent
 * recall hole but the standard RA trade: a z with deg > cap
 * contributes < 10⁶/cap per pair — the low-signal tail of the index —
 * and the cap bounds the whole enumeration by `cap·|E|` wedges.
 * Candidate pairs never materialize beyond that bound; top-k is a
 * TakeOrdered (no global sort).
 */
object LinkPredict {

  /** @param k            number of predicted links to return
   *  @param maxHubDegree wedge-center degree cap (see scale note)
   *  @return (u_key, v_key, common_nbrs, ra_e6) — the k best
   *          non-adjacent pairs by RA score, key-oriented u < v,
   *          deterministic total order (ra desc, u_key, v_key). */
  def topOverlap(
      graph: LinkGraph,
      k: Int = 100,
      maxHubDegree: Long = 64): DataFrame = {
    require(graph.symmetric, "link prediction expects the symmetrized graph")

    // wedge centers: deg 2..cap, with the integer RA slot 10^6 div d
    val centers = graph.degrees
      .where(col("out_degree").between(2L, maxHubDegree))
      .select(col("id").as("src"), expr("1000000L div out_degree").as("slot"))

    // (z, slot, neighbor id, neighbor key); the edge side is already
    // clustered by src = z, so the centers join is co-partitioned
    val zn = graph.edgesBySrc
      .join(centers, "src")
      .join(graph.vertices.select(col("id").as("dst"), col("key").as("nbr_key")), "dst")
      .select(col("src").as("z"), col("slot"), col("dst").as("nid"), col("nbr_key"))

    val left = zn.select(col("z"), col("slot"),
      col("nid").as("u"), col("nbr_key").as("u_key"))
    val right = zn.select(col("z"), col("nid").as("v"), col("nbr_key").as("v_key"))
    val scores = left.join(right, "z")
      .where(col("u_key") < col("v_key")) // one orientation per pair, by KEY
      .groupBy(col("u"), col("v"), col("u_key"), col("v_key"))
      .agg(count(lit(1)).as("common_nbrs"), sum(col("slot")).as("ra_e6"))

    // keep only pairs NOT already linked (symmetric edges hold both
    // orientations, so one anti-join probe suffices)
    scores
      .join(graph.edgesBySrc.select(col("src").as("u"), col("dst").as("v")),
        Seq("u", "v"), "left_anti")
      .select(col("u_key"), col("v_key"), col("common_nbrs"), col("ra_e6"))
      .orderBy(desc("ra_e6"), col("u_key"), col("v_key"))
      .limit(k)
  }
}
