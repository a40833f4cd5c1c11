package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /**
   * Per-EDGE neighborhood Jaccard — `|N(u)∩N(v)| / |N(u)\{v} ∪ N(v)\{u}|`
   * for every existing undirected edge, the structural near-duplicate
   * signal (mirror pages link to the same set of pages).
   *
   * Common-neighbor counts are triangles-per-edge, so the enumeration
   * reuses the degree-ordered oriented wedge join of [[TriangleCount]]
   * — bounded by Σ d_min(e), NO hub cap needed — and each triangle is
   * exploded onto its three edges. Jaccard is exported as the exact
   * integer `10⁶·common div union` (0 where the union is empty).
   *
   * @return (u_key, v_key, common_nbrs, union_nbrs, jaccard_e6),
   *         one row per undirected edge, key-oriented u < v. */
  /**
   * Local-similarity BACKBONE sparsification (the Satuluri-style
   * pre-filter run before expensive algorithms at web scale): keep an
   * edge iff it ranks in EITHER endpoint's top-`k` by neighborhood
   * Jaccard — hubs keep only their most-embedded edges, so the
   * retained graph size is ≤ k·|V| no matter how skewed the degrees.
   *
   * Deterministic: rank by (jaccard_e6 desc, neighbor key asc).
   * Scale shape: rides [[edgeJaccard]] (Σd_min wedge join), then one
   * per-vertex window over each vertex's own edges.
   *
   * @return (u_key, v_key, jaccard_e6) — the kept edges, key-oriented
   */
  def backbone(graph: LinkGraph, k: Int = 3): DataFrame = {
    val ej = edgeJaccard(graph).persist()
    val dir = ej.select(col("u_key").as("a"), col("v_key").as("b"), col("jaccard_e6"))
      .unionByName(
        ej.select(col("v_key").as("a"), col("u_key").as("b"), col("jaccard_e6")))
    val w = Window.partitionBy(col("a"))
      .orderBy(col("jaccard_e6").desc, col("b").asc)
    val kept = dir.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(least(col("a"), col("b")).as("u_key"),
        greatest(col("a"), col("b")).as("v_key"))
      .distinct()
    kept.join(ej, Seq("u_key", "v_key"))
      .select(col("u_key"), col("v_key"), col("jaccard_e6"))
  }

  def edgeJaccard(graph: LinkGraph): DataFrame = {
    require(graph.symmetric, "edge Jaccard expects the symmetrized graph")
    val o = TriangleCount.orient(graph)
    val wedges = o.as("e1").join(
      o.select(col("a").as("b"), col("b").as("c")).as("e2"), "b")
    val tris = wedges.join(
      o.select(col("a"), col("b").as("c")), Seq("a", "c"), "left_semi")

    val vk = (n: String) =>
      graph.vertices.select(col("id").as(n), col("key").as(n + "k"))
    // each triangle credits its three edges with one common neighbor
    val triEdges = tris.select(explode(array(
      struct(col("a").as("x"), col("b").as("y")),
      struct(col("b").as("x"), col("c").as("y")),
      struct(col("a").as("x"), col("c").as("y")))).as("e"))
      .select(col("e.x").as("x"), col("e.y").as("y"))
      .join(vk("x"), "x").join(vk("y"), "y")
    val common = triEdges
      .groupBy(least(col("xk"), col("yk")).as("u_key"),
        greatest(col("xk"), col("yk")).as("v_key"))
      .agg(count(lit(1)).as("common_nbrs"))

    val deg = graph.degrees.select(col("id"), col("out_degree").as("d"))
    val edges = graph.edgesBySrc
      .join(deg.withColumnRenamed("id", "src").withColumnRenamed("d", "du"), "src")
      .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("d", "dv"), "dst")
      .join(vk("src"), "src").join(vk("dst"), "dst")
      .where(col("srck") < col("dstk")) // one key-oriented row per edge
      .select(col("srck").as("u_key"), col("dstk").as("v_key"),
        col("du"), col("dv"))

    edges.join(common, Seq("u_key", "v_key"), "left")
      .withColumn("common_nbrs", coalesce(col("common_nbrs"), lit(0L)))
      .withColumn("union_nbrs", col("du") + col("dv") - lit(2L) - col("common_nbrs"))
      .select(col("u_key"), col("v_key"), col("common_nbrs"), col("union_nbrs"),
        when(col("union_nbrs") > 0,
          expr("(1000000L * common_nbrs) div union_nbrs"))
          .otherwise(lit(0L)).as("jaccard_e6"))
  }
}
