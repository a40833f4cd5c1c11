package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.LinkGraph

/**
 * Exact triangle counting on the undirected, deduped, self-loop-free
 * graph (north-rule algorithm; no reference toolkit — SURVEY.md §2.4
 * A7).
 *
 * Degree-ordered orientation: each undirected edge {u,v} is kept once,
 * directed from the endpoint with smaller `(degree, id)` to the
 * larger. Every triangle then has exactly one wedge
 * `a→b, b→c  (a<b<c in degree order)` closed by `a→c`, so
 *
 *   triangles = |(oriented ⋈ oriented on b)  left_semi  oriented|
 *
 * The orientation bounds the wedge join by Σ d_min(e) — the classic
 * cure for hub skew: a hub of degree D contributes O(D) oriented
 * OUT-edges only towards higher-degree vertices, not O(D²) wedges.
 * Residual skew is handled by AQE skew-join splitting (enabled in the
 * session) — mirroring the reference's work-stealing + chunk tuning
 * (core/graph.hpp:1340-1403).
 */
object TriangleCount {

  /** Oriented edge list (a, b) with (deg,id)-order a < b. */
  def orient(graph: LinkGraph): DataFrame = {
    require(graph.symmetric, "triangle counting expects a symmetrized graph")
    val deg = graph.degrees.select(col("id"), col("out_degree").as("d"))
    // symmetric graph: every undirected edge appears as both (u,v) and
    // (v,u); keeping only rows where src precedes dst in (deg, id)
    // order retains exactly one orientation per undirected edge.
    graph.edgesBySrc
      .join(deg.withColumnRenamed("id", "src").withColumnRenamed("d", "sd"), "src")
      .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("d", "dd"), "dst")
      .where(col("sd") < col("dd") ||
        (col("sd") === col("dd") && col("src") < col("dst")))
      .select(col("src").as("a"), col("dst").as("b"))
  }

  /**
   * Per-vertex triangle counts + degree — the integer-exact export of
   * the local clustering coefficient `2t / d(d−1)` (the float is the
   * consumer's one division). Same oriented wedge join as [[count]];
   * each closed wedge (a,b,c) is a distinct triangle credited to all
   * three corners via a 3-way explode + one counting aggregate. The
   * identical oriented subplan feeds all three join legs, so Spark's
   * exchange reuse materializes it once.
   *
   * @return (id, degree, triangles) for every vertex
   */
  def perVertex(graph: LinkGraph): DataFrame = {
    val o = orient(graph)
    val wedges = o.as("e1").join(
      o.select(col("a").as("b"), col("b").as("c")).as("e2"), "b")
    val tris = wedges.join(
      o.select(col("a"), col("b").as("c")),
      Seq("a", "c"), "left_semi")
    val counts = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy(col("id"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("triangles"))
    graph.degrees.select(col("id"), col("out_degree").as("degree"))
      .join(counts, Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
  }

  /**
   * Exact 4-clique count — one more extension step of the oriented
   * wedge machinery. In the degree-ordered DAG every 4-clique
   * {w,x,y,z} appears as exactly one ordered tuple w→x→y→z with all
   * six DAG edges present, so:
   *
   *   quads = triangles(a,b,c) ⋈ o(c,d)  semi o(a,d)  semi o(b,d)
   *
   * Cost is Σ over triangles of outdeg(apex) — the orientation keeps
   * hub out-degrees small (only towards higher-degree vertices), the
   * same Σ d_min skew cure as the triangle join; residual skew goes
   * to AQE. Scales as the natural k-clique ladder (Danisch et al.
   * kClist, WWW'18, specialised to k=4).
   */
  def countFourCliques(graph: LinkGraph): Long = {
    val o = orient(graph).persist()
    try {
      val tri = o.as("e1")
        .join(o.select(col("a").as("b"), col("b").as("c")).as("e2"), "b")
        .join(o.select(col("a"), col("b").as("c")), Seq("a", "c"), "left_semi")
      val quads = tri
        .join(o.select(col("a").as("c"), col("b").as("d")), "c")
        .join(o.select(col("a"), col("b").as("d")), Seq("a", "d"), "left_semi")
        .join(o.select(col("a").as("b"), col("b").as("d")), Seq("b", "d"), "left_semi")
      quads.count()
    } finally { o.unpersist() }
  }

  def count(graph: LinkGraph): Long = {
    val o = orient(graph).persist()
    try {
      val wedges = o.as("e1").join(
        o.select(col("a").as("b"), col("b").as("c")).as("e2"), "b")
      val closed = wedges.join(
        o.select(col("a"), col("b").as("c")),
        Seq("a", "c"), "left_semi")
      closed.count()
    } finally { o.unpersist() }
  }
}
