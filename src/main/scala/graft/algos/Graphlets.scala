package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.LinkGraph

/**
 * Non-induced 4-node graphlet census — the motif-frequency
 * fingerprint (graphlet degree signature family: Pržulj 2007) of the
 * symmetric link graph, in closed form from one wedge enumeration:
 *
 *   wedges   Σ C(d,2)                  claws    Σ C(d,3)
 *   paths3   Σ_{(u,v)∈E}(d_u−1)(d_v−1) − 3·triangles
 *   tailed   Σ_v t_v·(d_v−2)           (t_v = triangles at v)
 *   C4       ½ Σ_{u<v} C(codeg(u,v),2)
 *   diamond  Σ_{(u,v)∈E} C(t_e,2)      (t_e = triangles on the edge)
 *   K4       oriented kClist ladder ([[TriangleCount.countFourCliques]])
 *
 * Every count is an exact integer (each C(n,k) numerator is divisible
 * by k!, so per-row floor division is exact), and the whole census
 * shares ONE codegree table: codeg(u,v) = common-neighbor counts from
 * the wedge generator, its restriction to adjacent pairs giving t_e,
 * whose endpoint sums give t_v and whose total gives 3·triangles.
 *
 * Scale shape: the wedge generator is the same Σ C(d,2) enumeration
 * as [[LinkPredict.edgeJaccard]] — per-center fan-out C(d,2), so a
 * degree-10⁶ hub needs the standard cure (cap or sample hub centers;
 * here exact, parameterized nothing — transcript-graph hubs are
 * tools with d ≪ 10⁴). All aggregates are partial-agg groupBys; the
 * six scalars are Allreduce-style one-row reads, never row collects.
 */
object Graphlets {

  /** @return one row: (n_edges, n_wedges, n_claws, n_triangles,
   *          n_paths3, n_tailed, n_c4, n_diamonds, n_k4) */
  def census4(graph: LinkGraph): DataFrame = {
    require(graph.symmetric, "graphlet census expects a symmetrized graph")
    val spark = graph.spark
    val nbr = graph.edgesBySrc.select(col("src"), col("dst"))
    val deg = graph.degrees.select(col("id"), col("out_degree").as("d"))
    val und = nbr.where(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v")).persist()
    val codeg = nbr.as("x")
      .join(nbr.as("y"), col("x.src") === col("y.src") && col("x.dst") < col("y.dst"))
      .groupBy(col("x.dst").as("u"), col("y.dst").as("v"))
      .agg(count(lit(1)).as("c")).persist()
    val te = codeg.join(und, Seq("u", "v")).persist()

    val mEdges = und.count()
    val dRow = deg.agg(
      coalesce(sum(expr("d * (d - 1) div 2")), lit(0L)),
      coalesce(sum(expr("d * (d - 1) * (d - 2) div 6")), lit(0L))).first()
    val (wedges, claws) = (dRow.getLong(0), dRow.getLong(1))
    val teRow = te.agg(
      coalesce(sum(col("c")), lit(0L)),
      coalesce(sum(expr("c * (c - 1) div 2")), lit(0L))).first()
    val (triX3, diamonds) = (teRow.getLong(0), teRow.getLong(1))
    val triangles = triX3 / 3
    val c4 = codeg.agg(coalesce(sum(expr("c * (c - 1) div 2")), lit(0L)))
      .first().getLong(0) / 2
    val p3sum = und
      .join(deg.select(col("id").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("d").as("dv")), "v")
      .agg(coalesce(sum((col("du") - 1) * (col("dv") - 1)), lit(0L)))
      .first().getLong(0)
    val tailed = te
      .select(explode(array(col("u"), col("v"))).as("id"), col("c"))
      .groupBy(col("id")).agg(expr("sum(c) div 2").as("t"))
      .join(deg, "id")
      .agg(coalesce(sum(col("t") * (col("d") - 2)), lit(0L)))
      .first().getLong(0)
    val k4 = TriangleCount.countFourCliques(graph)
    und.unpersist(blocking = false)
    codeg.unpersist(blocking = false)
    te.unpersist(blocking = false)

    spark.range(1).select(
      lit(mEdges).as("n_edges"), lit(wedges).as("n_wedges"),
      lit(claws).as("n_claws"), lit(triangles).as("n_triangles"),
      lit(p3sum - 3 * triangles).as("n_paths3"), lit(tailed).as("n_tailed"),
      lit(c4).as("n_c4"), lit(diamonds).as("n_diamonds"), lit(k4).as("n_k4"))
  }
}
