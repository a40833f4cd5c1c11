package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.LinkGraph
import graft.syntax._

/**
 * SCAN structural graph clustering (Xu, Yuruk, Feng, Schweiger,
 * KDD'07): vertices cluster when their NEIGHBORHOODS agree, not
 * merely when they touch — the community detector that, unlike label
 * propagation or modularity, also names the misfits: `hub` vertices
 * bridging two clusters and `outlier` vertices attached to none.
 *
 * Structural similarity of an edge (u,v) uses closed neighborhoods:
 * σ(u,v) = |N[u]∩N[v]| / √(|N[u]|·|N[v]|). An edge is an ε-edge when
 * σ ≥ ε; a vertex is a core when its ε-neighborhood (self included)
 * has ≥ μ members; clusters are the connected components of the
 * core–core ε-subgraph; a non-core ε-adjacent to a core joins that
 * core's cluster (`member`, smallest cluster label when several
 * claim it); of the rest, a vertex whose plain neighbors span ≥ 2
 * distinct clusters is a `hub`, otherwise an `outlier`.
 *
 * Integer-exact ε test (no float sqrt): with closed sizes d+1 and
 * common c+2 (both endpoints belong to both closed neighborhoods),
 * σ ≥ ε  ⇔  10⁴·(c+2)² ≥ eps2E4·(du+1)·(dv+1), eps2E4 = ⌊10⁴ε²⌋.
 *
 * Scale shape: common-neighbor counts ride the SAME degree-oriented
 * triangle machinery as [[TriangleCount]]/[[LinkPredict.edgeJaccard]]
 * (O(Σ d_min) wedge join, never O(Σ d²)); the ε/μ gates are one
 * grouped count; clustering runs [[CCStar]] star contraction —
 * O(log n) rounds even though σ-chains make clusters long and thin
 * (HashMin would pay a superstep per hop). Hub/outlier triage is one
 * join against the clustered assignment. Everything shuffles on
 * vertex/edge keys only.
 */
object Scan {

  final case class Result(assign: DataFrame, epsEdges: Long, cores: Long)

  /** @return assign: (key, cluster, role) for every vertex — cluster
   *          is the lexicographically smallest member key, '-' for
   *          hubs/outliers; role ∈ core|member|hub|outlier. */
  def run(graph: LinkGraph, eps2E4: Long = 3600, mu: Int = 3): Result = {
    require(graph.symmetric, "SCAN expects a symmetrized graph")
    val np = graph.numPartitions

    // common neighbors per undirected edge: each triangle credits its
    // three edges once (ids; orientation normalized via least/greatest)
    val o = TriangleCount.orient(graph)
    val wedges = o.as("e1").join(
      o.select(col("a").as("b"), col("b").as("c")).as("e2"), "b")
    val tris = wedges.join(
      o.select(col("a"), col("b").as("c")), Seq("a", "c"), "left_semi")
    val common = tris.select(explode(array(
      struct(col("a").as("x"), col("b").as("y")),
      struct(col("b").as("x"), col("c").as("y")),
      struct(col("a").as("x"), col("c").as("y")))).as("e"))
      .groupBy(least(col("e.x"), col("e.y")).as("u"),
        greatest(col("e.x"), col("e.y")).as("v"))
      .agg(count(lit(1)).as("c"))

    val deg = graph.degrees.select(col("id"), col("out_degree").as("d"))
    val epsE = graph.edgesBySrc
      .where(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v"))
      .join(common, Seq("u", "v"), "left")
      .join(deg.select(col("id").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("d").as("dv")), "v")
      .where(expr(s"10000L * (coalesce(c, 0L) + 2) * (coalesce(c, 0L) + 2)" +
        s" >= ${eps2E4}L * (du + 1) * (dv + 1)"))
      .select(col("u"), col("v"))
      .repartition(np, col("u"))
      .graftCut // wedge-join lineage ends here (plan-size discipline)

    // ε-degree + 1 (self) ≥ μ ⇒ core
    val cores = epsE.select(col("u").as("id"))
      .unionByName(epsE.select(col("v").as("id")))
      .groupBy(col("id")).agg((count(lit(1)) + 1).as("ne"))
      .where(col("ne") >= mu)
      .select(col("id"))
      .graftCut
    val nCores = cores.count()

    // clusters: star-contraction CC over the core-core ε-subgraph
    // (identity id space ⇒ CCStar's label is min core id); cluster
    // name = lexicographically smallest member KEY of the component
    val coreE = epsE
      .join(cores.select(col("id").as("u")), "u")
      .join(cores.select(col("id").as("v")), "v")
      .select(col("u").as("src"), col("v").as("dst"), lit(1.0).as("weight"))
    val cg = LinkGraph.fromIdEdges(coreE, graph.numVertices, symmetric = true, np)
    val coreLbl = CCStar.run(cg).labels
      .join(cores, "id") // only true cores; synthesized isolates drop out
    val clusterName = coreLbl
      .join(graph.vertices, "id")
      .groupBy(col("lbl")).agg(min(col("key")).as("cluster"))
    val coreAssign = coreLbl.join(clusterName, "lbl")
      .select(col("id"), col("cluster"))
      .graftCut
    cg.unpersist()

    // members: non-core ε-adjacent to ≥1 core → smallest such cluster
    val adj = epsE
      .join(coreAssign.select(col("id").as("u"), col("cluster")), "u")
      .select(col("v").as("id"), col("cluster"))
      .unionByName(epsE
        .join(coreAssign.select(col("id").as("v"), col("cluster")), "v")
        .select(col("u").as("id"), col("cluster")))
    val memberAssign = adj
      .join(cores, Seq("id"), "left_anti")
      .groupBy(col("id")).agg(min(col("cluster")).as("cluster"))

    val clustered = coreAssign.select(col("id"), col("cluster"), lit("core").as("role"))
      .unionByName(memberAssign.select(col("id"), col("cluster"), lit("member").as("role")))
      .graftCut
    // everything downstream reads only the cut `clustered`
    coreAssign.graftFree()

    // hubs vs outliers: unclustered vertices, classified by how many
    // DISTINCT clusters their plain neighbors belong to
    val nbrClusters = graph.edgesBySrc
      .join(clustered.select(col("id").as("dst"), col("cluster")), "dst")
      .select(col("src").as("id"), col("cluster"))
    val rest = graph.vertices.select(col("id"))
      .join(clustered.select(col("id")), Seq("id"), "left_anti")
      .join(nbrClusters.groupBy(col("id"))
        .agg(countDistinct(col("cluster")).as("nc")), Seq("id"), "left")
      .select(col("id"), lit("-").as("cluster"),
        when(col("nc") >= 2, "hub").otherwise("outlier").as("role"))

    val assign = clustered.unionByName(rest)
      .join(graph.vertices, "id")
      .select(col("key"), col("cluster"), col("role"))
    val nEps = epsE.count()
    epsE.graftFree()
    cores.graftFree()
    Result(assign, nEps, nCores)
  }
}
