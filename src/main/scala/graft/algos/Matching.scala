package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.syntax._
import graft.LinkGraph

/**
 * Deterministic maximal matching by parallel greedy on hashed edge
 * priorities — the classic symmetry-breaking primitive next to
 * [[Mis]] (Luby), and the building block of coarsening/clustering
 * passes (METIS-style contraction) and 2-approximate vertex cover.
 *
 * Round: every live edge whose md5 priority is the minimum among the
 * live edges at BOTH endpoints joins the matching (two adjacent edges
 * can never both win — the shared endpoint has one minimum); matched
 * vertices leave with all their incident edges. Always progresses
 * (the globally-minimal live edge matches every round) and finishes
 * in O(log |E|) rounds in expectation over the hash. Priorities are
 * md5 of the KEY pair, so the fixpoint is engine-independent and the
 * DuckDB oracle replays it exactly (q_matching).
 *
 * Shape per round: one union + grouped min (map-side combined), two
 * co-keyed joins against the minima, two anti-joins — every exchange
 * hash-keyed, work proportional to the SHRINKING live edge set (a
 * matched hub removes its whole star at once, so skew self-resolves).
 */
object Matching {

  final case class Result(matching: DataFrame, rounds: Int)

  /** @return matching rows (u_key, v_key, mround), u_key < v_key. */
  def run(graph: LinkGraph, maxRounds: Int = 64): Result = {
    require(graph.symmetric, "matching expects the symmetrized graph")
    val e = keyedEdges(graph)
      .select(col("u_key"), col("v_key"),
        conv(substring(md5(concat_ws("|", col("u_key"), col("v_key"))), 1, 15), 16, 10)
          .cast("long").as("p"))
    greedy(graph, e, maxRounds, Nil)
  }

  /**
   * Preis-style locally-HEAVIEST matching — the weighted variant with
   * the classic 1/2-approximation guarantee for MAXIMUM-weight
   * matching: a round matches every edge that is the heaviest live
   * edge at BOTH endpoints (priority = (97−w)·2⁴⁰ + 40-bit md5 of the
   * key pair, so min-priority ⇔ max weight with a deterministic,
   * engine-independent tie-break — the same total order that makes
   * [[Msf]] unique). Runs on the hashed-capacity graph; the
   * pseudo-random weights keep the round count O(log E) expected
   * (adversarial monotone weights would serialize a locally-heaviest
   * schedule — with hashed capacities no such chain survives).
   *
   * @return matching rows (u_key, v_key, w, mround), u_key < v_key.
   */
  def runWeighted(graph: LinkGraph, maxRounds: Int = 200): Result = {
    require(graph.symmetric, "matching expects the symmetrized graph")
    val e = keyedEdges(graph)
      .select(col("u_key"), col("v_key"), col("weight").cast("long").as("w"),
        ((lit(97L) - col("weight").cast("long")) * lit(1L << 40) +
          conv(substring(md5(concat_ws("|", col("u_key"), col("v_key"))), 1, 10), 16, 10)
            .cast("long")).as("p"))
    greedy(graph, e, maxRounds, Seq("w"))
  }

  /** One key-oriented row per undirected edge, weight preserved. */
  private def keyedEdges(graph: LinkGraph): DataFrame = {
    val vk = (idCol: String, keyCol: String) =>
      graph.vertices.select(col("id").as(idCol), col("key").as(keyCol))
    graph.edgesBySrc
      .join(vk("src", "u_key"), "src")
      .join(vk("dst", "v_key"), "dst")
      .where(col("u_key") < col("v_key"))
  }

  /** Shared parallel-greedy loop: matches every live edge that is the
   * min-priority edge at both endpoints; `extra` columns ride along
   * into the output. */
  private def greedy(
      graph: LinkGraph, e0: DataFrame, maxRounds: Int, extra: Seq[String]): Result = {
    val np = graph.numPartitions
    var e = e0.repartition(np, col("u_key")).graftCut
    var live = e.count()

    var rounds = 0
    var acc: DataFrame = null
    val junk = scala.collection.mutable.ListBuffer[DataFrame]()
    while (live > 0 && rounds < maxRounds) {
      rounds += 1
      val nbrs = e.select(col("u_key").as("x"), col("p"))
        .unionByName(e.select(col("v_key").as("x"), col("p")))
      val mins = nbrs.groupBy(col("x")).agg(min(col("p")).as("mp"))
      val matched = e
        .join(mins.select(col("x").as("u_key"), col("mp").as("mpu")), "u_key")
        .join(mins.select(col("x").as("v_key"), col("mp").as("mpv")), "v_key")
        .where(col("p") === col("mpu") && col("p") === col("mpv"))
        .select((Seq(col("u_key"), col("v_key")) ++ extra.map(col) :+
          lit(rounds.toLong).as("mround")): _*)
        .graftCut
      val mv = matched.select(col("u_key").as("x"))
        .unionByName(matched.select(col("v_key").as("x")))
      val (e2, n2) = e
        .join(mv, col("u_key") === col("x"), "left_anti")
        .join(mv, col("v_key") === col("x"), "left_anti")
        .graftCutCount
      acc = if (acc == null) matched else acc.unionByName(matched)
      junk += e
      junk += matched // freed after the accumulated matching is cut
      e = e2
      live = n2
    }
    e.graftFree()
    val out = (if (acc == null) {
      val base = graph.spark.emptyDataFrame
        .withColumn("u_key", lit("")).withColumn("v_key", lit(""))
      extra.foldLeft(base)((d, c) => d.withColumn(c, lit(0L)))
        .withColumn("mround", lit(0L)).limit(0)
    } else acc).graftCut
    junk.foreach(_.graftFree())
    Result(out, rounds)
  }

  /** 2-approximate minimum vertex cover — the endpoints of a maximal
   * matching (Gavril/Yannakakis: every edge has a matched endpoint by
   * maximality, and |C| = 2|M| ≤ 2·OPT since any cover needs one
   * endpoint per matched edge). Free once [[run]] exists. */
  def vertexCover(matching: DataFrame): DataFrame =
    matching.select(col("u_key").as("key"))
      .unionByName(matching.select(col("v_key").as("key")))
      .distinct()

  /**
   * One multilevel contraction step over a matching — the METIS-style
   * coarsening pass that [[run]]'s matching exists for: every matched
   * pair collapses into a supervertex named by its smaller key,
   * unmatched vertices survive as themselves, parallel edges between
   * supervertices merge with their multiplicities and weight mass
   * (self-edges — the contracted matched edges — drop). Iterating
   * matching→coarsen halves the graph per level; the coarse graph
   * feeds partitioners and multilevel layout/clustering.
   *
   * @return (su_key, sv_key, n_edges, tot_w_e3), su_key < sv_key —
   *         n_edges = contracted multiplicity, tot_w_e3 = exact
   *         integer Σ weight·1000.
   */
  def coarsen(graph: LinkGraph, matching: DataFrame): DataFrame = {
    require(graph.symmetric, "coarsening expects the symmetrized graph")
    val pairMap = matching.select(col("v_key").as("key"), col("u_key").as("sup"))
      .unionByName(matching.select(col("u_key").as("key"), col("u_key").as("sup")))
    val vmap = graph.vertices.select(col("key"))
      .join(pairMap, Seq("key"), "left")
      .select(col("key"), coalesce(col("sup"), col("key")).as("sup"))
    val vk = (idCol: String, keyCol: String) =>
      graph.vertices.select(col("id").as(idCol), col("key").as(keyCol))
    val edges = graph.edgesBySrc
      .join(vk("src", "a_key"), "src")
      .join(vk("dst", "b_key"), "dst")
      .where(col("a_key") < col("b_key"))
      .select(col("a_key"), col("b_key"), col("weight"))
    edges
      .join(vmap.select(col("key").as("a_key"), col("sup").as("sa")), "a_key")
      .join(vmap.select(col("key").as("b_key"), col("sup").as("sb")), "b_key")
      .where(col("sa") =!= col("sb"))
      .groupBy(
        least(col("sa"), col("sb")).as("su_key"),
        greatest(col("sa"), col("sb")).as("sv_key"))
      .agg(
        count(lit(1)).as("n_edges"),
        round(sum(col("weight")) * 1000).cast("long").as("tot_w_e3"))
  }
}
