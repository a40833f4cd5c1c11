package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.syntax._
import graft.LinkGraph

/**
 * Deterministic greedy graph coloring by the Jones–Plassmann parallel
 * schedule: every vertex carries a fixed random-like priority (60-bit
 * md5 of its original key, ties broken by the key itself — a total
 * order independent of this engine's id assignment), a vertex is
 * colored once ALL its higher-priority neighbors are colored, and its
 * color is the mex (minimum excludant) of their colors.
 *
 * Because the color of v depends ONLY on the colors of its
 * higher-priority neighbors, the result equals the sequential greedy
 * coloring in decreasing priority order — schedule-independent, so
 * the DuckDB oracle's round-replay must match row-for-row without
 * agreeing on any engine detail.
 *
 * Scale shape: the edge set is oriented higher→lower ONCE
 * (two broadcast-sized priority joins against the clustered edge
 * table) and persisted; each round is two co-keyed joins + one
 * grouped min against the shrinking uncolored set. Round count is
 * the longest priority-decreasing path — O(log n / log log n)
 * expected for random priorities (Jones & Plassmann 1993), and md5
 * priorities are adversary-free by construction. The mex candidate
 * set is {0} ∪ {c+1 : c used}, never a dense color range — per-round
 * work is O(Σ deg(colorable)), not O(Δ²).
 */
object Coloring {

  final case class Result(colors: DataFrame, rounds: Int)

  /** @return colors: (id, colr) for every vertex. */
  def run(graph: LinkGraph, maxRounds: Int = 200): Result = {
    require(graph.symmetric, "JP coloring expects a symmetrized graph")
    val np = graph.numPartitions

    val pri = graph.vertices.select(col("id"), col("key"),
      expr("cast(conv(substring(md5(key), 1, 15), 16, 10) as bigint)").as("p"))
    // each undirected edge once, oriented higher-priority → lower:
    // u is the higher endpoint (the symmetric layout carries both
    // directions, so the strict filter keeps exactly one)
    val hi = graph.edgesBySrc
      .join(pri.select(col("id").as("src"), col("p").as("ps"), col("key").as("ks")), "src")
      .join(pri.select(col("id").as("dst"), col("p").as("pd"), col("key").as("kd")), "dst")
      .where(col("ps") > col("pd") || (col("ps") === col("pd") && col("ks") > col("kd")))
      .select(col("src").as("u"), col("dst").as("v"))
      .repartition(np, col("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var uncol = graph.vertices.select(col("id"))
      .repartition(np, col("id")).graftCut
    var nUncol = graph.numVertices
    var colored: DataFrame = null // (id, colr), grows round by round
    var rounds = 0
    while (nUncol > 0 && rounds < maxRounds) {
      // blocked: still has an UNCOLORED higher-priority neighbor
      val blocked = hi.join(uncol.select(col("id").as("u")), "u")
        .select(col("v").as("id")).distinct()
      val colorable = uncol.join(blocked, Seq("id"), "left_anti").graftCut
      // used: colors of the (all-colored) higher neighbors
      val used =
        if (colored == null)
          colorable.select(col("id"), lit(0L).as("colr")).where(lit(false))
        else hi.join(colorable.select(col("id").as("v")), "v")
          .join(colored.select(col("id").as("u"), col("colr")), "u")
          .select(col("v").as("id"), col("colr")).distinct()
      // mex = min of ({0} ∪ {c+1}) ∖ used
      val cand = colorable.select(col("id"), lit(0L).as("c"))
        .unionByName(used.select(col("id"), (col("colr") + 1).as("c")))
      val mex = cand
        .join(used.select(col("id"), col("colr").as("c")), Seq("id", "c"), "left_anti")
        .groupBy(col("id")).agg(min(col("c")).as("colr"))
      val newCol = mex.repartition(np, col("id")).graftCut
      val prevColored = colored
      colored =
        if (colored == null) newCol
        else colored.unionByName(newCol).graftCut
      val (nu, n) = uncol.join(newCol.select(col("id")), Seq("id"), "left_anti")
        .graftCutCount
      uncol.graftFree(); colorable.graftFree()
      if (prevColored != null) { prevColored.graftFree(); newCol.graftFree() }
      uncol = nu
      nUncol = n
      rounds += 1
    }
    require(nUncol == 0, s"JP coloring did not converge in $maxRounds rounds")
    hi.unpersist(blocking = false)
    Result(colored, rounds)
  }
}
