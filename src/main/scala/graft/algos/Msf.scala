package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.syntax._
import graft.LinkGraph

/**
 * Minimum spanning forest by Borůvka contraction — the O(log |V|)-
 * round distributed MSF (each round every component picks its
 * minimum-weight outgoing edge; the picked edges merge components via
 * pointer-jumping, the classic Sollin/CONNECTED-style schedule).
 *
 * Edge identity and the total order: every edge carries its canonical
 * original-key pair (akey < bkey), and selection minimizes the tuple
 * (w, akey, bkey) — a TOTAL order independent of this engine's id
 * assignment, which makes the MSF UNIQUE. Uniqueness is what the
 * correctness story rides on: the output edge SET is a property of
 * the graph alone (cut property: for ANY vertex set S, the minimum
 * edge crossing (S, V∖S) is in the MSF), so the DuckDB oracle may run
 * a completely different merge schedule and MUST still produce the
 * identical rows.
 *
 * Scale shape (the CCStar discipline): there is NO |V|-sized state —
 * the working set is the contracted edge multigraph itself, which
 * SHRINKS every round (components at least halve; parallel edges are
 * thinned to their minimum representative, valid by the cycle
 * property). Per round: one grouped min-struct aggregation (the
 * pick), a handful of self-joins on the component-sized parent map
 * (2-cycle break + pointer jumps, O(log chain) each), and two
 * co-keyed joins to re-label edge endpoints. Skewed hub components
 * cost one partial-aggregated min, not a materialized neighbor list.
 */
object Msf {

  final case class Result(
      forest: DataFrame, // (a_key, b_key, w) — the unique MSF
      rounds: Int)

  def run(graph: LinkGraph, maxRounds: Int = 48): Result = {
    require(graph.symmetric, "Borůvka expects a symmetrized graph")
    val np = graph.numPartitions

    // Canonical undirected working set in component space:
    // (u, v) = current component ids, (akey, bkey, w) = the original
    // edge this contracted row represents.
    val vk = graph.vertices
    var e = graph.edgesBySrc
      .where(col("src") < col("dst"))
      .join(vk.select(col("id").as("src"), col("key").as("skey")), "src")
      .join(vk.select(col("id").as("dst"), col("key").as("dkey")), "dst")
      .select(col("src").as("u"), col("dst").as("v"), col("weight").as("w"),
        least(col("skey"), col("dkey")).as("akey"),
        greatest(col("skey"), col("dkey")).as("bkey"))
      .repartition(np, col("u"))
      .graftCut
    var remaining = e.count()

    var rounds = 0
    var forestParts = List[DataFrame]()
    while (remaining > 0 && rounds < maxRounds) {
      // ---- pick: per component, the (w, akey, bkey)-minimum incident edge
      val nbrs = e.unionByName(
        e.select(col("v").as("u"), col("u").as("v"), col("w"), col("akey"), col("bkey")))
      val chosen = nbrs
        .groupBy(col("u"))
        .agg(min(struct(col("w"), col("akey"), col("bkey"), col("v"))).as("m"))
        .select(col("u"), col("m.v").as("v"), col("m.w").as("w"),
          col("m.akey").as("akey"), col("m.bkey").as("bkey"))
        .repartition(np, col("u"))
        .graftCut
      forestParts = chosen :: forestParts

      // ---- parent map: p(u) = picked partner; the pick graph is a
      // functional pseudo-forest whose only cycles are mutual picks
      // (both endpoints of a cluster's minimum edge pick each other) —
      // break each 2-cycle at its smaller id to root the forest.
      val p0 = chosen.select(col("u"), col("v").as("p"))
      var par = p0
        .join(p0.select(col("u").as("p"), col("p").as("pp")), "p")
        .select(col("u"),
          when(col("pp") === col("u") && col("u") < col("p"), col("u"))
            .otherwise(col("p")).as("p"))
        .repartition(np, col("u"))
        .graftCut
      // ---- pointer jumping to the roots (O(log chain) doublings)
      var jumping = true
      var jumps = 0
      while (jumping && jumps < 40) {
        val j = par
          .join(par.select(col("u").as("p"), col("p").as("gp")), "p")
          .select(col("u"), col("p"), col("gp"))
          .graftCut
        val changed = j.where(col("gp") =!= col("p")).count()
        val nxt = j.select(col("u"), col("gp").as("p")).graftCut
        j.graftFree()
        par.graftFree()
        par = nxt
        jumping = changed > 0
        jumps += 1
      }

      // ---- contract: re-label endpoints, drop internal edges, thin
      // parallel edges to their (w, akey, bkey)-minimum representative
      val pu = par.select(col("u"), col("p").as("cu"))
      val pv = par.select(col("u").as("v"), col("p").as("cv"))
      val (ne, nRemaining) = e
        .join(pu, "u").join(pv, "v")
        .where(col("cu") =!= col("cv"))
        .select(
          least(col("cu"), col("cv")).as("u"),
          greatest(col("cu"), col("cv")).as("v"),
          col("w"), col("akey"), col("bkey"))
        .groupBy(col("u"), col("v"))
        .agg(min(struct(col("w"), col("akey"), col("bkey"))).as("m"))
        .select(col("u"), col("v"), col("m.w").as("w"),
          col("m.akey").as("akey"), col("m.bkey").as("bkey"))
        .repartition(np, col("u"))
        .graftCutCount
      e.graftFree()
      par.graftFree()
      e = ne
      remaining = nRemaining
      rounds += 1
    }
    require(remaining == 0, s"Borůvka did not converge in $maxRounds rounds")

    if (forestParts.isEmpty) { // edgeless graph: empty forest
      val empty = e.sparkSession.emptyDataFrame
        .select(lit("").as("a_key"), lit("").as("b_key"), lit(0.0).as("w"))
      e.graftFree()
      return Result(empty, rounds)
    }
    val forest = forestParts
      .map(_.select(col("akey"), col("bkey"), col("w")))
      .reduce(_ unionByName _)
      .select(col("akey").as("a_key"), col("bkey").as("b_key"), col("w"))
      .distinct()
      .graftCut
    (e :: forestParts).foreach(_.graftFree())
    Result(forest, rounds)
  }
}
