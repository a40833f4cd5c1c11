package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.syntax._
import graft.LinkGraph

/**
 * Densest-subgraph peeling (Charikar'00 greedy, parallelized à la
 * Bahmani-Kumar-Vassilvitskii VLDB'12 with ε = ½): each round drops
 * every vertex whose live degree d satisfies 2·d·nv ≤ 3·se (i.e.
 * d ≤ 1.5 · average degree); the best round of the peel sequence is
 * a 2(1+ε) = 3-approximation of the maximum-density subgraph. The
 * min-degree vertex always falls below the gate, so the live set
 * strictly shrinks — O(log₁.₅ |V|) rounds.
 *
 * Exact integers end-to-end: live degrees, nv, se are counts; the
 * removal gate and the density export ⌊10⁴·e/v⌋ are integer
 * products/divisions; the argmax over rounds compares e_i/v_i
 * rationals by BigInt cross-multiplication (ties → earliest round),
 * so the oracle replays every decision bit-for-bit.
 *
 * @return (round, n_vertices, n_edges, dens_e4, is_best) — one row
 *         per peel round over vertices with live degree > 0
 */
object Densest {

  /** Survival gate: keep v iff gateNum·d·nv > gateDen·se, i.e.
   * d > (gateDen/gateNum)·avgdeg — (2,3) is ε=½ (3-approx, provably
   * O(log) rounds), (1,1) is classic Charikar ε=0 (2-approx; rounds
   * bounded by the longest chain on path-like graphs, so production
   * at 10^12 edges wants ε>0). */
  def run(graph: LinkGraph, gateNum: Long = 2L, gateDen: Long = 3L,
      maxRounds: Int = 1000): DataFrame = {
    require(graph.symmetric, "densest-subgraph peel expects a symmetrized graph")
    val spark = graph.spark
    import spark.implicits._
    val e = graph.edgesBySrc.select(col("src"), col("dst"))
    var live = graph.degrees.where(col("out_degree") > 0)
      .select(col("id")).graftCut
    val stats = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    var it = 0L
    var done = false
    while (!done && it < maxRounds) {
      val deg = e
        .join(live.select(col("id").as("src")), "src")
        .join(live.select(col("id").as("dst")), "dst")
        .groupBy(col("src").as("id")).agg(count(lit(1)).as("d"))
        .graftCut
      val row = deg.agg(count(lit(1)), coalesce(sum(col("d")), lit(0L))).first()
      val (nv, se) = (row.getLong(0), row.getLong(1))
      if (nv == 0) { deg.graftFree(); done = true }
      else {
        stats += ((it, nv, se))
        val prev = live
        live = deg
          .where(lit(gateNum) * col("d") * lit(nv) > lit(gateDen) * lit(se))
          .select(col("id")).graftCut
        prev.graftFree(); deg.graftFree()
        it += 1
      }
    }
    live.graftFree()
    // exact rational argmax of e/v (= (se/2)/nv), ties → earliest
    // round — BigInt cross-multiplication, never a float quotient
    val best = stats.reduceLeft { (a, b) =>
      val strictlyDenser = BigInt(b._3) * BigInt(a._2) > BigInt(a._3) * BigInt(b._2)
      if (strictlyDenser) b else a
    }._1
    stats.toSeq.map { case (r, nv, se) =>
      (r, nv, se / 2, 10000L * (se / 2) / nv, if (r == best) 1L else 0L)
    }.toDF("round", "n_vertices", "n_edges", "dens_e4", "is_best")
  }
}
