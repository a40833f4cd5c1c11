package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.syntax._
import graft.LinkGraph

/**
 * Weisfeiler-Lehman color refinement (1-WL) structural hashing — the
 * per-vertex fingerprint of the k-hop unfolding tree that underpins
 * WL graph kernels and GNN expressiveness analysis. No reference
 * counterpart (SURVEY §2.10 beyond-reference); built on the same
 * gather shape as the superstep machinery.
 *
 * Round 0: label = degree. Round t: label_t(v) =
 * md5(label_{t-1}(v) || '|' || H(multiset of neighbor labels)),
 * where H is a COMMUTATIVE multiset hash: Σ over neighbors of the
 * 32-bit prefix of md5(label), summed exactly in decimal(38,0), mod
 * the Mersenne prime 2^61−1. Two vertices get equal labels iff their
 * refinement trees agree (up to the negligible sum-collision
 * probability).
 *
 * 100 TB design note: the textbook formulation concatenates the
 * SORTED neighbor-label list — at a 10^7-degree hub that is a
 * gigabyte-sized string built on one reducer. The commutative-sum
 * hash is the scale fix: it partially aggregates map-side (plain
 * `sum`), so hub messages combine before the shuffle and no reducer
 * ever sees more than numPartitions partial sums. decimal(38,0)
 * keeps the sum exact (no ANSI long overflow) up to ~10^28 neighbors.
 */
object WlRefine {

  val MersennePrime = "2305843009213693951" // 2^61 − 1

  /** @return (id, wl) — md5 hex label after `rounds` refinements over
   * the (symmetric) graph; equal labels ⇔ 1-WL-indistinguishable
   * within `rounds` hops. */
  def run(graph: LinkGraph, rounds: Int = 3): DataFrame = {
    var labels = graph.degrees
      .select(col("id"), col("out_degree").cast("string").as("wl"))
      .repartition(graph.numPartitions, col("id"))
      .graftCut
    for (_ <- 1 to rounds) {
      val msgs = graph.edgesBySrc
        .join(labels.select(col("id").as("src"), col("wl")), "src")
        .groupBy(col("dst").as("id"))
        .agg(
          sum(conv(substring(md5(col("wl")), 1, 8), 16, 10)
            .cast("decimal(38,0)")).as("s"))
        .select(col("id"),
          (col("s") % expr(s"cast($MersennePrime as decimal(38,0))"))
            .cast("long").cast("string").as("h"))
      val next = labels
        .join(msgs, Seq("id"), "left")
        .select(col("id"),
          md5(concat(col("wl"), lit("|"), coalesce(col("h"), lit("")))).as("wl"))
        .graftCut
      labels.graftFree()
      labels = next
    }
    labels
  }

  /** Color-class census: one row per distinct label with its class
   * size — the WL-kernel feature vector restricted to one graph. */
  def census(labels: DataFrame): DataFrame =
    labels.groupBy(col("wl")).agg(count(lit(1)).as("n_vertices"))
}
