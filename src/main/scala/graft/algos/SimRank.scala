package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.syntax._

/**
 * SimRank structural similarity (Jeh & Widom, KDD'02): two vertices
 * are similar iff their IN-neighbors are similar —
 *
 *   s(a,a) = 1,   s(a,b) = C/(|I(a)|·|I(b)|) · Σ_{u∈I(a),v∈I(b)} s(u,v)
 *
 * — the "similar tools are invoked after similar tools" readout on
 * the dominant-direction tool-transition digraph (the same input as
 * [[Scc]]/[[BowTie]]), where it surfaces interchangeable tools for
 * agent-behavior clustering.
 *
 * Integer-exact with C = 4/5 and 10⁶ scale, floor at each round:
 * s' = ⌊4·Σs / (5·|I(a)|·|I(b)|)⌋, diagonal pinned at 10⁶ — the
 * DuckDB oracle replays the rounds as chained CTEs bit-for-bit.
 *
 * Scale shape: the fixpoint is computed as PAIR-GRAPH message
 * passing — each nonzero pair (u,v) fans out to out-neighbor pairs
 * (a,b) ∈ O(u)×O(v), one partial-agg shuffle per round. Sparsity is
 * maintained by the `minS` floor-pruning threshold (rows with s <
 * minS are dropped, the standard SimRank top-k pruning): round-k
 * rows are O(nonzero pairs · out-deg²), never |V|². On a hub-heavy
 * digraph raise `minS` (or pre-cap out-degrees) to bound the square.
 */
object SimRank {

  val Scale = 1000000L

  /** @param edges  directed (src_key, dst_key) — in-neighbor sets
   *                define similarity
   *  @return (tool_a, tool_b, simrank_e6), a < b, score ≥ minS after
   *          `iters` rounds */
  def run(
      edges: DataFrame,
      iters: Int = 3,
      minS: Long = 1L): DataFrame = {
    val e = edges.select(col("src_key").as("src"), col("dst_key").as("dst"))
      .distinct().persist()
    val nodes = e.select(col("src").as("n"))
      .unionByName(e.select(col("dst").as("n"))).distinct().persist()
    val indeg = e.groupBy(col("dst")).agg(count(lit(1)).as("deg"))
    val diag = nodes.select(col("n").as("a"), col("n").as("b"), lit(Scale).as("s"))
    var s = diag
    var prev: DataFrame = null
    for (_ <- 1 to iters) {
      val off = s
        .join(e.select(col("src").as("a"), col("dst").as("na")), "a")
        .join(e.select(col("src").as("b"), col("dst").as("nb")), "b")
        .where(col("na") =!= col("nb"))
        .groupBy(col("na"), col("nb")).agg(sum(col("s")).as("m"))
        .join(indeg.select(col("dst").as("na"), col("deg").as("da")), "na")
        .join(indeg.select(col("dst").as("nb"), col("deg").as("db")), "nb")
        .select(col("na").as("a"), col("nb").as("b"),
          expr("4 * m div (5 * da * db)").as("s"))
        .where(col("s") >= minS)
      val next = off.unionByName(diag).graftCut
      if (prev != null) prev.graftFree()
      prev = next
      s = next
    }
    val out = s.where(col("a") < col("b"))
      .select(col("a").as("tool_a"), col("b").as("tool_b"), col("s").as("simrank_e6"))
    e.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    out
  }
}
