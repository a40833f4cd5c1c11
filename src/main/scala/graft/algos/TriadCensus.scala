package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Directed triad census (Holland-Leinhardt) over an ANTISYMMETRIC
 * digraph — here the dominant-direction tool-transition graph, whose
 * construction drops mutual arcs, so exactly five non-trivial triad
 * types exist: 021D (out-star), 021U (in-star), 021C (path), 030T
 * (transitive triangle), 030C (cyclic triangle). The classic SNA
 * structural signature (hierarchy shows up as 030T ≫ 030C).
 *
 * Counted from closed forms, not triple enumeration:
 *   P  = Σ_v in(v)·out(v)            (2-paths)
 *   T  = |{a→b, b→c, a→c}|           (one pattern per 030T)
 *   C  = |{a→b, b→c, c→a}| / 3       (three patterns per 030C)
 *   021C = P − T − 3C,  021D = Σ C(out,2) − T,  021U = Σ C(in,2) − T
 * Only the two triangle joins touch pairs of arcs; the stars/paths
 * are degree aggregates — the whole census is O(Σ d²) worst case and
 * shuffle-light at any scale. Sums run in decimal(38,0) (hub degrees
 * square past long range at 10^12 edges).
 */
object TriadCensus {

  /** @param arcs (src_key, dst_key) with no mutual pairs
   * @return (triad_type, n) — the five census rows */
  def run(arcs: DataFrame): DataFrame = {
    val spark = arcs.sparkSession
    import spark.implicits._
    val aa = arcs.select(col("src_key").as("s"), col("dst_key").as("d")).persist()
    val outd = aa.groupBy(col("s").as("v")).agg(count(lit(1)).as("o"))
    val ind = aa.groupBy(col("d").as("v")).agg(count(lit(1)).as("i"))
    val deg = outd.join(ind, Seq("v"), "full_outer")
      .select(coalesce(col("o"), lit(0L)).as("o"), coalesce(col("i"), lit(0L)).as("i"))
    def aggLong(e: String): Long =
      deg.agg(expr(s"coalesce(sum($e), cast(0 as decimal(38,0)))")).first()
        .getDecimal(0).longValueExact()
    val p = aggLong("cast(i as decimal(38,0)) * o")
    val dOut = aggLong("cast(o as decimal(38,0)) * (o - 1) / 2")
    val dIn = aggLong("cast(i as decimal(38,0)) * (i - 1) / 2")
    val t = aa.as("e1")
      .join(aa.select(col("s").as("d"), col("d").as("c")).as("e2"), "d")
      .join(aa.select(col("s"), col("d").as("c")), Seq("s", "c"), "left_semi")
      .count()
    val cyc = aa
      .join(aa.select(col("s").as("d"), col("d").as("c")), "d")
      .join(aa.select(col("d").as("s"), col("s").as("c")), Seq("s", "c"), "left_semi")
      .count() / 3
    aa.unpersist(blocking = false)
    Seq(
      ("021D", dOut - t), ("021U", dIn - t), ("021C", p - t - 3 * cyc),
      ("030T", t), ("030C", cyc)).toDF("triad_type", "n")
  }

  /**
   * Holland–Leinhardt DYAD census of the raw directed transition
   * graph — the level below [[run]]'s triads: per unordered tool
   * pair, `mutual` (both directions observed), `asym` (exactly one),
   * `nulls` (no transition; C(n,2) − connected pairs over the n
   * tools that transition at all). The reciprocity readout
   * (mutual / connected) falls straight out.
   *
   * One grouped aggregate over the (tiny) tool×tool counts — no
   * joins against the big tables beyond the windowed lead that
   * builds them.
   *
   * @param cnt raw counts from [[graft.sources.EdgeBuilder.toolTransitionCounts]]
   * @return one row: (n_tools, mutual, asym, nulls)
   */
  def dyads(cnt: DataFrame): DataFrame = {
    val spark = cnt.sparkSession
    val und = cnt.groupBy(
      least(col("src_key"), col("dst_key")).as("u"),
      greatest(col("src_key"), col("dst_key")).as("v"))
      .agg(count(lit(1)).as("dirs")) // 1 = asym, 2 = mutual
    val n = cnt.select(col("src_key").as("k"))
      .unionByName(cnt.select(col("dst_key").as("k")))
      .distinct().count()
    und.agg(
      sum(when(col("dirs") === 2, 1L).otherwise(0L)).as("mutual"),
      sum(when(col("dirs") === 1, 1L).otherwise(0L)).as("asym"),
      count(lit(1)).as("p"))
      .select(lit(n).as("n_tools"),
        coalesce(col("mutual"), lit(0L)).as("mutual"),
        coalesce(col("asym"), lit(0L)).as("asym"),
        (lit(n * (n - 1) / 2) - coalesce(col("p"), lit(0L))).as("nulls"))
  }
}
