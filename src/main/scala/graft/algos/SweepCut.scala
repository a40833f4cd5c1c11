package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.LinkGraph

/**
 * PPR sweep cut — local community detection around a seed (Andersen,
 * Chung, Lang FOCS'06 / PageRank-Nibble): order vertices by
 * degree-normalized PPR score, then for every prefix S_k of the
 * order report volume, cut, and conductance φ(S_k); the argmin
 * prefix is the local cluster. No reference counterpart (SURVEY
 * §2.10).
 *
 * Integer-exact across engines: the order key is
 * `(p_e5 · 10⁶) div deg` over the e5-rounded PPR export (the
 * already-oracle-proven integers), ties by vertex key, so the oracle
 * replays the exact same total order with no float comparisons.
 *
 * 100 TB shape: top-K selection is `orderBy(...).limit(K)` (Spark's
 * TakeOrdered — per-partition top-K then a K-row merge, never a
 * global sort); the K-row rank table broadcasts to the edge scan;
 * cut counts come from the difference-array trick — each edge with
 * ranked lower endpoint lo and higher endpoint hi (unranked → K+1)
 * contributes +1 to cut_k for lo ≤ k < hi, accumulated as two
 * grouped counts + one window over the K-row result. The only
 * windows run over K = O(100) rows.
 */
object SweepCut {

  /**
   * @param scores (id, score) PPR scores (missing ids → 0)
   * @param k sweep length (prefixes 1..k reported)
   * @return (k, key, vol, cut, phi_e4) — prefix rank, the vertex
   *         admitted at that rank, prefix volume Σdeg, crossing-edge
   *         count, and ⌊10⁴·cut / min(vol, 2m−vol)⌋
   */
  def run(graph: LinkGraph, scores: DataFrame, k: Int = 100): DataFrame = {
    require(graph.symmetric, "sweep cut expects a symmetrized graph")
    val deg = graph.degrees.select(col("id"), col("out_degree").as("deg"))
    val ranked = graph.vertices.join(scores, Seq("id"), "left")
      .select(col("id"), col("key"),
        round(coalesce(col("score"), lit(0.0)) * 100000).cast("long").as("p_e5"))
      .join(deg, "id")
      .withColumn("sweep", expr("p_e5 * 1000000 div deg"))
    val order = Window.orderBy(desc("sweep"), col("key"))
    val top = ranked.orderBy(desc("sweep"), col("key")).limit(k)
      .withColumn("r", row_number().over(order).cast("long"))
      .persist()
    // pin the K-row table: three plan legs reference it (rank join +
    // two broadcast maps); it stays cached — K rows, negligible
    top.count()
    // one row per undirected edge; rank endpoints via the broadcast map
    val unranked = lit((k + 1).toLong)
    val e = graph.edgesBySrc.where(col("src") < col("dst"))
      .join(broadcast(top.select(col("id").as("src"), col("r").as("ra"))), Seq("src"), "left")
      .join(broadcast(top.select(col("id").as("dst"), col("r").as("rb"))), Seq("dst"), "left")
      .select(
        least(coalesce(col("ra"), unranked), coalesce(col("rb"), unranked)).as("lo"),
        greatest(coalesce(col("ra"), unranked), coalesce(col("rb"), unranked)).as("hi"))
      .where(col("lo") <= k)
    val loCnt = e.groupBy(col("lo").as("r")).agg(count(lit(1)).as("nlo"))
    val hiCnt = e.where(col("hi") <= k)
      .groupBy(col("hi").as("r")).agg(count(lit(1)).as("nhi"))
    val total = graph.numEdges // symmetric row count = 2m = total volume
    val out = top
      .join(loCnt, Seq("r"), "left").join(hiCnt, Seq("r"), "left")
      .withColumn("vol", sum(col("deg")).over(order.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cut", sum(coalesce(col("nlo"), lit(0L)) - coalesce(col("nhi"), lit(0L)))
        .over(order.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("r").as("k"), col("key"), col("vol"), col("cut"),
        // S = V ⇒ cut = 0 and the denominator vanishes; φ ≔ 0 there
        expr(s"CASE WHEN least(vol, $total - vol) = 0 THEN 0L " +
          s"ELSE 10000 * cut div least(vol, $total - vol) END").as("phi_e4"))
    out
  }
}
