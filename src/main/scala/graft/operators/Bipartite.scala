package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bipartite (two-mode) graph projection — the classic "conversations
 * sharing a tool" one-mode reduction: given membership rows
 * (entity, group), emit weighted entity–entity edges whose weight is
 * the number of shared groups.
 *
 * Plan shape: distinct memberships → self-join keyed by GROUP (the
 * only shuffle key) → pair aggregate. The join is the textbook skew
 * risk (a hub group of degree d yields d² pairs), which is why the
 * operator surfaces `maxGroupDegree`: groups above the cap are
 * DROPPED (with their pair mass), the standard projection guard at
 * web scale — a degree-10⁶ hub would emit 10¹² pairs, and its
 * projection carries no signal anyway. The cap is part of the
 * operator's contract so the oracle replays it exactly.
 */
object Bipartite {

  /**
   * @param membership (entity, group) rows, duplicates tolerated
   * @param maxGroupDegree drop groups with more entities than this
   *                       (0 = uncapped)
   * @return (a, b, shared) with a < b, shared = co-membership count
   */
  def project(membership: DataFrame, maxGroupDegree: Long = 0L): DataFrame = {
    val m = membership.select(col("entity"), col("group")).distinct()
    val kept =
      if (maxGroupDegree <= 0) m
      else m.join(
        m.groupBy(col("group")).agg(count(lit(1)).as("gd"))
          .where(col("gd") <= maxGroupDegree)
          .select(col("group")),
        "group")
    kept.select(col("entity").as("a"), col("group"))
      .join(kept.select(col("entity").as("b"), col("group")), "group")
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("shared"))
  }
}
