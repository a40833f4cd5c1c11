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

  /**
   * Butterfly (bipartite 4-cycle) counting — the bipartite analogue
   * of triangle counting: a butterfly is two entities co-member of
   * two groups (a complete 2×2 biclique), the smallest bipartite
   * cohesion motif. Emits, per group pair sharing ≥ 2 entities,
   * the shared-entity count c and its butterfly count C(c, 2);
   * Σ n_bf over the output is the graph's total butterfly count.
   *
   * Plan shape: the wedge generator self-joins distinct memberships
   * keyed by ENTITY (the opposite orientation from [[project]]), so
   * the per-row fan-out is C(deg(entity), 2) — bounded by the
   * entity-side degree (turns per conversation), while skew on the
   * GROUP side (hub tools) costs nothing. `maxEntityDegree` is the
   * mirror-image guard for entity-side hubs: at 10^12-turn scale a
   * conversation touching 10^4 tools would emit 10^8 wedges, so
   * capped entities are dropped, as in [[project]] — part of the
   * operator contract so the oracle replays it exactly.
   */
  def butterflies(membership: DataFrame, maxEntityDegree: Long = 0L): DataFrame = {
    val m = membership.select(col("entity"), col("group")).distinct()
    val kept =
      if (maxEntityDegree <= 0) m
      else m.join(
        m.groupBy(col("entity")).agg(count(lit(1)).as("ed"))
          .where(col("ed") <= maxEntityDegree)
          .select(col("entity")),
        "entity")
    kept.select(col("group").as("group_a"), col("entity"))
      .join(kept.select(col("group").as("group_b"), col("entity")), "entity")
      .where(col("group_a") < col("group_b"))
      .groupBy(col("group_a"), col("group_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= 2)
      .select(col("group_a"), col("group_b"), col("n_shared"),
        expr("n_shared * (n_shared - 1) div 2").as("n_bf"))
  }
}
