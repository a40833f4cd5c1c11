package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Tool co-occurrence lift over conversations — the association-mining
 * statistic (lift = P(a,b) / (P(a)·P(b)); PMI is its log) used to
 * surface tool pairings for agent-behavior analysis and feature
 * crosses. Exported as an exact integer `lift_e4 = ⌊10⁴·lift⌋` so the
 * oracle compare is bit-exact (the repo's closeness/similarity
 * convention: lift the RATIO, not its log — floor of a ratio of
 * exact counts needs no floating point at all).
 *
 * Scale shape: the pair generator self-joins the DISTINCT (conv, tool)
 * set on conv_id — a conversation carries at most turns-per-conv
 * tools, so pair fan-out per conversation is bounded by a constant
 * independent of corpus size; the marginals table (one row per tool)
 * is broadcast. One shuffle for the distinct, one for the pair count.
 */
object Cooccur {

  /** @param transcripts (conv_id, turn_idx, role, text, tool, ts)
   *  @return (tool_a, tool_b, n_ab, n_a, n_b, lift_e4), tool_a < tool_b */
  def toolLift(transcripts: DataFrame): DataFrame = {
    val convTools = transcripts
      .where(col("tool").isNotNull)
      .select(col("conv_id"), col("tool"))
      .distinct()
      .cache()
    val nConvs = transcripts.select(col("conv_id")).distinct().count()

    val marginals = convTools.groupBy(col("tool")).agg(count(lit(1)).as("n"))
    val pairs = convTools.as("a")
      .join(convTools.as("b"), "conv_id")
      .where(col("a.tool") < col("b.tool"))
      .groupBy(col("a.tool").as("tool_a"), col("b.tool").as("tool_b"))
      .agg(count(lit(1)).as("n_ab"))

    val out = pairs
      .join(broadcast(marginals.select(col("tool").as("tool_a"), col("n").as("n_a"))), "tool_a")
      .join(broadcast(marginals.select(col("tool").as("tool_b"), col("n").as("n_b"))), "tool_b")
      .select(
        col("tool_a"), col("tool_b"), col("n_ab"), col("n_a"), col("n_b"),
        // `div` = integer floor division (Spark's `/` is double
        // division). The products run in decimal(38,0): at 10^12-turn
        // scale n_ab·10⁴·nConvs overflows a long and ANSI mode would
        // abort the job where the DuckDB oracle (HUGEINT) succeeds.
        expr(s"(cast(n_ab AS decimal(38,0)) * 10000 * cast(${nConvs}L AS decimal(38,0)))" +
          s" div (cast(n_a AS decimal(38,0)) * cast(n_b AS decimal(38,0)))")
          .cast("long").as("lift_e4"))
    convTools.unpersist(blocking = false)
    out
  }
}
