package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Lexical conversation segmentation (TextTiling-style, Hearst'97
 * reduced to its exact-arithmetic core): a topic boundary falls
 * between consecutive turns whose DISTINCT-token Jaccard overlap
 * drops below a threshold; segments are the runs between boundaries.
 *
 * All integer: overlap is exact set intersection over distinct
 * tokens, the gate is 10⁴·|∩| < thr·|∪| (no float division), and
 * segment ids are a cumulative boundary count. Windows are
 * partitioned BY CONVERSATION — embarrassingly parallel across the
 * corpus, no global ordering anywhere.
 */
object Segment {

  /**
   * @param thrE4 boundary when jaccard_e4 < thrE4
   * @return (conv_id, seg_id, start_turn, n_turns) per segment
   */
  def lexical(transcripts: DataFrame, thrE4: Long = 500): DataFrame = {
    val toks = transcripts
      .select(col("conv_id"), col("turn_idx"),
        explode(array_distinct(split(lower(col("text")), " "))).as("tok"))
    val sizes = toks.groupBy(col("conv_id"), col("turn_idx"))
      .agg(count(lit(1)).as("sz"))
    // intersection of consecutive turns: token equi-join at idx+1
    val inter = toks.alias("a")
      .join(toks.alias("b"),
        col("a.conv_id") === col("b.conv_id") &&
          col("b.turn_idx") === col("a.turn_idx") + 1 &&
          col("a.tok") === col("b.tok"))
      .groupBy(col("a.conv_id").as("conv_id"), col("b.turn_idx").as("turn_idx"))
      .agg(count(lit(1)).as("inter"))
    // per turn > 0: boundary iff 10⁴·inter < thr·(sza + szb − inter)
    val flags = transcripts.select(col("conv_id"), col("turn_idx")).distinct()
      .join(sizes, Seq("conv_id", "turn_idx"))
      .withColumn("prev_sz",
        lag(col("sz"), 1).over(Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))))
      .join(inter, Seq("conv_id", "turn_idx"), "left")
      .withColumn("boundary",
        when(col("prev_sz").isNull, lit(0L)) // first turn opens segment 0
          .when(lit(10000L) * coalesce(col("inter"), lit(0L)) <
            lit(thrE4) * (col("prev_sz") + col("sz") - coalesce(col("inter"), lit(0L))),
            lit(1L))
          .otherwise(lit(0L)))
      .withColumn("seg_id",
        sum(col("boundary")).over(Window.partitionBy(col("conv_id"))
          .orderBy(col("turn_idx"))
          .rowsBetween(Window.unboundedPreceding, 0)))
    flags.groupBy(col("conv_id"), col("seg_id"))
      .agg(min(col("turn_idx")).cast("long").as("start_turn"),
        count(lit(1)).as("n_turns"))
  }

  /**
   * Conversation topic-drift score: distinct-token Jaccard between
   * the first and second half of each conversation (halves by turn
   * position: first ⟺ 2·turn_idx < n_turns). High overlap = the
   * conversation stayed on one topic; near-zero = it drifted — the
   * whole-conversation complement of the adjacent-turn TextTiling
   * boundaries above. Single-turn conversations have an empty second
   * half and score 0 by construction.
   *
   * Integer-exact (counts and a floor-div ratio). Scale shape: one
   * (conv, half, token) distinct + two grouped aggregates keyed by
   * conv/token — all partially aggregated, no windows.
   *
   * @return (conv_id, n_inter, n_union, jaccard_e4)
   */
  def halfDrift(transcripts: DataFrame): DataFrame = {
    val sizes = transcripts.groupBy(col("conv_id"))
      .agg(count(lit(1)).as("n"))
    val toks = transcripts
      .join(sizes, "conv_id")
      .select(col("conv_id"),
        (col("turn_idx") * 2 < col("n")).as("first_half"),
        explode(split(lower(col("text")), " ")).as("tok"))
      .where(col("tok") =!= "")
      .distinct()
    toks.groupBy(col("conv_id"), col("tok"))
      .agg(count(lit(1)).as("halves"))
      .groupBy(col("conv_id"))
      .agg(
        sum(when(col("halves") === 2, 1L).otherwise(0L)).as("n_inter"),
        count(lit(1)).as("n_union"))
      .withColumn("jaccard_e4", expr("(n_inter * 10000L) div n_union"))
  }
}
