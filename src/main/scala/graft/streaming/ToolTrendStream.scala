package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Current decayed score of one tool (latest update wins). */
case class ToolTrend(tool: String, score_scaled: Long)

private case class ToolEvent(tool: String, tus: Long)
private case class TrendState(score: Long)

/**
 * Streaming "trending tools": per-tool exponentially-decayed usage
 * score with dyadic-exact decay — each use at age-bucket b (3-day
 * buckets vs a fixed reference instant) contributes 2^(40−min(b,40)),
 * so score_scaled = ⌊2^40 · Σ 2^-b⌋ in EXACT integers: the same
 * portability trick as the time-decayed PageRank weights
 * (EdgeBuilder.keyEdgesDecayed), which is what makes a STATEFUL
 * streaming operator oracle-checkable — integer addition commutes, so
 * any micro-batch slicing reaches the same fixpoint.
 *
 * State = one running long per tool (Update mode re-emits the new
 * total each batch; the latest row per tool is the answer). On a
 * static table everything is one slice, so batch mode = the plain
 * GROUP BY — one code path, two engines (q_trending's oracle).
 */
object ToolTrendStream {

  def trending(
      transcripts: DataFrame,
      refTs: Long,
      bucketUs: Long = 259200000000L, // 3 days
      maxBucket: Int = 40): Dataset[ToolTrend] = {
    val spark = transcripts.sparkSession
    import spark.implicits._
    val rows = transcripts.where(col("tool").isNotNull)
      .select(col("tool"),
        unix_micros(col("ts").cast("timestamp")).as("tus"))
      .as[ToolEvent]
    rows
      .groupByKey(_.tool)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (tool: String, slice: Iterator[ToolEvent], state: GroupState[TrendState]) =>
          val add = slice.map { e =>
            val b = math.min((refTs - e.tus) / bucketUs, maxBucket.toLong).toInt
            1L << (maxBucket - b)
          }.sum
          val cur = state.getOption.map(_.score).getOrElse(0L) + add
          state.update(TrendState(cur))
          Iterator.single(ToolTrend(tool, cur))
      }
  }
}
