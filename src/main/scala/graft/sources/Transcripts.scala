package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Transcript input table (the engine's only external-facing schema):
 * `(conv_id: string, turn_idx: int, role: string, text: string,
 * tool: string, ts: timestamp)` — multi-turn conversation / agent
 * transcripts. Two constructors:
 *
 *  - [[fromEvents]] derives the table deterministically from the
 *    driver-provided `events.parquet` so the DuckDB oracle can
 *    reproduce it with equivalent ANSI SQL (every expression used
 *    here evaluates identically in Spark and DuckDB).
 *  - [[synthetic]] generates an arbitrarily large table from
 *    `spark.range` with pure column expressions (no RNG, no driver
 *    data) — deterministic across runs and parallelism levels, used
 *    for unit tests and the scaling benchmark.
 *
 * Scale note: both are embarrassingly parallel scans; the only window
 * is partitioned by `user_id`/`conv_id` (bounded-size groups), so
 * there is no global sort anywhere on the ingest path.
 */
object Transcripts {

  /** Bucketing width for the tool vocabulary: tools are shared only
   * within a block of `toolUserBucket` adjacent user ids, which keeps
   * connected components bounded (realistic tool locality) while
   * still inducing cross-conversation edges. */
  val toolUserBucket = 10
  val toolsPerBucket = 5

  def fromEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    ev.select(
      concat(lit("c"), col("user_id").cast("string")).as("conv_id"),
      (row_number().over(w) - 1).cast("int").as("turn_idx"),
      when(col("event_type").isin("click", "view"), lit("user"))
        .when(col("event_type") === "signup", lit("assistant"))
        .otherwise(lit("tool")).as("role"),
      concat(col("event_type"), lit(" "), col("props")).as("text"),
      when(
        col("event_type").isin("purchase", "error"),
        concat(
          lit("tool_"),
          (floor(col("user_id") / lit(10.0)) * lit(toolsPerBucket) +
            pmod(floor(col("value")), lit(toolsPerBucket))).cast("long").cast("string"))
      ).as("tool"),
      col("ts"))
  }

  /**
   * Deterministic synthetic transcripts: `numConvs * turnsPerConv`
   * rows. Tool turns every `toolEvery` turns, drawn from a vocabulary
   * of `numTools` via xxhash64 (stable across runs/parallelism).
   */
  def synthetic(
      spark: SparkSession,
      numConvs: Long,
      turnsPerConv: Int,
      numTools: Int,
      toolEvery: Int = 3): DataFrame = {
    val n = numConvs * turnsPerConv
    val base = spark.range(n)
    val conv = (col("id") / turnsPerConv).cast("long")
    val turn = pmod(col("id"), lit(turnsPerConv.toLong)).cast("int")
    base.select(
      concat(lit("c"), conv.cast("string")).as("conv_id"),
      turn.as("turn_idx"),
      when(pmod(turn, lit(3)) === 0, lit("user"))
        .when(pmod(turn, lit(3)) === 1, lit("assistant"))
        .otherwise(lit("tool")).as("role"),
      concat(lit("msg "), xxhash64(col("id")).cast("string")).as("text"),
      when(
        pmod(turn, lit(toolEvery)) === 0,
        concat(lit("tool_"), pmod(xxhash64(col("id"), lit(7)), lit(numTools.toLong)).cast("string"))
      ).as("tool"),
      expr("timestampadd(SECOND, id % 86400, timestamp'2024-01-01 00:00:00')").as("ts"))
  }
}
