package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Structured-metadata extraction from semi-structured turn text — the
 * "parse the JSON tail out of every log line" operator every
 * large-scale training-data pipeline needs. The transcript `text` is
 * `"<event_type> <json>"`; the JSON payload starts after the first
 * space. Extraction uses Spark's native `get_json_object` (codegen'd
 * path evaluation, no UDF), and the downstream aggregation is pure
 * integer arithmetic so the result crosses engines exactly.
 *
 * Scale: a stateless per-row projection (embarrassingly parallel,
 * pushdown-friendly) + one hash aggregate keyed by conv_id.
 */
object Extract {

  /** Per-turn extraction: (conv_id, kv) with kv = the `$.k` integer of
   * the JSON payload (null when absent). */
  def jsonField(transcripts: DataFrame, path: String = "$.k"): DataFrame =
    transcripts.select(
      col("conv_id"),
      get_json_object(
        expr("substring(text, instr(text, ' ') + 1)"), path
      ).cast("long").as("kv"))

  /** Per-conversation metadata profile over the extracted field:
   * (conv_id, n_vals, k_sum, k_min, k_max) — nulls excluded from all
   * four aggregates. */
  def convMetadata(transcripts: DataFrame): DataFrame =
    jsonField(transcripts)
      .where(col("kv").isNotNull)
      .groupBy(col("conv_id"))
      .agg(
        count(lit(1)).as("n_vals"),
        sum(col("kv")).as("k_sum"),
        min(col("kv")).as("k_min"),
        max(col("kv")).as("k_max"))
}
