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

  /**
   * SFT ECHO rate — the "response parrots the prompt" screen run on
   * extracted instruction pairs before they enter a fine-tuning mix:
   * for every assistant turn (paired with its latest strictly-earlier
   * user turn, same as-of semantics as `q_sft_pairs`), the share of
   * the response's DISTINCT lowercase tokens that also occur in the
   * prompt. echo_e4 = ⌊10⁴·|resp ∩ prompt| / |resp|⌋ — high values
   * flag extraction bugs (quote loops) and low-information pairs.
   *
   * Scale shape: merge as-of join (one hash shuffle) + token explode
   * + two hash aggregates + an equi-join on (conv, turn, tok) —
   * linear in token volume, no windows over the corpus, no UDFs.
   *
   * @param transcripts (conv_id, turn_idx, role, text, tool, ts)
   * @return (conv_id, turn_idx, n_resp_toks, n_echo, echo_e4) — one
   *         row per assistant turn with an earlier user turn;
   *         empty-token responses report echo_e4 = 0
   */
  /**
   * Feature-hashing (hashing-trick) conversation featurizer: every
   * token hashes to one of `dims` buckets via an md5 dimension draw
   * plus an independent md5 SIGN draw (the signed variant that keeps
   * collisions unbiased, Weinberger et al.) — the fixed-width sparse
   * featurization a downstream trainer consumes without a vocabulary
   * pass. Long format (one row per non-empty (conv, dim)) so the
   * export is exact integers.
   *
   * Deterministic and engine-replayable: dim = first 4 md5 hex
   * nibbles mod dims, sign from the 5th nibble's parity.
   *
   * Scale shape: explode + one grouped aggregate keyed by
   * (conv, dim) — partially aggregated, no vocabulary table, no
   * windows.
   *
   * @return (conv_id, dim, n_toks, feat) with feat = Σ ±1
   */
  def hashFeatures(transcripts: DataFrame, dims: Int = 16): DataFrame =
    transcripts.select(col("conv_id"),
      explode(split(lower(col("text")), " ")).as("w"))
      .where(col("w") =!= "")
      .select(col("conv_id"),
        expr(s"cast(conv(substring(md5(w), 1, 4), 16, 10) AS bigint) % $dims").as("dim"),
        expr("CASE WHEN cast(conv(substring(md5(w), 5, 1), 16, 10) AS bigint) % 2 = 0" +
          " THEN 1L ELSE -1L END").as("sign"))
      .groupBy(col("conv_id"), col("dim"))
      .agg(count(lit(1)).as("n_toks"), sum(col("sign")).as("feat"))

  def sftEcho(transcripts: DataFrame): DataFrame = {
    val probes = transcripts.where(col("role") === "assistant")
      .select(col("conv_id"), col("turn_idx"), col("text").as("response"))
    val quotes = transcripts.where(col("role") === "user")
      .select(col("conv_id"), col("turn_idx"), col("text"))
    val pairs = graft.operators.Temporal
      .asOfJoin(probes, quotes, "conv_id", "turn_idx", Seq("text"))
      .select(col("conv_id"), col("turn_idx"),
        col("asof.text").as("prompt"), col("response"))
    def toks(src: String) = pairs
      .select(col("conv_id"), col("turn_idx"),
        explode(split(lower(col(src)), " ")).as("tok"))
      .where(col("tok") =!= "").distinct()
    val nResp = toks("response").groupBy(col("conv_id"), col("turn_idx"))
      .agg(count(lit(1)).as("n_resp_toks"))
    val nEcho = toks("response")
      .join(toks("prompt"), Seq("conv_id", "turn_idx", "tok"))
      .groupBy(col("conv_id"), col("turn_idx"))
      .agg(count(lit(1)).as("n_echo"))
    pairs.select(col("conv_id"), col("turn_idx"))
      .join(nResp, Seq("conv_id", "turn_idx"), "left")
      .join(nEcho, Seq("conv_id", "turn_idx"), "left")
      .select(col("conv_id"), col("turn_idx").cast("long").as("turn_idx"),
        coalesce(col("n_resp_toks"), lit(0L)).as("n_resp_toks"),
        coalesce(col("n_echo"), lit(0L)).as("n_echo"))
      .withColumn("echo_e4",
        when(col("n_resp_toks") === 0L, 0L)
          .otherwise(expr("n_echo * 10000L div n_resp_toks")))
  }
}
