package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * PII-style pattern scrubbing — the standard pre-training redaction
 * pass: for a regex character-class pattern, count the matches per
 * row and replace each with a fixed placeholder token. Production
 * pipelines run this with email / phone / SSN classes; the synthetic
 * corpus carries none of those, so the driver query exercises the
 * operator on digit runs (`[0-9]+` → `<N>`) — the same number-
 * normalization scrub C4 applies — while the pattern stays a
 * parameter.
 *
 * Cross-engine contract: patterns must be plain character-class
 * regexes (no lookaround, no \d shorthands) so Java's regex (Spark,
 * codegen'd `regexp_replace`/`regexp_extract_all`) and RE2 (DuckDB)
 * match identically.
 *
 * Scale shape: pure per-row column expressions inside whole-stage
 * codegen — no shuffle, no UDF; the scan's row order is irrelevant
 * and the pass pipelines with whatever filter follows it.
 */
object Redact {

  /**
   * @param transcripts (conv_id, turn_idx, ..., text)
   * @return (conv_id, turn_idx, n_matches, red_text)
   */
  def scrub(
      transcripts: DataFrame,
      pattern: String = "[0-9]+",
      token: String = "<N>"): DataFrame =
    transcripts.select(
      col("conv_id"), col("turn_idx"),
      size(regexp_extract_all(col("text"), lit(pattern), lit(0)))
        .cast("long").as("n_matches"),
      regexp_replace(col("text"), pattern, token).as("red_text"))
}
