package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Ordered funnel analysis over conversations — the product-analytics
 * staple on the transcripts payload: how far does each conversation
 * progress through a tool sequence s1 → s2 → s3, where each step must
 * happen strictly AFTER the previous one?
 *
 * The funnel steps are data-derived and deterministic: the top-3
 * tools by distinct-conversation usage (ties by tool name) — same
 * "query from the corpus" pattern as BM25.
 *
 * All times are integer epoch-microseconds; depth/completion export
 * exactly. Scale shape: one groupBy per step over (conv, tool) rows
 * pre-filtered to that step's tool — three partially-aggregated
 * shuffles keyed by conv_id, no windows, no per-conv sequence
 * materialization (the classic funnel self-join trap at 10^12 turns
 * is avoided: each step only carries one min per conversation).
 */
object Funnel {

  /**
   * Per-conversation response-latency profile: turn count, total
   * span, max and (lower-)median inter-turn gap — all integer epoch
   * microseconds. The median is the value at rank ⌈m/2⌉ of the gap
   * multiset (value-at-rank is tie-order independent, so both
   * engines agree without a float percentile). Single-turn
   * conversations report −1 gaps. Windows are per-conversation —
   * parallel across the corpus, no global sort.
   *
   * @return (conv_id, n_turns, span_us, max_gap_us, median_gap_us)
   */
  def latency(transcripts: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    val gaps = transcripts
      .select(col("conv_id"), col("turn_idx"),
        unix_micros(col("ts").cast("timestamp")).as("tus"))
      .withColumn("gap", col("tus") - lag(col("tus"), 1).over(w))
    val stats = gaps.groupBy(col("conv_id")).agg(
      count(lit(1)).as("n_turns"),
      (max(col("tus")) - min(col("tus"))).as("span_us"),
      coalesce(max(col("gap")), lit(-1L)).as("max_gap_us"))
    val wg = org.apache.spark.sql.expressions.Window
      .partitionBy(col("conv_id")).orderBy(col("gap"), col("turn_idx"))
    val med = gaps.where(col("gap").isNotNull)
      .withColumn("rn", row_number().over(wg))
      .withColumn("m", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("conv_id"))))
      .where(col("rn") === expr("(m + 1) div 2"))
      .select(col("conv_id"), col("gap").as("median_gap_us"))
    stats.join(med, Seq("conv_id"), "left")
      .select(col("conv_id"), col("n_turns"), col("span_us"), col("max_gap_us"),
        coalesce(col("median_gap_us"), lit(-1L)).as("median_gap_us"))
  }

  /**
   * Agent STUCK-LOOP detection: maximal runs of the SAME tool across
   * a conversation's consecutive tool-bearing turns (interleaved
   * non-tool turns don't break a run — the agent kept re-invoking the
   * tool). Runs of length ≥ `minRun` are the retry-loop signature a
   * transcript-quality pipeline flags before training on agent data.
   *
   * Gaps-and-islands over the per-conversation tool subsequence:
   * grp = rank-within-conv − rank-within-(conv, tool) is constant
   * exactly on a maximal equal-tool run. Windows are per-conversation
   * — parallel across the corpus, no global sort.
   *
   * @return (conv_id, tool, run_len, start_turn) for runs ≥ minRun
   */
  def toolLoops(transcripts: DataFrame, minRun: Int = 3): DataFrame = {
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("conv_id"), col("tool")).orderBy(col("turn_idx"))
    transcripts.where(col("tool").isNotNull)
      .select(col("conv_id"), col("turn_idx"), col("tool"))
      .withColumn("grp", row_number().over(w1) - row_number().over(w2))
      .groupBy(col("conv_id"), col("tool"), col("grp"))
      .agg(count(lit(1)).as("run_len"),
        min(col("turn_idx")).cast("long").as("start_turn"))
      .where(col("run_len") >= minRun)
      .select(col("conv_id"), col("tool"), col("run_len"), col("start_turn"))
  }

  /**
   * Per-TOOL response-latency profile: for every tool-bearing turn
   * that has a successor in its conversation, the gap to that next
   * turn — the tool's observed round-trip. Aggregated per tool as
   * integer epoch-microsecond stats; median is the value at rank
   * ⌈m/2⌉ (lower median), tie-order independent, no float percentile.
   *
   * Scale shape: one per-conversation window (lead), then per-tool
   * grouped aggregates/windows — parallel across the tool vocabulary,
   * no global sort. A single mega-tool would serialize its own rank
   * window; the tool vocabulary is the natural parallelism unit here
   * (same contract as the per-source quantiles).
   *
   * @return (tool, n_calls, min_gap_us, max_gap_us, median_gap_us)
   */
  def toolLatency(transcripts: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    val gaps = transcripts
      .select(col("conv_id"), col("turn_idx"), col("tool"),
        unix_micros(col("ts").cast("timestamp")).as("tus"))
      .withColumn("gap", lead(col("tus"), 1).over(w) - col("tus"))
      .where(col("tool").isNotNull && col("gap").isNotNull)
    val stats = gaps.groupBy(col("tool")).agg(
      count(lit(1)).as("n_calls"),
      min(col("gap")).as("min_gap_us"),
      max(col("gap")).as("max_gap_us"))
    val wg = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tool")).orderBy(col("gap"), col("conv_id"), col("turn_idx"))
    val med = gaps
      .withColumn("rn", row_number().over(wg))
      .withColumn("m", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("tool"))))
      .where(col("rn") === expr("(m + 1) div 2"))
      .select(col("tool"), col("gap").as("median_gap_us"))
    stats.join(med, Seq("tool"))
  }

  /**
   * Conversation-length census in power-of-two buckets: bucket b
   * covers n_turns ∈ [2^(b-1), 2^b) — bit-length bucketing, no float
   * log (same idiom as the degree histogram). The shape-of-the-corpus
   * readout a packing/sessionization planner sizes state by. One
   * grouped count per conversation, then a ~60-row aggregate.
   *
   * @return (bucket, n_convs, min_turns, max_turns)
   */
  def convHistogram(transcripts: DataFrame): DataFrame =
    transcripts.groupBy(col("conv_id")).agg(count(lit(1)).as("n"))
      .withColumn("bucket", length(conv(col("n"), 10, 2)).cast("long"))
      .groupBy(col("bucket")).agg(
        count(lit(1)).as("n_convs"),
        min(col("n")).as("min_turns"),
        max(col("n")).as("max_turns"))

  /**
   * Chat-format LINT: per-conversation structural flags an SFT
   * pipeline gates on before templating — who opens and closes the
   * dialogue, whether an assistant turn exists at all, whether tools
   * are used, and how fragmented the role sequence is (number of
   * maximal same-role runs). `lint_ok` = opens with a user turn AND
   * contains an assistant turn — the minimal trainable-conversation
   * contract.
   *
   * Integer flags (0/1) for exact oracle compare. Scale shape: one
   * per-conversation window (lag) + one grouped aggregate — parallel
   * across conversations, no global sort.
   *
   * @return (conv_id, first_role, last_role, has_assistant, has_tool,
   *         n_role_runs, lint_ok)
   */
  def chatLint(transcripts: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    transcripts
      .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"))
      .withColumn("brk",
        when(lag(col("role"), 1).over(w).isNull ||
          lag(col("role"), 1).over(w) =!= col("role"), 1L).otherwise(0L))
      .groupBy(col("conv_id"))
      .agg(
        min_by(col("role"), col("turn_idx")).as("first_role"),
        max_by(col("role"), col("turn_idx")).as("last_role"),
        max(when(col("role") === "assistant", 1L).otherwise(0L)).as("has_assistant"),
        max(when(col("tool").isNotNull, 1L).otherwise(0L)).as("has_tool"),
        sum(col("brk")).as("n_role_runs"))
      .withColumn("lint_ok",
        when(col("first_role") === "user" && col("has_assistant") === 1L, 1L)
          .otherwise(0L))
  }

  /**
   * Context-budget truncation census: per conversation, how many
   * leading turns fit inside a `budget`-token context window and how
   * many tokens a head-truncating packer would drop. Token = number
   * of whitespace-split pieces (the ws_tokens contract). The planning
   * readout for SFT sequence budgeting — run before [[Mix.pack]]-
   * style packing to size the window.
   *
   * Scale shape: one per-conversation running-sum window + one
   * grouped aggregate; integers throughout.
   *
   * @return (conv_id, n_turns, total_tokens, fit_turns, lost_tokens)
   */
  def ctxBudget(transcripts: DataFrame, budget: Long = 256L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("conv_id")).orderBy(col("turn_idx"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    transcripts
      .select(col("conv_id"), col("turn_idx"),
        size(split(col("text"), " ")).cast("long").as("nt"))
      .withColumn("cum", sum(col("nt")).over(w))
      .groupBy(col("conv_id"))
      .agg(
        count(lit(1)).as("n_turns"),
        sum(col("nt")).as("total_tokens"),
        sum(when(col("cum") <= budget, 1L).otherwise(0L)).as("fit_turns"),
        sum(when(col("cum") > budget, col("nt")).otherwise(0L)).as("lost_tokens"))
  }

  /**
   * Second-order tool-transition census: trigrams (a, b, c) of
   * consecutive tool-bearing turns per conversation, with the
   * conditional share ×10⁴ against the (a, b) prefix — the order-2
   * Markov fingerprint that distinguishes "retry loops" from
   * "pipelines" where the order-1 matrix cannot. Per-conversation
   * windows only.
   *
   * @return (tool_a, tool_b, tool_c, n, share_e4)
   */
  def toolMarkov2(transcripts: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    val seq3 = transcripts.where(col("tool").isNotNull)
      .select(col("conv_id"), col("turn_idx"), col("tool"))
      .withColumn("b", lead(col("tool"), 1).over(w))
      .withColumn("c", lead(col("tool"), 2).over(w))
      .where(col("c").isNotNull)
    val cnt = seq3.groupBy(col("tool").as("tool_a"), col("b").as("tool_b"),
      col("c").as("tool_c")).agg(count(lit(1)).as("n"))
    val marg = cnt.groupBy(col("tool_a"), col("tool_b"))
      .agg(sum(col("n")).as("n_ab"))
    cnt.join(marg, Seq("tool_a", "tool_b"))
      .select(col("tool_a"), col("tool_b"), col("tool_c"), col("n"),
        expr("(n * 10000L) div n_ab").as("share_e4"))
  }

  /**
   * Per-tool burstiness: the Fano factor (variance-to-mean ratio) of
   * DAILY call counts over the tool's active lifetime — Poisson
   * traffic scores ≈ 10⁴, batch/cron-like bursts score ≫ 10⁴, and a
   * steady drumbeat < 10⁴ (the index-of-dispersion screen on tool
   * traffic shape, complementing [[toolLatency]]'s per-call view).
   *
   * Integer-exact over the lifetime span D = last−first+1 days with
   * zero days implicit: Var/mean = (D·Σx² − S²)/(D·S), exported as
   * fano_e4 = ⌊10⁴·(D·Σx² − S²) div (D·S)⌋ (S = total calls; a
   * single-day tool degenerates to 0). Integer UTC-day arithmetic,
   * two grouped aggregates, no windows.
   *
   * @return (tool, n_calls, n_days_active, span_days, fano_e4)
   */
  def toolBurstiness(transcripts: DataFrame): DataFrame =
    transcripts.where(col("tool").isNotNull)
      .select(col("tool"),
        expr("unix_micros(cast(ts AS timestamp)) div 86400000000L").as("day"))
      .groupBy(col("tool"), col("day")).agg(count(lit(1)).as("x"))
      .groupBy(col("tool")).agg(
        sum(col("x")).as("n_calls"),
        count(lit(1)).as("n_days_active"),
        (max(col("day")) - min(col("day")) + 1).as("span_days"),
        sum(col("x") * col("x")).as("sx2"))
      .select(col("tool"), col("n_calls"), col("n_days_active"), col("span_days"),
        expr("10000 * (span_days * sx2 - n_calls * n_calls)" +
          " div (span_days * n_calls)").as("fano_e4"))

  /**
   * δ-windowed temporal motif census (the Paranjape-Benson-Leskovec
   * WSDM'17 temporal-motif idea specialised to consecutive tool-call
   * triples): classify every run of 3 consecutive tool calls whose
   * total span fits in `deltaUs` by its equality pattern —
   *
   *   aba  retry ping-pong (A→B→A)    aaa  triple repeat
   *   aab / abb  stutter variants     abc  3-step pipeline
   *
   * The time window is what [[toolMarkov2]] lacks: an A→B→A that
   * spans a week is coincidence, inside δ it is a retry loop. One
   * per-conversation window pass + a ≤5-row aggregate; integer µs
   * arithmetic only.
   *
   * @return (pattern, n_motifs)
   */
  def temporalMotifs(
      transcripts: DataFrame,
      deltaUs: Long = 172800000000L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    transcripts.where(col("tool").isNotNull)
      .select(col("conv_id"), col("turn_idx"), col("tool"),
        expr("unix_micros(cast(ts AS timestamp))").as("tus"))
      .withColumn("t2", lead(col("tool"), 1).over(w))
      .withColumn("t3", lead(col("tool"), 2).over(w))
      .withColumn("span", lead(col("tus"), 2).over(w) - col("tus"))
      .where(col("t3").isNotNull && col("span") <= deltaUs)
      .select(
        when(col("tool") === col("t2") && col("t2") === col("t3"), "aaa")
          .when(col("tool") === col("t3") && col("tool") =!= col("t2"), "aba")
          .when(col("tool") === col("t2"), "aab")
          .when(col("t2") === col("t3"), "abb")
          .otherwise("abc").as("pattern"))
      .groupBy(col("pattern")).agg(count(lit(1)).as("n_motifs"))
  }

  /**
   * Inter-turn gap histogram in power-of-two microsecond buckets
   * (bit-length bucketing; zero-µs gaps get bucket 0) — the latency
   * distribution SHAPE, complementing the per-conversation and
   * per-tool percentile profiles. One window pass + a ~60-row
   * aggregate.
   *
   * @return (bucket, n_gaps, min_gap_us, max_gap_us)
   */
  def gapHistogram(transcripts: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    transcripts
      .select(col("conv_id"), col("turn_idx"),
        unix_micros(col("ts").cast("timestamp")).as("tus"))
      .withColumn("gap", col("tus") - lag(col("tus"), 1).over(w))
      .where(col("gap").isNotNull)
      .withColumn("bucket",
        when(col("gap") === 0L, 0L)
          .otherwise(length(conv(col("gap"), 10, 2)).cast("long")))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap")).as("min_gap_us"), max(col("gap")).as("max_gap_us"))
  }

  /** @return (conv_id, depth, done_us): steps completed in order
   * (0-3) and the completion time of the deepest step (-1 if none). */
  def toolFunnel(transcripts: DataFrame): DataFrame = {
    val tl = transcripts.where(col("tool").isNotNull)
      .select(col("conv_id"), col("tool"),
        unix_micros(col("ts").cast("timestamp")).as("tus"))
      .persist()
    val steps = tl.groupBy(col("tool"))
      .agg(count_distinct(col("conv_id")).as("nc"))
      .orderBy(desc("nc"), asc("tool")).limit(3)
      .collect().map(_.getString(0))
    val Seq(s1, s2, s3) = steps.toSeq
    val t1 = tl.where(col("tool") === s1)
      .groupBy(col("conv_id")).agg(min(col("tus")).as("t1"))
    val t2 = tl.where(col("tool") === s2)
      .join(t1, "conv_id").where(col("tus") > col("t1"))
      .groupBy(col("conv_id")).agg(min(col("tus")).as("t2"))
    val t3 = tl.where(col("tool") === s3)
      .join(t2, "conv_id").where(col("tus") > col("t2"))
      .groupBy(col("conv_id")).agg(min(col("tus")).as("t3"))
    val out = transcripts.select(col("conv_id")).distinct()
      .join(t1, Seq("conv_id"), "left")
      .join(t2, Seq("conv_id"), "left")
      .join(t3, Seq("conv_id"), "left")
      .select(col("conv_id"),
        (when(col("t3").isNotNull, 3L)
          .when(col("t2").isNotNull, 2L)
          .when(col("t1").isNotNull, 1L)
          .otherwise(0L)).as("depth"),
        coalesce(col("t3"), col("t2"), col("t1"), lit(-1L)).as("done_us"))
    // tl stays persisted until the caller's action (three step legs
    // re-read it); Bench's isolated{} / session teardown reclaims it
    out
  }

  /**
   * Role-transition Markov census: for every consecutive turn pair
   * within a conversation, count (role_a → role_b) and export each
   * row's share of role_a's outgoing transitions as an e4 integer —
   * the dialogue-structure fingerprint (user→assistant dominance,
   * tool-loop mass) a transcript corpus is profiled by before
   * extraction rules are written against it.
   *
   * Scale shape: one window per conversation (the same
   * partition-by-conv_id sort every adjacency derivation here rides),
   * a tiny |roles|² hash aggregate, and a broadcast marginal join.
   *
   * @param transcripts (conv_id, turn_idx, role, text, tool, ts)
   * @return (role_a, role_b, n, share_e4) with Σ share over role_a
   *         ≤ 10⁴ (floor rounding)
   */
  def roleTransitions(transcripts: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    val pairs = transcripts
      .select(col("conv_id"), col("turn_idx"), col("role").as("role_a"),
        lead(col("role"), 1).over(w).as("role_b"))
      .where(col("role_b").isNotNull)
      .groupBy(col("role_a"), col("role_b")).agg(count(lit(1)).as("n"))
    val marg = pairs.groupBy(col("role_a")).agg(sum(col("n")).as("n_out"))
    pairs.join(broadcast(marg), "role_a")
      .select(col("role_a"), col("role_b"), col("n"),
        expr("n * 10000L div n_out").as("share_e4"))
  }
}
