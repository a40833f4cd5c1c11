package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** One transcript turn, as consumed by the incremental edge builder
 * (`text`/`role`/`ts` are irrelevant to edge derivation and dropped
 * before the stateful operator — less state, smaller shuffle). */
case class TurnEvent(conv_id: String, turn_idx: Int, tool: Option[String])

/** Per-conversation state: the highest turn index ingested so far.
 * ONE small row per live conversation — state size is O(live convs),
 * independent of history length. */
case class ConvCursor(lastIdx: Int)

/** A derived link-graph edge (same shape as EdgeBuilder.keyEdges). */
case class KeyEdge(src_key: String, dst_key: String, kind: String, weight: Double)

/**
 * Structured-Streaming incremental edge ingest — the streaming twin of
 * `sources.EdgeBuilder.keyEdges` (the reference engine is batch-only;
 * this is the piece a production 10^12-turn pipeline needs so the
 * graph can be grown continuously instead of rebuilt).
 *
 * Semantics contract: turns of one conversation arrive in turn_idx
 * order (a live transcript log cannot emit turn 5 before turn 4;
 * batches may split a conversation anywhere). Under that contract the
 * accumulated output across all micro-batches equals the batch builder
 * on the full input, exactly:
 *
 *  - `adj`  edges `(conv#i → conv#j)` for consecutive ingested turns —
 *    the cross-batch seam is held in [[ConvCursor]] via
 *    `flatMapGroupsWithState` keyed by conv_id (bounded custom state,
 *    the Spark-first replacement for the batch `lead` window).
 *  - `tool` edges `(conv#i → T#tool)` — stateless, emitted inline.
 *  - self-loops dropped; late/duplicate turn indexes (≤ cursor) emit
 *    no adj edge instead of corrupting the chain.
 *
 * Scale/ops notes: output mode Append (edges are immutable facts —
 * nothing retracts); state evicts by processing-time TTL when
 * `stateTtl` is set (a conversation idle that long is closed; its
 * cursor is the only loss, so a late resume just starts a new chain
 * segment rather than erroring). Sink: `writeStream.foreachBatch`
 * appending to the bucketed edge layout (`sources.BucketedLayout`),
 * dedup-on-compact like the batch path. The same function runs on a
 * static DataFrame (Spark executes stateful operators per-group in
 * batch mode) — one code path, two execution modes.
 */
object EdgeStream {

  /** Incremental `(src_key, dst_key, kind, weight)` from a (streaming
   * or static) transcript DataFrame. */
  def edges(transcripts: DataFrame, stateTtl: Option[String] = None): Dataset[KeyEdge] = {
    val spark = transcripts.sparkSession
    import spark.implicits._
    val turns = transcripts
      .select(col("conv_id"), col("turn_idx").cast("int").as("turn_idx"), col("tool"))
      .as[TurnEvent]
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    turns
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(advance(stateTtl))
      .filter(e => e.src_key != e.dst_key)
  }

  /** The per-conversation transition: sort the micro-batch slice,
   * chain adj edges from the stored cursor, emit tool edges, advance
   * the cursor. Pure function of (state, batch slice) → deterministic
   * replay from a streaming checkpoint. */
  private def advance(stateTtl: Option[String])(
      convId: String,
      rows: Iterator[TurnEvent],
      state: GroupState[ConvCursor]): Iterator[KeyEdge] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val sorted = rows.toArray.sortBy(_.turn_idx)
      val out = Array.newBuilder[KeyEdge]
      var last: Option[Int] = state.getOption.map(_.lastIdx)
      sorted.foreach { t =>
        // a stale replay (turn_idx ≤ cursor) emits NOTHING — its adj
        // and tool edges were already produced the first time, and
        // Append mode never retracts, so re-emitting would duplicate
        if (last.forall(_ < t.turn_idx)) {
          val vkey = s"$convId#${t.turn_idx}"
          last.foreach(li => out += KeyEdge(s"$convId#$li", vkey, "adj", 1.0))
          t.tool.foreach(tl => out += KeyEdge(vkey, s"T#$tl", "tool", 2.0))
          last = Some(t.turn_idx)
        }
      }
      last.foreach(li => state.update(ConvCursor(li)))
      stateTtl.foreach(state.setTimeoutDuration)
      out.result().iterator
    }
  }

  /**
   * The durable sink: each micro-batch appends to an Iceberg-style
   * `bucket=K/` parquet layout (hash of src_key — ingest time cannot
   * know degrees; the degree-aware re-range happens at compaction,
   * `sources.BucketedLayout`). Append-only and idempotent-per-layout:
   * replayed batches may re-append rows, so readers go through
   * [[compactEdges]] which dedups on the full edge key — the same
   * contract as the batch builder's `dropDuplicates`.
   */
  def sink(
      edges: Dataset[KeyEdge],
      path: String,
      checkpointDir: String,
      numBuckets: Int = 32): StreamingQuery =
    edges.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[KeyEdge], _: Long) =>
        batch
          .withColumn("bucket", pmod(xxhash64(col("src_key")), lit(numBuckets.toLong)))
          .write.mode("append").partitionBy("bucket").parquet(path)
      }
      .start()

  /** Read the accumulated sink layout back as the deduplicated edge
   * set (bucket pruning stays available to per-bucket readers; the
   * dedup is a hash aggregate keyed by the full edge row). */
  def compactEdges(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .select(col("src_key"), col("dst_key"), col("kind"), col("weight"))
      .dropDuplicates("src_key", "dst_key", "kind")

  /**
   * Watermarked event-time windowed aggregation: tool invocations per
   * (tumbling window, tool). The streaming leg of the engine's
   * reporting surface — on a stream, rows later than `watermark` past
   * the max seen event time are dropped and each window finalizes
   * (Append mode) once the watermark passes its end, so state is
   * O(open windows × tools). On a static DataFrame the watermark node
   * is a no-op (Catalyst eliminates it) and this is a plain windowed
   * group-by — one code path, two execution modes, same result, which
   * is what lets the batch driver query share a DuckDB
   * `time_bucket` oracle (`q_tool_windows`).
   *
   * `w_start` is exposed as epoch seconds (not a timestamp) so the
   * cross-engine comparison is exact integer equality, never
   * timezone/format-sensitive.
   */
  def toolWindows(
      transcripts: DataFrame,
      windowLen: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    transcripts
      .filter(col("tool").isNotNull)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("tool"))
      .agg(count(lit(1)).as("n"))
      .select(
        unix_timestamp(col("window.start")).as("w_start"),
        col("tool"),
        col("n"))

  /**
   * Stream-stream interval join — the last member of the streaming
   * surface next to the stateful ingest, windows, and the dedup gate:
   * every error turn joined to the tool invocations of the SAME
   * conversation within the `horizonMinutes` that follow (error
   * blast-radius attribution). Both sides carry watermarks and the
   * join condition bounds the event-time range, so Spark buffers each
   * side only until the other side's watermark passes the horizon —
   * state is O(rows inside one horizon), independent of stream length.
   * On static input the watermarks are no-ops and this is a plain
   * equi+range join (`q_err_tools` shares a one-line DuckDB oracle).
   */
  def errorToolJoin(
      transcripts: DataFrame,
      horizonMinutes: Int = 10,
      watermark: String = "10 minutes"): DataFrame = {
    val errs = transcripts
      .where(col("text").startsWith("error"))
      .select(col("conv_id"), col("turn_idx").as("err_turn"),
        col("ts").cast("timestamp").as("err_ts"))
      .withWatermark("err_ts", watermark)
    val tools = transcripts
      .where(col("tool").isNotNull)
      .select(col("conv_id").as("t_conv"), col("tool"),
        col("turn_idx").as("tool_turn"), col("ts").cast("timestamp").as("tool_ts"))
      .withWatermark("tool_ts", watermark)
    errs.join(tools,
      col("conv_id") === col("t_conv") &&
        col("tool_ts") >= col("err_ts") &&
        col("tool_ts") < col("err_ts") + expr(s"INTERVAL $horizonMinutes MINUTES"))
      .select(col("conv_id"), col("err_turn"), col("tool_turn"), col("tool"))
  }

  /** Sliding-window twin of [[toolWindows]]: 1-hour windows advancing
   * every 30 minutes, so each invocation lands in exactly
   * len/slide = 2 overlapping windows (hopping count smoothing — the
   * third member of the window family after tumbling and session).
   * Same one-code-path batch/stream contract and epoch-seconds export. */
  def toolSliding(
      transcripts: DataFrame,
      windowLen: String = "1 hour",
      slide: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    transcripts
      .filter(col("tool").isNotNull)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("tool"))
      .agg(count(lit(1)).as("n"))
      .select(
        unix_timestamp(col("window.start")).as("w_start"),
        col("tool"),
        col("n"))

  /**
   * Session-window sessionization: turns of one conversation merge
   * into a session while consecutive event times are closer than
   * `gap`; a quiet period of ≥ gap starts a new session (conversation
   * bursts — the session-window member of the window family, next to
   * [[toolWindows]]' tumbling windows). Native `session_window` keeps
   * streaming state per OPEN session only (closed by watermark, Append
   * mode); batch mode is the same merge as the classic gaps-and-islands
   * SQL, which is exactly the `q_conv_sessions` DuckDB oracle.
   * `sess_start` is epoch MICROseconds (`unix_micros` ↔ DuckDB
   * `epoch_us`) so raw sub-second timestamps compare as exact integers.
   */
  def convSessions(
      transcripts: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    transcripts
      .withWatermark("ts", watermark)
      .groupBy(col("conv_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_turns"))
      .select(
        col("conv_id"),
        // parquet NTZ timestamps make the window struct NTZ; cast to
        // LTZ is exact under the engine's UTC session convention
        unix_micros(col("session_window.start").cast("timestamp")).as("sess_start"),
        col("n_turns"))
}
