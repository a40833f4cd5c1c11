package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) clustering key for multi-dimensional data layout —
 * the space-filling-curve companion to the range-bucketed
 * [[graft.sources.SnapshotTable]]: sorting/bucketing a 100 TB event
 * log by the interleaved (user, time-bucket) key gives file-level
 * min/max pruning on BOTH dimensions at once, where a plain
 * (user, time) sort order prunes only its leading column.
 *
 * Pure integer bit arithmetic (16+16 → 32-bit Morton code), so the
 * oracle replays it exactly; no UDF — the interleave is a 32-term
 * shift/mask expression that whole-stage-codegens into straight-line
 * long ops.
 */
object ZOrder {

  /** Bit-interleave of two 16-bit keys: a's bit i → 2i, b's → 2i+1. */
  def morton16(a: Column, b: Column): Column =
    (0 until 16).flatMap { i =>
      Seq(
        shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ + _)

  /**
   * Morton key + file-bucket assignment for the event log:
   * dimensions = (user_id & 0xFFFF, hour bucket since corpus start
   * & 0xFFFF); bucket = top log₂(files) bits of the 32-bit code.
   *
   * @return (event_id, zval, file_bucket)
   */
  def eventsZOrder(
      events: DataFrame,
      timeBucketUs: Long = 3600000000L, // 1 hour
      files: Int = 16): DataFrame = {
    require(files > 0 && (files & (files - 1)) == 0, "files must be a power of two")
    val tus = unix_micros(col("ts").cast("timestamp"))
    // corpus-min timestamp: one scalar agg, folded in as a literal
    val minTs = events.agg(min(tus)).first().getLong(0)
    val shift = 32 - (63 - java.lang.Long.numberOfLeadingZeros(files.toLong))
    events
      .select(col("event_id"),
        col("user_id").bitwiseAND(lit(65535L)).as("u"),
        expr(s"(${minTs}L * -1 + unix_micros(cast(ts as timestamp))) div ${timeBucketUs}L")
          .bitwiseAND(lit(65535L)).as("tb"))
      .select(col("event_id"), morton16(col("u"), col("tb")).as("zval"))
      .select(col("event_id"), col("zval"),
        expr(s"zval div ${1L << shift}L").as("file_bucket"))
  }
}
