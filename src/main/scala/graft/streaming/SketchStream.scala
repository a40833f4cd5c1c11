package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.pipeline.Sketch

/** One HLL register update (changelog row: the NEW max for the
 * bucket). Downstream consumers keep last-value per (source, bucket). */
case class HllReg(source: String, bucket: Long, max_rho: Long)

private case class RegRow(source: String, bucket: Long, rho: Long)
private case class RegState(regs: Map[Long, Long])

/**
 * Streaming HyperLogLog register maintenance — the ingest-time half
 * of the distinct-count story (the batch half, pipeline/Sketch.hll,
 * sketches the corpus at rest): as document batches arrive, each
 * source's 2^p register vector is kept in keyed state and the stream
 * emits a changelog row whenever a register RISES (max-merge is
 * monotone, so updates are append-only — no retractions, exactly the
 * property that makes HLL streamable).
 *
 * State is one ≤ 2^p-entry map per source in the streaming state
 * store, co-partitioned by source — the check is a local max, never
 * a join against history. On a STATIC DataFrame all rows form one
 * slice ⇒ the emitted rows are precisely the batch register table
 * (Sketch.hll), so the driver query runs this code path in batch
 * mode against the SAME DuckDB oracle as q_hll — one code path, two
 * execution modes (the DocStream.dedup contract).
 */
object SketchStream {

  def hllRegisters(docs: DataFrame): Dataset[HllReg] = {
    val spark = docs.sparkSession
    import spark.implicits._
    Sketch.hllRegisterRows(docs).as[RegRow]
      .groupByKey(_.source)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(merge)
  }

  private def merge(
      source: String,
      slice: Iterator[RegRow],
      state: GroupState[RegState]): Iterator[HllReg] = {
    val cur = state.getOption.map(_.regs).getOrElse(Map.empty[Long, Long])
    val sliceMax = slice.foldLeft(Map.empty[Long, Long]) { (m, r) =>
      val old = m.getOrElse(r.bucket, Long.MinValue)
      if (r.rho > old) m.updated(r.bucket, r.rho) else m
    }
    val risen = sliceMax.filter { case (b, r) =>
      r > cur.getOrElse(b, Long.MinValue)
    }
    if (risen.nonEmpty) state.update(RegState(cur ++ risen))
    risen.iterator.map { case (b, r) => HllReg(source, b, r) }
  }
}
