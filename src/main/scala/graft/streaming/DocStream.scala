package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A document admitted by the streaming dedup (first occurrence of
 * its text). */
case class KeptDoc(doc_id: Long, text_md5: String)

private case class DocRow(doc_id: Long, text_md5: String)
private case class SeenText(keeper: Long)

/**
 * Streaming EXACT dedup over a document stream: admit a document the
 * first time its text (md5-keyed) is seen, drop every later copy —
 * the ingest-time half of the dedup story (the batch half,
 * pipeline/Dedup, dedups the corpus at rest; this gate keeps an
 * APPEND-ONLY curated stream clean as crawl batches arrive).
 *
 * State = one (text_md5 → keeper doc_id) entry per distinct text seen
 * — keyed state co-partitioned by Spark's streaming state store, so
 * at scale each text hash lives on exactly one partition and the
 * check is a local lookup, never a join against the corpus-at-rest.
 * With `stateTtl` set, hashes idle that long are evicted (sliding
 * dedup horizon — the standard memory/recall tradeoff for unbounded
 * crawls; evicted ⇒ a much-later copy is re-admitted).
 *
 * Within one micro-batch the keeper is the MIN doc_id of the slice
 * (deterministic under batch replay); across batches, first arrival
 * wins. On a STATIC DataFrame all rows form one slice, so batch-mode
 * output = exact-dedup keepers (pipeline/Dedup.exact) — one code
 * path, two execution modes, shared DuckDB oracle (q_stream_dedup).
 */
object DocStream {

  def dedup(docs: DataFrame, stateTtl: Option[String] = None): Dataset[KeptDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = docs
      .select(col("doc_id").cast("long").as("doc_id"), md5(col("text")).as("text_md5"))
      .as[DocRow]
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    rows
      .groupByKey(_.text_md5)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(admit(stateTtl))
  }

  private def admit(stateTtl: Option[String])(
      textMd5: String,
      slice: Iterator[DocRow],
      state: GroupState[SeenText]): Iterator[KeptDoc] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val out =
        if (state.exists) Iterator.empty // already admitted — drop copies
        else {
          val keeper = slice.map(_.doc_id).min
          state.update(SeenText(keeper))
          Iterator.single(KeptDoc(keeper, textMd5))
        }
      stateTtl.foreach(state.setTimeoutDuration)
      out
    }
  }
}
