package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.sources.{EdgeBuilder, Transcripts}
import graft.streaming.EdgeStream

/** Incremental (Structured Streaming) edge ingest: the accumulated
 * stream output must equal the batch EdgeBuilder on the same input —
 * including conversations split across micro-batch boundaries, where
 * the adj seam edge depends on the flatMapGroupsWithState cursor. */
class StreamingSpec extends SparkSpec {

  test("stream ≡ batch: cross-batch conversation seams produce the exact batch edge set") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val batch1 = Seq(
      ("c0", 0, None), ("c0", 1, Some("t9")), ("c0", 2, None),
      ("c1", 0, None), ("c1", 1, None))
    val batch2 = Seq(
      ("c0", 3, None), ("c0", 4, Some("t9")), // c0 continues: seam 2→3
      ("c1", 2, None), // c1 continues: seam 1→2
      ("c2", 0, Some("t3"))) // new conv arriving late

    val input = MemoryStream[(String, Int, Option[String])]
    val edges = EdgeStream.edges(
      input.toDF().toDF("conv_id", "turn_idx", "tool"))
    val q = edges.writeStream
      .format("memory").queryName("edges_sink").outputMode("append").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("edges_sink").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3))).toSet
    val expected = EdgeBuilder.keyEdges(
      (batch1 ++ batch2).toDF("conv_id", "turn_idx", "tool")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3))).toSet
    assert(got == expected)
    assert(got.contains(("c0#2", "c0#3", "adj", 1.0)), "seam edge across the batch boundary")
    assert(got.contains(("c0#4", "T#t9", "tool", 2.0)))
  }

  test("batch-mode parity: the streaming operator on a static table equals EdgeBuilder") {
    // one code path, two execution modes — Spark runs the stateful
    // operator per-group when the input is static
    val tr = Transcripts.synthetic(spark, numConvs = 40, turnsPerConv = 6, numTools = 7)
    val got = EdgeStream.edges(tr).collect()
      .map(e => (e.src_key, e.dst_key, e.kind, e.weight)).toSet
    val expected = EdgeBuilder.keyEdges(tr).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3))).toSet
    assert(got == expected)
    assert(expected.nonEmpty)
  }

  test("stale replays do not corrupt the adjacency chain") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Int, Option[String])]
    val edges = EdgeStream.edges(input.toDF().toDF("conv_id", "turn_idx", "tool"))
    val q = edges.writeStream
      .format("memory").queryName("edges_replay").outputMode("append").start()
    try {
      input.addData(("c9", 0, None), ("c9", 1, None))
      q.processAllAvailable()
      input.addData(("c9", 1, None), ("c9", 2, None)) // turn 1 replayed late
      q.processAllAvailable()
    } finally q.stop()
    val adj = spark.table("edges_replay").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(adj == Set(("c9#0", "c9#1"), ("c9#1", "c9#2")),
      s"replayed turn must not fork or duplicate the chain: $adj")
  }
}
