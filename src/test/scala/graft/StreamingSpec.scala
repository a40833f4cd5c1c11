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
      input.addData(("c9", 0, None), ("c9", 1, Some("tx")))
      q.processAllAvailable()
      input.addData(("c9", 1, Some("tx")), ("c9", 2, None)) // turn 1 replayed late
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("edges_replay").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val adj = rows.toSet
    assert(adj == Set(("c9#0", "c9#1"), ("c9#1", "c9#2"), ("c9#1", "T#tx")),
      s"replayed turn must not fork or duplicate the chain: $adj")
    assert(rows.length == rows.toSet.size,
      "a replayed tool turn must not re-emit its tool edge (Append never retracts)")
  }

  test("foreachBatch sink: bucketed append across micro-batches, dedup-on-compact equals batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_").toString
    val input = MemoryStream[(String, Int, Option[String])]
    val edges = EdgeStream.edges(input.toDF().toDF("conv_id", "turn_idx", "tool"))
    val q = EdgeStream.sink(edges, s"$dir/edges", s"$dir/ckpt", numBuckets = 4)
    try {
      input.addData(("c0", 0, None), ("c0", 1, Some("t1")), ("c1", 0, Some("t2")))
      q.processAllAvailable()
      input.addData(("c0", 2, None), ("c1", 1, None))
      q.processAllAvailable()
    } finally q.stop()

    val layout = new java.io.File(s"$dir/edges").listFiles().map(_.getName).filter(_.startsWith("bucket="))
    assert(layout.nonEmpty, "sink must write a bucket=K/ partitioned layout")

    val got = EdgeStream.compactEdges(spark, s"$dir/edges").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3))).toSet
    val all = Seq(
      ("c0", 0, None), ("c0", 1, Some("t1")), ("c1", 0, Some("t2")),
      ("c0", 2, None), ("c1", 1, None))
    val expected = sources.EdgeBuilder.keyEdges(all.toDF("conv_id", "turn_idx", "tool")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3))).toSet
    assert(got == expected)
  }

  test("toolWindows: watermark finalizes closed windows and drops late rows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val batch1 = Seq(
      ("a", 0, Some("t1"), ts("2024-01-01 10:05:00")),
      ("a", 1, Some("t1"), ts("2024-01-01 10:20:00")),
      ("a", 2, Some("t2"), ts("2024-01-01 11:15:00")))
    val batch2 = Seq(("a", 3, Some("t3"), ts("2024-01-01 12:30:00")))
    val lateRow = ("a", 4, Some("t1"), ts("2024-01-01 10:40:00")) // < watermark: dropped

    val input = MemoryStream[(String, Int, Option[String], java.sql.Timestamp)]
    val windows = EdgeStream.toolWindows(
      input.toDF().toDF("conv_id", "turn_idx", "tool", "ts"))
    val q = windows.writeStream
      .format("memory").queryName("tool_windows").outputMode("append").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*) // advances watermark to 12:20 → hours 10,11 close
      q.processAllAvailable()
      input.addData(lateRow)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("tool_windows").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // expected: the batch aggregation over the on-time rows, minus the
    // still-open newest window (t3's) — and NOT the late row's count
    val batchAgg = EdgeStream.toolWindows(
      (batch1 ++ batch2).toDF("conv_id", "turn_idx", "tool", "ts")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val openWindow = batchAgg.map(_._1).max
    assert(got == batchAgg.filter(_._1 < openWindow))
    assert(got.map(_._2) == Set("t1", "t2"))
    assert(got.find(_._2 == "t1").get._3 == 2L, "late row must not inflate the finalized count")
  }

  test("convSessions: sessions merge across micro-batches and close by watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val batch1 = Seq(
      ("a", 0, None: Option[String], ts("2024-01-01 10:00:00")),
      ("a", 1, None: Option[String], ts("2024-01-01 10:10:00")),
      ("b", 0, None: Option[String], ts("2024-01-01 10:05:00")))
    val batch2 = Seq(
      ("a", 2, None: Option[String], ts("2024-01-01 10:25:00")), // < 30 min after 10:10 → merges
      ("z", 0, None: Option[String], ts("2024-01-01 13:00:00"))) // advances watermark → a, b close

    val input = MemoryStream[(String, Int, Option[String], java.sql.Timestamp)]
    val sessions = EdgeStream.convSessions(
      input.toDF().toDF("conv_id", "turn_idx", "tool", "ts"))
    val q = sessions.writeStream
      .format("memory").queryName("conv_sessions").outputMode("append").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("conv_sessions").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val batchAgg = EdgeStream.convSessions(
      (batch1 ++ batch2).toDF("conv_id", "turn_idx", "tool", "ts")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == batchAgg.filter(_._1 != "z"), "closed sessions must equal the batch merge; z still open")
    assert(got.find(_._1 == "a").get._3 == 3L, "cross-batch turn must merge into ONE session")
  }

  test("streaming doc dedup: first text wins across batches, min doc_id within a batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batch1 = Seq(
      (5L, "alpha beta gamma"),
      (7L, "delta epsilon"), (3L, "delta epsilon")) // in-batch dup → keeper 3
    val batch2 = Seq(
      (9L, "alpha beta gamma"), // cross-batch dup of 5 → dropped
      (1L, "alpha beta gamma"), // even a smaller id loses to first arrival
      (8L, "zeta eta"))
    val input = MemoryStream[(Long, String)]
    val kept = streaming.DocStream.dedup(input.toDF().toDF("doc_id", "text"))
    val q = kept.writeStream
      .format("memory").queryName("doc_dedup_sink").outputMode("append").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("doc_dedup_sink").collect().map(_.getLong(0)).toSet
    assert(got == Set(5L, 3L, 8L), s"kept $got")
  }

  test("streaming HLL registers: monotone cross-batch merge, changelog last-value equals batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batch1 = Seq((1L, "alpha beta gamma delta", "webx"))
    val batch2 = Seq((2L, "alpha beta epsilon zeta eta", "webx"),
      (3L, "one two three", "chatx"))
    val input = MemoryStream[(Long, String, String)]
    val regs = streaming.SketchStream.hllRegisters(
      input.toDF().toDF("doc_id", "text", "source"))
    val q = regs.writeStream
      .format("memory").queryName("hll_sink").outputMode("append").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    // changelog last-value per (source, bucket) == batch registers on
    // the union of both batches
    val got = spark.table("hll_sink").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    val all = (batch1 ++ batch2).toDF("doc_id", "text", "source")
    val expected = pipeline.Sketch.hll(all).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("streaming HLL in batch mode equals the batch register table") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma", "webx"), (2L, "beta delta", "webx"),
      (3L, "one two", "chatx"))
      .toDF("doc_id", "text", "source")
    val got = streaming.SketchStream.hllRegisters(docs).collect()
      .map(r => (r.source, r.bucket) -> r.max_rho).toMap
    val expected = pipeline.Sketch.hll(docs).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("streaming doc dedup in batch mode equals exact-dedup keepers") {
    import spark.implicits._
    val docs = Seq(
      (0L, "x y z"), (1L, "x y z"), (4L, "q r"), (2L, "q r"), (9L, "solo"))
      .toDF("doc_id", "text")
    val got = streaming.DocStream.dedup(docs).collect().map(_.doc_id).toSet
    val expected = pipeline.Dedup.exact(docs).collect().map(_.getLong(2)).toSet
    assert(got == expected && got == Set(0L, 2L, 9L))
  }

  test("trending tools: stream state converges to the batch score under any slicing") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val all = Seq(
      ("c1", 0, Some("A"), ts("2024-01-10 00:00:00")), // age 0 bucket
      ("c1", 1, Some("A"), ts("2024-01-02 00:00:00")), // ~2.7 buckets → b=2
      ("c2", 0, Some("B"), ts("2024-01-04 00:00:00")), // b=2
      ("c2", 1, Some("A"), ts("2023-12-01 00:00:00"))) // b=13
    val refTs = all.map(_._4.getTime * 1000L).max
    // batch truth
    val batch = streaming.ToolTrendStream.trending(
      all.toDF("conv_id", "turn_idx", "tool", "ts"), refTs)
      .collect().map(t => t.tool -> t.score_scaled).toMap
    val expA = (1L << 40) + (1L << 38) + (1L << 27)
    assert(batch == Map("A" -> expA, "B" -> (1L << 38)))
    // stream in two slices: last Update row per tool = batch total
    val input = MemoryStream[(String, Int, Option[String], java.sql.Timestamp)]
    val q = streaming.ToolTrendStream.trending(
      input.toDF().toDF("conv_id", "turn_idx", "tool", "ts"), refTs)
      .writeStream.format("memory").queryName("trend_sink").outputMode("update").start()
    try {
      input.addData(all.take(2): _*)
      q.processAllAvailable()
      input.addData(all.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("trend_sink").collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).max } // scores only grow
    assert(last == batch)
  }

  test("stream-stream interval join equals the batch join across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // (conv_id, turn_idx, text, tool, ts)
    val batch1 = Seq(
      ("a", 0, "error boom", Some("tx"), ts("2024-01-01 10:00:00")),
      ("a", 1, "purchase ok", Some("ty"), ts("2024-01-01 10:04:00")),
      ("b", 0, "purchase ok", Some("tz"), ts("2024-01-01 10:05:00")))
    val batch2 = Seq(
      ("a", 2, "purchase ok", Some("tw"), ts("2024-01-01 10:09:00")), // inside horizon, cross-batch
      ("a", 3, "purchase ok", Some("tv"), ts("2024-01-01 10:30:00"))) // outside 10-min horizon
    val input = MemoryStream[(String, Int, String, Option[String], java.sql.Timestamp)]
    val joined = EdgeStream.errorToolJoin(
      input.toDF().toDF("conv_id", "turn_idx", "text", "tool", "ts"))
    val q = joined.writeStream
      .format("memory").queryName("err_tools_sink").outputMode("append").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("err_tools_sink").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
    val expected = EdgeStream.errorToolJoin(
      (batch1 ++ batch2).toDF("conv_id", "turn_idx", "text", "tool", "ts")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
    assert(got == expected, s"stream $got vs batch $expected")
    // error's own tool call, +4 min, and the cross-batch +9 min match;
    // conversation b and the +30 min call do not
    assert(got == Set(("a", 0, 0, "tx"), ("a", 0, 1, "ty"), ("a", 0, 2, "tw")))
  }
}
