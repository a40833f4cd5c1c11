package graft

import org.apache.spark.sql.functions._

/** Round-3h operators: per-tool latency profile, conversation-length
 * histogram, Heaps'-law vocabulary growth. */
class Round3hSpec extends SparkSpec {

  // ---------- per-tool latency ----------

  test("toolLatency: per-tool gap stats, trailing calls excluded") {
    import spark.implicits._
    val tr = Seq(
      // c1: A at t0 (gap 2s), A at t2 (gap 5s), B at t4 (no successor)
      ("c1", 0, Some("A"), "2026-01-01 00:00:00"),
      ("c1", 1, None, "2026-01-01 00:00:02"),
      ("c1", 2, Some("A"), "2026-01-01 00:00:03"),
      ("c1", 3, None, "2026-01-01 00:00:08"),
      ("c1", 4, Some("B"), "2026-01-01 00:00:09"),
      // c2: A at t0 (gap 1s)
      ("c2", 0, Some("A"), "2026-01-01 00:00:00"),
      ("c2", 1, None, "2026-01-01 00:00:01"))
      .toDF("conv_id", "turn_idx", "tool", "tss")
      .withColumn("ts", col("tss").cast("timestamp"))
    val got = pipeline.Funnel.toolLatency(tr).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // A gaps = {2s, 5s, 1s}: n=3 min=1s max=5s median(rank 2 of 1,2,5)=2s
    assert(got == Map("A" -> ((3L, 1000000L, 5000000L, 2000000L))))
  }

  // ---------- conversation-length histogram ----------

  test("convHistogram: bit-length buckets with min/max") {
    import spark.implicits._
    val tr = (0 until 5).map(i => ("c1", i)) ++ Seq(("c2", 0), ("c2", 1)) ++
      Seq(("c3", 0)) ++ (0 until 3).map(i => ("c4", i))
    val df = tr.toDF("conv_id", "turn_idx")
    val got = pipeline.Funnel.convHistogram(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      1L -> ((1L, 1L, 1L)),   // c3 (1 turn)
      2L -> ((2L, 2L, 3L)),   // c2 (2), c4 (3)
      3L -> ((1L, 5L, 5L))))  // c1 (5)
  }

  // ---------- Heaps curve ----------

  test("heapsCurve: per-day volume, first-seen types, running totals") {
    import spark.implicits._
    val tr = Seq(
      ("c1", 0, "a b", "2026-01-01 10:00:00"),
      ("c1", 1, "b c", "2026-01-01 11:00:00"),
      ("c2", 0, "c d", "2026-01-02 10:00:00"),
      ("c3", 0, "a", "2026-01-03 10:00:00"))
      .toDF("conv_id", "turn_idx", "text", "tss")
      .withColumn("ts", col("tss").cast("timestamp"))
    val rows = pipeline.TextStats.heapsCurve(tr).orderBy("day").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      (4L, 3L, 4L, 3L),   // day 1: a b b c → 4 tokens, 3 new types
      (2L, 1L, 6L, 4L),   // day 2: c d → d is new
      (1L, 0L, 7L, 4L)))  // day 3: a → nothing new
  }
}
