package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.algos.PageRankInc
import graft.pipeline.{Multimodal, Similarity}
import graft.syntax._

/** Round-5 additions: the real AVI video codec, the dangling-only
 * PageRankInc round (oracle-parity absorb), the LSH-bucketed scale
 * mode of mutual-kNN/DBSCAN, the binary edge-list fixture round trip,
 * and the symlink-resolved snapshot-expiry path canon. */
class Round5Spec extends SparkSpec {

  // ---------- real AVI codec ----------

  private def le32(x: Long): String =
    f"${x & 0xFF}%02X${(x >> 8) & 0xFF}%02X${(x >> 16) & 0xFF}%02X${(x >> 24) & 0xFF}%02X"
  private def le16(x: Long): String = f"${x & 0xFF}%02X${(x >> 8) & 0xFF}%02X"

  test("decodeAvi: hand-built 1x1 2-frame AVI decodes byte-exactly") {
    import spark.implicits._
    // w=1, h=1 → row stride 4, frame size 4; 2 frames; 40000 µs/frame
    val fs = 4L; val nf = 2L
    val hex =
      "52494646" + le32(216 + nf * (fs + 8)) + "41564920" +
        "4C495354" + le32(192) + "6864726C" +
        "61766968" + le32(56) +
        le32(40000) + le32(0) + le32(0) + le32(0) +
        le32(nf) + le32(0) + le32(1) + le32(fs) + le32(1) + le32(1) +
        le32(0) + le32(0) + le32(0) + le32(0) +
        "4C495354" + le32(116) + "7374726C" +
        "73747268" + le32(56) +
        "76696473" + "44494220" + le32(0) + le16(0) + le16(0) +
        le32(0) + le32(1) + le32(25) + le32(0) + le32(nf) + le32(fs) +
        le32(10000) + le32(0) + le16(0) + le16(0) + le16(1) + le16(1) +
        "73747266" + le32(40) +
        le32(40) + le32(1) + le32(1) + le16(1) + le16(24) + le32(0) +
        le32(fs) + le32(2835) + le32(2835) + le32(0) + le32(0) +
        "4C495354" + le32(4 + nf * (fs + 8)) + "6D6F7669" +
        "30306462" + le32(fs) + "01020300" + // frame 0: B=1 G=2 R=3, pad
        "30306462" + le32(fs) + "0A141E00" // frame 1: B=10 G=20 R=30, pad
    val avis = Seq((7L, hex)).toDF("media_id", "hx")
      .select(col("media_id"), unhex(col("hx")).as("avi"))
    val rows = Multimodal.decodeAvi(avis).collect()
      .map(r => r.getLong(1) -> r).toMap
    assert(rows.keySet == Set(0L, 1L))
    rows.values.foreach { r =>
      assert(r.getLong(2) == 1L && r.getLong(3) == 1L, "width/height")
      assert(r.getLong(4) == 2L, "n_frames")
      assert(r.getLong(5) == 40000L, "us_per_frame")
      assert(r.getLong(6) == 1L, "frame_ok")
      assert(r.getLong(7) == 1L, "n_pixels")
    }
    assert((rows(0L).getLong(8), rows(0L).getLong(9), rows(0L).getLong(10)) == ((1L, 2L, 3L)))
    assert((rows(1L).getLong(8), rows(1L).getLong(9), rows(1L).getLong(10)) == ((10L, 20L, 30L)))
  }

  test("aviTable/decodeAvi round trip recovers synthesis parameters exactly") {
    import spark.implicits._
    // doc_id 0: w=2 h=2 nf=2 usf=33333; stride 8, fs=16; text "AB"
    // repeats with period 2 ⇒ every pixel row alternates 0x41/0x42 and
    // each channel sums to 2·(0x41+0x42) = 262 in BOTH frames.
    val docs = Seq((0L, "AB", "en", "s0", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Multimodal.decodeAvi(Multimodal.aviTable(docs)).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getLong(2) == 2L && r.getLong(3) == 2L, "width/height")
      assert(r.getLong(4) == 2L && r.getLong(5) == 33333L, "n_frames/usf")
      assert(r.getLong(6) == 1L && r.getLong(7) == 4L, "frame_ok/n_pixels")
      assert(r.getLong(8) == 262L && r.getLong(9) == 262L && r.getLong(10) == 262L,
        s"channel sums: $r")
    }
  }

  test("decodeAvi: corrupted magic yields an invalid container (no rows)") {
    import spark.implicits._
    val docs = Seq((1L, "hello world", "en", "s0", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val good = Multimodal.aviTable(docs)
    assert(Multimodal.decodeAvi(good).count() > 0)
    // flip the RIFF magic: decoder must reject, not mis-decode
    val bad = good.select(col("media_id"),
      unhex(concat(lit("DEADBEEF"), substring(hex(col("avi")), 9, 1000000000))).as("avi"))
    assert(Multimodal.decodeAvi(bad).count() == 0)
  }

  // ---------- PageRankInc: dangling-only rounds absorb (oracle parity) ----------

  test("PageRankInc absorbs active danglings in rounds with no pushing vertex") {
    import spark.implicits._
    // 0 → 1 with 1 dangling. Round 1: 0 pushes (1 also absorbs its own
    // teleport mass). Round 2: ONLY the dangling is active (its r is
    // the incoming share) — the oracle's unrolled round absorbs it
    // unconditionally; the engine must too, not exit idle early.
    val g = graphOf(Seq((0, 1)), symmetric = false)
    val inc = PageRankInc.run(g, col("weight") === 2.0) // no arrivals
    val b = 3L * (1L << 40) / 20L
    val share = 17L * b / 20L
    assert(inc.phase1Active == Seq(1L, 1L, 0L),
      s"expected push round, dangling-absorb round, idle; got ${inc.phase1Active}")
    val p = byIndex(g, inc.state, "p").map { case (k, v) => k -> v.asInstanceOf[Long] }
    val r = byIndex(g, inc.state, "r").map { case (k, v) => k -> v.asInstanceOf[Long] }
    assert(p(0) == b && r(0) == 0L)
    assert(p(1) == b + share, s"dangling absorbed mass: ${p(1)} vs ${b + share}")
    assert(r(1) == 0L)
    inc.state.graftFree()
    g.unpersist()
  }

  // ---------- LSH-bucketed scale mode for mutual-kNN / DBSCAN ----------

  private def twoClusters = {
    import spark.implicits._
    Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (1L, Array(1f, 0f, 0f, 0f), 0),
      (2L, Array(1f, 0f, 0f, 0f), 0),
      (3L, Array(0f, 1f, 0f, 0f), 1),
      (4L, Array(0f, 1f, 0f, 0f), 1),
      (5L, Array(0f, 1f, 0f, 0f), 1)).toDF("vec_id", "embedding", "label")
  }

  test("knnClusters: LSH scale mode agrees with the exact mode") {
    val emb = twoClusters
    def clusters(planes: Int): Map[Long, Long] =
      Similarity.knnClusters(emb, k = 2, numPartitions = numPartitions,
        planes = planes).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = clusters(0)
    val scale = clusters(4)
    assert(exact == scale, s"exact $exact vs scale $scale")
    assert(exact.values.toSet.size == 2, "two clusters expected")
  }

  test("dbscan: LSH scale mode agrees with the exact mode") {
    val emb = twoClusters
    def run(planes: Int): Set[(Long, Long, String, Long)] =
      Similarity.dbscan(emb, simThresholdE4 = 3300, minPts = 2,
        numPartitions = numPartitions, planes = planes).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    val exact = run(0)
    val scale = run(4)
    assert(exact == scale, s"exact $exact vs scale $scale")
    assert(exact.forall(_._3 == "core"), "all duplicates are cores at minPts=2")
  }

  test("plan pin: LSH scale mode plans NO cartesian / nested-loop join") {
    def executedStr(df: DataFrame): String = {
      df.count()
      val p: SparkPlan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.finalPhysicalPlan
        case p0 => p0
      }
      p.toString
    }
    val emb = twoClusters
    val scalePlan = executedStr(Similarity.mutualKnnHalf(emb, 2, planes = 4))
    assert(!scalePlan.contains("CartesianProduct") &&
      !scalePlan.contains("BroadcastNestedLoop"),
      s"scale mode must join on bucket, got:\n$scalePlan")
    // the exact mode IS the deliberate quadratic baseline — pin that
    // the difference is real (same code path would make the pin vacuous)
    val exactPlan = executedStr(Similarity.mutualKnnHalf(emb, 2))
    assert(exactPlan.contains("CartesianProduct") ||
      exactPlan.contains("BroadcastNestedLoop"),
      "exact mode is expected to be the quadratic kernel")
  }

  // ---------- binary edge-list fixture round trip ----------

  test("GeminiEdgeList.writeFixture/read round-trips LE uint32 pairs") {
    val rows = Array((0L, 1L), (1L, 2L), (4294967295L, 7L)) // incl. max uint32
    val path = java.nio.file.Files.createTempFile("graft-gembin", ".bin").toString
    sources.GeminiEdgeList.writeFixture(rows, path)
    assert(java.nio.file.Files.size(java.nio.file.Paths.get(path)) == 24)
    val got = sources.GeminiEdgeList.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq == rows.toSeq.sorted)
  }

  // ---------- symlinked snapshot-table path canon ----------

  test("expireSnapshots survives a SYMLINKED table path spelling") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val table = java.nio.file.Files.createTempDirectory("graft-symlink").toString
    val buckets = (0L until 8L).map(i => (i, (i / 4).toInt)).toDF("id", "bucket")
    val e0 = (0L until 8L).map(i => (i, i + 100L, 1.0)).toDF("src", "dst", "weight")
    val e1 = (0L until 8L).map(i => (i, i + 100L, 2.0)).toDF("src", "dst", "weight")
    assert(SnapshotTable.commit(e0, buckets, table) == 0)
    assert(SnapshotTable.commit(e1, buckets, table) == 1)
    val keep = SnapshotTable.read(spark, table, Some(1))
      .select("src", "dst", "weight").collect().map(_.toSeq).toSet
    // expire through a SYMLINK to the table directory: normalize-only
    // canon would compare the symlink spelling against the real-path
    // manifest locs, mark every live dir orphaned, and delete data
    val link = java.nio.file.Paths.get(table + "-link")
    java.nio.file.Files.createSymbolicLink(link, java.nio.file.Paths.get(table))
    assert(SnapshotTable.expireSnapshots(link.toString, retain = 1) == Seq(0))
    val after = SnapshotTable.read(spark, table, Some(1))
      .select("src", "dst", "weight").collect().map(_.toSeq).toSet
    assert(after == keep, "retained snapshot lost data after symlinked-path expiry")
  }
}
