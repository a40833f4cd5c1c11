package graft

import org.apache.spark.sql.functions._

/** Round-3i operators: TextRank turn salience. */
class Round3iSpec extends SparkSpec {

  // ---------- TextRank ----------

  test("textrank: star conversation ranks the hub first, exact integer trajectory") {
    import spark.implicits._
    val tr = Seq(
      // c1: t0—t1 (w=2) both at the symmetric fixpoint 10^6; t2/t3 edgeless
      ("c1", 0, "alpha beta gamma"),
      ("c1", 1, "alpha beta delta"),
      ("c1", 2, "alpha epsilon zeta"), // shares only 1 token — below minShared
      ("c1", 3, "unrelated words here"),
      // c2: star — t0 shares 2 tokens with each leaf, leaves share nothing
      ("c2", 0, "x1 y1 x2 y2 x3 y3"),
      ("c2", 1, "x1 y1 p q"),
      ("c2", 2, "x2 y2 r s"),
      ("c2", 3, "x3 y3 u v"))
      .toDF("conv_id", "turn_idx", "text")
    val got = pipeline.TextRank.turnSalience(tr).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      // c1: symmetric pair stays at the 10^6 fixpoint; tie → lower idx
      ("c1", 0L) -> ((1000000L, 1L)),
      ("c1", 1L) -> ((1000000L, 2L)),
      // c2 after 4 integer rounds (hand-replayed): hub 1439236,
      // leaves 853587; top-3 keeps hub + first two leaves
      ("c2", 0L) -> ((1439236L, 1L)),
      ("c2", 1L) -> ((853587L, 2L)),
      ("c2", 2L) -> ((853587L, 3L))))
  }

  // ---------- burstiness ----------

  test("toolBurstiness: Fano factor over the lifetime span, zero days implicit") {
    import spark.implicits._
    val tr = Seq(
      // A: 2 calls day 0, 1 call day 2 → D=3, S=3, Σx²=5 → ⌊10⁴·6/9⌋
      ("c1", 0, Some("A"), "2026-01-01 00:00:00"),
      ("c1", 1, Some("A"), "2026-01-01 12:00:00"),
      ("c2", 0, Some("A"), "2026-01-03 00:00:00"),
      // B: single call → degenerate 0
      ("c3", 0, Some("B"), "2026-01-01 00:00:00"))
      .toDF("conv_id", "turn_idx", "tool", "tss")
      .withColumn("ts", col("tss").cast("timestamp"))
    val got = pipeline.Funnel.toolBurstiness(tr).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == Map(
      "A" -> ((3L, 2L, 3L, 6666L)),
      "B" -> ((1L, 1L, 1L, 0L))))
  }

  // ---------- PageRank-vs-degree correlation ----------

  test("prDegCorr wiring: sufficient statistics equal a per-vertex recompute") {
    val g = graphOf(Seq((0, 1), (0, 2), (1, 2), (2, 3)), symmetric = false)
    val pr = algos.PageRank.run(g, iterations = 5).ranks
      .select(col("id"), round(col("rank") * 100000).cast("long").as("r"))
    val rows = g.degrees.select(col("id"), col("out_degree").as("d"))
      .join(pr, "id").collect().map(r => (r.getLong(1), r.getLong(2)))
    val agg = g.degrees.select(col("id"), col("out_degree").as("d"))
      .join(pr, "id")
      .agg(count(lit(1)), sum(col("d")), sum(col("r")),
        sum(col("d") * col("d")), sum(col("r") * col("r")),
        sum(col("d") * col("r"))).collect()(0)
    assert(agg.getLong(0) == rows.length)
    assert(agg.getLong(1) == rows.map(_._1).sum)
    assert(agg.getLong(2) == rows.map(_._2).sum)
    assert(agg.getLong(5) == rows.map(p => p._1 * p._2).sum)
    g.unpersist()
  }

  // ---------- source TV divergence ----------

  test("sourceDivergence: hand-computed TV with shared and one-sided mass") {
    import spark.implicits._
    // p_A = {x:2/3, y:1/3}, p_B = {x:1/2, z:1/2} → TV = ½(1/6+1/3+1/2) = 0.5
    val docs = Seq((1L, "x x y", "A"), (2L, "x z", "B"))
      .toDF("doc_id", "text", "source")
    val got = pipeline.TextStats.sourceDivergence(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("A", "B", 1L, 500000L)))
  }

  // ---------- temporal motifs ----------

  test("temporalMotifs: pattern classes counted, out-of-window triples dropped") {
    import spark.implicits._
    def conv(id: String, tools: Seq[String], tss: Seq[String]) =
      tools.zip(tss).zipWithIndex.map { case ((tl, ts), i) => (id, i, Option(tl), ts) }
    val tr = (
      conv("c1", Seq("A", "B", "A"),
        Seq("2026-01-01 00:00:00", "2026-01-01 00:01:00", "2026-01-01 00:02:00")) ++
      conv("c2", Seq("A", "A", "A"),
        Seq("2026-01-01 00:00:00", "2026-01-01 00:01:00", "2026-01-01 00:02:00")) ++
      conv("c3", Seq("A", "B", "C"),
        Seq("2026-01-01 00:00:00", "2026-01-01 00:01:00", "2026-01-01 00:02:00")) ++
      // span 3 days > δ: dropped
      conv("c4", Seq("A", "B", "A"),
        Seq("2026-01-01 00:00:00", "2026-01-01 00:01:00", "2026-01-04 00:00:00")) ++
      conv("c5", Seq("A", "A", "B"),
        Seq("2026-01-01 00:00:00", "2026-01-01 00:01:00", "2026-01-01 00:02:00")) ++
      conv("c6", Seq("A", "B", "B"),
        Seq("2026-01-01 00:00:00", "2026-01-01 00:01:00", "2026-01-01 00:02:00")))
      .toDF("conv_id", "turn_idx", "tool", "tss")
      .withColumn("ts", col("tss").cast("timestamp"))
    val got = pipeline.Funnel.temporalMotifs(tr).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("aba" -> 1L, "aaa" -> 1L, "abc" -> 1L, "aab" -> 1L, "abb" -> 1L))
  }

  // ---------- hitting time ----------

  test("hittingTime: path to an absorbing endpoint, exact truncated trajectory") {
    // a–b–T, T absorbing. Hand-replayed 5 rounds (10⁴ scale):
    // h(a): 10000, 20000, 25000, 30000, 32500
    // h(b): 10000, 15000, 20000, 22500, 25000  (→ 40000/30000 at ∞)
    val g = graphOf(Seq((0, 1), (1, 2)), symmetric = true)
    val got = algos.HittingTime.run(g, col("key") === keyOf(2)).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(got == Map(keyOf(0) -> 32500L, keyOf(1) -> 25000L, keyOf(2) -> 0L))
    g.unpersist()
  }

  // ---------- embedding decontamination ----------

  test("evalContamination: train vector matching an eval vector flags, orthogonal doesn't") {
    import spark.implicits._
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)), // eval (0 mod 97)
      (1L, Seq(1.0f, 0.0f)), // identical to eval → sim 10000
      (2L, Seq(0.0f, 1.0f))) // orthogonal → sim 0
      .toDF("vec_id", "embedding")
    val got = pipeline.Similarity.evalContamination(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 10000L, 1L), (2L, 0L, 0L)))
  }

  // ---------- graphlet census ----------

  test("graphlets: K4 and P4 closed-form counts") {
    def censusOf(pairs: Seq[(Int, Int)]): Seq[Long] = {
      val g = graphOf(pairs, symmetric = true)
      val r = algos.Graphlets.census4(g).collect()(0)
      val out = (0 until 9).map(r.getLong(_))
      g.unpersist()
      out
    }
    // K4: 6 edges, 12 wedges, 4 claws, 4 triangles, 12 paths,
    // 12 tailed, 3 squares, 6 diamonds, 1 clique
    assert(censusOf(Seq((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))) ==
      Seq(6L, 12L, 4L, 4L, 12L, 12L, 3L, 6L, 1L))
    // P4 path a-b-c-d: 3 edges, 2 wedges, one 3-path, all else zero
    assert(censusOf(Seq((0, 1), (1, 2), (2, 3))) ==
      Seq(3L, 2L, 0L, 0L, 1L, 0L, 0L, 0L, 0L))
  }

  // ---------- SimRank ----------

  test("simrank: shared in-neighbor pair converges to the exact integer fixpoint") {
    import spark.implicits._
    // I(A) = {u1, u2}, I(B) = {u1, u3}: only u1 is shared, so
    // s(A,B) = ⌊4·10⁶ / (5·2·2)⌋ = 200000 at round 1 and stays there
    // (A and B have no out-edges, so off-diagonal mass never compounds)
    val e = Seq(("u1", "A"), ("u1", "B"), ("u2", "A"), ("u3", "B"))
      .toDF("src_key", "dst_key")
    val got = algos.SimRank.run(e).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("A", "B", 200000L)))
  }

  // ---------- sparse tf-idf cosine ----------

  test("sparseCosinePairs: exact integer cosine, stopword-like terms excluded") {
    import spark.implicits._
    // N = 8: content-word gate keeps df ≤ 2; "common" (df=3) is cut
    val docs = (Seq(
      (1L, "apple banana cherry common"),
      (2L, "apple banana damson common"),
      (3L, "x y z common")) ++
      (4L to 8L).map(i => (i, s"f${i}a f${i}b")))
      .toDF("doc_id", "text")
    val got = pipeline.Vocab.sparseCosinePairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // idf: df=2 → bitlen(8/2)=3, df=1 → bitlen(8)=4
    // w(d1) = w(d2) = {3, 3, 4} → ‖·‖² = 34; dot = 9 + 9 = 18
    // cos2_e6 = ⌊10⁶·18²/34²⌋ = ⌊324000000/1156⌋ = 280276
    assert(got.toSeq == Seq((1L, 2L, 18L, 280276L)))
  }

  test("textrank: edgeless corpus yields an empty result") {
    import spark.implicits._
    val tr = Seq(("c1", 0, "a b"), ("c1", 1, "c d"))
      .toDF("conv_id", "turn_idx", "text")
    assert(pipeline.TextRank.turnSalience(tr).count() == 0)
  }
}
