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

  // ---------- chat lint ----------

  test("chatLint: flags, role runs, and the trainable-conversation gate") {
    import spark.implicits._
    val tr = Seq(
      // c1: user,user,assistant,tool → 3 runs, ok
      ("c1", 0, "user", None: Option[String]),
      ("c1", 1, "user", None),
      ("c1", 2, "assistant", None),
      ("c1", 3, "tool", Some("T")),
      // c2: assistant first → not ok
      ("c2", 0, "assistant", None),
      ("c2", 1, "user", None),
      // c3: user only, no assistant → not ok
      ("c3", 0, "user", None))
      .toDF("conv_id", "turn_idx", "role", "tool")
    val got = pipeline.Funnel.chatLint(tr).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(got("c1") == (("user", "tool", 1L, 1L, 3L, 1L)))
    assert(got("c2") == (("assistant", "user", 1L, 0L, 2L, 0L)))
    assert(got("c3") == (("user", "user", 0L, 0L, 1L, 0L)))
  }

  // ---------- context budget ----------

  test("ctxBudget: prefix fit and head-truncation loss") {
    import spark.implicits._
    val tr = Seq(
      // c1: 3+4+2 tokens, budget 6 → turns 1 fits (3), turn 2 cum 7 > 6
      ("c1", 0, "a b c"), ("c1", 1, "d e f g"), ("c1", 2, "h i"),
      // c2: 2 tokens → everything fits
      ("c2", 0, "x y"))
      .toDF("conv_id", "turn_idx", "text")
    val got = pipeline.Funnel.ctxBudget(tr, budget = 6L).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got("c1") == ((3L, 9L, 1L, 6L)))
    assert(got("c2") == ((1L, 2L, 1L, 0L)))
  }

  // ---------- boilerplate ----------

  test("boilerplate: cross-conversation recurring texts only, ordered") {
    import spark.implicits._
    val tr = Seq(
      ("c1", 0, "hello"), ("c2", 0, "hello"), ("c3", 0, "hello"),
      ("c1", 1, "bye"), ("c2", 1, "bye"),
      ("c1", 2, "unique"), ("c1", 3, "solo"), ("c1", 4, "solo"))
      .toDF("conv_id", "turn_idx", "text")
    val got = pipeline.TextStats.boilerplate(tr, minConvs = 2, k = 10)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // "solo" repeats but only inside c1 → excluded; hello(3) before bye(2)
    assert(got.toSeq == Seq((3L, 3L), (2L, 2L)))
  }

  // ---------- eigenvector centrality ----------

  /** Naive replay of the exact integer power-iteration dynamic. */
  private def eigenNaive(n: Int, pairs: Seq[(Int, Int)], rounds: Int,
      scale: Long = 1000000L): Map[Int, Long] = {
    val nbrs = (pairs ++ pairs.map(_.swap)).distinct
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var x = (0 until n).map(_ => scale).toArray
    for (_ <- 1 to rounds) {
      val raw = (0 until n).map(v =>
        nbrs.getOrElse(v, Seq.empty).map(u => x(u)).sum).toArray
      val m = raw.max
      x = raw.map(s => if (m == 0L) 0L else s * scale / m)
    }
    (0 until n).map(i => i -> x(i)).toMap
  }

  test("eigen: hub of a star saturates, leaves split evenly") {
    // star: center 0, leaves 1..4 — bipartite, so the exact dynamic
    // alternates between (1e6, 250000·leaves) and all-1e6; the naive
    // replay is the ground truth, center saturates at every round.
    val pairs = Seq((0, 1), (0, 2), (0, 3), (0, 4))
    val g = graphOf(pairs, symmetric = true)
    val got = byIndex(g, algos.EigenCentrality.run(g, iterations = 6).eigen,
      "eigen_x")
    val want = eigenNaive(5, pairs, 6)
    assert(got == want.map { case (k, v) => k -> (v: Any) })
    assert(got(0) == 1000000L)
    g.unpersist()
  }

  test("eigen matches the naive integer replay on a random graph") {
    val rnd = new scala.util.Random(7)
    val n = 12
    val pairs = (0 until 3 * n).map(_ => (rnd.nextInt(n), rnd.nextInt(n)))
      .filter(p => p._1 != p._2).map(p => (p._1 min p._2, p._1 max p._2))
      .distinct
    val g = graphOf(pairs, symmetric = true)
    val got = byIndex(g, algos.EigenCentrality.run(g, iterations = 6).eigen,
      "eigen_x")
    // vertices absent from any pair don't exist in the graph; compare
    // only ids the graph knows
    val present = got.keySet
    val want = eigenNaive(n, pairs, 6).filter(kv => present(kv._1))
    assert(got == want.map { case (k, v) => k -> (v: Any) })
    g.unpersist()
  }

  // ---------- targeted-attack census ----------

  test("attack: removing the hub shatters the star into singletons") {
    // two stars joined at their centers: 0-(1,2,3), 4-(5,6), 0-4.
    // deg(0)=4, deg(4)=3. k=1 removes 0 → components {1},{2},{3},
    // {4,5,6}: three size-1 (bucket 1) + one size-3 (bucket 2).
    val pairs = Seq((0, 1), (0, 2), (0, 3), (4, 5), (4, 6), (0, 4))
    val g = graphOf(pairs, symmetric = true)
    val got = algos.Attack.census(g, k = 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(1L -> ((3L, 1L, 1L)), 2L -> ((1L, 3L, 3L))))
    g.unpersist()
  }

  test("attack: k=0 census equals the plain component census") {
    val pairs = Seq((0, 1), (1, 2), (3, 4))
    val g = graphOf(pairs, symmetric = true)
    val got = algos.Attack.census(g, k = 0).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // components {0,1,2} (bucket 2) and {3,4} (bucket 2)
    assert(got == Map(2L -> ((2L, 2L, 3L))))
    g.unpersist()
  }

  // ---------- embedding-norm census ----------

  test("normCensus: exact quantized norms, zero vector in bucket 1") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),        // norm2_q = 1e12
      (1L, Array(0.5f, 0.5f)),        // 2·(5e5)² = 5e11
      (2L, Array(0.0f, 0.0f)),        // zero vector
      (3L, Array(0.001f, 0.0f, 0.0f)) // 3 dims, xq=1000 → 1e6
    ).toDF("vec_id", "embedding")
    val got = pipeline.Similarity.normCensus(emb).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(0L) == ((2L, 1000000000000L, 40L)))
    assert(got(1L) == ((2L, 500000000000L, 39L)))
    assert(got(2L) == ((2L, 0L, 1L)))
    assert(got(3L) == ((3L, 1000000L, 20L)))
  }

  // ---------- bidirectional BFS ----------

  test("bidirBfs: path distance, same-vertex zero, disconnected -1") {
    val g = graphOf(Seq((0, 1), (1, 2), (2, 3), (3, 4), (5, 6)), symmetric = true)
    val idx = indexOf(g).map(_.swap)
    assert(algos.BidirBfs.dist(g, idx(0), idx(4)).dist == 4L)
    assert(algos.BidirBfs.dist(g, idx(2), idx(2)).dist == 0L)
    assert(algos.BidirBfs.dist(g, idx(0), idx(6)).dist == -1L)
    g.unpersist()
  }

  test("bidirBfs agrees with single-source BFS levels on a random graph") {
    val rnd = new scala.util.Random(13)
    val n = 14
    val pairs = (0 until 2 * n).map(_ => (rnd.nextInt(n), rnd.nextInt(n)))
      .filter(p => p._1 != p._2).distinct
    val g = graphOf(pairs, symmetric = true)
    val idx = indexOf(g).map(_.swap)
    val present = idx.keySet.toSeq.sorted
    val s = idx(present.head)
    val levels = byIndex(g, algos.Bfs.run(g, s).tree, "level")
      .map { case (k, v) => k -> v.asInstanceOf[Int].toLong }
    for (t <- present.drop(1).take(5)) {
      val want = levels.getOrElse(t, -1L)
      assert(algos.BidirBfs.dist(g, s, idx(t)).dist == want, s"t=$t")
    }
    g.unpersist()
  }

  // ---------- R-MAT generator ----------

  test("rmat: bit-exact md5 replay, vertex range, determinism") {
    val scale = 6
    val got = sources.RMat.edges(spark, n = 32L, scale = scale).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    def h(i: Long, l: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"rmat|$i|$l".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 4), 16)
    }
    val want = (0L until 32L).map { i =>
      var src = 0L; var dst = 0L
      for (l <- 0 until scale) {
        val hh = h(i, l)
        if (hh >= 49152) src |= 1L << (scale - 1 - l)
        if ((hh >= 36864 && hh < 49152) || hh >= 61440) dst |= 1L << (scale - 1 - l)
      }
      (i, src, dst)
    }
    assert(got.toSeq == want)
    assert(got.forall(e => e._2 >= 0 && e._2 < 64 && e._3 >= 0 && e._3 < 64))
  }

  // ---------- sequential patterns ----------

  test("toolSeqPatterns: ordered support, below-support pairs dropped") {
    import spark.implicits._
    val tr = Seq(
      ("c1", 0, Some("A")), ("c1", 2, Some("B")), ("c1", 4, Some("A")),
      ("c2", 0, Some("A")), ("c2", 1, Some("B")),
      ("c2", 2, None: Option[String]))
      .toDF("conv_id", "turn_idx", "tool")
    val got = pipeline.Cooccur.toolSeqPatterns(tr, k = 10, minSupport = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // (A→B) in both convs; (B→A) only in c1 (support 1 < 2)
    assert(got.toSeq == Seq(("A", "B", 2L)))
  }

  // ---------- stale tools ----------

  test("staleTools: age vs corpus max day, stale flag past threshold") {
    import spark.implicits._
    val tr = Seq(
      ("c1", 0, Some("A"), "2026-01-01 00:00:00"),
      ("c2", 0, Some("A"), "2026-01-10 00:00:00"),
      ("c3", 0, Some("B"), "2026-01-01 00:00:00"))
      .toDF("conv_id", "turn_idx", "tool", "tss")
      .withColumn("ts", col("tss").cast("timestamp"))
    val got = pipeline.Cooccur.staleTools(tr, staleDays = 7).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got("A") == ((0L, 2L, 0L)))
    assert(got("B") == ((9L, 1L, 1L)))
  }

  // ---------- SQ-8 codes ----------

  test("sq8Codes: per-dim integer grid, constant dims code to 0") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.5f, 1.0f))).toDF("vec_id", "embedding")
    val got = pipeline.Similarity.sq8Codes(emb).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // dim0 grid [0,1e6]: codes 0/255/127; dim1 grid [0,1e6]: 0/0/255
    assert(got(0L) == ((2L, 0L, 0L, 0L)))
    assert(got(1L) == ((2L, 255L, 0L, 255L)))
    assert(got(2L) == ((2L, 382L, 127L, 255L)))
  }

  // ---------- landmark distance oracle ----------

  test("distOracle: est = min over landmarks of d(a,l)+d(l,b)") {
    val g = graphOf(Seq((0, 1), (1, 2), (2, 3)), symmetric = true)
    val idx = indexOf(g).map(_.swap)
    val dists = algos.MultiSourceBfs.run(g, Seq(idx(0))).dists
    val got = algos.MultiSourceBfs
      .distOracle(dists, g.vertices, Seq((idx(1), idx(3))))
      .collect().map(r => r.getLong(2))
    // only landmark is vertex 0: est = d(1,0)+d(0,3) = 1+3 = 4 ≥ true 2
    assert(got.toSeq == Seq(4L))
    g.unpersist()
  }

  // ---------- order-2 tool Markov ----------

  test("toolMarkov2: trigrams with conditional share") {
    import spark.implicits._
    val tr = Seq(
      ("c1", 0, Some("A")), ("c1", 1, Some("B")), ("c1", 2, Some("A")),
      ("c1", 3, Some("B")), ("c1", 4, None: Option[String]))
      .toDF("conv_id", "turn_idx", "tool")
    val got = pipeline.Funnel.toolMarkov2(tr).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == Set(("A", "B", "A", 1L, 10000L), ("B", "A", "B", 1L, 10000L)))
  }

  // ---------- gap histogram ----------

  test("gapHistogram: zero gaps bucket 0, pow-2 buckets otherwise") {
    import spark.implicits._
    val tr = Seq(
      ("c1", 0, "2026-01-01 00:00:00"), ("c1", 1, "2026-01-01 00:00:00"),
      ("c1", 2, "2026-01-01 00:00:01"))
      .toDF("conv_id", "turn_idx", "tss")
      .withColumn("ts", col("tss").cast("timestamp"))
    val got = pipeline.Funnel.gapHistogram(tr).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // 10^6 µs has bit-length 20 (2^19 ≤ 10^6 < 2^20)
    assert(got == Map(0L -> ((1L, 0L, 0L)), 20L -> ((1L, 1000000L, 1000000L))))
  }

  // ---------- bow-tie decomposition ----------

  test("bowTie: cycle core, upstream in, downstream out, rest other") {
    // core = cycle 1→2→3→1; 0→1 feeds it (IN); 3→4 drains (OUT);
    // 0→7 is an IN-tendril and 5→6 a separate component (both OTHER)
    val g = graphOf(Seq((0, 1), (1, 2), (2, 3), (3, 1), (3, 4), (5, 6), (0, 7)),
      symmetric = false)
    val got = algos.BowTie.census(g).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("core" -> 3L, "in" -> 1L, "out" -> 1L, "other" -> 3L))
    g.unpersist()
  }

  // ---------- degree correlation ----------

  test("degCorr sufficient statistics on a hand graph") {
    val g = graphOf(Seq((0, 1), (0, 2), (1, 2)), symmetric = false)
    val r = g.degrees.agg(
      count(lit(1)), sum(col("out_degree")), sum(col("in_degree")),
      sum(col("out_degree") * col("out_degree")),
      sum(col("in_degree") * col("in_degree")),
      sum(col("in_degree") * col("out_degree"))).first()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((3L, 3L, 3L, 5L, 5L, 1L)))
    g.unpersist()
  }

  // ---------- per-tool distinctive terms ----------

  test("toolTopTerms: integer lift ranks the tool-specific token first") {
    import spark.implicits._
    val tr = Seq(
      ("c1", 0, Some("X"), "alpha alpha alpha"),
      ("c1", 1, None: Option[String], "beta beta beta"),
      ("c2", 0, Some("Y"), "gamma gamma gamma beta"))
      .toDF("conv_id", "turn_idx", "tool", "text")
    val got = pipeline.Cooccur.toolTopTerms(tr, k = 3, minSupport = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    // N=10; X: lift(alpha) = 3·10·1e4 div (3·3) = 33333
    // Y: lift(gamma) = 3·10·1e4 div (4·3) = 25000; beta support 1 < 3
    assert(got == Set(
      ("X", "alpha", 3L, 33333L, 1L),
      ("Y", "gamma", 3L, 25000L, 1L)))
  }

  // ---------- feature hashing ----------

  test("hashFeatures: md5 dims and signs replay bit-exactly") {
    import spark.implicits._
    val tr = Seq(("c1", 0, "aa bb aa"), ("c2", 0, "cc"))
      .toDF("conv_id", "turn_idx", "text")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def dim(w: String) = java.lang.Long.parseLong(md5hex(w).substring(0, 4), 16) % 16
    def sign(w: String) =
      if (java.lang.Long.parseLong(md5hex(w).substring(4, 5), 16) % 2 == 0) 1L else -1L
    val expect = Seq("aa" -> "c1", "bb" -> "c1", "aa" -> "c1", "cc" -> "c2")
      .groupBy { case (w, c) => (c, dim(w)) }
      .map { case ((c, d), ws) =>
        (c, d, ws.size.toLong, ws.map(x => sign(x._1)).sum) }
      .toSet
    val got = pipeline.Extract.hashFeatures(tr).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expect)
  }

  // ---------- R-MAT roundtrip ----------

  test("rmat histogram: dedup + self-loop drop replayed naively") {
    val e = sources.RMat.edges(spark, n = 500L, scale = 6).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val deg = e.filter(p => p._1 != p._2).distinct.groupBy(_._1)
      .map { case (_, es) => es.size.toLong }
    val expect = deg.groupBy(d => java.lang.Long.toBinaryString(d).length.toLong)
      .map { case (b, ds) => b -> ((ds.size.toLong, ds.min, ds.max)) }
    val g = graft.LinkGraph.fromIdEdges(
      sources.RMat.edges(spark, n = 500L, scale = 6)
        .select(col("src"), col("dst")),
      64L, symmetric = false, numPartitions = 4)
    val got = graft.algos.DegreeStats.histogram(g).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expect)
    g.unpersist()
  }

  // ---------- landmark distance census ----------

  test("distCensus: path graph from one root counts one pair per level") {
    val g = graphOf(Seq((0, 1), (1, 2)), symmetric = true)
    val root = indexOf(g).collectFirst { case (id, 0) => id }.get
    val got = algos.MultiSourceBfs.distCensus(
      algos.MultiSourceBfs.run(g, Seq(root)).dists).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
    g.unpersist()
  }

  // ---------- daily volume anomalies ----------

  test("dailyAnomalies: a 10x spike day flags, steady days don't") {
    import spark.implicits._
    val rows = (1 to 10).flatMap(d =>
      (0 until 10).map(i => (s"c$d-$i", 0, f"2026-01-$d%02d 12:00:00"))) ++
      (0 until 100).map(i => (s"cs-$i", 0, "2026-01-11 12:00:00"))
    val tr = rows.toDF("conv_id", "turn_idx", "tss")
      .withColumn("ts", col("tss").cast("timestamp"))
    val got = pipeline.Profile.dailyAnomalies(tr, kSigma = 2).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(100L) == ((1L, 0L))) // the spike day
    assert(got(10L) == ((0L, 0L)))  // steady days
  }

  // ---------- topic drift ----------

  test("halfDrift: half-overlap Jaccard, single-turn scores zero") {
    import spark.implicits._
    val tr = Seq(
      ("c1", 0, "a b"), ("c1", 1, "c"), ("c1", 2, "a d"), ("c1", 3, "e"),
      ("c2", 0, "x y"))
      .toDF("conv_id", "turn_idx", "text")
    val got = pipeline.Segment.halfDrift(tr).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // c1: first {a,b,c} second {a,d,e} → inter 1, union 5, 2000
    assert(got("c1") == ((1L, 5L, 2000L)))
    assert(got("c2") == ((0L, 2L, 0L)))
  }

  // ---------- column profile ----------

  test("columnProfile: nulls and exact distincts per column") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), "x"), (2L, None, "x"), (3L, Some("a"), "y"))
      .toDF("id", "s", "t")
    val got = pipeline.Profile.columnProfile(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      "id" -> ((3L, 0L, 3L)),
      "s" -> ((3L, 1L, 1L)),   // count_distinct skips nulls
      "t" -> ((3L, 0L, 2L))))
  }

  // ---------- mojibake ----------

  test("mojibake: replacement chars and non-printables counted") {
    import spark.implicits._
    val docs = Seq(
      (1L, "clean ascii text"),
      (2L, "bad � byte �"),
      (3L, "ctrl\u0007char\u00e9"), // BEL and \u00e9 are non-printable-ASCII
      (4L, "")).toDF("doc_id", "text")
    val got = pipeline.Profile.mojibake(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got(1L) == ((16L, 0L, 0L, 0L)))
    assert(got(2L) == ((12L, 2L, 2L, 1666L)))
    assert(got(3L) == ((10L, 2L, 0L, 2000L)))
    assert(got(4L) == ((0L, 0L, 0L, 0L)))
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
