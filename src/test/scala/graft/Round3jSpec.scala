package graft

import org.apache.spark.sql.functions._

/** Round-3j operators: SALSA, linear-threshold cascade, edge
 * betweenness, Zipf census, friendship paradox. */
class Round3jSpec extends SparkSpec {

  // ---------- edge betweenness ----------

  test("edge betweenness: path graph carries downstream subtree sizes") {
    val g = graphOf(Seq((0, 1), (1, 2), (2, 3)), symmetric = true)
    val root = g.vertices.where(col("key") === keyOf(0))
      .select(col("id")).first().getLong(0)
    val idx = indexOf(g)
    val got = algos.EdgeBetweenness.run(g, root).collect()
      .map(r => (idx(r.getLong(0)), idx(r.getLong(1))) -> r.getDouble(2)).toMap
    assert(got == Map((0, 1) -> 3.0, (1, 2) -> 2.0, (2, 3) -> 1.0))
    g.unpersist()
  }

  test("edge betweenness: diamond splits flow across the two branches") {
    val g = graphOf(Seq((0, 1), (0, 2), (1, 3), (2, 3)), symmetric = true)
    val root = g.vertices.where(col("key") === keyOf(0))
      .select(col("id")).first().getLong(0)
    val idx = indexOf(g)
    val got = algos.EdgeBetweenness.run(g, root).collect()
      .map(r => (idx(r.getLong(0)), idx(r.getLong(1))) -> r.getDouble(2)).toMap
    assert(got == Map(
      (0, 1) -> 1.5, (0, 2) -> 1.5, (1, 3) -> 0.5, (2, 3) -> 0.5))
    g.unpersist()
  }

  // ---------- Zipf census ----------

  test("zipfHistogram: bit-length buckets with exact type/token totals") {
    import spark.implicits._
    val docs = Seq((1L, "a a a a b b c")).toDF("doc_id", "text")
    val got = pipeline.Vocab.zipfHistogram(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == Map(
      1L -> ((1L, 1L, 1L, 1L)), // c: tf=1
      2L -> ((1L, 2L, 2L, 2L)), // b: tf=2
      3L -> ((1L, 4L, 4L, 4L)))) // a: tf=4
  }

  // ---------- friendship paradox ----------

  test("friendshipParadox: star graph separates the two means") {
    val g = graphOf(Seq((0, 1), (0, 2), (0, 3)), symmetric = true)
    val r = algos.DegreeStats.friendshipParadox(g).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 6L, 12L)))
    assert(r.getLong(3) == 15000L) // mean degree 1.5
    assert(r.getLong(4) == 20000L) // mean neighbor degree 2.0
    g.unpersist()
  }

  // ---------- SAGE mean-pool ----------

  test("sage meanPoolLayer: path graph, floored neighbor means per dim") {
    val g = graphOf(Seq((0, 1), (1, 2)), symmetric = true)
    val idx = indexOf(g)
    val got = algos.Sage.meanPoolLayer(g).collect()
      .map(r => (idx(r.getLong(0)), r.getInt(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      // v0: deg 1, nbr = v1 (deg 2, bitlen 2)
      (0, 0) -> ((1L, 2L)), (0, 1) -> ((0L, 0L)), (0, 2) -> ((1L, 2L)),
      // v1: deg 2, nbrs v0+v2 (deg 1 each) → mean 1
      (1, 0) -> ((2L, 1L)), (1, 1) -> ((0L, 0L)), (1, 2) -> ((2L, 1L)),
      (2, 0) -> ((1L, 2L)), (2, 1) -> ((0L, 0L)), (2, 2) -> ((1L, 2L))))
    g.unpersist()
  }

  // ---------- k-anonymity ----------

  test("kAnonymity: groups below k flagged") {
    import spark.implicits._
    val docs = Seq(
      (1L, "web", "en", 10L), (2L, "web", "en", 12L), (3L, "web", "en", 9L),
      (4L, "web", "en", 15L), (5L, "web", "en", 8L),
      (6L, "chat", "fr", 100L))
      .toDF("doc_id", "source", "lang", "n_chars")
    val got = pipeline.Profile.kAnonymity(docs, k = 5).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      ("web", "en", 4L) -> ((5L, 1L)), // 8..15 all bit-length 4
      ("chat", "fr", 7L) -> ((1L, 0L))))
  }

  // ---------- max-cut local search ----------

  test("maxcut: matches a driver-side replay and never decreases the cut") {
    val pairs = Seq(
      (0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0), (1, 4), (2, 5))
    val g = graphOf(pairs, symmetric = true)
    val idx = indexOf(g)
    val got = algos.MaxCut.run(g, rounds = 4).collect()
      .map(r => idx(r.getLong(0)) -> r.getLong(1)).toMap

    // replay with the SAME Spark hash/priority expressions
    val init = g.vertices.select(col("id"),
      (expr("cast(conv(substring(md5(concat('mc|', key)), 1, 10), 16, 10) as bigint)")
        % 2).cast("long").as("side"),
      concat(substring(md5(concat(lit("mx|"), col("key"))), 1, 10),
        lit("|"), col("key")).as("pi"))
      .collect().map(r => idx(r.getLong(0)) -> ((r.getLong(1), r.getString(2)))).toMap
    val und = pairs.flatMap(p => Seq(p, p.swap))
    def nbrs(v: Int) = und.filter(_._1 == v).map(_._2)
    var side = init.map { case (v, (s, _)) => v -> s }
    def cut(s: Map[Int, Long]) = pairs.count(p => s(p._1) != s(p._2))
    var lastCut = cut(side)
    for (r <- 1 to 4) {
      val cand = side.keySet.filter { v =>
        val n = nbrs(v); n.count(side(_) == side(v)) * 2 > n.size
      }
      val flips = cand.filter(v =>
        nbrs(v).filter(cand).forall(u => init(v)._2 < init(u)._2))
      side = side.map { case (v, s) => v -> (if (flips(v)) 1L - s else s) }
      assert(cut(side) >= lastCut, s"cut decreased in round $r")
      lastCut = cut(side)
    }
    assert(got == side)
    g.unpersist()
  }

  // ---------- code likeness ----------

  test("codeLikeness: symbol density separates code from prose") {
    import spark.implicits._
    val docs = Seq(
      (1L, "for (i = 0; i < n; i++) { x[i] = y; }"),
      (2L, "plain prose with no symbols at all"))
      .toDF("doc_id", "text")
    val got = pipeline.TextStats.codeLikeness(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(4)))).toMap
    assert(got(1L)._2 == 1L) // flagged as code
    assert(got(2L) == ((0L, 0L))) // zero symbols, prose
  }

  // ---------- ACL forward push ----------

  test("pprPush: two-vertex path, hand-replayed integer pushes") {
    val g = graphOf(Seq((0, 1)), symmetric = true)
    val idx = indexOf(g)
    val seed = g.vertices.where(col("key") === keyOf(0))
      .select(col("id")).first().getLong(0)
    val got = algos.PprPush.run(g, seed, rounds = 2).state.collect()
      .map(r => idx(r.getLong(0)) -> ((r.getLong(1), r.getLong(2)))).toMap
    // round 1: seed pushes p += 2^40/4, full remainder to v1;
    // round 2: v1 pushes back
    assert(got == Map(
      0 -> ((274877906944L, 618475290624L)),
      1 -> ((206158430208L, 0L))))
    g.unpersist()
  }

  test("pprPush: mass conservation p + r = scale at every horizon") {
    val g = graphOf(
      Seq((0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (1, 4)), symmetric = true)
    val seed = g.vertices.orderBy(col("key")).select(col("id")).first().getLong(0)
    val st = algos.PprPush.run(g, seed, rounds = 6).state
      .agg(sum(col("p")), sum(col("r"))).collect()(0)
    assert(st.getLong(0) + st.getLong(1) == algos.PprPush.scale)
    g.unpersist()
  }

  // ---------- k_nn(k) curve ----------

  test("knnCurve: star graph, exact per-class sums") {
    val g = graphOf(Seq((0, 1), (0, 2), (0, 3)), symmetric = true)
    val got = algos.DegreeStats.knnCurve(g).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      3L -> ((3L, 3L, 10000L)), // hub's 3 edges all point at degree-1 leaves
      1L -> ((3L, 9L, 30000L)))) // each leaf's single edge points at the hub
    g.unpersist()
  }

  // ---------- snapshot expiry ----------

  test("expireSnapshots: ref-counting GC keeps loc-inherited data alive") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val table = java.nio.file.Files.createTempDirectory("graft-expire").toString
    val buckets = (0L until 20L).map(i => (i, (i / 5).toInt)).toDF("id", "bucket")
    val e0 = (0L until 20L).map(i => (i, i + 100L, 1.0)).toDF("src", "dst", "weight")
    assert(SnapshotTable.commit(e0, buckets, table) == 0)
    // merge touches only bucket 0 → snap 1 inherits buckets 1-3 from snap 0
    val up = Seq((3L, 103L, 9.0)).toDF("src", "dst", "weight")
    assert(SnapshotTable.merge(up, buckets, table) == 1)
    val e2 = (0L until 20L).map(i => (i, i + 100L, 2.0)).toDF("src", "dst", "weight")
    assert(SnapshotTable.commit(e2, buckets, table) == 2)

    val before = SnapshotTable.read(spark, table, Some(1))
      .select("src", "dst", "weight").collect().map(_.toSeq).toSet
    // retain 2 → snapshot 0's MANIFEST expires, but its data dir is
    // still referenced by snapshot 1's inherited buckets: must survive
    assert(SnapshotTable.expireSnapshots(table, retain = 2) == Seq(0))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$table/snap=0/_manifest.json")) ||
      SnapshotTable.latest(table).contains(2))
    val after = SnapshotTable.read(spark, table, Some(1))
      .select("src", "dst", "weight").collect().map(_.toSeq).toSet
    assert(after == before, "retained snapshot changed after expiry")
    assert(SnapshotTable.read(spark, table).count() == 20)
    // time travel to the expired snapshot now fails (manifest gone)
    intercept[Exception] { SnapshotTable.read(spark, table, Some(0)).count() }

    // expire down to 1: snapshot 1's manifest goes; snap 2 owns all
    // its data, so snap 0's and snap 1's dirs are now unreferenced
    assert(SnapshotTable.expireSnapshots(table, retain = 1) == Seq(1))
    assert(!new java.io.File(s"$table/snap=0").exists(),
      "unreferenced snapshot 0 data must be deleted once snap 1 is expired")
    assert(SnapshotTable.read(spark, table).count() == 20)
  }

  // ---------- OddBall ego features ----------

  test("oddball features: triangle + chain, hand-computed") {
    // triangle 0-1-2 plus pendant 2-3
    val g = graphOf(Seq((0, 1), (1, 2), (0, 2), (2, 3)), symmetric = true)
    val pv = algos.TriangleCount.perVertex(g).join(g.vertices, "id")
      .select(col("key"),
        (col("degree") + 1).as("n_ego"),
        (col("degree") + col("triangles")).as("e_ego"),
        when(col("degree") < 2, 10000L)
          .otherwise(expr("(2 * (degree + triangles) * 10000) div ((degree + 1) * degree)"))
          .as("clique_e4"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(pv(keyOf(0)) == ((3L, 3L, 10000L))) // ego {0,1,2} is a clique
    assert(pv(keyOf(2)) == ((4L, 4L, 6666L))) // ego {0,1,2,3}: 4 of 6 edges
    assert(pv(keyOf(3)) == ((2L, 1L, 10000L))) // pendant: trivial ego
    g.unpersist()
  }

  // ---------- RAKE ----------

  test("rakeKeywords: phrase-degree scoring, hand-computed") {
    import spark.implicits._
    // phrases: [deep graph engine] / [deep learning] / [rocks]
    val docs = Seq((1L, "deep graph engine and deep learning is rocks"))
      .toDF("doc_id", "text")
    val got = pipeline.TextStats.rakeKeywords(docs, k = 5).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // deep: freq 2, degsum 3+2=5 → 25000; graph/engine: 1,3 → 30000;
    // learning: 1,2 → 20000; rocks: 1,1 → 10000
    assert(got == Map(
      "engine" -> ((1L, 30000L, 1L)), "graph" -> ((1L, 30000L, 2L)),
      "deep" -> ((2L, 25000L, 3L)), "learning" -> ((1L, 20000L, 4L)),
      "rocks" -> ((1L, 10000L, 5L))))
  }

  // ---------- dominator election ----------

  test("dominatorElection: star hub dominates; path picks the local max") {
    // star 0-(1,2,3) plus pendant chain 3-4: hub 0 (deg 3) dominates
    // 0,1,2,3; vertex 4's closed nbhd {4 (deg 1), 3 (deg 2)} → 3
    val g = graphOf(Seq((0, 1), (0, 2), (0, 3), (3, 4)), symmetric = true)
    val idx = indexOf(g)
    val got = algos.DegreeStats.dominatorElection(g).collect()
      .map(r => idx(r.getLong(0)) -> r.getString(1)).toMap
    assert(got == Map(
      0 -> keyOf(0), 1 -> keyOf(0), 2 -> keyOf(0), 3 -> keyOf(0),
      4 -> keyOf(3)))
    g.unpersist()
  }

  // ---------- PQ ADC ----------

  test("pqAdcTopK: a query's self-distance equals its total quantization error") {
    import spark.implicits._
    // 12 deterministic 8-dim vectors (m=4 → 2-dim subspaces)
    val emb = (0L until 12L).map { i =>
      (i, (0 until 8).map(j => ((i * 7 + j * 3) % 11).toFloat / 11f))
    }.toDF("vec_id", "embedding")
    val adc = pipeline.Similarity
      .pqAdcTopK(emb, m = 4, k = 4, lloydIters = 2, nQueries = 3, topK = 12)
      .where(col("qid") === col("vec_id"))
      .select(col("qid"), col("est_d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val qerr = pipeline.Similarity.pqCodes(emb, m = 4, k = 4, lloydIters = 2)
      .groupBy(col("vec_id")).agg(sum(col("d2")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(adc.nonEmpty)
    adc.foreach { case (q, d) => assert(d == qerr(q), s"query $q") }
  }

  // ---------- ZGL label spreading ----------

  test("labelSpread: two clusters, hand-replayed floored averaging") {
    import spark.implicits._
    // seeds are vec_id % 5 == 0 → ids 0 and 5; k=2 keeps the two
    // 3-cliques separate
    val emb = Seq(
      (0L, Seq(1.00f, 0.00f), 3), (1L, Seq(0.99f, 0.01f), 9),
      (2L, Seq(0.98f, 0.02f), 9),
      (5L, Seq(0.00f, 1.00f), 7), (6L, Seq(0.01f, 0.99f), 9),
      (7L, Seq(0.02f, 0.98f), 9))
      .toDF("vec_id", "embedding", "label")
    val got = pipeline.Similarity.labelSpread(emb, k = 2, rounds = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      0L -> ((3L, 1000000L)), 5L -> ((7L, 1000000L)),
      // rounds: 500000 → 750000 → 875000 (seed mass + peer mass, /2)
      1L -> ((3L, 875000L)), 2L -> ((3L, 875000L)),
      6L -> ((7L, 875000L)), 7L -> ((7L, 875000L))))
  }

  // ---------- node2vec walks ----------

  test("node2vec walk: matches an independent JVM-md5 replay") {
    val pairs = Seq(
      (0, 1), (0, 2), (1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (5, 0), (3, 6))
    val g = graphOf(pairs, symmetric = true)
    val idx = indexOf(g)
    val roots = Seq(0, 3).map(i => g.vertices
      .where(col("key") === keyOf(i)).select(col("id")).first().getLong(0))
    val got = algos.RandomWalk.runNode2vec(g, roots, steps = 5).walks
      .collect().map(r => (idx(r.getLong(0)), r.getInt(1)) -> idx(r.getLong(2)))
      .toMap

    // independent replay: java.security MD5, not Spark's
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val und = pairs.flatMap(p => Seq(p, p.swap)).distinct
    def nbrs(v: Int) = und.filter(_._1 == v).map(_._2).sortBy(keyOf)
    val exp = scala.collection.mutable.Map[(Int, Int), Int]()
    for (r0 <- Seq(0, 3)) {
      var cur = r0
      var prev = -1
      exp((r0, 0)) = cur
      for (t <- 1 to 5) {
        val cands = nbrs(cur)
        val wqs = cands.map { c =>
          val bias =
            if (c == prev) 2L
            else if (prev >= 0 && und.contains((prev, c))) 4L
            else 1L
          1000L * bias // all test weights are 1.0
        }
        val tot = wqs.sum
        val h = BigInt(md5hex(s"n2|${keyOf(cur)}|$t").take(15), 16) % tot
        val cum = wqs.scanLeft(0L)(_ + _).tail
        val pick = cands(cum.indexWhere(_ > h.toLong))
        exp((r0, t)) = pick
        prev = cur
        cur = pick
      }
    }
    assert(got == exp.toMap)
    g.unpersist()
  }

  // ---------- PCA ----------

  test("pca pc1: dominant-axis cloud projects onto that axis") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(-1.0f, 0.0f)), (3L, Seq(0.5f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = pipeline.Pca.pc1(emb).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1L -> 1000000000L, 2L -> -1000000000L, 3L -> 500000000L))
  }

  test("pca pc1: canonical sign flips a negative leading component") {
    import spark.implicits._
    // vectors along (1,-2): iteration converges to w=(-5e5,1e6),
    // canonicalized to (5e5,-1e6)
    val emb = Seq(
      (1L, Seq(1.0f, -2.0f)), (2L, Seq(-1.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val got = pipeline.Pca.pc1(emb).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2500000000L, 2L -> -2500000000L))
  }

  // ---------- SALSA ----------

  test("salsa: hand-replayed integer floor-division trajectory") {
    // 0→1, 0→2, 1→2: out(0)=2, out(1)=1; in(1)=1, in(2)=2
    val g = graphOf(Seq((0, 1), (0, 2), (1, 2)), symmetric = false)
    val r = algos.Salsa.run(g, iterations = 4).scores
    val auth = byIndex(g, r, "auth")
    val hub = byIndex(g, r, "hub")
    assert(auth == Map(
      0 -> 0L, 1 -> 664062500000L, 2 -> 1335937500000L))
    assert(hub == Map(
      0 -> 1332031250000L, 1 -> 667968750000L, 2 -> 0L))
    g.unpersist()
  }

  test("salsa: uniform-degree graph reaches the mass-conserving fixpoint") {
    // 0→2, 1→2, 2→3: every divisor is the full degree, no floor loss
    val g = graphOf(Seq((0, 2), (1, 2), (2, 3)), symmetric = false)
    val r = algos.Salsa.run(g, iterations = 4).scores
    val s = 1000000000000L
    assert(byIndex(g, r, "auth") == Map(0 -> 0L, 1 -> 0L, 2 -> 2 * s, 3 -> s))
    assert(byIndex(g, r, "hub") == Map(0 -> s, 1 -> s, 2 -> s, 3 -> 0L))
    g.unpersist()
  }

  // ---------- linear-threshold cascade ----------

  test("cascade: indegree-1 chain activates at BFS distance") {
    // θ = 1 + (h mod 1) = 1 on every in-degree-1 vertex, hash-free
    val g = graphOf(Seq((0, 1), (1, 2), (2, 3)), symmetric = false)
    val idx = indexOf(g)
    val seed = g.vertices.where(col("key") === keyOf(0))
      .select(col("id")).first().getLong(0)
    val act = algos.Cascade.run(g, Seq(seed), maxRounds = 8).collect()
      .map(r => idx(r.getLong(0)) -> r.getInt(1)).toMap
    assert(act == Map(0 -> 0, 1 -> 1, 2 -> 2, 3 -> 3))
    g.unpersist()
  }

  test("cascade: matches a driver-side brute-force replay with real thresholds") {
    // braided digraph with mixed in-degrees (1..3)
    val pairs = Seq(
      (0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (3, 4), (2, 4), (0, 4),
      (4, 5), (3, 5), (5, 6), (6, 7), (2, 7), (7, 8), (8, 9), (5, 9))
    val g = graphOf(pairs, symmetric = false)
    val idx = indexOf(g)
    val seed = g.vertices.where(col("key") === keyOf(0))
      .select(col("id")).first().getLong(0)
    val got = algos.Cascade.run(g, Seq(seed), maxRounds = 8).collect()
      .map(r => idx(r.getLong(0)) -> r.getInt(1)).toMap

    // brute force: thresholds via the SAME Spark hash expression
    val th = g.degrees.where(col("in_degree") >= 1).join(g.vertices, "id")
      .select(col("id"),
        (lit(1L) + expr(
          "cast(conv(substring(md5(concat('lt|', key)), 1, 10), 16, 10) as bigint)")
          % col("in_degree")).as("th"))
      .collect().map(r => idx(r.getLong(0)) -> r.getLong(1)).toMap
    var active = Map(0 -> 0)
    var changed = true
    var round = 0
    while (changed && round < 8) {
      round += 1
      val cnt = pairs.filter(p => active.contains(p._1)).groupBy(_._2)
        .map { case (v, es) => v -> es.size.toLong }
      val fresh = cnt.collect {
        case (v, c) if !active.contains(v) && th.get(v).exists(c >= _) => v
      }
      changed = fresh.nonEmpty
      active = active ++ fresh.map(_ -> round)
    }
    assert(got == active)
    g.unpersist()
  }
}
