package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Cooccur, Similarity, TextStats}

/** Round-3f operators: conditional-trigram LM scoring, a-priori
 * frequent itemsets, DBSCAN over embeddings. */
class Round3fSpec extends SparkSpec {

  // ---------- conditional-trigram LM score ----------

  /** Plain-Scala replay: corpus trigram counts → per-doc mean of
   * ⌊10⁶·C₃/C₂⌋. */
  private def bruteLm(texts: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
    val grams = texts.flatMap { case (_, t) =>
      val w = t.toLowerCase.split(" ")
      (0 to w.length - 3).map(i => (w(i), w(i + 1), w(i + 2)))
    }
    val c3 = grams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c2 = grams.groupBy(g => (g._1, g._2)).view.mapValues(_.size.toLong).toMap
    texts.map { case (d, t) =>
      val w = t.toLowerCase.split(" ")
      val ps = (0 to w.length - 3).map { i =>
        val g = (w(i), w(i + 1), w(i + 2))
        1000000L * c3(g) / c2((g._1, g._2))
      }
      d -> (ps.size.toLong, ps.sum, if (ps.isEmpty) 0L else ps.sum / ps.size)
    }.toMap
  }

  test("lmScore: matches the plain replay; repeated text maxes out; short docs zero") {
    import spark.implicits._
    val texts = Seq(
      1L -> "m n o m n o m n o", // disjoint vocab: every prefix has ONE continuation
      2L -> "a b c x y z a b d", // 'a b' splits c/d
      3L -> "q r", // < 3 tokens → zero row
      4L -> "x y z q q q")
    val docs = texts.toDF("doc_id", "text")
    val got = TextStats.lmScore(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == bruteLm(texts))
    assert(got(1L)._3 == 1000000L) // pure repetition ⇒ mean prob 1
    assert(got(3L) == ((0L, 0L, 0L)))
  }

  // ---------- a-priori frequent itemsets ----------

  test("frequentItemsets: supports are exact and pruning loses nothing") {
    import spark.implicits._
    // baskets: 4 convs with {A,B,C}, 3 with {A,B}, 1 with {D}
    val rows =
      (1 to 4).flatMap(i => Seq("A", "B", "C").map(t => (s"c$i", t))) ++
        (5 to 7).flatMap(i => Seq("A", "B").map(t => (s"c$i", t))) ++
        Seq(("c8", "D")) ++
        Seq(("c1", "A")) // duplicate (conv, tool) must not inflate support
    val t = rows.toDF("conv_id", "tool")
      .select(col("conv_id"), col("tool"), lit("x").as("text"))
    // supportDivisor 2 → minSup = max(2, 8/2) = 4
    val got = Cooccur.frequentItemsets(t, supportDivisor = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = Set(
      ("A", 1L, 7L), ("B", 1L, 7L), ("C", 1L, 4L),
      ("A,B", 2L, 7L), ("A,C", 2L, 4L), ("B,C", 2L, 4L),
      ("A,B,C", 3L, 4L))
    assert(got == want)
  }

  // ---------- DBSCAN ----------

  /** Two angular fans of 5 (cores at minPts 4, threshold cos 0.98 —
   * neighbors iff within 10°), one trailing border point within 10°
   * of only THREE cluster-0 cores (deg 3 < minPts), one orthogonal
   * noise point. */
  test("dbscan: cores, border attach, noise on a hand-built constellation") {
    import spark.implicits._
    def ray(deg: Double, plane: Int) = {
      val r = math.toRadians(deg)
      if (plane == 0) Array(math.cos(r).toFloat, math.sin(r).toFloat, 0f)
      else Array(0f, math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val emb = (
      (0L to 4L).map(i => (i, ray(2.0 * i, 0))) ++ // fan A: 0°..8° in xy
        (5L to 9L).map(i => (i, ray(90 + 2.0 * (i - 5), 0))) ++ // fan B: 90°..98°
        Seq((10L, ray(14.0, 0))) ++ // border: within 10° of 4°,6°,8° only
        Seq((11L, ray(90, 1)))) // +z noise
      .map { case (id, a) => (id, a, 0) }
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.dbscan(emb, simThresholdE4 = 9800L, minPts = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getLong(3)))).toMap
    (0L to 4L).foreach(i => assert(got(i)._1 == 0L && got(i)._2 == "core", s"vec $i: ${got(i)}"))
    (5L to 9L).foreach(i => assert(got(i)._1 == 5L && got(i)._2 == "core", s"vec $i: ${got(i)}"))
    assert(got(10L) == ((0L, "border", 3L)))
    assert(got(11L) == ((-1L, "noise", 0L)))
  }

  // ---------- SCAN structural clustering ----------

  /** Literal SCAN per the KDD'07 definitions (union-find, closed
   * neighborhoods) — an independent replay of algos.Scan. */
  private def bruteScan(
      n: Int, pairs: Seq[(Int, Int)], eps2e4: Long, mu: Int): Map[String, (String, String)] = {
    val adj = (0 until n).map(v => v -> pairs.collect {
      case (a, b) if a == v => b
      case (a, b) if b == v => a
    }.toSet).toMap
    def ok(u: Int, v: Int): Boolean = {
      val c = (adj(u) intersect adj(v)).size.toLong
      10000L * (c + 2) * (c + 2) >= eps2e4 * (adj(u).size + 1) * (adj(v).size + 1)
    }
    val epsN = (0 until n).map(v => v -> adj(v).filter(ok(v, _))).toMap
    val core = (0 until n).filter(v => epsN(v).size + 1 >= mu).toSet
    val parent = scala.collection.mutable.Map((0 until n).map(v => v -> v): _*)
    def find(v: Int): Int = if (parent(v) == v) v else { parent(v) = find(parent(v)); parent(v) }
    for (u <- core; v <- epsN(u) if core(v)) parent(find(u)) = find(v)
    val clusterOf = core.map(v => v -> core.filter(w => find(w) == find(v))
      .map(keyOf).min).toMap
    val memberOf = (0 until n).filterNot(core).flatMap { v =>
      val cs = epsN(v).filter(core).map(clusterOf)
      if (cs.nonEmpty) Some(v -> cs.min) else None
    }.toMap
    (0 until n).map { v =>
      if (core(v)) keyOf(v) -> ((clusterOf(v), "core"))
      else if (memberOf.contains(v)) keyOf(v) -> ((memberOf(v), "member"))
      else {
        val nbrClusters = adj(v).flatMap(w =>
          clusterOf.get(w).orElse(memberOf.get(w)))
        keyOf(v) -> (("-", if (nbrClusters.size >= 2) "hub" else "outlier"))
      }
    }.toMap
  }

  test("scan: two cliques, a bridging hub, a pendant outlier; equals the literal replay") {
    val cliqueA = for (i <- 0 to 3; j <- i + 1 to 3) yield (i, j)
    val cliqueB = for (i <- 4 to 7; j <- i + 1 to 7) yield (i, j)
    val pairs = cliqueA ++ cliqueB ++ Seq((8, 0), (8, 4), (9, 3))
    val g = graphOf(pairs, symmetric = true)
    val got = algos.Scan.run(g, eps2E4 = 6400, mu = 3).assign.collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(got == bruteScan(10, pairs, 6400, 3))
    assert(got(keyOf(8)) == (("-", "hub"))) // touches both cliques
    assert(got(keyOf(9)) == (("-", "outlier"))) // pendant off clique A
    assert(got(keyOf(0)) == ((keyOf(0), "core")))
    assert(got(keyOf(5))._1 == keyOf(4)) // cluster named by min core key
    g.unpersist()
  }

  test("scan: equals the literal replay on random graphs") {
    for (seed <- 1 to 3) {
      val n = 14
      val pairs = (0 until n).flatMap(i =>
        Seq((i, (i + 1) % n), (i, (i * 3 + seed) % n), (i, (i * 7 + 2 * seed) % n))
          .filter(p => p._1 != p._2))
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val g = graphOf(pairs, symmetric = true)
      val got = algos.Scan.run(g, eps2E4 = 4900, mu = 3).assign.collect()
        .map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
      assert(got == bruteScan(n, pairs, 4900, 3), s"seed=$seed")
      g.unpersist()
    }
  }

  // ---------- Euler census + bipartiteness ----------

  test("eulerCensus: circuit on a cycle, trail on a path, none on a star+chord") {
    // comp A: 4-cycle (all even → circuit); comp B: path of 3 (2 odd → trail);
    // comp C: star K1,3 (3 odd leaves + center odd → none)
    val pairs = Seq((0, 1), (1, 2), (2, 3), (3, 0),
      (4, 5), (5, 6),
      (7, 8), (7, 9), (7, 10))
    val g = graphOf(pairs, symmetric = true)
    val labels = algos.CCStar.run(g).labels
    val got = algos.DegreeStats.eulerCensus(g, labels).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    assert(got(keyOf(0)) == ((4L, 4L, 0L, "circuit")))
    assert(got(keyOf(4)) == ((3L, 2L, 2L, "trail")))
    assert(got(keyOf(7)) == ((4L, 3L, 4L, "none")))
    g.unpersist()
  }

  test("oddCycle: even cycle bipartite, odd cycle one conflict, seed pinned at min key") {
    // comp A: 6-cycle (bipartite); comp B: 5-cycle (1 conflict edge);
    // comp C: triangle + pendant (1 conflict)
    val pairs = (0 to 5).map(i => (i, (i + 1) % 6 match { case 0 => 0; case j => j })) // 0-1..5-0
      .filter(p => p._1 != p._2) ++ Seq((5, 0)) ++
      (6 to 9).map(i => (i, if (i == 10) 6 else i + 1)).filter(_._2 <= 10) ++ Seq((10, 6)) ++
      Seq((11, 12), (12, 13), (13, 11), (13, 14))
    val g = graphOf(pairs.distinct, symmetric = true)
    val labels = algos.CCStar.run(g).labels
    val got = algos.OddCycle.run(g, labels).census.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(keyOf(0)) == ((6L, 0L, 1L)), s"6-cycle: ${got(keyOf(0))}")
    assert(got(keyOf(6)) == ((5L, 1L, 0L)), s"5-cycle: ${got(keyOf(6))}")
    // triangle: levels from v11 are 0,1,1 → the (12,13) edge conflicts
    assert(got(keyOf(11)) == ((4L, 1L, 0L)), s"triangle+pendant: ${got(keyOf(11))}")
    g.unpersist()
  }

  // ---------- bridges ----------

  /** Brute bridges: an edge is a bridge iff removing it increases the
   * component count (literal definition, tiny graphs). */
  private def bruteBridges(n: Int, pairs: Seq[(Int, Int)]): Set[(String, String)] = {
    def comps(es: Seq[(Int, Int)]): Int = {
      val parent = scala.collection.mutable.Map((0 until n).map(v => v -> v): _*)
      def find(v: Int): Int = if (parent(v) == v) v else { parent(v) = find(parent(v)); parent(v) }
      es.foreach { case (a, b) => parent(find(a)) = find(b) }
      (0 until n).map(find).distinct.size
    }
    val base = comps(pairs)
    pairs.filter(e => comps(pairs.filterNot(_ == e)) > base)
      .map { case (a, b) =>
        (Seq(keyOf(a), keyOf(b)).min, Seq(keyOf(a), keyOf(b)).max) }.toSet
  }

  test("bridges: cycles contribute none, chains all, lollipop stem only") {
    // 5-cycle (no bridges) -- stem -- triangle (no bridges), plus an
    // isolated chain (all bridges)
    val pairs = Seq((0, 1), (1, 2), (2, 3), (3, 4), (4, 0), // cycle
      (2, 5), (5, 6), // stem: both bridges
      (6, 7), (7, 8), (8, 6), // triangle
      (9, 10), (10, 11)) // chain: both bridges
    val g = graphOf(pairs, symmetric = true)
    val got = algos.Bridges.run(g).bridges.collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == bruteBridges(12, pairs))
    assert(got == Set((keyOf(2), keyOf(5)), (keyOf(5), keyOf(6)),
      (keyOf(9), keyOf(10)), (keyOf(10), keyOf(11))))
    g.unpersist()
  }

  test("2ecc blocks: cycle and triangle are blocks, bridge chain shatters to singletons") {
    val pairs = Seq((0, 1), (1, 2), (2, 3), (3, 4), (4, 0),
      (2, 5), (5, 6),
      (6, 7), (7, 8), (8, 6),
      (9, 10), (10, 11))
    val g = graphOf(pairs, symmetric = true)
    val got = algos.Bridges.blocks(g).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    (0 to 4).foreach(i => assert(got(keyOf(i)) == keyOf(0)))
    (6 to 8).foreach(i => assert(got(keyOf(i)) == keyOf(6)))
    Seq(5, 9, 10, 11).foreach(i => assert(got(keyOf(i)) == keyOf(i), s"v$i singleton"))
    g.unpersist()
  }

  test("bridges: equals the removal-count brute force on random graphs") {
    for (seed <- 1 to 3) {
      val n = 15
      val pairs = (0 until n).flatMap(i =>
        Seq((i, (i + 2) % n), (i, (i * 5 + seed) % n)).filter(p => p._1 != p._2))
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct ++
        Seq((0, n), (n, n + 1)) // guarantee at least one pendant chain
      val g = graphOf(pairs.distinct, symmetric = true)
      val got = algos.Bridges.run(g).bridges.collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(got == bruteBridges(n + 2, pairs.distinct), s"seed=$seed")
      g.unpersist()
    }
  }

  // ---------- dyad census ----------

  test("dyads: mutual pair, asym pair, self-transitions excluded, nulls complete") {
    import spark.implicits._
    val t = Seq(
      ("c1", 0, "A"), ("c1", 1, "B"), ("c1", 2, "A"), // A<->B mutual
      ("c2", 0, "C"), ("c2", 1, "D"), // C->D asym
      ("c3", 0, "E"), ("c3", 1, "E")) // self-transition: excluded
      .toDF("conv_id", "turn_idx", "tool")
    val got = algos.TriadCensus.dyads(
      sources.EdgeBuilder.toolTransitionCounts(t)).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3)) ==
      ((4L, 1L, 1L, 4L))) // n=4, mutual=1, asym=1, nulls=C(4,2)-2
  }

  // ---------- Gini concentration ----------

  test("toolGini: rank-form integer Gini on a hand-computed distribution") {
    import spark.implicits._
    // usage counts A:1 B:1 C:2 D:4 → sorted asc, Σx=8, Σi·x=25,
    // G = (2·25 − 5·8)/(4·8) = 0.3125
    val rows = Seq("A" -> 1, "B" -> 1, "C" -> 2, "D" -> 4)
      .flatMap { case (t, n) => (0 until n).map(i => (s"c$t$i", 0, t)) }
    val t = rows.toDF("conv_id", "turn_idx", "tool")
    val got = pipeline.Cooccur.toolGini(t).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == ((4L, 8L, 312500L)))
    // uniform usage → Gini 0... minus the discrete floor
    val u = Seq(("c1", 0, "X"), ("c2", 0, "Y"), ("c3", 0, "Z")).toDF("conv_id", "turn_idx", "tool")
    assert(pipeline.Cooccur.toolGini(u).collect().head.getLong(2) == 0L)
  }

  // ---------- greedy coverage ----------

  test("greedyCover: picks by marginal coverage with conv_id ties; stops when covered") {
    import spark.implicits._
    val t = Seq(
      ("c1", 0, "A"), ("c1", 1, "B"), ("c1", 2, "C"), // 3 tools
      ("c2", 0, "C"), ("c2", 1, "D"), // 2 tools, 1 new after c1
      ("c3", 0, "D"), ("c3", 1, "E"), ("c3", 2, "F"), // 3 tools
      ("c4", 0, "A")) // subset of c1
      .toDF("conv_id", "turn_idx", "tool")
    val got = pipeline.Cover.greedyCover(t, k = 10).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList
    // round 1: c1 and c3 both cover 3 → tie to c1; round 2: c3 covers
    // D,E,F (3 new); round 3: only D? no — all covered after c3 ∪ c1
    // except D? c1={A,B,C}, c3={D,E,F} → covered=6 of {A..F} → done
    assert(got == List((1L, "c1", 3L), (2L, "c3", 3L)))
  }

  // ---------- percolation ----------

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("percolation: md5-coin replay matches union-find census; p=1 equals full CC") {
    val pairs = (0 until 20).flatMap(i =>
      Seq((i, (i + 1) % 20), (i, (i * 7 + 3) % 20)).filter(p => p._1 != p._2))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val g = graphOf(pairs, symmetric = true)
    def census(pE4: Long): Map[Long, (Long, Long, Long)] =
      algos.Percolation.census(g, pE4).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // brute: replay the coins, union-find the survivors
    def brute(pE4: Long): Map[Long, (Long, Long, Long)] = {
      val live = pairs.filter { case (a, b) =>
        val h = java.lang.Long.parseLong(
          md5hex(s"${keyOf(a)}|${keyOf(b)}").take(10), 16)
        10000L * h < pE4 * (1L << 40)
      }
      val parent = scala.collection.mutable.Map((0 until 20).map(v => v -> v): _*)
      def find(v: Int): Int = if (parent(v) == v) v else { parent(v) = find(parent(v)); parent(v) }
      live.foreach { case (a, b) => parent(find(a)) = find(b) }
      val szs = (0 until 20).groupBy(find).values.map(_.size.toLong)
      szs.groupBy(s => java.lang.Long.toBinaryString(s).length.toLong)
        .map { case (b, xs) => b -> ((xs.size.toLong, xs.min, xs.max)) }
    }
    assert(census(7000L) == brute(7000L))
    assert(census(10000L) == brute(10000L)) // everything survives = true CC census
    g.unpersist()
  }

  // ---------- k-center ----------

  test("kcenter: farthest-first on a path picks the ends then the middle") {
    // giant = path 0..9; side chain 10-11 must be ignored
    val pairs = (0 until 9).map(i => (i, i + 1)) ++ Seq((10, 11))
    val g = graphOf(pairs, symmetric = true)
    val labels = algos.CCStar.run(g).labels
    val got = algos.KCenter.run(g, labels).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // s1 = v0 (min key), s2 = v9 (farthest), s3 = v4 (max min-dist=4,
    // tie v4 < v5); assignment ties go to the smaller center key
    assert(got == Map(
      keyOf(0) -> ((3L, 2L)), // v0,v1,v2 (v2 ties 2-2 with v4 → v0)
      keyOf(4) -> ((4L, 2L)), // v3..v6
      keyOf(9) -> ((3L, 2L)))) // v7,v8,v9
    g.unpersist()
  }

  // ---------- weighted matching ----------

  test("runWeighted: equals the locally-heaviest replay; maximal; prefers heavy edges") {
    // path 0-1-2-3 with weights 5, 9, 5: greedy-by-weight takes (1,2)
    // then nothing else (0 and 3 isolated) — weight 9 beats the
    // unweighted matching's md5 luck
    val pairs = Seq((0, 1), (1, 2), (2, 3), (4, 5))
    val w = Map((0, 1) -> 5.0, (1, 2) -> 9.0, (2, 3) -> 5.0, (4, 5) -> 7.0)
    val g = graphOf(pairs, symmetric = true, weights = w)
    val got = algos.Matching.runWeighted(g).matching.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((keyOf(1), keyOf(2), 9L), (keyOf(4), keyOf(5), 7L)))
    g.unpersist()
  }

  test("runWeighted: replay equality on a random weighted graph") {
    val n = 12
    val pairs = (0 until n).flatMap(i =>
      Seq((i, (i + 1) % n), (i, (i * 5 + 1) % n)).filter(p => p._1 != p._2))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val w = pairs.zipWithIndex.map { case (p, i) => p -> ((i * 13) % 20 + 1).toDouble }.toMap
    val g = graphOf(pairs, symmetric = true, weights = w)
    val got = algos.Matching.runWeighted(g).matching.collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // literal locally-heaviest replay
    def prio(p: (Int, Int)): Long = {
      val h = java.lang.Long.parseLong(
        md5hex(s"${keyOf(p._1)}|${keyOf(p._2)}").take(10), 16)
      (97L - w(p).toLong) * (1L << 40) + h
    }
    var live = pairs
    val res = scala.collection.mutable.Set[(String, String)]()
    while (live.nonEmpty) {
      val best = (live.flatMap(p => Seq(p._1 -> p, p._2 -> p)))
        .groupBy(_._1).view.mapValues(_.map(_._2).minBy(prio)).toMap
      val m = live.filter(p => best(p._1) == p && best(p._2) == p)
      res ++= m.map(p => (keyOf(p._1), keyOf(p._2)))
      val used = m.flatMap(p => Seq(p._1, p._2)).toSet
      live = live.filterNot(p => used(p._1) || used(p._2))
    }
    assert(got == res.toSet)
    // maximality: no live edge remains with both endpoints unmatched
    val matchedV = got.flatMap(t => Seq(t._1, t._2))
    pairs.foreach { case (a, b) =>
      assert(matchedV(keyOf(a)) || matchedV(keyOf(b)), s"($a,$b) unmatched-extendable") }
    g.unpersist()
  }

  // ---------- cross-source overlap ----------

  test("sourceOverlap: shared shingles and containment are exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e", "s1"), // shingles: abc bcd cde
      (2L, "a b c x y", "s2"), // abc bcx cxy
      (3L, "b c d q r", "s2"), // bcd cdq dqr
      (4L, "z z z z", "s3")) // zzz (x2 distinct → 1)
      .toDF("doc_id", "text", "source")
    val got = pipeline.Dedup.sourceOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // s1={abc,bcd,cde}, s2={abc,bcx,cxy,bcd,cdq,dqr}, s3={zzz}
    assert(got(("s1", "s2")) == ((2L, 3L, 6L, 10000L * 2 / 3)))
    assert(!got.contains(("s1", "s3")) && !got.contains(("s2", "s3")))
  }

  test("knnClusters: mutual top-k splits the fans, hub-attracted loners stay singletons") {
    import spark.implicits._
    def ray(deg: Double) = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat, 0f)
    }
    val emb = (
      (0L to 4L).map(i => (i, ray(2.0 * i))) ++ // fan A around 0°
        (5L to 9L).map(i => (i, ray(90 + 2.0 * (i - 5)))) ++ // fan B around 90°
        Seq((10L, Array(0f, 0f, 1f)))) // orthogonal loner
      .map { case (id, a) => (id, a, 0) }
      .toDF("vec_id", "embedding", "label")
    val got = graft.pipeline.Similarity.knnClusters(emb, k = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 4L).foreach(i => assert(got(i) == 0L, s"vec $i"))
    (5L to 9L).foreach(i => assert(got(i) == 5L, s"vec $i"))
    // 10's top-4 exist but none reciprocates (fans' top-4 are intra-fan)
    assert(got(10L) == 10L)
  }

  test("dbscan: minPts above any degree yields all-noise") {
    import spark.implicits._
    val emb = (0L until 6L)
      .map(i => (i, Array(1f, i.toFloat / 100), 0)).toDF("vec_id", "embedding", "label")
    val got = Similarity.dbscan(emb, simThresholdE4 = 9000L, minPts = 50).collect()
    assert(got.forall(r => r.getString(2) == "noise" && r.getLong(1) == -1L))
  }
}
