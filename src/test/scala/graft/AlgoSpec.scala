package graft

import org.apache.spark.sql.functions._

import graft.algos._

/** Golden tests on toy graphs with closed-form answers (FIXTURES.md §3)
 * plus allclose-1e-6 against the single-node Oracle. */
class AlgoSpec extends SparkSpec {

  // FIXTURES.md: classic small PageRank digraph incl. a dangling vertex
  val wikiEdges: Seq[(Int, Int)] = Seq(
    (1, 2), (2, 1), (3, 0), (3, 1), (4, 1), (4, 3), (5, 1), (5, 4),
    (6, 1), (6, 4), (7, 1), (7, 4), (8, 1), (8, 4), (9, 4), (10, 4))
  val wikiN = 11

  val path5 = Seq((0, 1), (1, 2), (2, 3), (3, 4))
  val cycle4 = Seq((0, 1), (1, 2), (2, 3), (3, 0))
  val twoCliques: Seq[(Int, Int)] =
    (for { a <- 0 until 4; b <- 0 until 4 if a < b } yield (a, b)) ++
      (for { a <- 4 until 8; b <- 4 until 8 if a < b } yield (a, b))

  def assertAllClose(actual: Map[Int, Any], expected: Array[Double], tol: Double = 1e-6): Unit = {
    assert(actual.size == expected.length)
    actual.foreach { case (i, v) =>
      val d = math.abs(v.asInstanceOf[Double] - expected(i))
      assert(d <= tol, s"vertex $i: got $v expected ${expected(i)} (|diff|=$d)")
    }
  }

  test("PageRank fixed-iteration parity with oracle on wiki digraph (allclose 1e-6)") {
    val g = graphOf(wikiEdges, symmetric = false)
    for (iters <- Seq(1, 3, 10)) {
      val r = PageRank.run(g, iterations = iters)
      assertAllClose(byIndex(g, r.ranks, "rank"), Oracle.pagerank(wikiN, wikiEdges, iters))
    }
  }

  test("PageRank convergence mode matches oracle at the same iteration count") {
    val g = graphOf(wikiEdges, symmetric = false)
    val r = PageRank.run(g, iterations = 0, maxIterations = 100, tol = 1e-6)
    val oracleIters = Oracle.pagerankItersToConverge(wikiN, wikiEdges, 1e-6)
    assert(r.iterations == oracleIters)
    assertAllClose(byIndex(g, r.ranks, "rank"), Oracle.pagerank(wikiN, wikiEdges, r.iterations))
  }

  test("PageRank on cycle4 is uniform 1.0") {
    val g = graphOf(cycle4, symmetric = false)
    val r = PageRank.run(g, iterations = 0, maxIterations = 100, tol = 1e-9)
    byIndex(g, r.ranks, "rank").values.foreach(v =>
      assert(math.abs(v.asInstanceOf[Double] - 1.0) < 1e-6))
  }

  test("CC HashMin exact labels on twoCliques + isolated pair") {
    val edges = twoCliques ++ Seq((8, 9))
    val g = graphOf(edges, symmetric = true)
    val r = ConnectedComponents.run(g)
    val expected = Oracle.ccLabels(10, edges)
    // engine labels are min-ID per component; ids are not index-ordered,
    // so compare PARTITIONS via min-member-index canonicalization
    val got = byIndex(g, r.labels, "lbl").view.mapValues(_.asInstanceOf[Long]).toMap
    val repByLbl = got.groupBy(_._2).map { case (l, m) => l -> m.keys.min }
    got.foreach { case (i, l) =>
      assert(repByLbl(l) == expected(i), s"vertex $i")
    }
    assert(ConnectedComponents.componentCount(r.labels) == 3)
  }

  test("LP fixpoint equals CC labels (undirected)") {
    val edges = twoCliques ++ path5.map { case (a, b) => (a + 10, b + 10) }
    val g = graphOf(edges, symmetric = true)
    val cc = ConnectedComponents.run(g).labels.withColumnRenamed("lbl", "cc")
    val lp = LabelPropagation.run(g).labels.withColumnRenamed("lbl", "lp")
    assert(cc.join(lp, "id").where(col("cc") =!= col("lp")).count() == 0)
  }

  test("Triangle count: twoCliques=8, cycle4=0, path5=0") {
    assert(TriangleCount.count(graphOf(twoCliques, symmetric = true)) ==
      Oracle.triangles(8, twoCliques))
    assert(Oracle.triangles(8, twoCliques) == 8L)
    assert(TriangleCount.count(graphOf(cycle4, symmetric = true)) == 0L)
    assert(TriangleCount.count(graphOf(path5, symmetric = true)) == 0L)
  }

  test("BFS levels on path5 (directed) and star (symmetric)") {
    val g = graphOf(path5, symmetric = false)
    val idx = indexOf(g)
    val rootId = idx.collectFirst { case (id, 0) => id }.get
    val r = Bfs.run(g, rootId)
    val got = byIndex(g, r.tree, "level")
    val expected = Oracle.bfsLevels(5, path5, 0)
    (0 until 5).foreach(i => assert(got(i) == expected(i), s"vertex $i"))

    val star = (1 to 8).map(i => (0, i))
    val gs = graphOf(star, symmetric = true)
    val idxS = indexOf(gs)
    val rootS = idxS.collectFirst { case (id, 3) => id }.get
    val rs = Bfs.run(gs, rootS)
    val gotS = byIndex(gs, rs.tree, "level")
    assert(gotS(3) == 0 && gotS(0) == 1)
    (1 to 8).filter(_ != 3).foreach(i => assert(gotS(i) == 2, s"leaf $i"))
  }

  test("per-vertex triangles: 3 per clique vertex, 0 on cycle4; sums to 3·total") {
    val g = graphOf(twoCliques, symmetric = true)
    val r = TriangleCount.perVertex(g).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.forall { case (_, d, t) => d == 3 && t == 3 }) // C(3,2)=3 each
    assert(r.map(_._3).sum == 3 * TriangleCount.count(g))
    val c = graphOf(cycle4, symmetric = true)
    assert(TriangleCount.perVertex(c).collect().forall(_.getLong(2) == 0L))
  }

  test("multi-source BFS equals per-root BFS on wiki digraph and twoCliques") {
    for ((edges, rootIdxs) <- Seq(
        (wikiEdges, Seq(3, 5, 9)), (twoCliques, Seq(0, 5)))) {
      val g = graphOf(edges, symmetric = true)
      val idx = indexOf(g)
      val roots = rootIdxs.map(i => idx.collectFirst { case (id, j) if j == i => id }.get)
      val ms = MultiSourceBfs.run(g, roots)
      val got = ms.dists.collect()
        .map(r => (r.getLong(1), r.getLong(0)) -> r.getInt(2)).toMap
      for (root <- roots) {
        val single = Bfs.run(g, root)
        val exp = single.tree.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
        val mine = got.collect { case ((rt, id), d) if rt == root => id -> d }
        assert(mine == exp, s"root index dists differ for root $root")
      }
    }
  }

  test("double-sweep diameter: exact on a path (lower bound = true diameter)") {
    val g = graphOf(path5, symmetric = true)
    val idx = indexOf(g)
    val mid = idx.collectFirst { case (id, 2) => id }.get
    val r = Diameter.run(g, mid)
    assert(r.startKey == keyOf(2))
    assert(r.farKey == keyOf(0) && r.eccStart == 2) // tie v0/v4 → min key
    assert(r.far2Key == keyOf(4) && r.eccFar == 4) // true diameter
  }

  test("MIS: independent, maximal, deterministic on twoCliques and wiki") {
    for (edges <- Seq(twoCliques, wikiEdges)) {
      val g = graphOf(edges, symmetric = true)
      val r = Mis.run(g)
      val idx = indexOf(g)
      val mis = r.mis.collect().map(x => idx(x.getLong(0))).toSet
      val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
      // independence: no edge inside the set
      assert(!sym.exists { case (a, b) => mis(a) && mis(b) })
      // maximality: every non-member has a member neighbor
      val nonMembers = idx.values.toSet -- mis
      assert(nonMembers.forall(v => sym.exists { case (a, b) => a == v && mis(b) }))
      // deterministic: a second run returns the identical set
      assert(Mis.run(g).mis.collect().map(x => idx(x.getLong(0))).toSet == mis)
    }
    // each 4-clique contributes exactly one member
    val g2 = graphOf(twoCliques, symmetric = true)
    val idx2 = indexOf(g2)
    val m2 = Mis.run(g2).mis.collect().map(x => idx2(x.getLong(0))).toSet
    assert(m2.count(_ < 4) == 1 && m2.count(_ >= 4) == 1)
  }

  test("harmonic closeness: closed form on a star center and leaf") {
    // star K1,8 symmetric: center reaches 8 at dist 1 → harmonic 8.0;
    // a leaf reaches center at 1 and 7 leaves at 2 → 1 + 7·0.5 = 4.5
    val star = (1 to 8).map(i => (0, i))
    val g = graphOf(star, symmetric = true)
    val idx = indexOf(g)
    val center = idx.collectFirst { case (id, 0) => id }.get
    val leaf = idx.collectFirst { case (id, 3) => id }.get
    val r = MultiSourceBfs.run(g, Seq(center, leaf))
    val h = MultiSourceBfs.harmonicCloseness(r.dists).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(h(center) == ((8L, 80000L)))
    assert(h(leaf) == ((8L, 10000L + 7 * 5000L)))
  }

  test("Betweenness matches oracle on path5, wiki digraph, and twoCliques (allclose 1e-6)") {
    for ((edges, n, rootIdx) <- Seq(
        (path5, 5, 0), (wikiEdges, wikiN, 4), (twoCliques, 8, 0))) {
      val g = graphOf(edges, symmetric = false)
      val idx = indexOf(g)
      val root = idx.collectFirst { case (id, i) if i == rootIdx => id }.get
      val r = Betweenness.run(g, root)
      val got = byIndex(g, r.bc, "bc")
      val expected = Oracle.bc(n, edges, rootIdx)
      assert(got.keySet == expected.keySet, "reached sets differ")
      expected.foreach { case (i, v) =>
        assert(math.abs(got(i).asInstanceOf[Double] - v) < 1e-6, s"vertex $i")
      }
    }
  }

  test("SSSP weightedDiamond exact distances") {
    val wedges = Seq((0, 1), (0, 2), (1, 3), (2, 3))
    val weights = Map((0, 1) -> 1.0, (0, 2) -> 4.0, (1, 3) -> 1.0, (2, 3) -> 1.0)
    val g = graphOf(wedges, symmetric = false, weights)
    val idx = indexOf(g)
    val rootId = idx.collectFirst { case (id, 0) => id }.get
    val r = Sssp.run(g, rootId)
    val got = byIndex(g, r.distances, "dist")
    val expected = Oracle.sssp(4, wedges.map { case (a, b) => (a, b, weights((a, b))) }, 0)
    (0 until 4).foreach(i =>
      assert(math.abs(got(i).asInstanceOf[Double] - expected(i)) < 1e-9, s"vertex $i"))
  }

  test("weighted PageRank: reduces to PageRank at w=1, matches oracle on weighted graph") {
    // all weights 1 ⇒ wout = outdeg ⇒ identical to the reference loop
    val g = graphOf(wikiEdges, symmetric = false)
    val pr = byIndex(g, PageRank.run(g, iterations = 5).ranks, "rank")
    val wpr = byIndex(g, WeightedPageRank.run(g, iterations = 5).ranks, "rank")
    (0 until wikiN).foreach(i => assert(
      math.abs(pr(i).asInstanceOf[Double] - wpr(i).asInstanceOf[Double]) < 1e-12, s"v$i"))

    // weighted: single-node oracle on a 4-vertex graph with skewed weights
    val wedges = Seq((0, 1), (0, 2), (1, 3), (2, 3))
    val w = Map((0, 1) -> 3.0, (0, 2) -> 1.0, (1, 3) -> 2.0, (2, 3) -> 5.0)
    def oracle(n: Int, iters: Int, d: Double = 0.85): Array[Double] = {
      val wout = Array.fill(n)(0.0)
      wedges.foreach { case (u, v) => wout(u) += w((u, v)) }
      var raw = Array.fill(n)(1.0)
      var vv = raw.zipWithIndex.map { case (r, i) => if (wout(i) > 0) r / wout(i) else r }
      for (_ <- 1 to iters) {
        val s = Array.fill(n)(0.0)
        wedges.foreach { case (u, v2) => s(v2) += vv(u) * w((u, v2)) }
        raw = s.map(x => (1.0 - d) + d * x)
        vv = raw.zipWithIndex.map { case (r, i) => if (wout(i) > 0) r / wout(i) else r }
      }
      raw
    }
    val gw = graphOf(wedges, symmetric = false, weights = w)
    val got = byIndex(gw, WeightedPageRank.run(gw, iterations = 4).ranks, "rank")
    val exp = oracle(4, 4)
    (0 until 4).foreach(i => assert(
      math.abs(got(i).asInstanceOf[Double] - exp(i)) < 1e-12, s"v$i: ${got(i)} vs ${exp(i)}"))
  }

  test("personalized PageRank matches a single-node oracle; support radiates from the seed") {
    def oracle(n: Int, edges: Seq[(Int, Int)], seed: Int, iters: Int, d: Double = 0.85): Array[Double] = {
      val out = Array.fill(n)(0)
      edges.foreach { case (u, _) => out(u) += 1 }
      def divDeg(raw: Array[Double]) =
        raw.zipWithIndex.map { case (r, i) => if (out(i) > 0) r / out(i) else r }
      var raw = Array.tabulate(n)(i => if (i == seed) 1.0 else 0.0)
      var v = divDeg(raw)
      for (_ <- 1 to iters) {
        val s = Array.fill(n)(0.0)
        edges.foreach { case (u, w) => s(w) += v(u) }
        raw = Array.tabulate(n)(i => (1.0 - d) * (if (i == seed) 1.0 else 0.0) + d * s(i))
        v = divDeg(raw)
      }
      raw
    }
    val g = graphOf(wikiEdges, symmetric = false)
    val idx = indexOf(g)
    val seedId = idx.collectFirst { case (id, 4) => id }.get
    val r = PersonalizedPageRank.run(g, Seq(seedId), iterations = 5)
    val got = byIndex(g, r.scores, "score")
      .map { case (k, v) => k -> v.asInstanceOf[Double] }.withDefaultValue(0.0)
    val exp = oracle(wikiN, wikiEdges, seed = 4, iters = 5)
    (0 until wikiN).foreach(i =>
      assert(math.abs(got(i) - exp(i)) < 1e-12, s"vertex $i: ${got(i)} vs ${exp(i)}"))
    // vertices the walk cannot reach from 4 within 5 hops carry no row
    val nRows = r.scores.count()
    assert(wikiN - nRows == exp.count(_ == 0.0),
      s"state must stay sparse: $nRows rows, ${exp.count(_ == 0.0)} zeros expected")
  }

  test("k-core peeling: cliques survive, chains and tails peel away") {
    // 4-clique + pendant tail 3-8-9: 2-core = the clique (tail peels
    // in two rounds: 9 first, then 8), core degrees all 3
    val g = graphOf(twoCliques.take(6) ++ Seq((3, 8), (8, 9)), symmetric = true)
    val r = KCore.run(g, k = 2)
    val got = byIndex(g, r.core, "core_degree").map { case (k2, v) => k2 -> v.asInstanceOf[Long] }
    assert(got == Map(0 -> 3L, 1 -> 3L, 2 -> 3L, 3 -> 3L), s"2-core must be the clique: $got")
    assert(r.aliveHistory.last == 4 && r.rounds >= 3, s"${r.rounds} rounds, ${r.aliveHistory}")

    // k=4 exceeds every degree → empty core
    assert(KCore.run(g, k = 4).core.count() == 0)

    // cycle4 is its own 2-core with degree exactly 2, one round
    val c = graphOf(cycle4, symmetric = true)
    val rc = KCore.run(c, k = 2)
    assert(rc.rounds == 1 && rc.core.count() == 4)
    assert(byIndex(c, rc.core, "core_degree").values.forall(_ == 2L))

    // path5 2-core is empty (pure chain peels end-in)
    assert(KCore.run(graphOf(path5, symmetric = true), k = 2).core.count() == 0)
  }

  test("HITS: closed form on a star, integer-exact oracle on wiki digraph") {
    // star 0→{1,2,3}: geometric growth a_k(leaf)=3^(k-1)·?, at 4 iters
    // auth(leaf)=27, hub(center)=81, cross terms 0
    val star = graphOf(Seq((0, 1), (0, 2), (0, 3)), symmetric = false)
    val rs = Hits.run(star, iterations = 4).scores
    val auth = byIndex(star, rs, "auth").map { case (k, v) => k -> v.asInstanceOf[Long] }
    val hub = byIndex(star, rs, "hub").map { case (k, v) => k -> v.asInstanceOf[Long] }
    assert(auth(0) == 0L && hub(0) == 81L)
    (1 to 3).foreach(i => assert(auth(i) == 27L && hub(i) == 0L, s"leaf $i: ${auth(i)}/${hub(i)}"))

    // single-node integer oracle, exact equality (no tolerance)
    def oracle(n: Int, edges: Seq[(Int, Int)], iters: Int): (Array[Long], Array[Long]) = {
      var h = Array.fill(n)(1L)
      var a = Array.fill(n)(0L)
      for (_ <- 1 to iters) {
        a = Array.fill(n)(0L)
        edges.foreach { case (u, v) => a(v) += h(u) }
        h = Array.fill(n)(0L)
        edges.foreach { case (u, v) => h(u) += a(v) }
      }
      (a, h)
    }
    val g = graphOf(wikiEdges, symmetric = false)
    val r = Hits.run(g, iterations = 4).scores
    val (ea, eh) = oracle(wikiN, wikiEdges, 4)
    val ga = byIndex(g, r, "auth")
    val gh = byIndex(g, r, "hub")
    (0 until wikiN).foreach { i =>
      assert(ga(i) == ea(i), s"auth($i): ${ga(i)} != ${ea(i)}")
      assert(gh(i) == eh(i), s"hub($i): ${gh(i)} != ${eh(i)}")
    }
  }
}
