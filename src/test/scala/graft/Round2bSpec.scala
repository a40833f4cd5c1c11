package graft

import org.apache.spark.sql.functions._

import graft.algos.{DegreeStats, RandomWalk}
import graft.pipeline.{Cooccur, Quantiles}

/** Specs for the round-2b additions: deterministic random walks,
 * exact histogram quantiles, tool co-occurrence lift. Each compares
 * the distributed result against a direct single-node replay. */
class Round2bSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("random walk replays the md5-argmin rule exactly") {
    // braid: cycle 0..7 plus chords — every vertex has ≥2 neighbors
    val pairs = (0 until 8).map(i => (i, (i + 1) % 8)) ++
      Seq((0, 4), (1, 5), (2, 6))
    val g = graphOf(pairs, symmetric = true)
    val idx = indexOf(g)
    val keyToIdx = idx.map { case (id, i) => keyOf(i) -> i }
    val idOf = idx.map(_.swap)

    // symmetric neighbor map on keys (deduped, no self-loops)
    val nbrs = (pairs ++ pairs.map(_.swap)).distinct
      .filter { case (a, b) => a != b }
      .groupBy(_._1).map { case (a, bs) => keyOf(a) -> bs.map(x => keyOf(x._2)) }

    val roots = Seq(0, 3)
    val steps = 5
    val r = RandomWalk.run(g, roots.map(i => idOf(i)), steps)
    val got = r.walks.collect()
      .map(x => (idx(x.getLong(0)), x.getInt(1)) -> idx(x.getLong(2))).toMap

    for (root <- roots) {
      var cur = keyOf(root)
      assert(got((root, 0)) === root)
      for (t <- 1 to steps) {
        val next = nbrs(cur).minBy(n => (md5hex(s"$cur|$t|$n"), n))
        assert(got((root, t)) === keyToIdx(next), s"root=$root step=$t")
        cur = next
      }
    }
    r.walks.unpersist()
  }

  test("weighted walk replays the cumulative-weight-slot rule exactly") {
    val pairs = (0 until 8).map(i => (i, (i + 1) % 8)) ++
      Seq((0, 4), (1, 5), (2, 6))
    // asymmetric-looking weights; graph build takes min per symmetric pair
    val w = pairs.map { case (a, b) => (a, b) -> (1.0 + (a * 3 + b) % 4) }.toMap
    val g = graphOf(pairs, symmetric = true, weights = w)
    val idx = indexOf(g)
    val keyToIdx = idx.map { case (id, i) => keyOf(i) -> i }
    val idOf = idx.map(_.swap)

    // symmetric deduped neighbor->weight map on keys (min weight per pair)
    val sym = (pairs.map { case (a, b) => (a, b, w((a, b))) } ++
      pairs.map { case (a, b) => (b, a, w((a, b))) })
      .filter { case (a, b, _) => a != b }
      .groupBy(x => (x._1, x._2)).map { case ((a, b), xs) =>
        (keyOf(a), keyOf(b)) -> xs.map(_._3).min }
    val nbrs = sym.keys.groupBy(_._1).map { case (a, ks) =>
      a -> ks.map(_._2).toSeq.sorted }

    val roots = Seq(2, 7)
    val steps = 5
    val r = RandomWalk.run(g, roots.map(i => idOf(i)), steps, weighted = true)
    val got = r.walks.collect()
      .map(x => (idx(x.getLong(0)), x.getInt(1)) -> idx(x.getLong(2))).toMap

    for (root <- roots) {
      var cur = keyOf(root)
      for (t <- 1 to steps) {
        val line = nbrs(cur).map(n => n -> math.round(sym((cur, n)) * 1000))
        val tot = line.map(_._2).sum
        val h = BigInt(md5hex(s"$cur|$t").take(15), 16) mod BigInt(tot)
        var cum = 0L
        val next = line.find { case (_, wq) => cum += wq; cum > h.toLong }.get._1
        assert(got((root, t)) === keyToIdx(next), s"root=$root step=$t")
        cur = next
      }
    }
    r.walks.unpersist()
  }

  test("degree histogram buckets by exact bit length") {
    val pairs = Seq((0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (1, 2), (3, 4))
    val g = graphOf(pairs, symmetric = true)
    val got = DegreeStats.histogram(g).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // symmetric degrees: v0=5, v1=2, v2=2, v3=2, v4=2, v5=1
    val degs = Seq(5L, 2L, 2L, 2L, 2L, 1L)
    val expected = degs.groupBy(d => 64L - java.lang.Long.numberOfLeadingZeros(d))
      .map { case (b, ds) => b -> ((ds.size.toLong, ds.min, ds.max)) }
    assert(got === expected)
  }

  test("component-size histogram matches the known component census") {
    import graft.algos.ConnectedComponents
    // component {0..7} (size 8) + triangle {8,9,10} (size 3)
    val pairs = Seq((0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0), (2, 6), (6, 7),
      (8, 9), (9, 10), (10, 8))
    val g = graphOf(pairs, symmetric = true)
    val labels = ConnectedComponents.run(g).labels
    val got = DegreeStats.sizeHistogram(labels).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(4L -> ((1L, 8L, 8L)), 2L -> ((1L, 3L, 3L))))
  }

  test("link prediction equals the brute-force RA index over non-adjacent pairs") {
    import graft.algos.LinkPredict
    // two hubs (1, 2) sharing leaves + a path tail — plenty of
    // non-adjacent pairs with 1-2 common neighbors
    val pairs = Seq((0, 1), (0, 2), (0, 3), (1, 2), (3, 4), (4, 5), (2, 5),
      (1, 6), (2, 6), (1, 7), (2, 7))
    val g = graphOf(pairs, symmetric = true)

    val und = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }.distinct
    val nbrs = und.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def brute(cap: Int): Map[(String, String), (Long, Long)] = {
      val verts = nbrs.keys.toSeq.sorted
      (for {
        u <- verts; v <- verts
        if keyOf(u) < keyOf(v) && !nbrs(u).contains(v)
        zs = (nbrs(u) & nbrs(v)).filter(z => nbrs(z).size >= 2 && nbrs(z).size <= cap)
        if zs.nonEmpty
      } yield (keyOf(u), keyOf(v)) ->
        ((zs.size.toLong, zs.toSeq.map(z => 1000000L / nbrs(z).size).sum))).toMap
    }

    for (cap <- Seq(64, 3)) { // 3 excludes the degree-4+ hubs as centers
      val got = LinkPredict.topOverlap(g, k = 1000, maxHubDegree = cap).collect()
        .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
        .toMap
      assert(got === brute(cap), s"cap=$cap")
    }
  }

  test("edge Jaccard equals the brute-force neighbor-set computation") {
    import graft.algos.LinkPredict
    // triangle-rich core + a degree-1 tail (5-4) whose edge has
    // union > 0 but common = 0, + an isolated edge (8-9): union = 0
    val pairs = Seq((0, 1), (0, 2), (0, 3), (1, 2), (3, 4), (4, 5), (2, 5),
      (1, 6), (2, 6), (8, 9))
    val g = graphOf(pairs, symmetric = true)
    val und = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }.distinct
    val nbrs = und.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = pairs.map { case (x, y) =>
      val (a, b) = if (keyOf(x) < keyOf(y)) (x, y) else (y, x)
      val common = (nbrs(a) & nbrs(b)).size.toLong
      val union = (nbrs(a).size - 1) + (nbrs(b).size - 1) - common
      val jac = if (union > 0) 1000000L * common / union else 0L
      (keyOf(a), keyOf(b)) -> ((common, union, jac))
    }.toMap
    val got = LinkPredict.edgeJaccard(g).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === expected)
  }

  test("exact quantiles equal the sorted ceil-rank selection") {
    import spark.implicits._
    // adversarial: duplicates, a gap, a heavy mode
    val lens = Seq(1, 1, 1, 2, 2, 5, 5, 5, 5, 5, 9, 40, 40, 41, 100)
    val docs = lens.zipWithIndex
      .map { case (k, i) => (i.toLong, Seq.fill(k)("w").mkString(" ")) }
      .toDF("doc_id", "text")
    val pcts = Seq(10, 25, 50, 75, 90, 99, 100)
    val got = Quantiles.tokenCountQuantiles(docs, pcts).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val sorted = lens.sorted
    val n = lens.size
    for (p <- pcts) {
      val rank = (p.toLong * n + 99L) / 100L
      assert(got(p.toLong) === ((rank, sorted(rank.toInt - 1).toLong)), s"pct=$p")
    }
  }

  test("grouped quantiles equal the per-group sorted ceil-rank selection") {
    import spark.implicits._
    val rows = Seq(
      ("a", 1), ("a", 3), ("a", 3), ("a", 7), ("a", 20),
      ("b", 2), ("b", 2), ("b", 9))
    val docs = rows.zipWithIndex.map { case ((s, k), i) =>
      (i.toLong, s, Seq.fill(k)("w").mkString(" ")) }
      .toDF("doc_id", "source", "text")
    val pcts = Seq(50, 90, 100)
    val got = Quantiles.tokenCountQuantilesBy(docs, "source", pcts).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    for ((src, lens) <- rows.groupBy(_._1).view.mapValues(_.map(_._2.toLong).sorted)) {
      val n = lens.size
      for (p <- pcts) {
        val rank = (p.toLong * n + 99L) / 100L
        assert(got((src, p.toLong)) === ((rank, lens(rank.toInt - 1))), s"$src p$p")
      }
    }
  }

  test("tool lift equals the brute-force conversation counts") {
    import spark.implicits._
    // c1:{A,B} c2:{A,B,C} c3:{A} c4:{} c5:{B,C} — incl. a tool-free conv
    val rows = Seq(
      ("c1", "A"), ("c1", "B"), ("c1", "A"), // duplicate use in one conv
      ("c2", "A"), ("c2", "B"), ("c2", "C"),
      ("c3", "A"), ("c5", "B"), ("c5", "C"),
      ("c4", null))
    val tr = rows.toDF("conv_id", "tool")
    val got = Cooccur.toolLift(tr).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

    val convTools = rows.filter(_._2 != null).distinct.groupBy(_._1).map {
      case (c, ts) => c -> ts.map(_._2).toSet }
    val nConvs = rows.map(_._1).distinct.size.toLong
    val tools = convTools.values.flatten.toSeq.distinct.sorted
    val marg = tools.map(t => t -> convTools.values.count(_.contains(t)).toLong).toMap
    val expected = (for {
      a <- tools; b <- tools if a < b
      nab = convTools.values.count(s => s.contains(a) && s.contains(b)).toLong
      if nab > 0
    } yield (a, b) -> ((nab, marg(a), marg(b),
      nab * 10000L * nConvs / (marg(a) * marg(b))))).toMap
    assert(got === expected)
  }
}
