package graft

import org.apache.spark.sql.functions._

import graft.algos._

/** Round-3d operators: WL color refinement, 4-clique counting,
 * PPR sweep-cut conductance. */
class Round3dSpec extends SparkSpec {

  // ---------- Weisfeiler-Lehman refinement ----------

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Reference 1-WL with the engine's multiset-sum hash, in plain Scala. */
  private def bruteWl(n: Int, adj: Map[Int, Set[Int]], rounds: Int): Map[Int, String] = {
    val prime = BigInt("2305843009213693951")
    var lbl = (0 until n).map(v => v -> adj(v).size.toString).toMap
    for (_ <- 1 to rounds) {
      lbl = (0 until n).map { v =>
        val s = adj(v).toSeq
          .map(u => BigInt(md5hex(lbl(u)).take(8), 16))
          .foldLeft(BigInt(0))(_ + _)
        val h = if (adj(v).isEmpty) "" else (s % prime).toString
        v -> md5hex(lbl(v) + "|" + h)
      }.toMap
    }
    lbl
  }

  private def wlByIndex(g: LinkGraph, rounds: Int): Map[Int, String] =
    byIndex(g, WlRefine.run(g, rounds), "wl")
      .map { case (v, w) => v -> w.asInstanceOf[String] }

  test("WL: engine labels equal the plain-Scala replay on an irregular graph") {
    // two triangles sharing a bridge + a pendant: mixed degrees 1..3
    val pairs = Seq((0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3), (5, 6))
    val adj = (0 to 6).map(v => v -> pairs.collect {
      case (a, b) if a == v => b
      case (a, b) if b == v => a
    }.toSet).toMap
    val g = graphOf(pairs, symmetric = true)
    assert(wlByIndex(g, 3) == bruteWl(7, adj, 3))
    g.unpersist()
  }

  test("WL: symmetric positions share labels, asymmetric ones split") {
    // path P6: 0-1-2-3-4-5 — mirror pairs (0,5),(1,4),(2,3) are
    // automorphic; after 3 rounds each mirror pair shares a label and
    // the three orbits are pairwise distinct
    val g = graphOf(Seq((0, 1), (1, 2), (2, 3), (3, 4), (4, 5)), symmetric = true)
    val wl = wlByIndex(g, 3)
    assert(wl(0) == wl(5) && wl(1) == wl(4) && wl(2) == wl(3))
    assert(Set(wl(0), wl(1), wl(2)).size == 3)
    g.unpersist()
  }

  // ---------- 4-clique counting ----------

  private def brute4Cliques(n: Int, pairs: Seq[(Int, Int)]): Long = {
    val adj = Array.fill(n, n)(false)
    pairs.foreach { case (a, b) => adj(a)(b) = true; adj(b)(a) = true }
    (for {
      w <- 0 until n; x <- w + 1 until n if adj(w)(x)
      y <- x + 1 until n if adj(w)(y) && adj(x)(y)
      z <- y + 1 until n if adj(w)(z) && adj(x)(z) && adj(y)(z)
    } yield 1).size.toLong
  }

  test("4-cliques: K4=1, K5=5, K5 minus an edge=2, C6=0") {
    def kN(n: Int) = for (i <- 0 until n; j <- i + 1 until n) yield (i, j)
    val cases: Seq[(Seq[(Int, Int)], Long)] = Seq(
      (kN(4), 1L),
      (kN(5), 5L), // C(5,4) = 5
      (kN(5).filterNot(_ == (0, 1)), 2L), // only the two K4s avoiding {0,1}
      (Seq((0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0)), 0L))
    cases.foreach { case (pairs, want) =>
      val g = graphOf(pairs, symmetric = true)
      assert(TriangleCount.countFourCliques(g) == want, s"pairs=$pairs")
      g.unpersist()
    }
  }

  test("4-cliques: equals brute force on a deterministic random graph") {
    val n = 24
    val pairs = for {
      i <- 0 until n; j <- i + 1 until n
      if md5hex(s"q$i|$j").charAt(0) <= '7' // ~half density → rich clique structure
    } yield (i, j)
    val g = graphOf(pairs, symmetric = true)
    assert(TriangleCount.countFourCliques(g) == brute4Cliques(n, pairs))
    g.unpersist()
  }

  // ---------- coreness ----------

  test("coreness: K4=3, attached triangle=2, pendant chain=1") {
    val pairs = Seq(
      (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), // K4
      (4, 5), (5, 6), (4, 6), // triangle
      (3, 4), // bridge
      (6, 7), (7, 8)) // chain
    val g = graphOf(pairs, symmetric = true)
    val got = byIndex(g, KCore.coreness(g), "coreness")
      .map { case (v, c) => v -> c.asInstanceOf[Long] }
    val expected = Map(0 -> 3L, 1 -> 3L, 2 -> 3L, 3 -> 3L,
      4 -> 2L, 5 -> 2L, 6 -> 2L, 7 -> 1L, 8 -> 1L)
    assert(got == expected)
    g.unpersist()
  }

  // ---------- densest subgraph ----------

  test("densest peel: rounds equal the plain-Scala replay; best is the clique round") {
    // K6 (density 2.5) + a 12-vertex path tail (density ~0.46)
    def k6 = for (i <- 0 until 6; j <- i + 1 until 6) yield (i, j)
    val tail = (5 until 17).map(i => (i, i + 1))
    val pairs = k6 ++ tail
    val g = graphOf(pairs, symmetric = true)
    // replay: same gate 2·d·nv > 3·se over live-degree>0 vertices
    var adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }
    val exp = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
    var r = 0L
    while (adj.nonEmpty) {
      val deg = adj.map { case (v, ns) => v -> ns.size.toLong }
      val nv = deg.size.toLong
      val se = deg.values.sum
      exp += ((r, nv, se / 2, 10000L * (se / 2) / nv))
      val keep = deg.filter { case (_, d) => 2 * d * nv > 3 * se }.keySet
      adj = adj.collect { case (v, ns) if keep(v) =>
        v -> ns.intersect(keep) }.filter(_._2.nonEmpty)
      r += 1
    }
    val got = Densest.run(g).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
      .sortBy(_._1)
    assert(got.map(x => (x._1, x._2, x._3, x._4)).toSeq == exp.toSeq)
    // the flagged round is the true argmax of e/v (cross-mult check)
    val best = got.filter(_._5 == 1L)
    assert(best.length == 1)
    val (_, bv, be, _, _) = best.head
    got.foreach { case (_, v, e, _, _) =>
      assert(BigInt(e) * bv <= BigInt(be) * v)
    }
    g.unpersist()
  }

  // ---------- lexical segmentation ----------

  test("segmentation: boundary at the topic shift, none within topics") {
    import spark.implicits._
    val tr = Seq(
      ("c1", 0, "alpha beta gamma delta"),
      ("c1", 1, "alpha beta gamma epsilon"), // J = 3/5 ≥ 0.05 → same segment
      ("c1", 2, "zz yy xx ww"), // J = 0 → boundary
      ("c1", 3, "zz yy xx vv"),
      ("c2", 0, "solo"))
      .toDF("conv_id", "turn_idx", "text")
    val got = graft.pipeline.Segment.lexical(tr).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      ("c1", 0L, 0L, 2L), ("c1", 1L, 2L, 2L), ("c2", 0L, 0L, 1L)))
  }

  // ---------- triad census ----------

  test("triad census: known counts on a composite digraph") {
    import spark.implicits._
    val arcs = Seq(
      ("a", "b"), ("b", "c"), ("a", "c"), // 030T
      ("d", "e"), ("e", "f"), ("f", "d"), // 030C
      ("g", "h"), ("g", "i"), // 021D
      ("j", "k"), ("k", "l")) // 021C
      .toDF("src_key", "dst_key")
    val got = TriadCensus.run(arcs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "021D" -> 1L, // g's star (a's out-pair belongs to the 030T)
      "021U" -> 0L, // c's in-pair belongs to the 030T
      "021C" -> 1L, // j→k→l
      "030T" -> 1L, "030C" -> 1L))
  }

  // ---------- funnel ----------

  test("funnel: ordered-step depths on a hand fixture") {
    import spark.implicits._
    // usage: A in 4 convs > B in 3 > C in 2 → steps (A, B, C)
    val tr = Seq(
      ("c1", 0, Some("A"), "2026-01-01 00:00:01"),
      ("c1", 1, Some("B"), "2026-01-01 00:00:02"),
      ("c1", 2, Some("C"), "2026-01-01 00:00:03"),
      ("c2", 0, Some("B"), "2026-01-01 00:00:01"), // B before A → B leg dead
      ("c2", 1, Some("A"), "2026-01-01 00:00:02"),
      ("c2", 2, Some("C"), "2026-01-01 00:00:03"),
      ("c3", 0, Some("A"), "2026-01-01 00:00:01"),
      ("c4", 0, None: Option[String], "2026-01-01 00:00:01"),
      ("c5", 0, Some("A"), "2026-01-01 00:00:01"),
      ("c5", 1, Some("B"), "2026-01-01 00:00:02"))
      .toDF("conv_id", "turn_idx", "tool", "tss")
      .withColumn("ts", col("tss").cast("timestamp"))
    val m = tr.select(col("conv_id"), col("turn_idx"),
      unix_micros(col("ts")).as("m")).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val got = graft.pipeline.Funnel.toolFunnel(tr).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      "c1" -> ((3L, m(("c1", 2)))),
      "c2" -> ((1L, m(("c2", 1)))), // only A counts: B happened before A
      "c3" -> ((1L, m(("c3", 0)))),
      "c4" -> ((0L, -1L)),
      "c5" -> ((2L, m(("c5", 1))))))
  }

  // ---------- latency profile ----------

  test("latency: span/max/lower-median gaps, single-turn sentinel") {
    import spark.implicits._
    val tr = Seq(
      ("c1", 0, "2026-01-01 00:00:00"), ("c1", 1, "2026-01-01 00:00:02"),
      ("c1", 2, "2026-01-01 00:00:03"), ("c1", 3, "2026-01-01 00:00:08"),
      ("c1", 4, "2026-01-01 00:00:09"), // gaps 2,1,5,1 s → median(lower) 1 s
      ("c2", 0, "2026-01-01 00:00:00"))
      .toDF("conv_id", "turn_idx", "tss")
      .withColumn("ts", col("tss").cast("timestamp"))
    val got = graft.pipeline.Funnel.latency(tr).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got("c1") == ((5L, 9000000L, 5000000L, 1000000L)))
    assert(got("c2") == ((1L, 0L, -1L, -1L)))
  }

  // ---------- z-order ----------

  test("zorder: morton code equals the bit-interleave replay") {
    import spark.implicits._
    val ev = Seq(
      (0L, 0L, "2026-01-01 00:10:00"), (1L, 1L, "2026-01-01 00:20:00"),
      (2L, 65535L, "2026-01-01 05:00:00"), (3L, 43690L, "2026-01-01 02:30:00"),
      (4L, 70000L, "2026-01-01 03:00:00")) // > 16 bits → masked
      .toDF("event_id", "user_id", "tss")
      .withColumn("ts", col("tss").cast("timestamp"))
    val tus = ev.select(col("event_id"), unix_micros(col("ts")).as("m")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val minTs = tus.values.min
    def morton(u: Long, t: Long): Long = (0 until 16).map { i =>
      (((u >> i) & 1L) << (2 * i)) | (((t >> i) & 1L) << (2 * i + 1))
    }.sum
    val users = Map(0L -> 0L, 1L -> 1L, 2L -> 65535L, 3L -> 43690L, 4L -> 70000L)
    val expected = users.map { case (id, u) =>
      val z = morton(u & 65535L, ((tus(id) - minTs) / 3600000000L) & 65535L)
      id -> ((z, z >> 28))
    }
    val got = graft.operators.ZOrder.eventsZOrder(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
  }

  // ---------- temporal earliest-arrival ----------

  test("temporal reach: time-respecting only, with frontier re-expansion") {
    import spark.implicits._
    // a→b@30 arrives late; the cheaper a→c@10, c→b@12 path lowers b
    // below 15, which re-enables b→d@15 — exercises re-expansion.
    // e is a trap: only reachable via an edge OLDER than b's best.
    val te = Seq(
      ("a", "b", 30L), ("a", "c", 10L), ("c", "b", 12L),
      ("b", "d", 15L), ("b", "e", 11L))
      .toDF("src_key", "dst_key", "t")
    val seeds = Seq(("a", 0L)).toDF("key", "arr")
    val got = TemporalReach.run(te, seeds, numPartitions = 4).arrivals
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 0L, "c" -> 10L, "b" -> 12L, "d" -> 15L))
    // b@12 > 11 ⇒ b→e@11 is not time-respecting; e absent ✓ (checked
    // by the exact-map equality above)
  }

  test("temporal reach: decreasing-time chain blocks propagation") {
    import spark.implicits._
    val te = Seq(("a", "b", 10L), ("b", "c", 5L)).toDF("src_key", "dst_key", "t")
    val seeds = Seq(("a", 0L)).toDF("key", "arr")
    val got = TemporalReach.run(te, seeds, numPartitions = 4).arrivals
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 0L, "b" -> 10L))
  }

  // ---------- PPR sweep cut ----------

  test("sweep cut: barbell graph — replay matches and argmin is the cluster") {
    import spark.implicits._
    // two K4s bridged by (3,4)
    def k4(off: Int) = for (i <- 0 until 4; j <- i + 1 until 4) yield (i + off, j + off)
    val pairs = k4(0) ++ k4(4) :+ ((3, 4))
    val g = graphOf(pairs, symmetric = true)
    val scoreByIdx = Map(0 -> 0.8, 1 -> 0.7, 2 -> 0.6, 3 -> 0.5, 4 -> 0.1,
      5 -> 0.05, 6 -> 0.05, 7 -> 0.05)
    val idToIdx = indexOf(g)
    val scores = idToIdx.toSeq.map { case (id, idx) => (id, scoreByIdx(idx)) }
      .toDF("id", "score")
    val got = SweepCut.run(g, scores, k = 8).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    // plain-Scala replay
    val deg = (0 to 7).map(v => v -> pairs.count(p => p._1 == v || p._2 == v)).toMap
    val order = (0 to 7).sortBy(v =>
      (-(math.round(scoreByIdx(v) * 100000) * 1000000L / deg(v)), keyOf(v)))
    val tot = 2L * pairs.size
    val expected = (1 to 8).map { k =>
      val s = order.take(k).toSet
      val vol = s.toSeq.map(deg(_).toLong).sum
      val cut = pairs.count(p => s.contains(p._1) != s.contains(p._2)).toLong
      val den = math.min(vol, tot - vol)
      (k.toLong, keyOf(order(k - 1)), vol, cut, if (den == 0) 0L else 10000L * cut / den)
    }
    assert(got.toSeq == expected)
    // conductance bottoms out exactly at the 4-vertex cluster
    val phiByK = got.map(r => r._1 -> r._5).toMap
    assert(phiByK(4L) == got.filter(_._1 < 8).map(_._5).min) // k=8 is S=V (φ≔0 by convention)
    g.unpersist()
  }

  test("WL: refinement distinguishes C6 from 2×C3 where degrees cannot") {
    // both 2-regular — round 0 and round 1 agree; by round 2 the
    // triangle vertices see closed 2-hop neighborhoods and split.
    // (C6 vs 2×C3 is THE textbook pair 1-WL *can* separate locally
    // per-vertex only via multiset census... here labels stay equal
    // per vertex — so assert census instead: both graphs are
    // vertex-transitive, all labels equal within each graph.)
    val c6 = graphOf(Seq((0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0)), symmetric = true)
    val cc3 = graphOf(Seq((0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)), symmetric = true)
    val w6 = wlByIndex(c6, 3).values.toSet
    val w33 = wlByIndex(cc3, 3).values.toSet
    assert(w6.size == 1 && w33.size == 1, "vertex-transitive graphs refine to one class")
    // and the single classes agree across the two graphs: the classic
    // 1-WL blind spot, documented behavior of color refinement
    assert(w6 == w33)
    c6.unpersist(); cc3.unpersist()
  }
}
