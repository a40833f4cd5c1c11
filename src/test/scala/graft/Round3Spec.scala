package graft

import org.apache.spark.sql.functions._

import graft.algos.{CCStar, ConnectedComponents}
import graft.operators.Temporal
import graft.pipeline.{Similarity, Sketch, TextStats}

/** Round-3 operators: star-contraction CC, temporal joins (as-of /
 * range), Bloom sketch, SemDeDup, ROLLUP census. */
class Round3Spec extends SparkSpec {

  import spark.implicits._

  // ---- CCStar ----

  private def ccAgree(pairs: Seq[(Int, Int)]): Unit = {
    val g = graphOf(pairs, symmetric = true)
    val star = CCStar.run(g)
    val hashmin = ConnectedComponents.run(g).labels.withColumnRenamed("lbl", "hm")
    assert(star.labels.join(hashmin, "id").where(col("lbl") =!= col("hm")).count() == 0)
    g.unpersist()
  }

  test("CCStar labels equal HashMin CC on cliques, paths, and isolated pairs") {
    ccAgree((for { a <- 0 until 4; b <- 0 until 4 if a < b } yield (a, b)) ++
      Seq((8, 9)) ++ Seq((10, 11), (11, 12), (12, 13), (13, 14)))
  }

  test("CCStar converges in O(log n) rounds on a long path (HashMin needs O(n))") {
    val n = 96
    val path = (0 until n - 1).map(i => (i, i + 1))
    val g = graphOf(path, symmetric = true)
    val r = CCStar.run(g)
    assert(r.labels.select(col("lbl")).distinct().count() == 1)
    // star contraction halves remaining structure per alternation:
    // well under the ~95 supersteps HashMin pays on this path
    assert(r.rounds <= 14, s"took ${r.rounds} rounds")
    g.unpersist()
  }

  test("CCStar: interrupted and resumed run yields the identical labels") {
    val edges = Seq((0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7),
      (8, 9), (9, 10), (10, 8), (11, 12))
    val g = graphOf(edges, symmetric = true)
    val full = CCStar.run(g)
    val ck = Checkpoint(java.nio.file.Files.createTempDirectory("graft-ccstar").toString)
    CCStar.run(g, maxRounds = 2, ckpt = Some(ck), ckptEvery = 1) // "kill" after 2 rounds
    assert(ck.latestIteration().contains(2))
    val resumed = CCStar.run(g, ckpt = Some(ck), ckptEvery = 1, resume = true)
    val a = full.labels.select(col("id"), col("lbl"))
    val b = resumed.labels.select(col("id"), col("lbl"))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    g.unpersist()
  }

  test("CCStar equals HashMin on a deterministic random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (0 until 160).map(_ => (rnd.nextInt(60), rnd.nextInt(60)))
      .filter { case (a, b) => a != b }
    ccAgree(edges.distinct)
  }

  test("DeltaStepping distances equal label-correcting SSSP at every Δ") {
    val edges = Seq((0, 1), (1, 2), (2, 3), (0, 4), (4, 3), (3, 5), (5, 6), (2, 6), (7, 8))
    val w = Map((0, 1) -> 1.0, (1, 2) -> 1.0, (2, 3) -> 2.0, (0, 4) -> 2.0,
      (4, 3) -> 2.0, (3, 5) -> 1.0, (5, 6) -> 2.0, (2, 6) -> 5.0, (7, 8) -> 3.0)
    val g = graphOf(edges, symmetric = true, weights = w)
    val root = indexOf(g).collectFirst { case (id, 0) => id }.get
    val want = byIndex(g, algos.Sssp.run(g, root).distances, "dist")
      .view.mapValues(_.asInstanceOf[Double]).toMap
    // Δ spans the Dijkstra-like (< min weight), mixed, and
    // Bellman-Ford-like (> max weight) regimes — same fixpoint in all
    for (d <- Seq(0.5, 2.0, 100.0)) {
      val got = byIndex(g, algos.DeltaStepping.run(g, root, delta = d).distances, "dist")
        .view.mapValues(_.asInstanceOf[Double]).toMap
      assert(got.keySet == want.keySet, s"reached set differs at delta=$d")
      want.foreach { case (i, v) =>
        assert(math.abs(got(i) - v) < 1e-12, s"vertex $i at delta=$d")
      }
    }
    g.unpersist()
  }

  test("DeltaStepping: interrupted and resumed run equals uninterrupted distances") {
    val edges = (0 until 30).map(i => (i, i + 1))
    val w = edges.map { case (a, b) => (a, b) -> (if (a % 3 == 0) 2.5 else 1.0) }.toMap
    val g = graphOf(edges, symmetric = true, weights = w)
    val root = indexOf(g).collectFirst { case (id, 0) => id }.get
    val full = byIndex(g, algos.DeltaStepping.run(g, root, delta = 2.0).distances, "dist")
    val ck = Checkpoint(java.nio.file.Files.createTempDirectory("graft-ds").toString)
    // "kill" mid-run: enough rounds for a few bucket-end snapshots
    algos.DeltaStepping.run(g, root, delta = 2.0, maxRounds = 9,
      ckpt = Some(ck), ckptEvery = 1)
    assert(ck.latestIteration().exists(_ >= 1))
    val resumed = byIndex(g,
      algos.DeltaStepping.run(g, root, delta = 2.0,
        ckpt = Some(ck), ckptEvery = 1, resume = true).distances, "dist")
    assert(resumed.keySet == full.keySet)
    full.foreach { case (i, v) =>
      assert(math.abs(resumed(i).asInstanceOf[Double] - v.asInstanceOf[Double]) < 1e-12,
        s"vertex $i")
    }
    g.unpersist()
  }

  test("Truss: 3-truss keeps the cliques with exact support, peels the tail; 5-truss empty") {
    val cliques = (for { a <- 0 until 4; b <- 0 until 4 if a < b } yield (a, b)) ++
      (for { a <- 4 until 8; b <- 4 until 8 if a < b } yield (a, b))
    val tail = Seq((3, 8), (8, 9), (9, 10)) // tree fringe off clique 1
    val g = graphOf(cliques ++ tail, symmetric = true)
    val t3 = algos.Truss.keyed(g, k = 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // survivors: exactly the 12 clique edges, each closing 2 triangles
    assert(t3.length == 12)
    assert(t3.forall(_._3 == 2L))
    assert(!t3.exists(e => e._1 == keyOf(9) || e._2 == keyOf(9)))
    val t5 = algos.Truss.run(g, k = 5)
    assert(t5.edges.count() == 0)
    g.unpersist()
  }

  test("batch PPR: one loop over K seeds equals K single-seed runs") {
    val edges = Seq((0, 1), (1, 2), (2, 3), (3, 0), (2, 4), (4, 5), (5, 6), (6, 4), (7, 8))
    val g = graphOf(edges, symmetric = true)
    val ids = indexOf(g).map(_.swap)
    val seeds = Seq(ids(0), ids(4))
    val batch = algos.PersonalizedPageRank.runBatch(g, seeds, iterations = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    seeds.foreach { s =>
      val single = algos.PersonalizedPageRank.run(g, Seq(s), iterations = 5).scores
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      single.foreach { case (id, sc) =>
        assert(math.abs(batch((s, id)) - sc) < 1e-12, s"seed $s vertex $id")
      }
      // vertices outside the single-seed support must be exactly zero
      batch.filter(_._1._1 == s).foreach { case ((_, id), v) =>
        if (!single.contains(id)) assert(v == 0.0)
      }
    }
    g.unpersist()
  }

  test("community LP: each clique settles on ONE label, cliques stay distinct") {
    val cliques = (for { a <- 0 until 4; b <- 0 until 4 if a < b } yield (a, b)) ++
      (for { a <- 4 until 8; b <- 4 until 8 if a < b } yield (a, b))
    val g = graphOf(cliques, symmetric = true)
    val m = algos.LabelPropagation.communities(g).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert((0 until 4).map(i => m(keyOf(i))).toSet.size == 1, "clique 1 uniform")
    assert((4 until 8).map(i => m(keyOf(i))).toSet.size == 1, "clique 2 uniform")
    assert(m(keyOf(0)) != m(keyOf(4)), "cliques keep distinct communities")
    g.unpersist()
  }

  test("Matching: valid (disjoint) and maximal on path + clique + star") {
    val edges = (0 until 7).map(i => (i, i + 1)) ++ // path 0..7
      (for { a <- 10 until 14; b <- 10 until 14 if a < b } yield (a, b)) ++ // K4
      (20 until 25).map(i => (20, i + 1)) // star at 20
    val g = graphOf(edges, symmetric = true)
    val m = algos.Matching.run(g).matching.collect()
      .map(r => (r.getString(0), r.getString(1)))
    val vs = m.flatMap(p => Seq(p._1, p._2))
    assert(vs.length == vs.distinct.length, "matching must be vertex-disjoint")
    val mv = vs.toSet
    edges.foreach { case (a, b) =>
      assert(mv.contains(keyOf(a)) || mv.contains(keyOf(b)),
        s"unmatched edge ($a,$b) with both endpoints free — not maximal")
    }
    g.unpersist()
  }

  test("coarsen: edge multiplicities conserve E minus contracted pairs; no self-edges") {
    val edges = (0 until 7).map(i => (i, i + 1)) ++
      (for { a <- 10 until 14; b <- 10 until 14 if a < b } yield (a, b)) ++
      (20 until 25).map(i => (20, i + 1))
    val g = graphOf(edges, symmetric = true)
    val m = algos.Matching.run(g).matching
    val c = algos.Matching.coarsen(g, m).collect()
    assert(c.forall(r => r.getString(0) < r.getString(1)), "key-oriented, no self-edges")
    // only the matched edges vanish inside supervertices; every other
    // original edge lands in exactly one contracted row's multiplicity
    assert(c.map(_.getLong(2)).sum == edges.length - m.count())
    g.unpersist()
  }

  test("coarsening preserves components: CC on the coarse graph = CC on the fine graph") {
    // every component keeps >= 2 supervertices, so none vanishes from
    // the edge-derived coarse vertex set: path7, K4, 5-cycle
    val edges = (0 until 6).map(i => (i, i + 1)) ++
      (for { a <- 10 until 14; b <- 10 until 14 if a < b } yield (a, b)) ++
      (20 until 25).map(i => (i, if (i == 24) 20 else i + 1))
    val g = graphOf(edges, symmetric = true)
    val c = algos.Matching.coarsen(g, algos.Matching.run(g).matching)
    val gc = LinkGraph.fromKeyEdges(
      c.select(col("su_key").as("src_key"), col("sv_key").as("dst_key"),
        lit(1.0).as("weight")),
      symmetric = true, numPartitions)
    val nFine = algos.ConnectedComponents.componentCount(
      algos.ConnectedComponents.run(g).labels)
    val nCoarse = algos.ConnectedComponents.componentCount(
      algos.CCStar.run(gc).labels)
    assert(nFine == 3 && nCoarse == 3)
    g.unpersist(); gc.unpersist()
  }

  test("assortativity sums: closed form on a star") {
    val g = graphOf(Seq((0, 1), (0, 2), (0, 3), (0, 4)), symmetric = true)
    val r = algos.DegreeStats.assortativity(g).collect().head
    // hub degree 4, leaves 1: 8 directed rows; Σdudv = 8·4; Σdu = 4·4+4;
    // Σdu² = 16·4+4
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == (8L, 32L, 20L, 68L))
    g.unpersist()
  }

  test("Truss: interrupted and resumed peel yields the identical truss") {
    val edges = (for { a <- 0 until 5; b <- 0 until 5 if a < b } yield (a, b)) ++
      Seq((4, 8), (8, 9), (9, 4), (9, 10), (10, 11))
    val g = graphOf(edges, symmetric = true)
    val full = algos.Truss.run(g, k = 4).edges.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ck = Checkpoint(java.nio.file.Files.createTempDirectory("graft-truss").toString)
    algos.Truss.run(g, k = 4, maxRounds = 1, ckpt = Some(ck)) // "kill" after round 1
    assert(ck.latestIteration().contains(1))
    val resumed = algos.Truss.run(g, k = 4, ckpt = Some(ck), resume = true).edges.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(resumed == full)
    g.unpersist()
  }

  // ---- as-of join ----

  test("asOfJoin picks the latest strictly-earlier quote per key") {
    val probes = Seq(("a", 5), ("a", 2), ("a", 1), ("b", 4))
      .toDF("k", "ord")
    val quotes = Seq(("a", 1, "q1"), ("a", 3, "q3"), ("a", 5, "q5"), ("b", 9, "q9"))
      .toDF("k", "ord", "txt")
    val got = Temporal.asOfJoin(probes, quotes, "k", "ord", Seq("txt"))
      .select(col("k"), col("ord"), col("asof.q_ord"), col("asof.txt"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSet
    // probe a@5: quote@5 is EXCLUDED (strict), latest earlier is q3;
    // probe a@1: no earlier quote -> dropped; b@4: quote@9 later -> dropped
    assert(got == Set(("a", 5, 3, "q3"), ("a", 2, 1, "q1")))
  }

  test("asOfJoin breaks equal-ord quote ties deterministically (max payload)") {
    val probes = Seq(("k", 10)).toDF("k", "ord")
    val quotes = Seq(("k", 4, "aa"), ("k", 4, "zz")).toDF("k", "ord", "txt")
    val got = Temporal.asOfJoin(probes, quotes, "k", "ord", Seq("txt"))
      .select(col("asof.txt")).as[String].collect().toSeq
    assert(got == Seq("zz"))
  }

  // ---- range join ----

  test("rangeJoin: half-open bounds, multi-bucket intervals, exactly-once pairs") {
    val points = Seq(0L, 9L, 10L, 25L, 34L, 35L).toDF("pt")
    // [10, 35) spans buckets 1..3 at width 10; [0, 10) exactly bucket 0
    val intervals = Seq(("w1", 10L, 35L), ("w0", 0L, 10L)).toDF("name", "s", "e")
    val got = Temporal.rangeJoin(points, intervals, "pt", "s", "e", bucketWidth = 10L)
      .groupBy(col("name")).agg(count(lit(1)).as("n"), sum(col("pt")).as("ps"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // w1 gets {10, 25, 34} (35 excluded: half-open); w0 gets {0, 9}
    assert(got == Set(("w1", 3L, 69L), ("w0", 2L, 9L)))
  }

  test("toolSliding: each invocation lands in exactly len/slide = 2 hopping windows") {
    val mk = (s: String) => java.sql.Timestamp.valueOf(s)
    val t = Seq(
      ("c0", 0, "tool", "x", Some("t1"), mk("2026-01-01 10:05:00")),
      ("c0", 1, "tool", "x", Some("t1"), mk("2026-01-01 10:40:00")),
      ("c1", 0, "user", "x", None, mk("2026-01-01 10:06:00")))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val rows = streaming.EdgeStream.toolSliding(t).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._3).sum == 4, "2 invocations x 2 windows")
    val base = rows.map(_._1).min
    assert(rows.map(r => (r._1 - base, r._3)).toSet == Set((0L, 1L), (1800L, 2L), (3600L, 1L)))
    assert(rows.forall(_._2 == "t1"))
  }

  // ---- Bloom sketch ----

  test("bloom: packed registers give zero false negatives and merge by bit_or") {
    val docs = (0 until 40).map(i => (i.toLong, s"document number $i body", s"s${i % 2}"))
      .toDF("doc_id", "text", "source")
    val regs = Sketch.bloom(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bySource = regs.groupBy(_._1).view
      .mapValues(_.map(x => x._2 -> x._3).toMap).toMap
    (0 until 40).foreach { i =>
      assert(Sketch.bloomContains(bySource(s"s${i % 2}"), s"document number $i body"),
        s"false negative for doc $i")
    }
    // merged filter (bit_or across sources) still contains everything
    val merged = regs.groupBy(_._2).view
      .mapValues(_.map(_._3).reduce(_ | _)).toMap
    (0 until 40).foreach { i =>
      assert(Sketch.bloomContains(merged, s"document number $i body"))
    }
    // word index stays within the 4096-bit geometry
    assert(regs.forall { case (_, w, _) => w >= 0 && w < (4096 + 59) / 60 })
  }

  // ---- SemDeDup ----

  test("semDedup drops exactly the vectors with a smaller-id cluster-mate above threshold") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.999f, 0.01f, 0.0f)), // near-dup of 0
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(0.0f, 0.0f, 1.0f)),
      (4L, Seq(0.01f, 0.999f, 0.0f)) // near-dup of 2
    ).toDF("vec_id", "embedding")
    val kept = Similarity.semDedup(emb, nlist = 2, lloydIters = 1, simThresholdE4 = 9500)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // invariants that hold under ANY clustering: a vector whose only
    // cosine≥τ partner has a LARGER id can never drop (0, 2), and an
    // all-orthogonal vector has no partner at all (3)
    assert(Set(0L, 2L, 3L).subsetOf(kept.keySet))
    // a near-dup twin survives ONLY by landing in a different cluster
    kept.get(1L).foreach(c => assert(c != kept(0L), "1 kept while co-clustered with 0"))
    kept.get(4L).foreach(c => assert(c != kept(2L), "4 kept while co-clustered with 2"))
  }

  // ---- ROLLUP census ----

  test("langRollup emits per-(source,lang), per-source, and grand-total rows") {
    val docs = Seq(
      (0L, "the and is with that", "s0"),
      (1L, "der und die das ist", "s0"),
      (2L, "the of to in it", "s1")
    ).toDF("doc_id", "text", "source")
    val rows = TextStats.langRollup(docs).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getLong(2), r.getLong(3)))
    val total = rows.filter(r => r._1.isEmpty && r._2.isEmpty)
    assert(total.length == 1 && total.head._3 == 3L)
    val s0 = rows.filter(r => r._1.contains("s0") && r._2.isEmpty)
    assert(s0.length == 1 && s0.head._3 == 2L)
    assert(rows.count(r => r._1.nonEmpty && r._2.nonEmpty) == 3)
    // char mass adds up
    assert(total.head._4 == rows.filter(r => r._1.nonEmpty && r._2.nonEmpty).map(_._4).sum)
  }
}
