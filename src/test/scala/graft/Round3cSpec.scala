package graft

import org.apache.spark.sql.functions._

import graft.algos._
import graft.sources.EdgeBuilder

/** Round-3c operators: SCC (FW-BW coloring), Katz centrality, Wyllie
 * list ranking, modularity statistics, tool-transition builder. */
class Round3cSpec extends SparkSpec {
  import spark.implicits._

  // ---------- SCC ----------

  private def bruteScc(n: Int, pairs: Seq[(Int, Int)]): Map[Int, Int] = {
    val reach = Array.fill(n, n)(false)
    for (i <- 0 until n) reach(i)(i) = true
    pairs.foreach { case (a, b) => reach(a)(b) = true }
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (reach(i)(k) && reach(k)(j)) reach(i)(j) = true
    (0 until n).map(v =>
      v -> (0 until n).filter(u => reach(v)(u) && reach(u)(v)).min).toMap
  }

  /** Engine scc labels (min ID — ids are hash-bucketed, not
   * key-ordered) → canonical grouping keyed by min member INDEX. */
  private def sccByMinIndex(g: LinkGraph): Map[Int, Int] = {
    val raw = byIndex(g, Scc.run(g).sccs, "scc")
      .map { case (v, s) => v -> s.asInstanceOf[Long] }
    val rep = raw.groupBy(_._2).map { case (s, m) => s -> m.keys.min }
    raw.map { case (v, s) => v -> rep(s) }
  }

  test("SCC: two cycles bridged one-way, tails are singletons") {
    // {0,1,2} cycle → 3; {3,4} cycle; 5→3; 6→7
    val pairs = Seq((0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 3), (5, 3), (6, 7))
    val g = graphOf(pairs, symmetric = false)
    assert(sccByMinIndex(g) == bruteScc(8, pairs))
    g.unpersist()
  }

  test("SCC equals brute-force mutual reachability on random digraphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 10 + trial
      val pairs = (0 until (3 * n)).map(_ => (rnd.nextInt(n), rnd.nextInt(n)))
        .filter(p => p._1 != p._2).distinct
      val present = pairs.flatMap(p => Seq(p._1, p._2)).distinct.toSet
      val g = graphOf(pairs, symmetric = false)
      val want = bruteScc(n, pairs).filter { case (v, _) => present(v) }
      assert(sccByMinIndex(g) == want, s"trial $trial")
      g.unpersist()
    }
  }

  test("toolTransitions keeps strictly dominant directions only") {
    // conv rows: A,B,A,B,A → A→B twice, B→A twice (tie, both dropped);
    // then C,A in two convs and A,C in one → C→A kept
    def conv(id: String, tools: Seq[String]) =
      tools.zipWithIndex.map { case (t, i) => (id, i, "tool", s"x$i", Some(t), null: java.sql.Timestamp) }
    val rows = conv("c1", Seq("A", "B", "A", "B", "A")) ++
      conv("c2", Seq("C", "A")) ++ conv("c3", Seq("C", "A")) ++
      conv("c4", Seq("A", "C"))
    val tr = rows.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val got = EdgeBuilder.toolTransitions(tr)
      .select(col("src_key"), col("dst_key"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("C", "A")))
  }

  // ---------- Katz ----------

  test("Katz on a path and a diamond: exact scaled-integer values") {
    // path 0→1→2: katz_x = 8^5·Σ 8^-k·paths_k
    val g = graphOf(Seq((0, 1), (1, 2)), symmetric = false)
    val got = byIndex(g, Katz.run(g).katz, "katz_x")
    assert(got == Map(0 -> 0L, 1 -> 4096L, 2 -> (4096L + 512L)))
    g.unpersist()
    val g2 = graphOf(Seq((0, 2), (1, 2)), symmetric = false)
    assert(byIndex(g2, Katz.run(g2).katz, "katz_x") ==
      Map(0 -> 0L, 1 -> 0L, 2 -> 8192L))
    g2.unpersist()
  }

  test("Katz equals the naive matrix-power series on random digraphs") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 2) {
      val n = 9 + trial
      val pairs = (0 until (2 * n)).map(_ => (rnd.nextInt(n), rnd.nextInt(n)))
        .filter(p => p._1 != p._2).distinct
      val g = graphOf(pairs, symmetric = false)
      // paths_k via repeated mat-vec: p_k(v) = Σ_{u→v} p_{k-1}(u)
      var p = Array.fill(n)(1L)
      val acc = Array.fill(n)(0L)
      for (_ <- 1 to 5) {
        val nx = Array.fill(n)(0L)
        pairs.foreach { case (u, v) => nx(v) += p(u) }
        for (v <- 0 until n) acc(v) = acc(v) * 8 + nx(v)
        p = nx
      }
      val present = pairs.flatMap(e => Seq(e._1, e._2)).distinct
      val want = present.map(v => v -> acc(v)).toMap
      assert(byIndex(g, Katz.run(g).katz, "katz_x") == want, s"trial $trial")
      g.unpersist()
    }
  }

  // ---------- ListRank ----------

  test("ListRank: multiple chains, ranks = distance to chain end") {
    // chains: a0→a1→…→a6, b0→b1, c0 (isolated terminal)
    val succ = (
      (0 until 6).map(i => (s"a$i", s"a${i + 1}")) ++
        Seq(("a6", null: String), ("b0", "b1"), ("b1", null: String), ("c0", null: String))
      ).toDF("id", "nxt")
    val r = ListRank.run(succ, numPartitions)
    val got = r.ranks.collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val want = (0 to 6).map(i => s"a$i" -> (6L - i)).toMap ++
      Map("b0" -> 1L, "b1" -> 0L, "c0" -> 0L)
    assert(got == want)
    assert(r.rounds <= 4) // ⌈log₂ 6⌉ = 3 jumps + the settle round
  }

  test("ListRank: 100-element chain settles in O(log n) rounds") {
    val succ = ((0 until 99).map(i => (f"n$i%03d", f"n${i + 1}%03d")) :+
      (("n099", null: String))).toDF("id", "nxt")
    val r = ListRank.run(succ, numPartitions)
    val got = r.ranks.where(col("id") === "n000").collect()(0).getLong(1)
    assert(got == 99L)
    assert(r.rounds <= 8, s"rounds=${r.rounds}") // ⌈log₂ 99⌉ = 7
  }

  // ---------- tree-contracted critical path ----------

  test("runContracted equals DagDepth.run on chains, branches, and random DAGs") {
    // hand case: chain with a side branch and a shared sink
    val hand = Seq((0, 1), (1, 2), (2, 3), (3, 4), (0, 5), (5, 4), (2, 6))
    val rnd = new scala.util.Random(13)
    val cases = hand +: (1 to 3).map { _ =>
      val n = 12
      // forward-only edges keep it a DAG
      (0 until (2 * n)).map { _ =>
        val a = rnd.nextInt(n - 1); (a, a + 1 + rnd.nextInt(n - 1 - a))
      }.distinct
    }
    cases.foreach { pairs =>
      val g = graphOf(pairs, symmetric = false)
      val slow = byIndex(g, DagDepth.run(g).depth, "d")
      val fast = byIndex(g, DagDepth.runContracted(g).depth, "d")
      assert(fast == slow, s"pairs=$pairs")
      g.unpersist()
    }
  }

  test("runContracted settles a long chain in O(log L) total rounds") {
    val n = 60
    val g = graphOf((0 until n - 1).map(i => (i, i + 1)), symmetric = false)
    val r = DagDepth.runContracted(g)
    assert(byIndex(g, r.depth, "d") == (0 until n).map(i => i -> i.toLong).toMap)
    assert(r.iterations <= 10, s"rounds=${r.iterations}") // log₂ 59 ≈ 6 + relax
    g.unpersist()
  }

  // ---------- eccentricity / k-hop / extraction ----------

  test("eccentricity: path graph landmarks, exact max levels") {
    // path 0-1-2-3-4 (symmetric): ecc(0)=4 reaching all 5
    val g = graphOf((0 until 4).map(i => (i, i + 1)), symmetric = true)
    val ids = indexOf(g).map(_.swap)
    val dists = MultiSourceBfs.run(g, Seq(ids(0), ids(2))).dists
    val got = MultiSourceBfs.eccentricity(dists)
      .collect().map(r => indexOf(g)(r.getLong(0)) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(0 -> ((4L, 5L)), 2 -> ((2L, 5L))))
    g.unpersist()
  }

  test("khopDegreeSums: star and triangle, hand-checked") {
    // star 0-{1,2,3}: deg(0)=3, leaves 1. h1(0)=3·1=3, h1(leaf)=3.
    // h2(0)=Σ h1(leaf)=9, h2(leaf)=h1(0)=3.
    val g = graphOf(Seq((0, 1), (0, 2), (0, 3)), symmetric = true)
    val got = byIndex(g, DegreeStats.khopDegreeSums(g).select(
      col("id"), struct(col("h1"), col("h2")).as("h")), "h")
      .map { case (k, v) =>
        val r = v.asInstanceOf[org.apache.spark.sql.Row]; k -> ((r.getLong(0), r.getLong(1))) }
    assert(got == Map(0 -> ((3L, 9L)), 1 -> ((3L, 3L)), 2 -> ((3L, 3L)), 3 -> ((3L, 3L))))
    g.unpersist()
  }

  test("jsonField + convMetadata extract the payload integers") {
    val rows = Seq(
      ("c1", 0, "user", """click {"k": 5}""", null: String, null: java.sql.Timestamp),
      ("c1", 1, "user", """view {"k": -2}""", null: String, null: java.sql.Timestamp),
      ("c2", 0, "user", """signup {"j": 9}""", null: String, null: java.sql.Timestamp))
    val tr = rows.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val got = graft.pipeline.Extract.convMetadata(tr)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map("c1" -> ((2L, 3L, -2L, 5L)))) // c2 has no $.k
  }

  // ---------- bipartite projection ----------

  test("Bipartite.project: shared counts, dup tolerance, hub cap") {
    val m = Seq(
      ("c1", "t1"), ("c2", "t1"), ("c3", "t1"),
      ("c1", "t2"), ("c2", "t2"),
      ("c1", "t3"), ("c4", "t3"),
      ("c1", "t1") // duplicate membership row
    ).toDF("entity", "group")
    def proj(cap: Long) = graft.operators.Bipartite.project(m, cap)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(proj(0) == Map(
      ("c1", "c2") -> 2L, ("c1", "c3") -> 1L, ("c2", "c3") -> 1L, ("c1", "c4") -> 1L))
    // cap 2 drops t1 (group degree 3); t2/t3 pairs survive
    assert(proj(2) == Map(("c1", "c2") -> 1L, ("c1", "c4") -> 1L))
  }

  // ---------- neighbor sampling ----------

  test("NeighborSample: ≤s per vertex, subset of true neighbors, replayable") {
    // star 0-{1..5} plus edge 1-2 (symmetric)
    val g = graphOf((1 to 5).map(i => (0, i)) :+ ((1, 2)), symmetric = true)
    val run1 = NeighborSample.sample(g, s = 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sortBy(x => (x._1, x._3))
    val run2 = NeighborSample.sample(g, s = 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sortBy(x => (x._1, x._3))
    assert(run1.sameElements(run2)) // md5 determinism
    val bySrc = run1.groupBy(_._1)
    assert(bySrc(keyOf(0)).length == 3) // degree 5 capped at 3
    assert(bySrc(keyOf(3)).length == 1) // leaf keeps its only neighbor
    assert(bySrc(keyOf(1)).length == 2) // degree 2: both kept
    // sampled edges are real edges
    val adj = Set((0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (1, 2))
      .flatMap { case (a, b) => Set((keyOf(a), keyOf(b)), (keyOf(b), keyOf(a))) }
    assert(run1.forall(x => adj((x._1, x._2))))
    // within a vertex, ranks are 1..k ordered by the md5 priority
    assert(bySrc(keyOf(0)).map(_._3).sorted.sameElements(Array(1L, 2L, 3L)))
    g.unpersist()
  }

  // ---------- snapshot table ----------

  test("SnapshotTable: commit, time travel, manifest-only pruning") {
    import graft.sources.SnapshotTable
    val table = java.nio.file.Files.createTempDirectory("graft-snap").toString
    val buckets = (0L until 20L).map(i => (i, (i / 5).toInt)).toDF("id", "bucket")
    val e1 = (0L until 10L).map(i => (i, i + 100L, 1.0)).toDF("src", "dst", "weight")
    val e2 = (0L until 20L).map(i => (i, i + 100L, 1.0)).toDF("src", "dst", "weight")
    assert(SnapshotTable.commit(e1, buckets, table) == 0)
    assert(SnapshotTable.commit(e2, buckets, table) == 1)
    assert(SnapshotTable.latest(table).contains(1))
    assert(SnapshotTable.read(spark, table).count() == 20)
    // time travel: snapshot 0 still reads the old rows exactly
    val v0 = SnapshotTable.read(spark, table, Some(0))
    assert(v0.count() == 10 && v0.agg(max(col("src"))).first().getLong(0) == 9L)
    // pruning comes from the manifest alone: src ∈ [0,4] → bucket 0 only
    assert(SnapshotTable.selectBuckets(table, 1, 0L, 4L) == Seq(0))
    assert(SnapshotTable.selectBuckets(table, 1, 4L, 11L) == Seq(0, 1, 2))
    val ranged = SnapshotTable.readRange(spark, table, 4L, 11L)
    assert(ranged.count() == 8)
    assert(ranged.agg(min(col("src")), max(col("src"))).first().toSeq == Seq(4L, 11L))
  }

  test("SnapshotTable.merge: COW upsert rewrites only touched buckets, reuses the rest") {
    import graft.sources.SnapshotTable
    val table = java.nio.file.Files.createTempDirectory("graft-merge").toString
    val buckets = (0L until 20L).map(i => (i, (i / 5).toInt)).toDF("id", "bucket")
    val e0 = (0L until 20L).map(i => (i, i + 100L, 1.0)).toDF("src", "dst", "weight")
    assert(SnapshotTable.commit(e0, buckets, table) == 0)
    // updates: overwrite (3, 103) weight, insert (4, 999) — bucket 0 only
    val up = Seq((3L, 103L, 9.0), (4L, 999L, 7.0)).toDF("src", "dst", "weight")
    assert(SnapshotTable.merge(up, buckets, table) == 1)
    val v1 = SnapshotTable.read(spark, table).select("src", "dst", "weight").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(v1.size == 21) // 20 rows + 1 insert
    assert(v1((3L, 103L)) == 9.0 && v1((4L, 999L)) == 7.0 && v1((4L, 104L)) == 1.0)
    // time travel: snapshot 0 untouched
    val v0 = SnapshotTable.read(spark, table, Some(0))
    assert(v0.count() == 20 &&
      v0.where(col("src") === 3L).first().getDouble(2) == 1.0)
    // COW: only bucket 0 was physically rewritten under snap=1 …
    val snap1 = new java.io.File(s"$table/snap=1")
    assert(snap1.listFiles().map(_.getName).filter(_.startsWith("bucket=")).toSeq == Seq("bucket=0"))
    // … and range reads resolve inherited buckets through the manifest
    val ranged = SnapshotTable.readRange(spark, table, 6L, 12L)
    assert(ranged.count() == 7)
    assert(SnapshotTable.selectBuckets(table, 1, 15L, 19L) == Seq(3))
  }

  test("SnapshotTable: bloom point-lookup prunes buckets; exact through merge") {
    import graft.sources.SnapshotTable
    val table = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    val buckets = (0L until 20L).map(i => (i, (i / 5).toInt)).toDF("id", "bucket")
    val e0 = (0L until 20L).map(i => (i, i + 100L, 1.0)).toDF("src", "dst", "weight")
    SnapshotTable.commit(e0, buckets, table)
    // dst=117 lives only in bucket 3; blooms must keep 3 and prune most
    val pb = SnapshotTable.pointBuckets(table, 0, 117L)
    assert(pb.contains(3) && pb.size <= 2, s"picked $pb")
    val hit = SnapshotTable.readPoint(spark, table, 117L).collect()
    assert(hit.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((17L, 117L)))
    // absent key: no false negatives required, exact empty result
    assert(SnapshotTable.readPoint(spark, table, 555L).count() == 0)
    // after a merge, inherited buckets keep their blooms
    val up = Seq((3L, 103L, 9.0)).toDF("src", "dst", "weight")
    SnapshotTable.merge(up, buckets, table)
    val pb1 = SnapshotTable.pointBuckets(table, 1, 117L)
    assert(pb1.contains(3) && pb1.size <= 2, s"picked $pb1 after merge")
    val w = SnapshotTable.readPoint(spark, table, 103L).collect()
    assert(w.map(r => (r.getLong(0), r.getDouble(2))).toSeq == Seq((3L, 9.0)))
  }

  // ---------- modularity statistics ----------

  test("communityStats: two triangles + bridge, hand-checked sums") {
    val tri = Seq((0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3))
    val g = graphOf(tri, symmetric = true)
    val labels = (0 to 5).map(i => (keyOf(i), if (i <= 2) "A" else "B"))
      .toDF("key", "community")
    val got = LabelPropagation.communityStats(g, labels)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // each triangle: 3 intra edges; bridge endpoint degree 3, others 2
    assert(got == Map("A" -> ((3L, 3L, 7L)), "B" -> ((3L, 3L, 7L))))
    // modularity from the stats: m=7, Q·4m² = Σ (4m·e_c − d_c²)
    val q4m2 = got.values.map { case (_, e, d) => 4 * 7 * e - d * d }.sum
    assert(q4m2 == (84 - 49) * 2)
    g.unpersist()
  }
}
