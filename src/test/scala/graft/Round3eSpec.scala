package graft

import org.apache.spark.sql.functions._

import graft.algos.WidestPath
import graft.operators.Bipartite
import graft.pipeline.Redact

/** Round-3e operators: butterfly counting, hop-bounded widest path,
 * PII-style pattern scrubbing. */
class Round3eSpec extends SparkSpec {

  // ---------- butterflies ----------

  private def membershipOf(rows: Seq[(String, String)]) = {
    import spark.implicits._
    rows.toDF("entity", "group")
  }

  test("butterflies: complete 2x2 bicliques counted as C(c,2) per group pair") {
    // c1,c2,c3 all use t1,t2; only c3 uses t3
    val m = membershipOf(Seq(
      "c1" -> "t1", "c1" -> "t2",
      "c2" -> "t1", "c2" -> "t2",
      "c3" -> "t1", "c3" -> "t2", "c3" -> "t3",
      "c3" -> "t3")) // duplicate membership must not double-count
    val out = Bipartite.butterflies(m).collect()
    assert(out.length == 1) // (t1,t3) and (t2,t3) share only c3 → filtered
    val r = out.head
    assert(r.getString(0) == "t1" && r.getString(1) == "t2")
    assert(r.getLong(2) == 3 && r.getLong(3) == 3) // C(3,2) = 3
  }

  test("butterflies: entity-degree cap drops capped entities' wedges") {
    val m = membershipOf(Seq(
      "c1" -> "t1", "c1" -> "t2",
      "c2" -> "t1", "c2" -> "t2",
      "c3" -> "t1", "c3" -> "t2", "c3" -> "t3"))
    val out = Bipartite.butterflies(m, maxEntityDegree = 2).collect()
    assert(out.length == 1)
    assert(out.head.getLong(2) == 2 && out.head.getLong(3) == 1)
  }

  // ---------- hop-bounded widest path ----------

  /** Brute-force hop-bounded bottleneck DP over an undirected graph. */
  private def bruteWidest(
      n: Int,
      edges: Seq[(Int, Int, Double)],
      root: Int,
      maxHops: Int): Map[Int, Double] = {
    val adj = edges.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    var cap = Map(root -> WidestPath.RootCap)
    for (_ <- 1 to maxHops) {
      val nxt = adj.flatMap { case (u, v, w) =>
        cap.get(u).map(c => v -> math.min(c, w))
      }.groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).max }
      cap = (cap.keySet ++ nxt.keySet)
        .map(v => v -> math.max(cap.getOrElse(v, 0.0), nxt.getOrElse(v, 0.0)))
        .toMap
    }
    cap
  }

  test("widest: picks the max-bottleneck route, not the shortest") {
    // 0→3 via 1: bottleneck 4 (wider first hop); via 2: bottleneck 5
    val edges = Seq((0, 1, 10.0), (1, 3, 4.0), (0, 2, 5.0), (2, 3, 5.0))
    val g = graphOf(edges.map(e => (e._1, e._2)), symmetric = true,
      weights = edges.map(e => (e._1, e._2) -> e._3).toMap)
    val idx = indexOf(g)
    val root = idx.collectFirst { case (id, 0) => id }.get
    val got = byIndex(g, WidestPath.run(g, root, maxHops = 12).caps, "cap")
      .map { case (v, c) => v -> c.asInstanceOf[Double] }
    assert(got(3) == 5.0 && got(1) == 10.0 && got(2) == 5.0)
    assert(got(0) == WidestPath.RootCap)
    g.unpersist()
  }

  test("widest: hop bound truncates exactly at maxHops (brute-force replay)") {
    val edges = Seq(
      (0, 1, 9.0), (1, 2, 8.0), (2, 3, 7.0), (3, 4, 6.0),
      (0, 5, 2.0), (5, 4, 2.0), (1, 5, 3.0), (2, 5, 1.0))
    val g = graphOf(edges.map(e => (e._1, e._2)), symmetric = true,
      weights = edges.map(e => (e._1, e._2) -> e._3).toMap)
    val idx = indexOf(g)
    val root = idx.collectFirst { case (id, 0) => id }.get
    for (hops <- 1 to 5) {
      val brute = bruteWidest(6, edges, 0, hops)
      val got = byIndex(g, WidestPath.run(g, root, maxHops = hops).caps, "cap")
        .map { case (v, c) => v -> c.asInstanceOf[Double] }
      assert(got == brute, s"hops=$hops")
    }
    g.unpersist()
  }

  // ---------- Borůvka MSF ----------

  /** Kruskal with union-find under the engine's (w, akey, bkey) total
   * order — the MSF is unique under it, so ANY correct algorithm must
   * produce this exact edge set. */
  private def bruteMsf(edges: Seq[(Int, Int, Double)]): Set[(String, String, Double)] = {
    val parent = scala.collection.mutable.Map[Int, Int]()
    def find(x: Int): Int = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val canon = edges.map { case (x, y, w) =>
      val (a, b) = if (keyOf(x) < keyOf(y)) (x, y) else (y, x)
      (w, keyOf(a), keyOf(b), x, y)
    }.sortBy(t => (t._1, t._2, t._3))
    canon.flatMap { case (w, ak, bk, x, y) =>
      val (rx, ry) = (find(x), find(y))
      if (rx == ry) None
      else { parent(rx) = ry; Some((ak, bk, w)) }
    }.toSet
  }

  private def msfOf(g: LinkGraph): Set[(String, String, Double)] =
    algos.Msf.run(g).forest.collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet

  test("msf: equals Kruskal on a weighted multi-component graph") {
    // two components + a cycle whose heaviest edge must be dropped
    val edges = Seq(
      (0, 1, 4.0), (1, 2, 2.0), (2, 0, 3.0), // triangle: drop (0,1)
      (2, 3, 1.0),
      (4, 5, 7.0), (5, 6, 5.0)) // separate chain component
    val g = graphOf(edges.map(e => (e._1, e._2)), symmetric = true,
      weights = edges.map(e => (e._1, e._2) -> e._3).toMap)
    assert(msfOf(g) == bruteMsf(edges))
    g.unpersist()
  }

  test("msf: tie-break on (akey, bkey) when weights are equal") {
    // all weights equal: the MSF is the lexicographically-first forest
    val edges = Seq((0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0), (2, 3, 1.0), (3, 0, 1.0))
    val g = graphOf(edges.map(e => (e._1, e._2)), symmetric = true,
      weights = edges.map(e => (e._1, e._2) -> e._3).toMap)
    assert(msfOf(g) == bruteMsf(edges))
    g.unpersist()
  }

  test("msf: hashed-weight pseudo-random graph matches Kruskal") {
    // deterministic irregular graph: 24 vertices, md5-derived weights
    def hw(a: Int, b: Int): Double =
      1 + (BigInt(1, java.security.MessageDigest.getInstance("MD5")
        .digest(s"w|$a|$b".getBytes("UTF-8"))).toLong.abs % 97).toDouble
    val pairs = (0 until 24).flatMap(i =>
      Seq((i, (i + 1) % 24), (i, (i * 7 + 3) % 24)).filter(p => p._1 != p._2))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val edges = pairs.map { case (a, b) => (a, b, hw(a, b)) }
    val g = graphOf(edges.map(e => (e._1, e._2)), symmetric = true,
      weights = edges.map(e => (e._1, e._2) -> e._3).toMap)
    val got = msfOf(g)
    assert(got == bruteMsf(edges))
    // spanning: |MSF| = V - components (this graph is connected)
    assert(got.size == 23)
    g.unpersist()
  }

  // ---------- Jones–Plassmann coloring ----------

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Sequential greedy coloring in decreasing (md5-priority, key)
   * order with mex over higher-priority neighbors — the schedule-
   * independent meaning of the JP result. */
  private def bruteColoring(n: Int, pairs: Seq[(Int, Int)]): Map[Int, Long] = {
    val adj = (0 until n).map(v => v -> pairs.collect {
      case (a, b) if a == v => b
      case (a, b) if b == v => a
    }.toSet).toMap
    def pri(v: Int): (Long, String) =
      (java.lang.Long.parseLong(md5hex(keyOf(v)).take(15), 16), keyOf(v))
    val order = (0 until n).sortBy(v => pri(v)).reverse // decreasing
    val color = scala.collection.mutable.Map[Int, Long]()
    for (v <- order) {
      val used = adj(v).flatMap(color.get) // colored ⇔ higher priority
      color(v) = Iterator.from(0).map(_.toLong).find(!used.contains(_)).get
    }
    color.toMap
  }

  test("coloring: equals sequential greedy by priority; proper on random graphs") {
    for (seed <- 1 to 3) {
      val n = 16
      val pairs = (0 until n).flatMap(i =>
        Seq((i, (i + 1) % n), (i, (i * 5 + seed) % n)).filter(p => p._1 != p._2))
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val g = graphOf(pairs, symmetric = true)
      val got = byIndex(g, algos.Coloring.run(g).colors, "colr")
        .map { case (v, c) => v -> c.asInstanceOf[Long] }
      assert(got == bruteColoring(n, pairs), s"seed=$seed")
      // proper coloring: no edge is monochromatic
      pairs.foreach { case (a, b) => assert(got(a) != got(b), s"edge ($a,$b)") }
      g.unpersist()
    }
  }

  // ---------- positional winnowing ----------

  /** Plain-Scala winnowing replay (same md5 40-bit gram hashes). */
  private def bruteWinnow(text: String, w: Int = 4): Set[(Long, Long)] = {
    val toks = text.split(" ")
    val grams = (0 to toks.length - 3).map { i =>
      val h = java.lang.Long.parseLong(
        md5hex(s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}").take(10), 16)
      (i.toLong, h)
    }
    val starts = 0 to math.max(grams.length - w, 0)
    starts.flatMap { s =>
      val win = grams.slice(s, s + w)
      Some(win.minBy { case (p, h) => (h, -p) }).map { case (p, h) => (p, h) }
    }.toSet
  }

  test("winnow: matches the plain-Scala replay, incl. short docs") {
    import spark.implicits._
    val texts = Seq(
      1L -> "a b c d e f g h",
      2L -> "x y z w", // 2 grams < window: single all-gram frame
      3L -> "p q r") // 1 gram
    val docs = texts.toDF("doc_id", "text")
    val got = graft.pipeline.TextStats.winnow(docs).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).groupBy(_._1)
      .map { case (d, xs) => d -> xs.map(_._2).toSet }
    texts.foreach { case (d, t) =>
      assert(got(d) == bruteWinnow(t), s"doc $d")
    }
  }

  test("winnow: docs sharing a long span share a fingerprint hash") {
    import spark.implicits._
    val shared = "k1 k2 k3 k4 k5 k6 k7 k8"
    val docs = Seq(
      1L -> s"aa bb cc $shared dd ee",
      2L -> s"zz $shared yy xx ww vv uu").toDF("doc_id", "text")
    val hs = graft.pipeline.TextStats.winnow(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (d, xs) => d -> xs.map(_._2).toSet }
    // winnowing guarantee: any shared ≥ w+k-1 = 6-token span ⇒ shared hash
    assert((hs(1L) intersect hs(2L)).nonEmpty)
  }

  // ---------- compaction ----------

  test("SnapshotTable.compact: single file per bucket, zero logical change") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val table = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val buckets = (0L until 20L).map(i => (i, (i / 5).toInt)).toDF("id", "bucket")
    val e0 = (0L until 20L).map(i => (i, i + 100L, 1.0)).toDF("src", "dst", "weight")
    assert(SnapshotTable.commit(e0, buckets, table, maxRecordsPerFile = 2) == 0)
    def files(snap: Int, b: Int) =
      new java.io.File(s"$table/snap=$snap/bucket=$b").listFiles()
        .count(_.getName.endsWith(".parquet"))
    assert((0 to 3).exists(files(0, _) > 1), "capped commit must fragment")
    assert(SnapshotTable.compact(spark, table) == 1)
    (0 to 3).foreach(b => assert(files(1, b) == 1, s"bucket $b not compacted"))
    // identical data, manifest-visible rewrite, EMPTY row-level changelog
    val v0 = SnapshotTable.read(spark, table, Some(0)).select("src", "dst", "weight")
    val v1 = SnapshotTable.read(spark, table, Some(1)).select("src", "dst", "weight")
    assert(v0.collect().toSet == v1.collect().toSet)
    assert(SnapshotTable.changedBuckets(table, 0, 1).nonEmpty)
    assert(SnapshotTable.changes(spark, table, 0, 1).count() == 0)
    // idempotent: nothing fragmented → no new snapshot
    assert(SnapshotTable.compact(spark, table) == 1)
    // point lookups still prune through inherited blooms
    assert(SnapshotTable.readPoint(spark, table, 117L).count() == 1)
  }

  // ---------- snapshot changelog (CDC) ----------

  test("SnapshotTable.changes: incremental read diffs only rewritten buckets") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val table = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    val buckets = (0L until 20L).map(i => (i, (i / 5).toInt)).toDF("id", "bucket")
    val e0 = (0L until 20L).map(i => (i, i + 100L, 1.0)).toDF("src", "dst", "weight")
    assert(SnapshotTable.commit(e0, buckets, table) == 0)
    val up = Seq((3L, 103L, 9.0), (4L, 999L, 7.0)).toDF("src", "dst", "weight")
    assert(SnapshotTable.merge(up, buckets, table) == 1)
    // manifest-level pruning: only bucket 0 was rewritten
    assert(SnapshotTable.changedBuckets(table, 0, 1) == Set(0))
    val ch = SnapshotTable.changes(spark, table, 0, 1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(ch == Set(("update", 3L, 103L, 9.0), ("insert", 4L, 999L, 7.0)))
    // identical snapshots: empty changelog, zero buckets read
    assert(SnapshotTable.changedBuckets(table, 1, 1).isEmpty)
    assert(SnapshotTable.changes(spark, table, 1, 1).count() == 0)
    // reverse direction: the update shows the OLD value, insert→delete
    val rev = SnapshotTable.changes(spark, table, 1, 0).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rev == Set(("update", 3L, 103L, 1.0), ("delete", 4L, 999L, 7.0)))
  }

  // ---------- pattern scrub ----------

  test("redact: digit runs counted and replaced") {
    import spark.implicits._
    val t = Seq(
      ("c1", 0, "error {\"k\": 69}"),
      ("c1", 1, "click 12 and 345 done"),
      ("c2", 0, "no digits here"))
      .toDF("conv_id", "turn_idx", "text")
    val out = Redact.scrub(t).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getString(3)))
      .toMap
    assert(out(("c1", 0)) == (1L, "error {\"k\": <N>}"))
    assert(out(("c1", 1)) == (2L, "click <N> and <N> done"))
    assert(out(("c2", 0)) == (0L, "no digits here"))
  }
}
