package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.algos.{Betweenness, Bfs, ConnectedComponents, PageRank, Sssp}

/** Checkpoint write→read round-trip, lineage metadata, and
 * kill-and-resume equality (SURVEY.md §5.5). */
class CheckpointSpec extends SparkSpec {

  def tmpDir(): String =
    Files.createTempDirectory("graft-ckpt").toString

  val edges: Seq[(Int, Int)] = Seq(
    (0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0), (2, 6), (6, 7),
    (8, 9), (9, 10), (10, 8))

  test("checkpoint round-trip is exact and carries lineage") {
    val g = graphOf(edges, symmetric = false)
    val ck = Checkpoint(tmpDir())
    val state = g.degrees.select(col("id"), col("out_degree").cast("double").as("v"))
    ck.save(state, 3, 42L)
    assert(ck.latestIteration().contains(3))
    val back = ck.load(spark, 3)
    assert(back.exceptAll(state).count() == 0 && state.exceptAll(back).count() == 0)
    val lineage = ck.lineage(3)
    assert(lineage.contains("\"iteration\":3"))
    assert(lineage.contains("\"active_count\":42"))
    assert(lineage.contains("partition_hashes"))
  }

  test("PageRank: interrupted at iteration k, resumed run equals uninterrupted run") {
    val g = graphOf(edges, symmetric = false)
    val full = PageRank.run(g, iterations = 8)
    val dir = tmpDir()
    val ck = Checkpoint(dir)
    // "kill" after 4 supersteps (save every 2, so iter=4 is on disk)
    PageRank.run(g, iterations = 4, ckpt = Some(ck), ckptEvery = 2)
    assert(ck.latestIteration().contains(4))
    val resumed = PageRank.run(g, iterations = 8, ckpt = Some(ck), ckptEvery = 2, resume = true)
    val a = byIndex(g, full.ranks, "rank")
    val b = byIndex(g, resumed.ranks, "rank")
    assert(a.keySet == b.keySet)
    a.foreach { case (i, v) =>
      assert(math.abs(v.asInstanceOf[Double] - b(i).asInstanceOf[Double]) < 1e-12, s"vertex $i")
    }
  }

  test("BFS: resume from checkpoint yields the identical tree") {
    val g = graphOf(edges, symmetric = true)
    val root = 0L
    val full = Bfs.run(g, root)
    val ck = Checkpoint(tmpDir())
    // "kill" after 2 levels (save every level)
    Bfs.run(g, root, maxIterations = 2, ckpt = Some(ck), ckptEvery = 1)
    assert(ck.latestIteration().contains(2))
    val resumed = Bfs.run(g, root, ckpt = Some(ck), ckptEvery = 1, resume = true)
    assert(resumed.found == full.found)
    val a = full.tree.select(col("id"), col("parent"), col("level"))
    val b = resumed.tree.select(col("id"), col("parent"), col("level"))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("SSSP: resume from checkpoint yields identical distances") {
    val w = edges.map { case (a, b) => (a, b) -> (1.0 + (a + b) % 3) }.toMap
    val g = graphOf(edges, symmetric = true, weights = w)
    val root = 0L
    val full = Sssp.run(g, root)
    val ck = Checkpoint(tmpDir())
    Sssp.run(g, root, maxIterations = 2, ckpt = Some(ck), ckptEvery = 1)
    assert(ck.latestIteration().contains(2))
    val resumed = Sssp.run(g, root, ckpt = Some(ck), ckptEvery = 1, resume = true)
    val a = full.distances
    val b = resumed.distances
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("BC: forward phase resumes from the per-level sigma snapshot") {
    val g = graphOf(edges, symmetric = true)
    val root = 0L
    val full = Betweenness.run(g, root)
    val dir = tmpDir()
    val ck = Checkpoint(dir)
    // full run with checkpointing writes per-level snapshots
    Betweenness.run(g, root, ckpt = Some(ck), ckptEvery = 2)
    assert(ck.latestIteration().nonEmpty)
    // resume from the latest forward snapshot and re-derive bc
    val resumed = Betweenness.run(g, root, ckpt = Some(ck), ckptEvery = 2, resume = true)
    assert(resumed.levels == full.levels)
    val a = full.bc.select(col("id"), col("sigma"), round(col("bc") * 1e9).as("b9"))
    val b = resumed.bc.select(col("id"), col("sigma"), round(col("bc") * 1e9).as("b9"))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("CC: resume from checkpoint converges to identical labels") {
    val g = graphOf(edges, symmetric = true)
    val full = ConnectedComponents.run(g)
    val dir = tmpDir()
    val ck = Checkpoint(dir)
    ConnectedComponents.run(g, ckpt = Some(ck), ckptEvery = 1, maxIterations = 2)
    assert(ck.latestIteration().nonEmpty)
    val resumed = ConnectedComponents.run(g, ckpt = Some(ck), resume = true)
    val a = full.labels.withColumnRenamed("lbl", "a")
    val b = resumed.labels.withColumnRenamed("lbl", "b")
    assert(a.join(b, "id").where(col("a") =!= col("b")).count() == 0)
  }

  test("HITS: resume from the (auth, hub) snapshot yields identical scores") {
    import graft.algos.Hits
    val g = graphOf(edges, symmetric = false)
    val full = Hits.run(g, iterations = 4)
    val ck = Checkpoint(tmpDir())
    Hits.run(g, iterations = 2, ckpt = Some(ck), ckptEvery = 2)
    assert(ck.latestIteration().contains(2))
    val resumed = Hits.run(g, iterations = 4, ckpt = Some(ck), ckptEvery = 2, resume = true)
    val a = full.scores
    val b = resumed.scores
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("PPR: resume mid-walk yields identical scores") {
    import graft.algos.PersonalizedPageRank
    val g = graphOf(edges, symmetric = false)
    val full = PersonalizedPageRank.run(g, Seq(0L), iterations = 5)
    val ck = Checkpoint(tmpDir())
    PersonalizedPageRank.run(g, Seq(0L), iterations = 2, ckpt = Some(ck), ckptEvery = 2)
    assert(ck.latestIteration().contains(2))
    val resumed = PersonalizedPageRank.run(
      g, Seq(0L), iterations = 5, ckpt = Some(ck), ckptEvery = 2, resume = true)
    val a = full.scores.select(col("id"), round(col("score") * 1e9).as("s9"))
    val b = resumed.scores.select(col("id"), round(col("score") * 1e9).as("s9"))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("MSBFS: resume from checkpoint yields identical landmark distances") {
    import graft.algos.MultiSourceBfs
    val g = graphOf(edges, symmetric = true)
    val roots = Seq(0L, 8L).map(i => indexOf(g).collectFirst {
      case (id, idx) if idx == i => id }.get)
    val full = MultiSourceBfs.run(g, roots)
    val ck = Checkpoint(tmpDir())
    MultiSourceBfs.run(g, roots, maxIterations = 2, ckpt = Some(ck), ckptEvery = 1)
    assert(ck.latestIteration().contains(2))
    val resumed = MultiSourceBfs.run(g, roots, ckpt = Some(ck), ckptEvery = 1, resume = true)
    assert(resumed.reached == full.reached)
    val a = full.dists
    val b = resumed.dists
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("MIS: resume mid-round yields the identical member set") {
    import graft.algos.Mis
    val g = graphOf(edges, symmetric = true)
    val full = Mis.run(g)
    val ck = Checkpoint(tmpDir())
    Mis.run(g, maxRounds = 1, ckpt = Some(ck), ckptEvery = 1)
    assert(ck.latestIteration().contains(1))
    val resumed = Mis.run(g, ckpt = Some(ck), ckptEvery = 1, resume = true)
    val a = full.mis
    val b = resumed.mis
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    assert(full.size > 0)
  }

  test("k-core: resume mid-peel yields the identical core") {
    import graft.algos.KCore
    val g = graphOf(edges :+ ((4, 1)), symmetric = true) // cycle + tails
    val full = KCore.run(g, k = 2)
    val ck = Checkpoint(tmpDir())
    KCore.run(g, k = 2, maxRounds = 1, ckpt = Some(ck), ckptEvery = 1)
    assert(ck.latestIteration().nonEmpty)
    val resumed = KCore.run(g, k = 2, ckpt = Some(ck), ckptEvery = 1, resume = true)
    val a = full.core
    val b = resumed.core
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    assert(full.core.count() > 0, "fixture must have a nonempty 2-core")
  }
}
