package graft

import org.apache.spark.sql.functions._

import graft.algos.Anf

/** HyperANF: exact register replay vs brute-force balls, estimator
 * sanity, neighborhood-function shape. */
class AnfSpec extends SparkSpec {

  /** Scala replay of the engine's 60-bit md5 register derivation. */
  private def reg(key: String): (Long, Long) = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(15)
    val h = java.lang.Long.parseLong(hex, 16)
    val w = h >> Anf.p
    val rho = if (w == 0) 57L else 57L - (64 - java.lang.Long.numberOfLeadingZeros(w))
    (h % Anf.m, rho)
  }

  /** Brute-force T-balls over undirected pairs → expected sparse
   * registers per vertex index. */
  private def bruteRegisters(
      n: Int, pairs: Seq[(Int, Int)], t: Int): Map[Int, Map[Long, Long]] = {
    val adj = Array.fill(n)(Set.newBuilder[Int])
    pairs.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    val nbrs = adj.map(_.result())
    (0 until n).map { v =>
      var ball = Set(v)
      for (_ <- 1 to t) ball = ball ++ ball.flatMap(nbrs)
      val regs = ball.toSeq.map(u => reg(keyOf(u)))
        .groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
      v -> regs
    }.toMap
  }

  private def engineRegisters(
      g: LinkGraph, t: Int): Map[Int, Map[Long, Long]] = {
    val idx = indexOf(g)
    Anf.run(g, iterations = t).registers.collect()
      .map(r => (idx(r.getLong(0)), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (v, rs) => v -> rs.map(x => x._2 -> x._3).toMap }
  }

  test("ANF registers equal brute-force ball sketches on path + cross edge") {
    // path 0-1-2-3-4-5 plus a chord 1-4: non-trivial ball growth
    val pairs = Seq((0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (1, 4))
    val g = graphOf(pairs, symmetric = true)
    for (t <- Seq(1, 2, 3)) {
      assert(engineRegisters(g, t) == bruteRegisters(6, pairs, t), s"t=$t")
    }
    g.unpersist()
  }

  test("ANF registers equal brute-force on random graphs") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 2) {
      val n = 12 + trial
      val pairs = (0 until 2 * n).map(_ => (rnd.nextInt(n), rnd.nextInt(n)))
        .filter(p => p._1 != p._2).distinct
      val present = pairs.flatMap(p => Seq(p._1, p._2)).distinct.toSet
      val g = graphOf(pairs, symmetric = true)
      val want = bruteRegisters(n, pairs, 3).filter { case (v, _) => present(v) }
      assert(engineRegisters(g, 3) == want, s"trial $trial")
      g.unpersist()
    }
  }

  test("neighborhood function is monotone and plateaus at the diameter") {
    // path of 9 vertices: diameter 8, reachable pairs plateau at t=8
    val pairs = (0 until 8).map(i => (i, i + 1))
    val g = graphOf(pairs, symmetric = true)
    val r = Anf.run(g, iterations = 9, reportNf = true)
    assert(r.nf.size == 10)
    // monotone non-decreasing (registers only grow; idempotent max)
    r.nf.sliding(2).foreach { case Seq(a, b) => assert(b >= a - 1e-9) }
    // plateau: N(8) == N(9) exactly (identical register tables)
    assert(math.abs(r.nf(8) - r.nf(9)) < 1e-9)
    // strict growth before the plateau
    assert(r.nf(7) < r.nf(8))
    // effective diameter at q=1.0 lands within the path's diameter
    val ed = Anf.effectiveDiameter(r.nf, q = 0.999)
    assert(ed > 4.0 && ed <= 8.0, s"ed=$ed")
    g.unpersist()
  }

  test("estimator is sane on a clique (ball(v,1) = all vertices)") {
    val n = 30
    val pairs = for (i <- 0 until n; j <- i + 1 until n) yield (i, j)
    val g = graphOf(pairs, symmetric = true)
    val regs = Anf.run(g, iterations = 1).registers
      .where(col("id") === 0).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    val est = Anf.estimate(regs)
    // m=16 HLL: ~26% relative error; allow 2x either way
    assert(est > n / 2.0 && est < n * 2.0, s"est=$est for true $n")
    g.unpersist()
  }
}
