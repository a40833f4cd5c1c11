package graft

/**
 * Single-node reference oracle — plain Scala on dense arrays, directly
 * transcribing the reference toolkit lambdas (FIXTURES.md §4). This is
 * the "single-node reference" the north rule's allclose-1e-6 refers to.
 *
 * Vertices are 0..n-1; edges are directed (src, dst) pairs.
 */
object Oracle {

  /** /root/reference/toolkits/pagerank.cpp:26-129 — incl. the
   * degree-division subtlety and the final un-divided iteration. */
  def pagerank(n: Int, edges: Seq[(Int, Int)], iters: Int, d: Double = 0.85): Array[Double] = {
    val out = Array.fill(n)(0)
    edges.foreach { case (s, _) => out(s) += 1 }
    var curr = Array.tabulate(n)(v => if (out(v) > 0) 1.0 / out(v) else 1.0)
    var res = curr
    for (i <- 0 until iters) {
      val next = Array.fill(n)(0.0)
      edges.foreach { case (s, t) => next(t) += curr(s) }
      var v = 0
      while (v < n) {
        next(v) = 1 - d + d * next(v)
        v += 1
      }
      res = next.clone()
      if (i < iters - 1) {
        v = 0
        while (v < n) { if (out(v) > 0) next(v) /= out(v); v += 1 }
      }
      curr = next
    }
    res
  }

  /** PageRank iteration count to convergence: same per-iteration delta
   * as pagerank.cpp:86-98 (`Σ|next-curr|·out_degree / n`). */
  def pagerankItersToConverge(
      n: Int, edges: Seq[(Int, Int)], tol: Double, maxIters: Int = 100,
      d: Double = 0.85): Int = {
    val out = Array.fill(n)(0)
    edges.foreach { case (s, _) => out(s) += 1 }
    var curr = Array.tabulate(n)(v => if (out(v) > 0) 1.0 / out(v) else 1.0)
    for (i <- 0 until maxIters) {
      val next = Array.fill(n)(0.0)
      edges.foreach { case (s, t) => next(t) += curr(s) }
      var delta = 0.0
      var v = 0
      while (v < n) {
        next(v) = 1 - d + d * next(v)
        if (out(v) > 0) {
          next(v) /= out(v)
          delta += math.abs(next(v) - curr(v)) * out(v)
        } else delta += math.abs(next(v) - curr(v))
        v += 1
      }
      delta /= n
      curr = next
      if (delta <= tol) return i + 1
    }
    maxIters
  }

  /** HashMin fixpoint (/root/reference/toolkits/cc.cpp) on the
   * symmetrized edge set: label = min reachable vertex index. */
  def ccLabels(n: Int, edges: Seq[(Int, Int)]): Array[Int] = {
    val lbl = Array.tabulate(n)(identity)
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    var changed = true
    while (changed) {
      changed = false
      und.foreach { case (s, t) =>
        if (lbl(s) < lbl(t)) { lbl(t) = lbl(s); changed = true }
      }
    }
    lbl
  }

  /** BFS levels from root (/root/reference/toolkits/bfs.cpp; levels are
   * the deterministic part, parents are race-dependent). -1 = unreached. */
  def bfsLevels(n: Int, edges: Seq[(Int, Int)], root: Int): Array[Int] = {
    val adj = edges.groupMap(_._1)(_._2)
    val lvl = Array.fill(n)(-1)
    lvl(root) = 0
    var frontier = List(root)
    var level = 0
    while (frontier.nonEmpty) {
      level += 1
      frontier = frontier
        .flatMap(v => adj.getOrElse(v, Nil))
        .filter(t => lvl(t) == -1)
        .distinct
      frontier.foreach(t => lvl(t) = level)
    }
    lvl
  }

  /** SSSP relaxation fixpoint (/root/reference/toolkits/sssp.cpp:46-59).
   * Double.PositiveInfinity = unreached (reference sentinel 1e9). */
  def sssp(n: Int, wedges: Seq[(Int, Int, Double)], root: Int): Array[Double] = {
    val dist = Array.fill(n)(Double.PositiveInfinity)
    dist(root) = 0.0
    var changed = true
    while (changed) {
      changed = false
      wedges.foreach { case (s, t, w) =>
        if (dist(s) + w < dist(t)) { dist(t) = dist(s) + w; changed = true }
      }
    }
    dist
  }

  /** Betweenness from root (/root/reference/toolkits/bc.cpp:24-196):
   * forward level-BFS accumulating σ, backward dependency unwind,
   * bc = dep·σ − 1. Returns reached vertices only. */
  def bc(n: Int, edges: Seq[(Int, Int)], root: Int): Map[Int, Double] = {
    val adj = edges.groupMap(_._1)(_._2)
    val sigma = Array.fill(n)(0.0)
    val level = Array.fill(n)(-1)
    sigma(root) = 1.0; level(root) = 0
    var levels = List(List(root))
    var frontier = List(root)
    var k = 0
    while (frontier.nonEmpty) {
      k += 1
      val next = scala.collection.mutable.LinkedHashSet[Int]()
      frontier.foreach { v =>
        adj.getOrElse(v, Nil).foreach { w =>
          if (level(w) == -1 || level(w) == k) {
            if (level(w) == -1) { level(w) = k; next += w }
            sigma(w) += sigma(v)
          }
        }
      }
      frontier = next.toList
      if (frontier.nonEmpty) levels = frontier :: levels
    }
    val dep = Array.fill(n)(0.0)
    var first = true
    levels.foreach { lvl =>
      lvl.foreach { v =>
        dep(v) = 1.0 / sigma(v) +
          (if (first) 0.0
           else adj.getOrElse(v, Nil).collect {
             case u if level(u) == level(v) + 1 => dep(u)
           }.sum)
      }
      first = false
    }
    (0 until n).filter(level(_) >= 0).map(v => v -> (dep(v) * sigma(v) - 1.0)).toMap
  }

  /** Exact triangle count on the undirected simple graph. */
  def triangles(n: Int, edges: Seq[(Int, Int)]): Long = {
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (a, b) => a != b }.distinct
    val canon = und.filter { case (a, b) => a < b }.toSet
    val byA = canon.groupMap(_._1)(_._2)
    var cnt = 0L
    canon.foreach { case (a, b) =>
      val bs = byA.getOrElse(b, Set.empty)
      val as = byA.getOrElse(a, Set.empty)
      cnt += bs.count(c => as.contains(c))
    }
    cnt
  }
}
