package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.syntax._
import graft.{Checkpoint, LinkGraph, Superstep}

/**
 * Connected components via HashMin label propagation, transcribing
 * /root/reference/toolkits/cc.cpp:22-109 on a SYMMETRIZED graph
 * (cc.cpp:121 loads undirected):
 *
 *  - `label[v] = v` init (:31-37)
 *  - each superstep: active vertices push their label along
 *    out-edges; a dst whose label improves (`msg < label`) adopts it
 *    and joins the next frontier (:44-79)
 *  - terminate when no vertex was activated (:39).
 *
 * The frontier shrinks fast, so this is where the adaptive push/pull
 * mode switch (Superstep.gather) earns its keep: early rounds are
 * dense co-partitioned joins; late rounds broadcast the few remaining
 * improved labels. Per superstep: one out-edge-mass action (the
 * reference's active-edge count, core/graph.hpp:1502-1507), one
 * gather, one `count()` (the Allreduce'd activated count).
 */
object ConnectedComponents {

  final case class Result(labels: DataFrame, iterations: Int, activeHistory: Seq[Long])

  def run(
      graph: LinkGraph,
      ckpt: Option[Checkpoint] = None,
      ckptEvery: Int = 5,
      resume: Boolean = false,
      maxIterations: Int = 10000,
      saltBuckets: Int = -1): Result = {
    require(graph.symmetric, "CC expects a symmetrized graph (cc.cpp:121)")
    val salt = Superstep.resolveSalt(graph, saltBuckets)

    var labels: DataFrame = null // (id, lbl)
    var frontier: DataFrame = null // (id, lbl) of newly-improved vertices
    var startIter = 0
    val resumed = if (resume) ckpt.flatMap(_.latestIteration()) else None
    resumed match {
      case Some(k) =>
        labels = ckpt.get.load(graph.spark, k)
          .repartition(graph.numPartitions, col("id"))
          .graftCut
        // conservative resume frontier: every vertex whose label is
        // not itself may still have something to teach its neighbors,
        // plus re-run converges identically (min is idempotent).
        frontier = labels.graftCut
        startIter = k
      case None =>
        labels = graph.vertices.select(col("id"), col("id").as("lbl"))
          .repartition(graph.numPartitions, col("id"))
          .graftCut
        frontier = labels
    }

    var activeCount = frontier.count()
    val history = scala.collection.mutable.ArrayBuffer[Long]()
    // Improved-only supersteps (round-2): each superstep materializes
    // ONLY the vertices whose label dropped (one cut job whose count
    // is the Allreduce'd activated count); the full label table is a
    // lazy outer-join chain compacted every `compactEvery` rounds —
    // 1 job/superstep instead of 3, O(|improved|) materialized rows
    // instead of O(|V|).
    val compactEvery = 4
    var base = labels
    var pendingFree = List[DataFrame]()
    var i = startIter
    while (activeCount > 0 && i < maxIterations) {
      history += activeCount
      val t0 = System.nanoTime()
      val mass = Superstep.massOrBound(graph, frontier, activeCount)
      val msgs = Superstep.gather(
        graph, frontier, signal = col("lbl"), combine = min,
        activeEdges = mass, activeCount = activeCount, saltBuckets = salt)
      val (improved, n) = msgs
        .join(labels.select(col("id"), col("lbl").as("old")), Seq("id"), "left")
        .where(col("msg") < col("old"))
        .select(col("id"), col("msg").as("lbl"))
        .graftCutCount
      if (n > 0) {
        pendingFree = frontier :: pendingFree
        labels = labels
          .join(improved.select(col("id"), col("lbl").as("nl")), Seq("id"), "left")
          .select(col("id"), coalesce(col("nl"), col("lbl")).as("lbl"))
        frontier = improved
      }
      activeCount = n
      i += 1
      if (activeCount > 0 && i % compactEvery == 0) {
        labels = labels.graftCut
        (base :: pendingFree).filter(_ ne frontier).foreach(_.graftFree())
        pendingFree = Nil
        base = labels
      }
      Superstep.log(f"cc iter $i: active=$activeCount ${(System.nanoTime() - t0) / 1e9}%.2f s")
      if (ckpt.nonEmpty && activeCount > 0 && (i % ckptEvery == 0))
        ckpt.get.save(labels, i, activeCount)
    }
    val finalLabels = labels.graftCut
    ckpt.foreach(_.save(finalLabels, i, activeCount))
    (base :: frontier :: pendingFree).filter(_ ne finalLabels).distinct.foreach(_.graftFree())
    Result(finalLabels, i, history.toSeq)
  }

  /** Number of distinct components (reference report, cc.cpp:90-104). */
  def componentCount(labels: DataFrame): Long =
    labels.select(col("lbl")).distinct().count()
}
