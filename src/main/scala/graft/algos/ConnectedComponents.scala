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
    var prevCut: DataFrame = labels
    val history = scala.collection.mutable.ArrayBuffer[Long]()
    var i = startIter
    while (activeCount > 0 && i < maxIterations) {
      history += activeCount
      val t0 = System.nanoTime()
      val mass = Superstep.massOrBound(graph, frontier, activeCount)
      val msgs = Superstep.gather(
        graph, frontier, signal = col("lbl"), combine = min,
        activeEdges = mass, activeCount = activeCount, saltBuckets = salt)
      val merged = labels
        .join(msgs, Seq("id"), "left")
        .select(
          col("id"),
          least(col("lbl"), coalesce(col("msg"), col("lbl"))).as("lbl"),
          (col("msg") < col("lbl")).as("improved"))
        .graftCut
      if (prevCut ne null) { prevCut.graftFree(); }
      prevCut = merged
      labels = merged.select(col("id"), col("lbl"))
      frontier = merged.where(col("improved")).select(col("id"), col("lbl"))
      activeCount = frontier.count()
      i += 1
      Superstep.log(f"cc iter $i: active=$activeCount ${(System.nanoTime() - t0) / 1e9}%.2f s")
      if (ckpt.nonEmpty && (i % ckptEvery == 0))
        ckpt.get.save(labels, i, activeCount)
    }
    ckpt.foreach(_.save(labels, i, activeCount))
    Result(labels, i, history.toSeq)
  }

  /** Number of distinct components (reference report, cc.cpp:90-104). */
  def componentCount(labels: DataFrame): Long =
    labels.select(col("lbl")).distinct().count()
}
