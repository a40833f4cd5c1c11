package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.syntax._
import graft.{Checkpoint, LinkGraph, Superstep}

/**
 * Synchronous min-label propagation (north-rule algorithm; no direct
 * reference toolkit — built on the same superstep machinery as CC,
 * SURVEY.md §2.4 A6).
 *
 * Every round EVERY vertex signals its current label and adopts
 * `min(own, min over in-neighbors)`; fixpoint when no label changes.
 * On an undirected graph the fixpoint labels equal HashMin CC's
 * (min id per component) — which is exactly what makes LP
 * exact-match verifiable — but the machinery differs: LP is the
 * always-dense full-scan variant (Gemini's pull mode every round),
 * whereas CC is the frontier/push-enabled variant.
 */
object LabelPropagation {

  final case class Result(labels: DataFrame, iterations: Int, changedHistory: Seq[Long])

  def run(
      graph: LinkGraph,
      ckpt: Option[Checkpoint] = None,
      maxIterations: Int = 10000,
      saltBuckets: Int = -1): Result = {
    val salt = Superstep.resolveSalt(graph, saltBuckets)
    var labels = graph.vertices.select(col("id"), col("id").as("lbl"))
      .repartition(graph.numPartitions, col("id"))
      .graftCut
    val history = scala.collection.mutable.ArrayBuffer[Long]()
    // Every round EVERY vertex signals (LP is the always-dense
    // variant), but only the vertices whose label CHANGED need
    // materializing: one cut job per round (its count = changed),
    // with the full label table as a compacted lazy chain — same
    // round-2 job-budget shape as CC/SSSP.
    val compactEvery = 4
    var base = labels
    var pendingFree = List[DataFrame]()
    var i = 0
    var changed = -1L
    while (changed != 0 && i < maxIterations) {
      val msgs = Superstep.gather(
        graph, labels, signal = col("lbl"), combine = min,
        activeEdges = graph.numEdges, activeCount = graph.numVertices,
        saltBuckets = salt)
      val (improved, n) = msgs
        .join(labels.select(col("id"), col("lbl").as("old")), Seq("id"), "left")
        .where(col("msg") < col("old"))
        .select(col("id"), col("msg").as("lbl"))
        .graftCutCount
      changed = n
      history += changed
      if (n > 0) {
        pendingFree = improved :: pendingFree
        labels = labels
          .join(improved.select(col("id"), col("lbl").as("nl")), Seq("id"), "left")
          .select(col("id"), coalesce(col("nl"), col("lbl")).as("lbl"))
      }
      i += 1
      if (changed > 0 && i % compactEvery == 0) {
        labels = labels.graftCut
        (base :: pendingFree).foreach(_.graftFree())
        pendingFree = Nil
        base = labels
      }
      Superstep.log(f"lp iter $i: changed=$changed")
      if (ckpt.nonEmpty && changed > 0 && (i % 5 == 0)) ckpt.get.save(labels, i, changed)
    }
    val finalLabels = labels.graftCut
    ckpt.foreach(_.save(finalLabels, i, 0L))
    (base :: pendingFree).filter(_ ne finalLabels).distinct.foreach(_.graftFree())
    Result(finalLabels, i, history.toSeq)
  }
}
