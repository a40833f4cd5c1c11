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
    var prevCut: DataFrame = labels
    var i = 0
    var changed = -1L
    while (changed != 0 && i < maxIterations) {
      val msgs = Superstep.gather(
        graph, labels, signal = col("lbl"), combine = min,
        activeEdges = graph.numEdges, activeCount = graph.numVertices,
        saltBuckets = salt)
      val merged = labels
        .join(msgs, Seq("id"), "left")
        .select(
          col("id"),
          least(col("lbl"), coalesce(col("msg"), col("lbl"))).as("newLbl"),
          col("lbl"))
        .graftCut
      if (prevCut ne null) { prevCut.graftFree(); }
      prevCut = merged
      changed = merged.where(col("newLbl") =!= col("lbl")).count()
      history += changed
      labels = merged.select(col("id"), col("newLbl").as("lbl"))
      i += 1
      if (ckpt.nonEmpty && (i % 5 == 0)) ckpt.get.save(labels, i, changed)
    }
    ckpt.foreach(_.save(labels, i, 0L))
    Result(labels, i, history.toSeq)
  }
}
