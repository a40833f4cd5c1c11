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
      saltBuckets: Int = -1,
      initLabels: Option[DataFrame] = None,
      initFrontier: Option[DataFrame] = None): Result = {
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
      case None if initLabels.nonEmpty =>
        // warm start ([[incremental]]): caller-supplied labels (must be
        // constant per component of the already-processed edge subset)
        // and a restricted frontier (endpoints of the new edges) — the
        // fixpoint is identical to a cold run because min-propagation
        // wakes exactly the vertices whose label can still drop.
        labels = initLabels.get
          .select(col("id"), col("lbl"))
          .repartition(graph.numPartitions, col("id"))
          .graftCut
        frontier = initFrontier
          .map(_.select(col("id"), col("lbl"))
            .repartition(graph.numPartitions, col("id")).graftCut)
          .getOrElse(labels)
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

  /**
   * Incremental connectivity maintenance — the streaming-graph form of
   * HashMin the batch reference cannot express: components of the
   * edge set WITHOUT the new edges are computed first (phase 1), then
   * the new edges arrive and ONLY their endpoints wake (phase 2's
   * initial frontier). Mass merges ripple out from there; vertices in
   * untouched components are never re-examined — at 10^12-edge scale
   * with a small arrival batch, phase 2 touches O(affected) rows
   * instead of O(|V|), and each merge needs O(merged-diameter)
   * supersteps instead of restarting the global O(diameter) loop.
   *
   * The fixpoint label is one value per merged component (the min
   * phase-1 label it contains): phase-1 labels are constant per old
   * component, label differences exist only across new edges, and an
   * improvement chain propagates from a new-edge endpoint to every
   * vertex whose label must drop. The keyed output (min key per final
   * label group) therefore equals a cold run's — [[run]] and
   * [[incremental]] share one oracle.
   *
   * @param newEdgePred predicate over (src, dst, weight) rows of
   *        `graph.edgesBySrc` selecting the NEWLY-ARRIVED edges; the
   *        complement is the already-processed edge set
   */
  def incremental(
      graph: LinkGraph,
      newEdgePred: org.apache.spark.sql.Column,
      maxIterations: Int = 10000): Result =
    incrementalTimed(graph, newEdgePred, maxIterations).result

  /** `phase1Seconds` = the cold component build on the old edge set
   * (what a bench cell pays to SIMULATE the pre-existing batch);
   * `phase2Seconds` = the warm merge ripple from the arrival
   * endpoints — the operator's real RECURRING cost per batch. */
  final case class IncResult(result: Result, phase1Seconds: Double, phase2Seconds: Double)

  def incrementalTimed(
      graph: LinkGraph,
      newEdgePred: org.apache.spark.sql.Column,
      maxIterations: Int = 10000): IncResult = {
    require(graph.symmetric, "CC expects a symmetrized graph (cc.cpp:121)")
    // Phase-1 graph = the same vertex dictionary + partitioning with
    // the new edges filtered out (filter preserves the src clustering,
    // so co-partitioned gathers still skip the edge-side shuffle). On
    // a symmetric graph the filtered rows are their own transpose.
    val oldEdges = graph.edgesBySrc.where(!newEdgePred)
    val oldByDst = oldEdges
      .select(col("dst").as("src"), col("src").as("dst"), col("weight"))
      .select(col("src"), col("dst"), col("weight"))
    val nOld = oldEdges.count()
    val oldGraph = graph.copy(
      edgesBySrc = oldEdges, edgesByDst = oldByDst, numEdges = nOld)
    // Phase 1 via star contraction (CCStar): O(log|V|) rounds instead
    // of HashMin's O(diameter) — on chain-heavy transcript graphs the
    // old-edge components ARE long chains, exactly HashMin's worst
    // case. The fixpoint is the same min-id-per-component labeling
    // (q_cc_fast shares q_cc's oracle), which is all the warm start
    // needs: labels constant per old component.
    val t0 = System.nanoTime()
    val phase1 = CCStar.run(oldGraph)
    val t1 = System.nanoTime()

    val newEdges = graph.edgesBySrc.where(newEdgePred)
    val touched = newEdges.select(col("src").as("id"))
      .unionByName(newEdges.select(col("dst").as("id")))
      .distinct()
    val warmFrontier = phase1.labels.join(touched, "id")
    val phase2 = run(graph, maxIterations = maxIterations,
      initLabels = Some(phase1.labels), initFrontier = Some(warmFrontier))
    val t2 = System.nanoTime()
    phase1.labels.graftFree()
    IncResult(
      Result(phase2.labels, phase1.rounds + phase2.iterations,
        phase2.activeHistory),
      (t1 - t0) / 1e9, (t2 - t1) / 1e9)
  }
}
