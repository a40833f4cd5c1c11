package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.syntax._
import graft.{Checkpoint, LinkGraph, Superstep}

/**
 * Single-source shortest paths (weighted), transcribing
 * /root/reference/toolkits/sssp.cpp:24-105:
 *
 *  - `distance[root] = 0`, everything else the 1e9 sentinel (:33-34)
 *    — here "absent row" (sparse state; the 1e9 sentinel would
 *    materialize 10^12 rows of infinity at scale).
 *  - relax: `min(distance[src] + weight)` over the frontier's
 *    out-edges (`write_min`, :46-59); improved vertices form the next
 *    frontier; terminate on empty frontier (:37).
 *
 * Bellman-Ford-style label-correcting supersteps — identical
 * convergence to the reference (it is the same algorithm). Distances
 * are Double (the reference uses float; Double avoids accumulation
 * noise vs the oracle, SURVEY.md §7.4.3).
 *
 * Job budget (round-2): each superstep materializes ONLY the improved
 * rows (cut + count in one job); the full distance table is a lazy
 * outer-join chain compacted every `compactEvery` supersteps, with
 * superseded cuts freed at compaction — O(1) jobs per superstep and
 * O(|reached|) cached state, vs 3 jobs + a full-table cut per
 * superstep in round 1 (36 s → see BENCH_r02).
 */
object Sssp {

  final case class Result(distances: DataFrame, iterations: Int)

  val compactEvery = 4

  /** @return distances: (id, dist) for REACHED vertices only. */
  def run(
      graph: LinkGraph,
      rootId: Long,
      maxIterations: Int = 100000,
      ckpt: Option[Checkpoint] = None,
      ckptEvery: Int = 8,
      resume: Boolean = false): Result = {
    val spark = graph.spark
    import spark.implicits._

    var dist: DataFrame = null // (id, dist) — lazy merge chain over cuts
    var frontier: DataFrame = null // (id, dist) of just-improved vertices
    var active = 1L
    var i = 0
    val resumed = if (resume) ckpt.flatMap(_.latestIteration()) else None
    resumed match {
      case Some(k) =>
        val st = ckpt.get.load(spark, k)
          .repartition(graph.numPartitions, col("id")).graftCut
        dist = st.select(col("id"), col("dist"))
        val (f, n) = st.where(col("improved"))
          .select(col("id"), col("dist")).graftCutCount
        frontier = f
        active = n
        i = k
      case None =>
        dist = Seq((rootId, 0.0)).toDF("id", "dist")
          .repartition(graph.numPartitions, col("id"))
          .graftCut
        frontier = dist
    }

    var base = dist // cut anchoring the lazy chain
    var pendingFree = List[DataFrame]()
    while (active > 0 && i < maxIterations) {
      val mass = Superstep.massOrBound(graph, frontier, active)
      val msgs = Superstep.gather(
        graph, frontier,
        signal = col("dist") + col("weight"), combine = min,
        activeEdges = mass, activeCount = active)
      // improved-only materialization: the write_min that actually won
      val (improved, n) = msgs
        .join(dist.select(col("id"), col("dist").as("old")), Seq("id"), "left")
        .where(col("old").isNull || col("msg") < col("old"))
        .select(col("id"), col("msg").as("dist"))
        .graftCutCount
      if (n > 0) {
        pendingFree = frontier :: pendingFree
        dist = dist
          .join(improved.select(col("id"), col("dist").as("nd")), Seq("id"), "full_outer")
          .select(col("id"), coalesce(col("nd"), col("dist")).as("dist"))
        frontier = improved
      }
      active = n
      i += 1
      if (active > 0 && i % compactEvery == 0) {
        dist = dist.graftCut
        (base :: pendingFree).filter(_ ne frontier).foreach(_.graftFree())
        pendingFree = Nil
        base = dist
      }
      if (ckpt.nonEmpty && active > 0 && (i % ckptEvery == 0))
        ckpt.get.save(
          dist.join(
            frontier.select(col("id"), lit(true).as("fimp")), Seq("id"), "left")
            .select(col("id"), col("dist"),
              coalesce(col("fimp"), lit(false)).as("improved")),
          i, active)
    }
    val finalDist = dist.graftCut
    // final snapshot keeps the REAL frontier flags: a run stopped at
    // maxIterations must resume with its live frontier, not an empty one
    ckpt.foreach(_.save(
      finalDist.join(
        frontier.select(col("id"), lit(true).as("fimp")), Seq("id"), "left")
        .select(col("id"), col("dist"),
          (coalesce(col("fimp"), lit(false)) && lit(active > 0)).as("improved")),
      i, active))
    (base :: frontier :: pendingFree).filter(_ ne finalDist).distinct.foreach(_.graftFree())
    Result(finalDist, i)
  }
}
