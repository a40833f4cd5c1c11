package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.syntax._
import graft.{Checkpoint, LinkGraph, Superstep}

/**
 * PageRank with the reference's exact semantics
 * (/root/reference/toolkits/pagerank.cpp:26-129):
 *
 *  - init `curr[v] = 1/out_degree(v)` (1 if degree 0)  (:35-45)
 *  - per iteration: `raw[dst] = 1-d + d·Σ curr[src]` over in-edges
 *    (:53-84, d = 0.85 :24)
 *  - non-final iterations re-divide by out_degree and report
 *    `delta = Σ |next−curr|·out_degree / |V|` (:86-98); degree-0
 *    vertices keep the undivided value and contribute `|next−curr|`
 *  - the FINAL iteration leaves ranks undivided (:77-84); dangling
 *    mass is NOT redistributed (sum < |V| with sinks) — transcribed
 *    literally so the single-node oracle matches to 1e-6.
 *
 * `iterations > 0` = fixed-iteration parity mode (reference loop
 * :47); `iterations <= 0` = converge to `delta ≤ tol` (north rule),
 * same per-iteration math.
 *
 * All vertices are always active (pagerank.cpp:32-33) ⇒ every
 * superstep is a DENSE gather: co-partitioned state⋈edges join, only
 * combined messages shuffle. Per iteration exactly one shuffle + one
 * scalar action (the delta Allreduce analogue).
 */
object PageRank {

  final case class Result(ranks: DataFrame, iterations: Int, deltas: Seq[Double])

  def run(
      graph: LinkGraph,
      iterations: Int = 0,
      maxIterations: Int = 100,
      tol: Double = 1e-6,
      d: Double = 0.85,
      ckpt: Option[Checkpoint] = None,
      ckptEvery: Int = 5,
      resume: Boolean = false,
      saltBuckets: Int = -1): Result = {
    val degs = graph.degrees.select(col("id"), col("out_degree"))
    val fixed = iterations > 0
    val limit = if (fixed) iterations else maxIterations
    val salt = Superstep.resolveSalt(graph, saltBuckets)

    var startIter = 0
    var curr: DataFrame = null // (id, v) where v = rank/out_degree
    var lastRaw: DataFrame = null // (id, rank) undivided
    val resumed = if (resume) ckpt.flatMap(c => c.latestIteration()) else None
    resumed match {
      case Some(k) =>
        curr = ckpt.get.load(graph.spark, k)
          .repartition(graph.numPartitions, col("id"))
          .graftCut
        startIter = k
      case None =>
        curr = degs.select(
          col("id"),
          when(col("out_degree") > 0, lit(1.0) / col("out_degree"))
            .otherwise(lit(1.0)).as("v"))
          .graftCut
    }

    val deltas = scala.collection.mutable.ArrayBuffer[Double]()
    var prevCut: DataFrame = curr // superseded state, freed once replaced
    var i = startIter
    var done = false
    while (i < limit && !done) {
      val sums = Superstep.gather(
        graph, curr, signal = col("v"), combine = sum,
        activeEdges = graph.numEdges, activeCount = graph.numVertices,
        saltBuckets = salt)
      // In fixed-iteration (parity) mode the per-iteration delta is
      // only reference REPORTING (pagerank.cpp:48-50) — skip its
      // column and its aggregation job: one job per superstep.
      val updated = degs
        .join(sums, Seq("id"), "left")
        .select(
          col("id"), col("out_degree"),
          (lit(1.0 - d) + lit(d) * coalesce(col("msg"), lit(0.0))).as("raw"))
      // Convergence mode folds the delta sum (the reference Allreduce,
      // pagerank.cpp:86-98) into the materialization pass: exactly ONE
      // job per superstep in both modes.
      val (step, delta) =
        if (fixed) {
          val s = updated.select(
            col("id"), col("raw"),
            when(col("out_degree") > 0, col("raw") / col("out_degree"))
              .otherwise(col("raw")).as("v")).graftCut
          (s, Double.NaN)
        } else {
          val t0 = System.nanoTime()
          val (s, dsum) = updated
            .join(curr, Seq("id"))
            .select(
              col("id"), col("raw"),
              when(col("out_degree") > 0, col("raw") / col("out_degree"))
                .otherwise(col("raw")).as("v"),
              when(col("out_degree") > 0,
                abs(col("raw") / col("out_degree") - col("v")) * col("out_degree"))
                .otherwise(abs(col("raw") - col("v"))).as("dterm"))
            .graftCutSum("dterm")
          val dlt = dsum / graph.numVertices
          Superstep.log(f"pr iter ${i + 1}: delta=$dlt%.2e step=${(System.nanoTime() - t0) / 1e9}%.2f s")
          (s, dlt)
        }
      if (prevCut ne null) { prevCut.graftFree(); }
      prevCut = step
      if (!fixed) deltas += delta
      lastRaw = step.select(col("id"), col("raw").as("rank"))
      curr = step.select(col("id"), col("v"))
      i += 1
      if (ckpt.nonEmpty && (i % ckptEvery == 0))
        ckpt.get.save(curr, i, graph.numVertices)
      if (!fixed && delta <= tol) done = true
    }
    ckpt.foreach(_.save(curr, i, graph.numVertices))
    if (lastRaw == null) {
      // resumed at the iteration limit: undo the division to recover
      // the reportable (undivided) rank — raw = v·out_degree (deg>0).
      lastRaw = degs.join(curr, Seq("id")).select(
        col("id"),
        when(col("out_degree") > 0, col("v") * col("out_degree"))
          .otherwise(col("v")).as("rank"))
    }
    Result(lastRaw, i, deltas.toSeq)
  }
}
