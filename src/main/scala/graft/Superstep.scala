package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The engine's dataflow core — the Spark-first re-expression of the
 * reference's `process_edges` (core/graph.hpp:1491-1866) with its
 * adaptive sparse(push)/dense(pull) dual mode.
 *
 * One superstep = "every active vertex signals along its out-edges;
 * messages to the same dst are combined; dst state is updated".
 * Relationally: `state ⋈ edgesBySrc on src → groupBy(dst).agg(combine)`.
 * The four reference lambdas collapse into: the signal expression
 * (what each src emits), the combiner (Gemini's atomic
 * `write_add`/`write_min`, core/atomic.hpp:24-51 → `sum`/`min`), and
 * the caller-side state merge.
 *
 * Mode adaptivity (core/graph.hpp:1501-1508, re-evaluated every
 * superstep): sparse iff the frontier's out-edge mass < |E|/20.
 *  - SPARSE/push → the (small) active state is BROADCAST to the
 *    co-partitioned edge table: zero shuffle of edges, zero shuffle
 *    of messages until the final combine.
 *  - DENSE/pull → co-partitioned shuffle-free join (state is
 *    hash-partitioned by id = edgesBySrc's src partitioning), partial
 *    aggregation before the message exchange = Gemini's mirror-side
 *    combining (core/graph.hpp:1747-1799).
 *
 * The broadcast is additionally gated by an absolute row cap so a
 * mid-algorithm frontier explosion can never OOM the driver — the
 * shuffle join is the always-safe fallback (SURVEY.md §7.4.5).
 */
object Superstep {

  /** Opt-in per-superstep timing (set GRAFT_VERBOSE=1). */
  val verbose: Boolean = sys.env.get("GRAFT_VERBOSE").contains("1")
  def log(msg: => String): Unit = if (verbose) System.err.println(s"[superstep] $msg")

  /** Same constant as the reference: sparse iff active out-edges < |E|/20
   * (core/graph.hpp:1508). */
  val denseThresholdFraction = 20L

  /** Hard cap on rows we are willing to broadcast in push mode. */
  val broadcastRowCap = 4000000L

  /** Out-edge mass of a frontier = Σ out_degree over active ids —
   * the statistic Gemini computes with process_vertices before every
   * superstep (core/graph.hpp:1502-1507). */
  def frontierEdgeMass(graph: LinkGraph, frontierState: DataFrame): Long = {
    val r = frontierState.select(col("id"))
      .join(graph.degrees, "id")
      .agg(coalesce(sum(col("out_degree")), lit(0L)))
      .first()
    r.getLong(0)
  }

  /** Frontier edge mass, skipping the aggregation job when
   * `activeCount · maxOutDegree` already proves the frontier sparse —
   * the exact statistic is only needed near the |E|/20 threshold.
   * Halves the per-superstep job count on long-diameter graphs
   * (transcript chains) where frontiers stay tiny for hundreds of
   * supersteps. */
  def massOrBound(graph: LinkGraph, frontierState: DataFrame, activeCount: Long): Long = {
    val bound = activeCount * graph.maxOutDegree
    if (bound < graph.numEdges / denseThresholdFraction) bound
    else frontierEdgeMass(graph, frontierState)
  }

  /**
   * One gather step: join `activeState(id, <cols>)` to out-edges and
   * combine per destination.
   *
   * @param activeState state rows of ACTIVE vertices only (id + payload)
   * @param signal      expression over the joined row (state cols +
   *                    `weight`) producing the message value
   * @param combine     aggregate over `col("msg")`, e.g. `sum(...)`,
   *                    `min(...)`
   * @param activeEdges out-edge mass of the frontier (precomputed by
   *                    the caller, which usually needs it anyway)
   * @return (id, msg) — combined message per destination, clustered by id
   */
  def gather(
      graph: LinkGraph,
      activeState: DataFrame,
      signal: Column,
      combine: Column => Column,
      activeEdges: Long,
      activeCount: Long,
      saltBuckets: Int = 0): DataFrame = {
    val sparse = activeEdges < graph.numEdges / denseThresholdFraction &&
      activeCount < broadcastRowCap
    val src = activeState.withColumnRenamed("id", "src")
    val joined =
      if (sparse)
        graph.edgesBySrc.join(broadcast(src), "src")
      else
        graph.edgesBySrc.join(src.repartition(graph.numPartitions, col("src")), "src")
    val msgs = joined.select(col("dst").as("id"), signal.as("msg"), col("src"))
    if (saltBuckets > 1) {
      // Explicit two-level salted aggregation for hub destinations
      // (north rule; Gemini's analogue is chunk tuning + work stealing,
      // core/graph.hpp:1340-1403): combine per (dst, salt) first so no
      // single reducer owns a hub's full in-degree, then combine the
      // ≤saltBuckets partials. Requires an associative combiner (sum/
      // min/max — all of ours). Map-side partial aggregation gives the
      // same effect implicitly; the salt makes the REDUCE side skew-
      // free too, which matters when a hub's combined input exceeds
      // one task even after partials.
      msgs
        .groupBy(col("id"), pmod(xxhash64(col("src")), lit(saltBuckets.toLong)).as("salt"))
        .agg(combine(col("msg")).as("msg"))
        .groupBy(col("id"))
        .agg(combine(col("msg")).as("msg"))
    } else {
      msgs
        .drop("src")
        .groupBy(col("id"))
        .agg(combine(col("msg")).as("msg"))
    }
  }

  /** Default skew thresholds for [[autoSaltBuckets]], env-overridable
   * (GRAFT_SALT_MIN_DEGREE / GRAFT_SALT_SKEW). The production default
   * is conservative: salting pays an extra reduce stage per superstep,
   * worth it only when one hub's combined input exceeds a task even
   * after map-side partial aggregation (≥ ~10^6 in-edges). */
  val saltMinDegree: Long =
    sys.env.get("GRAFT_SALT_MIN_DEGREE").map(_.toLong).getOrElse(1000000L)
  val saltSkewFactor: Double =
    sys.env.get("GRAFT_SALT_SKEW").map(_.toDouble).getOrElse(50.0)

  /** Salt-bucket heuristic: salt when the worst hub's in-degree is both
   * skewed (≫ mean) and large in absolute terms. Called once per
   * algorithm run (graph-level statistic, not per superstep). */
  def autoSaltBuckets(
      graph: LinkGraph,
      minHubDegree: Long = saltMinDegree,
      skewFactor: Double = saltSkewFactor): Int = {
    val r = graph.degrees.agg(max(col("in_degree")), avg(col("in_degree"))).first()
    val maxIn = r.getLong(0)
    val avgIn = r.getDouble(1)
    if (maxIn > minHubDegree && maxIn > skewFactor * avgIn) 16 else 0
  }

  /** Resolve a caller-supplied salt setting: negative = auto. */
  def resolveSalt(graph: LinkGraph, saltBuckets: Int): Int =
    if (saltBuckets < 0) autoSaltBuckets(graph) else saltBuckets
}
