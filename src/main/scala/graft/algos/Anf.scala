package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.syntax._
import graft.LinkGraph

/**
 * HyperANF — the approximate neighborhood function (Boldi, Rosa,
 * Vigna, WWW'11): per-vertex HyperLogLog counters where counter(v)
 * after t supersteps sketches the ball |{u : d(v,u) ≤ t}|. THE
 * web-scale distance-distribution / effective-diameter algorithm —
 * exact N(v,t) needs all-pairs BFS (|V| searches), HyperANF needs
 * O(diameter) supersteps moving O(|E|·m) register maxima, the same
 * join shape as one PageRank iteration.
 *
 * No reference counterpart (the reference's diameter story is
 * per-root BFS, toolkits/bfs.cpp:22-109); the superstep schedule
 * reuses the engine's dense gather: registers flow src→dst along the
 * symmetric edge layout and combine by `max` — an associative,
 * IDEMPOTENT combiner, so map-side partial aggregation absorbs
 * duplicate register deliveries before the exchange (Gemini's
 * mirror-side combining), and re-delivery across iterations is
 * harmless. That idempotence is what makes the sketch union exact to
 * replay: the state is a deterministic function of the T-ball, not of
 * the schedule.
 *
 * Determinism contract (same as pipeline/Sketch.scala): register
 * index and rank derive from the 60-bit md5 key hash — bucket = low
 * [[p]] bits, rho = leading-zero rank of the remaining 56 bits
 * (57 − bitlen, an exact integer — no float log2). The register
 * table is therefore integer-exact and engine-portable: the DuckDB
 * oracle replays the identical fixed-T fixpoint. Float estimation
 * ([[estimate]], [[neighborhoodFunction]]) stays driver-side,
 * sbt-tested — only integer registers cross the oracle boundary.
 *
 * State is SPARSE: (id, bucket, rho) rows only for registers with a
 * hit — ≤ m·|V| rows total, reached-component-bounded like the BFS
 * visited set. At 10^12 edges the counter table is the only state
 * that moves, and every superstep is exactly: one co-partitioned
 * edge⋈state join + one (id, bucket) max-combine exchange.
 */
object Anf {

  /** Register-index bits: 2^p = 16 registers per vertex. Small by
   * design — per-vertex balls need |V|·m state rows, and m=16 gives
   * ~26% relative error, plenty for distance-distribution shape. */
  val p = 4
  val m: Int = 1 << p

  /** 60-bit md5 hash (the Dedup/Mix/Sketch determinism contract:
   * DuckDB `('0x'||substr(md5(x),1,15))::BIGINT`). */
  private def h60 = conv(substring(md5(col("key")), 1, 15), 16, 10).cast("long")

  final case class Result(
      registers: DataFrame, // (id, bucket, rho) sparse HLL registers at t=iterations
      iterations: Int,
      nf: Seq[Double]) // neighborhood function N(t) per superstep (empty unless reportNf)

  /**
   * Run T synchronous register-union supersteps over the (symmetric)
   * graph: counter(v) ∪= counter(u) for every in-neighbor u.
   *
   * Fixed iteration count, not a convergence test: T bounds the ball
   * radius, so the output is a deterministic pure function of
   * (graph, T) — the oracle-replayable contract. Callers wanting the
   * full distance distribution pass T ≥ diameter and read [[Result.nf]]
   * (reportNf = true) — N(t) plateaus at the reachable-pair count.
   *
   * @param reportNf also estimate N(t) = Σ_v |ball(v,t)| per superstep
   *                 (one extra float aggregation job per iteration —
   *                 reporting only, never part of the integer state)
   */
  def run(graph: LinkGraph, iterations: Int = 6, reportNf: Boolean = false): Result = {
    // init: ball(v,0) = {v} — one register row per vertex
    val w = shiftright(h60, p)
    val rho = when(w === 0, lit(57)).otherwise(lit(57) - length(conv(w, 10, 2)))
    var state = graph.vertices
      .select(col("id"), pmod(h60, lit(m.toLong)).as("bucket"), rho.cast("long").as("rho"))
      .repartition(graph.numPartitions, col("id"))
      .graftCut
    val nf = scala.collection.mutable.ArrayBuffer[Double]()
    if (reportNf) nf += graph.numVertices.toDouble // N(0) = |V| exactly

    var prev = state
    var t = 0
    while (t < iterations) {
      // src-clustered edge layout ⋈ state on src: the big edge side
      // never moves; register maxima partial-aggregate before the one
      // (id, bucket) exchange. Always dense — every vertex stays
      // active (counters never shrink), same as PageRank's schedule.
      val msgs = graph.edgesBySrc
        .join(state.withColumnRenamed("id", "src")
          .repartition(graph.numPartitions, col("src")), "src")
        .select(col("dst").as("id"), col("bucket"), col("rho"))
      state = state.unionByName(msgs)
        .groupBy(col("id"), col("bucket"))
        .agg(max(col("rho")).as("rho"))
        .graftCut
      prev.graftFree()
      prev = state
      t += 1
      if (reportNf) nf += estimateNf(state)
    }
    Result(state, iterations, nf.toSeq)
  }

  /** Integer-exact per-vertex export of the register table:
   * (id, reg_sum = Σ rho, nz = populated registers). Pins the full
   * sketch state through two order-independent integer aggregates —
   * the driver-query surface (the raw (id,bucket,rho) table is
   * m-times larger and equally checkable, but the summary keeps the
   * compare payload at one row per vertex). */
  def perVertexSummary(registers: DataFrame): DataFrame =
    registers.groupBy(col("id"))
      .agg(sum(col("rho")).as("reg_sum"), count(lit(1)).as("nz"))

  /** Global neighborhood-function estimate N(t) = Σ_v Ê|ball(v,t)|:
   * per-vertex HLL estimator (Flajolet alpha_16, linear counting in
   * small range) folded over the sparse registers in one aggregation.
   * Float REPORTING only — never crosses the oracle boundary. */
  def estimateNf(registers: DataFrame): Double = {
    val alpha = 0.673 // alpha_16 (Flajolet et al. 2007, m = 16)
    val est = registers.groupBy(col("id"))
      .agg(
        sum(pow(lit(2.0), -col("rho"))).as("s"),
        count(lit(1)).as("nz"))
      .select(
        col("nz"),
        (lit(alpha * m * m) / (col("s") + (lit(m) - col("nz")))).as("e"))
      .select(
        // linear-counting correction: est ≤ 2.5m and zero registers exist
        when(col("e") <= 2.5 * m && col("nz") < m,
          lit(m.toDouble) * log(lit(m.toDouble) / (lit(m) - col("nz"))))
          .otherwise(col("e")).as("est"))
      .agg(sum(col("est"))).first()
    est.getDouble(0)
  }

  /** Driver-side single-ball estimator over one vertex's sparse
   * registers — the sbt-test surface for estimator sanity. */
  def estimate(regs: Seq[(Long, Long)]): Double = {
    val alpha = 0.673
    val s = regs.map { case (_, r) => math.pow(2.0, -r.toDouble) }.sum + (m - regs.size)
    val e = alpha * m * m / s
    val zeros = m - regs.size
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
  }

  /** Effective diameter at quantile q from the reported N(t) curve:
   * smallest t with N(t) ≥ q·N(T), linearly interpolated (the
   * HyperANF paper's definition). Requires T past the plateau. */
  def effectiveDiameter(nf: Seq[Double], q: Double = 0.9): Double = {
    require(nf.nonEmpty)
    val target = q * nf.last
    val t = nf.indexWhere(_ >= target)
    if (t <= 0) 0.0
    else t - 1 + (target - nf(t - 1)) / (nf(t) - nf(t - 1))
  }
}
