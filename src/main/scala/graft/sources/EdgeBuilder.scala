package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Transcripts → canonical string-keyed edge table `(src_key, dst_key,
 * kind, weight)`.
 *
 * Edge derivation rules (FIXTURES.md §2):
 *  - `adj`  : consecutive turns of a conversation — `lead` over
 *             `(partitionBy conv_id orderBy turn_idx)`.
 *  - `tool` : turn → tool *vertex* (star shape). Modeling the tool as
 *             a vertex instead of pairwise turn×turn joins keeps the
 *             edge count linear in the input — the pairwise variant is
 *             quadratic per tool and melts down on hub tools at
 *             10^12-turn scale.
 *
 * Vertex keys: turns are `"<conv_id>#<turn_idx>"`, tools are
 * `"T#<tool>"` (disjoint namespaces). Self-loops dropped, edges
 * deduped — mirroring the reference loader's canonicalization
 * (/root/reference/core/graph.hpp:771-1338 reads raw pairs; dedup is
 * ours, needed for exact triangle counts).
 */
object EdgeBuilder {

  def turnKey(transcripts: DataFrame): DataFrame =
    transcripts.withColumn(
      "vkey",
      concat(col("conv_id"), lit("#"), col("turn_idx").cast("string")))

  /**
   * Time-decayed edge weights for temporal link analysis: each edge
   * carries w = 2^-min(⌊age/bucket⌋, maxBucket) of its SOURCE turn,
   * where age = corpus-max timestamp − turn timestamp. Feeding this
   * table to [[graft.algos.WeightedPageRank]] yields recency-weighted
   * rank — the standard "fresh links count more" temporal variant.
   *
   * Every arithmetic step is engine-portable-exact: the age bucket is
   * INTEGER division of epoch-microseconds, and 2^-b is a dyadic
   * rational a double represents exactly (1.0 / (1L << b)) — no
   * exp/log in either engine.
   */
  def keyEdgesDecayed(
      transcripts: DataFrame,
      bucketUs: Long = 259200000000L, // 3 days
      maxBucket: Int = 40): DataFrame = {
    val keyed = turnKey(transcripts)
      .withColumn("tus", unix_micros(col("ts").cast("timestamp")))
    // corpus-max timestamp: one scalar agg (tiny job, broadcast as a
    // literal into the decay expression)
    val maxTs = keyed.agg(max(col("tus"))).first().getLong(0)
    val decayed = keyed
      .withColumn("bkt",
        least(expr(s"(${maxTs}L - tus) div ${bucketUs}L"), lit(maxBucket.toLong)).cast("int"))
      .withColumn("decay", lit(1.0) / expr("shiftleft(1L, bkt)").cast("double"))
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    val adj = decayed
      .select(
        col("vkey").as("src_key"),
        lead(col("vkey"), 1).over(w).as("dst_key"),
        col("decay"))
      .where(col("dst_key").isNotNull)
      .select(col("src_key"), col("dst_key"), lit("adj").as("kind"),
        col("decay").as("weight"))
    val tool = decayed
      .where(col("tool").isNotNull)
      .select(
        col("vkey").as("src_key"),
        concat(lit("T#"), col("tool")).as("dst_key"),
        lit("tool").as("kind"),
        col("decay").as("weight"))
    adj.unionByName(tool)
      .where(col("src_key") =!= col("dst_key"))
      .dropDuplicates("src_key", "dst_key")
  }

  /** weight: adjacency edges 1.0, tool edges 2.0 (used only by the
   * weighted-parity algorithms, SSSP; unweighted algos ignore it). */
  def keyEdges(transcripts: DataFrame): DataFrame = {
    val keyed = turnKey(transcripts)
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    val adj = keyed
      .select(
        col("vkey").as("src_key"),
        lead(col("vkey"), 1).over(w).as("dst_key"))
      .where(col("dst_key").isNotNull)
      .select(col("src_key"), col("dst_key"), lit("adj").as("kind"), lit(1.0).as("weight"))
    val tool = keyed
      .where(col("tool").isNotNull)
      .select(
        col("vkey").as("src_key"),
        concat(lit("T#"), col("tool")).as("dst_key"),
        lit("tool").as("kind"),
        lit(2.0).as("weight"))
    adj.unionByName(tool)
      .where(col("src_key") =!= col("dst_key"))
      .dropDuplicates("src_key", "dst_key")
  }

  /**
   * [[keyEdges]] with hashed integer CAPACITIES in [1, 97] instead of
   * the 1.0/2.0 parity weights — the input for bottleneck-path and
   * spanning-forest algorithms, which are degenerate on a two-valued
   * weight set. w = 1 + (40-bit md5 of the canonical undirected pair)
   * mod 97: deterministic, direction-independent, and replayable in
   * the DuckDB oracle via the same md5 (no RNG, no float). The (w,
   * least_key, greatest_key) TOTAL order these weights induce makes
   * the minimum spanning forest unique, so MSF output is
   * hash-comparable across engines.
   */
  def keyEdgesCapacity(transcripts: DataFrame): DataFrame =
    keyEdges(transcripts).select(
      col("src_key"), col("dst_key"), col("kind"),
      (expr(
        "cast(conv(substring(md5(concat('cap|', least(src_key, dst_key), '|', " +
          "greatest(src_key, dst_key))), 1, 10), 16, 10) as bigint)") % 97 + 1)
        .cast("double").as("weight"))

  /**
   * Symmetric TEMPORAL edge table `(src_key, dst_key, t)` — each
   * undirected edge carries the epoch-microsecond instant it came
   * into existence: an adjacency edge exists once its LATER turn
   * happened (lead(ts)), a tool edge at its turn's ts. Deduped to
   * min(t) per pair, self-loops dropped — the input contract of
   * [[graft.algos.TemporalReach]]. All integer microseconds, no
   * floats (same portability contract as [[keyEdgesDecayed]]).
   */
  def keyEdgesTemporal(transcripts: DataFrame): DataFrame = {
    val keyed = turnKey(transcripts)
      .withColumn("tus", unix_micros(col("ts").cast("timestamp")))
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    val adj = keyed.select(
      col("vkey").as("src_key"),
      lead(col("vkey"), 1).over(w).as("dst_key"),
      lead(col("tus"), 1).over(w).as("t"))
      .where(col("dst_key").isNotNull)
    val tool = keyed.where(col("tool").isNotNull)
      .select(
        col("vkey").as("src_key"),
        concat(lit("T#"), col("tool")).as("dst_key"),
        col("tus").as("t"))
    val dir = adj.unionByName(tool).where(col("src_key") =!= col("dst_key"))
    dir.unionByName(
      dir.select(col("dst_key").as("src_key"), col("src_key").as("dst_key"), col("t")))
      .groupBy(col("src_key"), col("dst_key")).agg(min(col("t")).as("t"))
  }

  /**
   * Graph EVOLUTION telemetry: per UTC week, turn volume plus the
   * counts of edges and vertices seen for the FIRST time — the
   * growth curve a continuously-ingested link graph is sized and
   * re-partitioned by (is the id space still growing? is densification
   * slowing?). Week = ⌊epoch_µs / 604 800·10⁶⌋, integer and
   * timezone-free like the novelty curve.
   *
   * Scale shape: rides [[keyEdgesTemporal]] (whose min-t grouping IS
   * the first-seen time), then two hash censuses and one tiny
   * per-week join — no windows over the corpus.
   *
   * @return (week, n_turns, new_edges, new_vertices)
   */
  def growthCensus(transcripts: DataFrame): DataFrame = {
    val wk = 604800000000L
    val te = keyEdgesTemporal(transcripts)
    val turns = transcripts
      .select(expr(s"unix_micros(cast(ts AS timestamp)) div ${wk}L").as("week"))
      .groupBy(col("week")).agg(count(lit(1)).as("n_turns"))
    val newEdges = te.where(col("src_key") < col("dst_key"))
      .select(expr(s"t div ${wk}L").as("week"))
      .groupBy(col("week")).agg(count(lit(1)).as("new_edges"))
    val newVerts = te.groupBy(col("src_key")).agg(min(col("t")).as("ft"))
      .select(expr(s"ft div ${wk}L").as("week"))
      .groupBy(col("week")).agg(count(lit(1)).as("new_vertices"))
    turns.join(newEdges, Seq("week"), "left").join(newVerts, Seq("week"), "left")
      .select(col("week"), col("n_turns"),
        coalesce(col("new_edges"), lit(0L)).as("new_edges"),
        coalesce(col("new_vertices"), lit(0L)).as("new_vertices"))
  }

  /**
   * Dominant-direction tool-transition graph: vertex = tool, edge
   * A→B iff consecutive tool calls A-then-B (within a conversation)
   * are STRICTLY more frequent than B-then-A. Unlike the turn graph
   * (a DAG by construction), this digraph has genuine cycles — equal
   * dominance chains close loops — which is what makes it the SCC
   * operator's natural input. Deterministic: counts are exact, ties
   * drop both directions.
   *
   * Scale: one windowed lead per conversation (bounded groups), one
   * count aggregate keyed by the (tiny) tool×tool domain, one
   * self-join on that aggregate.
   */
  def toolTransitions(transcripts: DataFrame): DataFrame = {
    val cnt = toolTransitionCounts(transcripts)
    val rev = cnt.select(
      col("src_key").as("dst_key"), col("dst_key").as("src_key"),
      col("c").as("rc"))
    cnt.join(rev, Seq("src_key", "dst_key"), "left")
      .where(col("c") > coalesce(col("rc"), lit(0L)))
      .select(col("src_key"), col("dst_key"),
        lit("tooltrans").as("kind"), lit(1.0).as("weight"))
  }

  /** RAW directed tool-transition counts (src_key, dst_key, c) —
   * both directions kept; [[toolTransitions]] antisymmetrizes this,
   * the dyad census reads it as-is. */
  def toolTransitionCounts(transcripts: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    transcripts
      .where(col("tool").isNotNull)
      .select(col("conv_id"), col("turn_idx"), col("tool"))
      .withColumn("nxt", lead(col("tool"), 1).over(w))
      .where(col("nxt").isNotNull && col("nxt") =!= col("tool"))
      .groupBy(col("tool").as("src_key"), col("nxt").as("dst_key"))
      .agg(count(lit(1)).as("c"))
  }

  /** Successor relation of the conversation chains — ListRank input:
   * (id = turn key, nxt = next turn's key, null at the last turn). */
  def turnSuccessors(transcripts: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    turnKey(transcripts)
      .select(col("vkey").as("id"), lead(col("vkey"), 1).over(w).as("nxt"))
  }
}
