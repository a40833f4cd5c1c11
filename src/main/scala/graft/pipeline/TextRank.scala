package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * TextRank extractive salience (Mihalcea & Tarau 2004) over the turns
 * of each conversation — the "which turns carry this conversation"
 * summarization primitive an SFT-data curator ranks excerpts with.
 * The sentence graph of the paper becomes a TURN graph: two turns of
 * one conversation are linked iff they share ≥ `minShared` distinct
 * lowercase tokens (edge weight = shared-token count), and salience
 * is weighted PageRank on that graph.
 *
 * Integer-exact power iteration (the repo's [[graft.algos.EigenCentrality]]
 * convention, so the DuckDB oracle replays it bit-for-bit): scores
 * scaled by 10⁶, damping 17/20 exactly, and every division a floor:
 *
 *   r₀(i)    = 10⁶
 *   rₖ₊₁(i) = 3·10⁶/20 + ⌊17 · Σ_{j~i} ⌊rₖ(j)·w_ij / W_j⌋ / 20⌋
 *
 * with W_j = Σ_i w_ij the total incident weight of j. Fixed `iters`
 * rounds (TextRank converges in a handful on sentence-sized graphs;
 * a fixed count keeps the oracle a finite CTE chain).
 *
 * Scale shape: the pair generator joins the distinct (conv, turn,
 * token) set on (conv_id, token) — fan-out per token occurrence is
 * bounded by turns-per-conversation, so the join is LINEAR in corpus
 * size with a per-conv constant, never corpus×corpus. Each iteration
 * is one co-keyed join + one partial-agg shuffle on (conv_id, turn);
 * the only window is the final per-conversation top-k rank. At
 * 10^12 turns every stage is keyed by conv_id and hash-parallel;
 * nothing global anywhere.
 */
object TextRank {

  val Scale = 1000000L

  /** Similarity edges (conv_id, src, dst, w, wtot): both directions
   * of every qualifying turn pair, with the source's total incident
   * weight attached (the PageRank out-mass divisor). */
  def turnGraph(transcripts: DataFrame, minShared: Long): DataFrame = {
    val toks = transcripts.select(col("conv_id"), col("turn_idx"),
      explode(array_distinct(split(lower(col("text")), " "))).as("tok"))
    val half = toks.as("a")
      .join(toks.as("b"),
        col("a.conv_id") === col("b.conv_id") &&
          col("a.turn_idx") < col("b.turn_idx") &&
          col("a.tok") === col("b.tok"))
      .groupBy(col("a.conv_id").as("conv_id"),
        col("a.turn_idx").as("i"), col("b.turn_idx").as("j"))
      .agg(count(lit(1)).as("w"))
      .where(col("w") >= minShared)
    val edges = half.select(col("conv_id"), col("i").as("src"), col("j").as("dst"), col("w"))
      .unionByName(half.select(col("conv_id"), col("j").as("src"), col("i").as("dst"), col("w")))
    val wsum = edges.groupBy(col("conv_id"), col("src")).agg(sum(col("w")).as("wtot"))
    edges.join(wsum, Seq("conv_id", "src"))
  }

  /**
   * @return (conv_id, turn_idx, score, rnk) — the `topK` most salient
   *         turns per conversation (score desc, turn_idx tie-break),
   *         over conversations whose turn graph has ≥ 1 edge.
   */
  def turnSalience(
      transcripts: DataFrame,
      iters: Int = 4,
      minShared: Long = 2,
      topK: Int = 3): DataFrame = {
    val graph = turnGraph(transcripts, minShared).persist()
    var r = graph.select(col("conv_id"), col("src").as("id")).distinct()
      .withColumn("score", lit(Scale))
    for (_ <- 1 to iters) {
      r = graph
        .join(r.select(col("conv_id"), col("id").as("src"), col("score")),
          Seq("conv_id", "src"))
        .select(col("conv_id"), col("dst"), expr("score * w div wtot").as("c"))
        .groupBy(col("conv_id"), col("dst"))
        .agg(sum(col("c")).as("s"))
        .select(col("conv_id"), col("dst").as("id"),
          (lit(3L * Scale / 20L) + expr("17 * s div 20")).as("score"))
    }
    val win = Window.partitionBy(col("conv_id")).orderBy(desc("score"), asc("id"))
    val out = r.withColumn("rnk", row_number().over(win).cast("long"))
      .where(col("rnk") <= topK)
      .select(col("conv_id"), col("id").cast("long").as("turn_idx"),
        col("score"), col("rnk"))
    out
  }
}
