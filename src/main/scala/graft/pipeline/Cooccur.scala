package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Tool co-occurrence lift over conversations — the association-mining
 * statistic (lift = P(a,b) / (P(a)·P(b)); PMI is its log) used to
 * surface tool pairings for agent-behavior analysis and feature
 * crosses. Exported as an exact integer `lift_e4 = ⌊10⁴·lift⌋` so the
 * oracle compare is bit-exact (the repo's closeness/similarity
 * convention: lift the RATIO, not its log — floor of a ratio of
 * exact counts needs no floating point at all).
 *
 * Scale shape: the pair generator self-joins the DISTINCT (conv, tool)
 * set on conv_id — a conversation carries at most turns-per-conv
 * tools, so pair fan-out per conversation is bounded by a constant
 * independent of corpus size; the marginals table (one row per tool)
 * is broadcast. One shuffle for the distinct, one for the pair count.
 */
object Cooccur {

  /**
   * Windowed word co-occurrence lift (integer PMI core) over
   * documents: unordered word pairs within a ±`window` token
   * distance, lift_e4 = ⌊10⁴ · n_ab·T² / (Np·n_a·n_b)⌋ with T = total
   * tokens, Np = total windowed pairs — the distributional-feature
   * builder (PMI = log lift; exporting the ratio keeps it integer).
   *
   * Scale shape: the pair generator is a per-document positional
   * self-join bounded to `window` successors — fan-out ≤ window per
   * token, LINEAR in corpus size, never doc×doc; marginals broadcast.
   * The lift numerator runs in decimal(38,0)/HUGEINT (fits through
   * T ≈ 10^9 tokens; beyond that rescale T or go log-space).
   *
   * @return top-`k` pairs by (n_ab desc, word_a, word_b) with
   *         support ≥ minSupport: (word_a, word_b, n_ab, lift_e4)
   */
  def wordPmi(docs: DataFrame, window: Int = 3, minSupport: Long = 5,
      k: Int = 100): DataFrame = {
    val tok = docs.select(col("doc_id"),
      posexplode(split(lower(col("text")), " ")).as(Seq("pos", "w")))
      .persist()
    val t = tok.count()
    val pairs = tok.as("a")
      .join(tok.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("b.pos") > col("a.pos") && col("b.pos") <= col("a.pos") + window &&
          col("a.w") =!= col("b.w"))
      .select(least(col("a.w"), col("b.w")).as("word_a"),
        greatest(col("a.w"), col("b.w")).as("word_b"))
      .groupBy(col("word_a"), col("word_b")).agg(count(lit(1)).as("n_ab"))
      .persist()
    val np = pairs.agg(coalesce(sum(col("n_ab")), lit(0L))).first().getLong(0)
    val marg = tok.groupBy(col("w")).agg(count(lit(1)).as("n"))
    val out = pairs.where(col("n_ab") >= minSupport)
      .join(broadcast(marg.select(col("w").as("word_a"), col("n").as("n_a"))), "word_a")
      .join(broadcast(marg.select(col("w").as("word_b"), col("n").as("n_b"))), "word_b")
      .select(col("word_a"), col("word_b"), col("n_ab"),
        expr(s"(cast(n_ab AS decimal(38,0)) * 10000 * ${t}L * ${t}L)" +
          s" div (cast(${np}L AS decimal(38,0)) * n_a * n_b)")
          .cast("long").as("lift_e4"))
      .orderBy(desc("n_ab"), asc("word_a"), asc("word_b"))
      .limit(k)
    out
  }

  /** @param transcripts (conv_id, turn_idx, role, text, tool, ts)
   *  @return (tool_a, tool_b, n_ab, n_a, n_b, lift_e4), tool_a < tool_b */
  def toolLift(transcripts: DataFrame): DataFrame = {
    val convTools = transcripts
      .where(col("tool").isNotNull)
      .select(col("conv_id"), col("tool"))
      .distinct()
      .cache()
    val nConvs = transcripts.select(col("conv_id")).distinct().count()

    val marginals = convTools.groupBy(col("tool")).agg(count(lit(1)).as("n"))
    val pairs = convTools.as("a")
      .join(convTools.as("b"), "conv_id")
      .where(col("a.tool") < col("b.tool"))
      .groupBy(col("a.tool").as("tool_a"), col("b.tool").as("tool_b"))
      .agg(count(lit(1)).as("n_ab"))

    val out = pairs
      .join(broadcast(marginals.select(col("tool").as("tool_a"), col("n").as("n_a"))), "tool_a")
      .join(broadcast(marginals.select(col("tool").as("tool_b"), col("n").as("n_b"))), "tool_b")
      .select(
        col("tool_a"), col("tool_b"), col("n_ab"), col("n_a"), col("n_b"),
        // `div` = integer floor division (Spark's `/` is double
        // division). The products run in decimal(38,0): at 10^12-turn
        // scale n_ab·10⁴·nConvs overflows a long and ANSI mode would
        // abort the job where the DuckDB oracle (HUGEINT) succeeds.
        expr(s"(cast(n_ab AS decimal(38,0)) * 10000 * cast(${nConvs}L AS decimal(38,0)))" +
          s" div (cast(n_a AS decimal(38,0)) * cast(n_b AS decimal(38,0)))")
          .cast("long").as("lift_e4"))
    convTools.unpersist(blocking = false)
    out
  }

  /**
   * A-priori frequent tool itemsets (sizes 1–3) over conversations —
   * the market-basket miner behind "which tool BUNDLES co-occur":
   * singletons, pairs, and triples of tools used within one
   * conversation with support ≥ max(2, ⌊nConvs / supportDivisor⌋)
   * (a RELATIVE threshold, so the same query is meaningful at every
   * scale factor).
   *
   * A-priori pruning, Spark-shaped: level-k candidates are generated
   * only from conversations restricted to FREQUENT singletons
   * (broadcast semi-join before the pair self-join), and triple
   * counting only touches triples whose (a,b) and (b,c) sub-pairs are
   * frequent (two more broadcast semi-joins) — the downward-closure
   * property says no other triple can reach the threshold, so the
   * pruned plan is EXACT, not approximate. Pair/triple fan-out per
   * conversation is (basket choose k), constant for bounded baskets —
   * the whole mine is linear in conversation count.
   *
   * @return (itemset: comma-joined sorted tools, sz, support)
   */
  def frequentItemsets(
      transcripts: DataFrame,
      supportDivisor: Long = 30): DataFrame = {
    val ct = transcripts
      .where(col("tool").isNotNull)
      .select(col("conv_id"), col("tool"))
      .distinct()
      .cache()
    val nConvs = transcripts.select(col("conv_id")).distinct().count()
    val minSup = math.max(2L, nConvs / supportDivisor)

    val f1 = ct.groupBy(col("tool")).agg(count(lit(1)).as("support"))
      .where(col("support") >= minSup)
      .cache()
    val tx = ct.join(broadcast(f1.select(col("tool"))), "tool")
      .select(col("conv_id"), col("tool"))
    val f2 = tx.as("a").join(tx.as("b"), "conv_id")
      .where(col("a.tool") < col("b.tool"))
      .groupBy(col("a.tool").as("ta"), col("b.tool").as("tb"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= minSup)
      .cache()
    val p = f2.select(col("ta"), col("tb"))
    val f3 = tx.as("a").join(tx.as("b"), "conv_id")
      .where(col("a.tool") < col("b.tool"))
      .join(broadcast(p),
        col("a.tool") === col("ta") && col("b.tool") === col("tb"))
      .select(col("conv_id"), col("a.tool").as("x"), col("b.tool").as("y"))
      .join(tx.as("c"), "conv_id")
      .where(col("y") < col("c.tool"))
      .join(broadcast(p.select(col("ta").as("pb"), col("tb").as("pc"))),
        col("y") === col("pb") && col("c.tool") === col("pc"))
      .groupBy(col("x"), col("y"), col("c.tool").as("z"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= minSup)
    val out = f1.select(col("tool").as("itemset"), lit(1L).as("sz"), col("support"))
      .unionByName(f2.select(concat_ws(",", col("ta"), col("tb")).as("itemset"),
        lit(2L).as("sz"), col("support")))
      .unionByName(f3.select(concat_ws(",", col("x"), col("y"), col("z")).as("itemset"),
        lit(3L).as("sz"), col("support")))
    ct.unpersist(blocking = false)
    out
  }

  /**
   * Gini concentration of tool usage — the inequality readout behind
   * "is the tool surface dominated by a head?" (skew planning input:
   * a Gini near 1 says hub mitigation is mandatory, near 0 says hash
   * partitioning is already fair). Integer-exact via the rank form
   * on ascending counts x₁ ≤ … ≤ x_n (ties broken by tool name):
   * G·n·Σx = 2·Σ i·xᵢ − (n+1)·Σx, exported as
   * gini_e6 = ⌊10⁶·(2Σi·xᵢ − (n+1)Σx) / (n·Σx)⌋ — no floats, no
   * sort of the raw usage table (only the tiny per-tool aggregate is
   * ranked).
   *
   * @return one row: (n_tools, total_uses, gini_e6)
   */
  def toolGini(transcripts: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").asc, col("tool").asc)
    val ranked = transcripts.where(col("tool").isNotNull)
      .groupBy(col("tool")).agg(count(lit(1)).as("cnt"))
      .withColumn("i", row_number().over(w).cast("long"))
    ranked.agg(
      count(lit(1)).as("n_tools"),
      sum(col("cnt")).as("total_uses"),
      sum(col("i") * col("cnt")).as("iwx"))
      .select(col("n_tools"), col("total_uses"),
        expr("(1000000L * (2 * iwx - (n_tools + 1) * total_uses))" +
          " div (n_tools * total_uses)").as("gini_e6"))
  }

  /**
   * Sequential-pattern mining (the ordered complement of the
   * a-priori itemsets): tool pairs a → b supported by a conversation
   * iff SOME a-call precedes SOME b-call there — i.e.
   * first_pos(a) < last_pos(b) — counted once per conversation.
   * PrefixSpan's length-2 core, which is where most of the signal
   * lives on tool logs ("search before write", "read before edit").
   *
   * Scale shape: one (conv, tool) aggregate to (min_pos, max_pos),
   * then a per-conversation self-join whose fan-out is bounded by the
   * conversation's DISTINCT tool count (≪ turns) — never doc×doc;
   * top-k by (support desc, tool_a, tool_b).
   *
   * @return (tool_a, tool_b, n_convs)
   */
  def toolSeqPatterns(transcripts: DataFrame, k: Int = 50,
      minSupport: Long = 2): DataFrame = {
    val pos = transcripts.where(col("tool").isNotNull)
      .groupBy(col("conv_id"), col("tool"))
      .agg(min(col("turn_idx")).as("minp"), max(col("turn_idx")).as("maxp"))
    pos.as("a").join(pos.as("b"),
      col("a.conv_id") === col("b.conv_id") &&
        col("a.tool") =!= col("b.tool") &&
        col("a.minp") < col("b.maxp"))
      .groupBy(col("a.tool").as("tool_a"), col("b.tool").as("tool_b"))
      .agg(count(lit(1)).as("n_convs"))
      .where(col("n_convs") >= minSupport)
      .orderBy(desc("n_convs"), asc("tool_a"), asc("tool_b"))
      .limit(k)
  }

  /**
   * Stale-tool screen: per tool, the last UTC day it was invoked and
   * its age against the corpus' newest day — the deprecation
   * dashboard ("which tools has the fleet stopped using"). Integer
   * day arithmetic; `stale` flags age > `staleDays`.
   *
   * @return (tool, last_day, age_days, n_uses, stale)
   */
  def staleTools(transcripts: DataFrame, staleDays: Long = 7): DataFrame = {
    val uses = transcripts.where(col("tool").isNotNull)
      .select(col("tool"),
        expr("unix_micros(cast(ts AS timestamp)) div 86400000000").as("day"))
    val maxDay = uses.agg(coalesce(max(col("day")), lit(0L))).first().getLong(0)
    uses.groupBy(col("tool"))
      .agg(max(col("day")).as("last_day"), count(lit(1)).as("n_uses"))
      .select(col("tool"), col("last_day"),
        (lit(maxDay) - col("last_day")).as("age_days"), col("n_uses"),
        when(lit(maxDay) - col("last_day") > staleDays, 1L).otherwise(0L)
          .as("stale"))
  }

  /**
   * Per-tool DISTINCTIVE terms — "what is this tool used for": the
   * top-`k` tokens of tool-bearing turns ranked by integer lift
   * against the whole-corpus token distribution,
   * lift_e4 = ⌊10⁴ · n_tw·N / (n_t·n_w)⌋ (N = corpus token count,
   * n_t = the tool's token count, n_w = the token's corpus count),
   * support ≥ `minSupport`. Ties by (n_tw desc, term asc). The
   * numerator runs in decimal(38,0) — exact at any corpus scale.
   *
   * Scale shape: two grouped counts (corpus marginals broadcast), a
   * per-tool rank window over the tool vocabulary — parallel across
   * tools, no global sort; the one driver scalar is N (the Allreduce
   * analog).
   *
   * @return (tool, term, n_tw, lift_e4, rank)
   */
  def toolTopTerms(transcripts: DataFrame, k: Int = 3,
      minSupport: Long = 3): DataFrame = {
    val tok = transcripts.select(col("tool"),
      explode(split(lower(col("text")), " ")).as("w"))
      .where(col("w") =!= "")
      .persist()
    val n = tok.count()
    val gw = tok.groupBy(col("w")).agg(count(lit(1)).as("n_w"))
    val tt = tok.where(col("tool").isNotNull)
      .groupBy(col("tool"), col("w")).agg(count(lit(1)).as("n_tw"))
    val nt = tt.groupBy(col("tool")).agg(sum(col("n_tw")).as("n_t"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tool"))
      .orderBy(desc("lift_e4"), desc("n_tw"), asc("w"))
    val out = tt.join(broadcast(nt), "tool").join(gw, "w")
      .where(col("n_tw") >= minSupport)
      .withColumn("lift_e4",
        expr(s"cast((cast(n_tw AS decimal(38,0)) * ${n}L * 10000)" +
          " div (cast(n_t AS decimal(38,0)) * n_w) AS bigint)"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("tool"), col("w").as("term"), col("n_tw"),
        col("lift_e4"), col("rank"))
    out // tok stays persisted for the two consumers; session cleanup frees it
  }
}
