package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * EXACT distributed quantiles of the per-document token-count
 * distribution — the corpus-profiling statistic behind sequence-length
 * curricula, packing bin sizing, and length-filter thresholds.
 *
 * `approx_percentile` is the usual Spark answer but its sketch is not
 * engine-portable (no DuckDB equivalent ⇒ no oracle) and not exact.
 * Exactness at 100 TB comes from the VALUE-HISTOGRAM trick instead of
 * a global sort: token counts live in a bounded domain (a document has
 * at most context-window-many tokens), so
 *   1. one shuffle: `groupBy(value).count()` — at most |domain| rows
 *      out, whatever the corpus size;
 *   2. a cumulative sum over the (tiny) histogram — the only
 *      single-partition step, O(|domain|) ≤ ~10^6 rows, constant in
 *      corpus size;
 *   3. quantile p = the smallest value whose cumulative count reaches
 *      `ceil(p·N/100)` (rank computed in exact integer arithmetic).
 * The full corpus is scanned exactly once and never sorted.
 */
object Quantiles {

  /** @return (pct, rank, value) — exact pct-th percentile (ceil-rank
   *          convention) of whitespace token counts, one row per
   *          requested percentile. */
  def tokenCountQuantiles(
      docs: DataFrame,
      pcts: Seq[Int] = Seq(25, 50, 75, 90, 99)): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val hist = docs
      .select(size(split(col("text"), " ")).cast("long").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
      .cache()
    val n = hist.agg(coalesce(sum(col("c")), lit(0L))).first().getLong(0)

    // single-partition window over the histogram only (≤ |domain| rows)
    val cum = hist.withColumn(
      "cum", sum(col("c")).over(Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    // exact integer ceil(p*n/100); driver-side (pcts is a constant list)
    val ranks = pcts.map(p => (p.toLong, (p.toLong * n + 99L) / 100L))
      .toDF("pct", "rank")
    val out = cum.join(broadcast(ranks), col("cum") >= col("rank"))
      .groupBy(col("pct"), col("rank"))
      .agg(min(col("v")).as("value"))
    hist.unpersist(blocking = false)
    out
  }

  /** Per-GROUP exact quantiles — same value-histogram scheme but the
   * cumulative window partitions by the group column, so there is no
   * single-partition step at all: every stage is a grouped shuffle.
   * Rank arithmetic stays exact-integer per group.
   *
   * @return (group, pct, rank, value) */
  def tokenCountQuantilesBy(
      docs: DataFrame,
      groupCol: String,
      pcts: Seq[Int] = Seq(25, 50, 75, 90, 99)): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window

    val hist = docs
      .select(col(groupCol).as("grp"), size(split(col("text"), " ")).cast("long").as("v"))
      .groupBy(col("grp"), col("v")).agg(count(lit(1)).as("c"))
    val cum = hist.select(
      col("grp"), col("v"), col("c"),
      sum(col("c")).over(Window.partitionBy(col("grp")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cum"),
      sum(col("c")).over(Window.partitionBy(col("grp"))).as("n"))
    val pctDf = broadcast(pcts.map(_.toLong).toDF("pct"))
    // integer ceil((pct·n)/100) = (pct·n + 99) div 100 — exact per group
    cum.join(pctDf, col("cum") >= expr("(pct * n + 99) div 100"))
      .groupBy(col("grp").as(groupCol), col("pct"),
        expr("(pct * n + 99) div 100").as("rank"))
      .agg(min(col("v")).as("value"))
      .select(col(groupCol), col("pct"), col("rank"), col("value"))
  }
}
