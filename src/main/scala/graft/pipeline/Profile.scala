package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Dataset profiling — the deequ/Great-Expectations-style ingestion
 * health checks a pipeline runs before trusting a new drop of data.
 * Everything is exact integer counts (no float stats), so profiles
 * are comparable across engines and across snapshots.
 *
 * Scale shape: [[columnProfile]] is ONE aggregate pass for the null
 * counts plus one count-distinct per column (each a partially
 * aggregated shuffle on its own column — at 100 TB swap in HLL
 * registers from [[Sketch]] if approximate distincts suffice);
 * [[mojibake]] is pure per-row column expressions, zero shuffles.
 */
object Profile {

  /**
   * Per-column profile of any DataFrame: null count and exact
   * distinct count, plus the table's row count on every row for
   * ratio-free integer compare.
   *
   * @return (col_name, n_rows, n_nulls, n_distinct) — one row per input
   *         column, ordered by column name
   */
  def columnProfile(df: DataFrame): DataFrame = {
    val cols = df.columns.sorted.toSeq
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n_rows")) ++
        cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c")) ++
        cols.map(c => count_distinct(col(c)).as(s"dist_$c"))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map(c =>
      struct(lit(c).as("col_name"), col("n_rows"),
        col(s"nulls_$c").as("n_nulls"), col(s"dist_$c").as("n_distinct")))
    one.select(explode(array(rows: _*)).as("p"))
      .select(col("p.col_name"), col("p.n_rows").as("n_rows"),
        col("p.n_nulls").as("n_nulls"), col("p.n_distinct").as("n_distinct"))
  }

  /**
   * Encoding-quality (mojibake) screen over `documents`: per document,
   * the count of characters outside printable-ASCII ∪ {tab, LF, CR},
   * the count of U+FFFD replacement characters (the classic
   * broken-transcode tell), and the non-printable rate ×10⁴. A clean
   * synthetic corpus reports zeros — the oracle checks the FUNCTION,
   * the unit test feeds it genuinely broken strings.
   *
   * @return (doc_id, n_chars, n_nonprint, n_repl, nonprint_e4)
   */
  def mojibake(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[^ -~\t\n\r]", "")))
        .cast("long").as("n_nonprint"),
      (length(col("text")) - length(replace(col("text"), lit("\uFFFD"), lit(""))))
        .cast("long").as("n_repl"))
      .withColumn("nonprint_e4",
        when(col("n_chars") === 0L, 0L)
          .otherwise(expr("(n_nonprint * 10000L) div n_chars")))
}
