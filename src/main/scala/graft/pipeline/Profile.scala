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
   * Ingestion-volume anomaly detection: flag UTC days whose turn
   * volume sits more than `kSigma` standard deviations from the
   * corpus mean — the spike/drop alarm an ingestion pipeline pages
   * on. The k-sigma gate is the same cross-multiplied INTEGER form as
   * the per-source length outliers (|n·x − s|² > k²·(n·ssq − s²),
   * decimal(38,0) — no float mean/sqrt crosses the oracle boundary),
   * with the sign split into separate spike/drop flags.
   *
   * Scale shape: one per-day count (partially aggregated), one 3-cell
   * global aggregate broadcast back over the ~day-count rows.
   *
   * @return (day, n_turns, is_spike, is_drop)
   */
  def dailyAnomalies(transcripts: DataFrame, kSigma: Long = 2): DataFrame = {
    val days = transcripts.select(
      expr("unix_micros(cast(ts AS timestamp)) div 86400000000").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n_turns"))
    val stats = days.agg(count(lit(1)).as("n"),
      sum(col("n_turns")).as("s"),
      sum(col("n_turns") * col("n_turns")).as("ssq"))
    val dev = s"(cast(n AS decimal(38,0)) * n_turns - s)"
    val gate = s"$dev * $dev > ${kSigma * kSigma} *" +
      s" (cast(n AS decimal(38,0)) * ssq - cast(s AS decimal(38,0)) * s)"
    days.crossJoin(broadcast(stats))
      .select(col("day"), col("n_turns"),
        expr(s"cast(CASE WHEN $gate AND cast(n AS decimal(38,0)) * n_turns > s" +
          " THEN 1 ELSE 0 END AS bigint)").as("is_spike"),
        expr(s"cast(CASE WHEN $gate AND cast(n AS decimal(38,0)) * n_turns < s" +
          " THEN 1 ELSE 0 END AS bigint)").as("is_drop"))
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

  /**
   * k-anonymity census over the release quasi-identifiers (source,
   * lang, length bucket): a privacy screen run before publishing a
   * corpus slice — any quasi-identifier combination shared by fewer
   * than k documents re-identifies its members, so those groups are
   * flagged for suppression/generalization. The length bucket is the
   * power-of-two bit-length class (exact integer), mirroring the
   * generalization a release pipeline actually applies to a
   * continuous column.
   *
   * Output one row per equivalence class with its size and the
   * anonymity flag — exact integers end to end. Scale shape: one
   * partial-aggregated groupBy over low-cardinality keys.
   */
  def kAnonymity(docs: DataFrame, k: Long = 5): DataFrame =
    docs.select(col("source"), col("lang"),
      length(conv(col("n_chars"), 10, 2)).cast("long").as("len_bucket"))
      .groupBy(col("source"), col("lang"), col("len_bucket"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("anon_ok",
        when(col("n_docs") >= k, 1L).otherwise(0L))
}
