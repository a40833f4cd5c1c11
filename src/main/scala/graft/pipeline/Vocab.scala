package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus vocabulary operators for tokenizer/feature construction over
 * `documents` — no counterpart in the reference (training-data
 * pipeline surface, like TextStats/Mix).
 *
 * All statistics are integer counts (term frequency, document
 * frequency, ranks), so oracle compares have zero floating-point
 * surface: a consumer computes idf/tf-idf weights from (tf, df, N)
 * however it likes; the engine's job is the exact counts.
 */
object Vocab {

  private def terms(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))

  /**
   * Top-k corpus vocabulary by total occurrence count, with document
   * frequency — the tokenizer-vocab / stopword-list builder.
   *
   * Scale shape: one partial-aggregated groupBy(term) (map-side
   * combine collapses the corpus to |vocab| rows before the shuffle),
   * then a TakeOrderedAndProject top-k — per-partition heaps, no
   * global sort. Tie-break on the unique `term` makes the cut
   * deterministic.
   */
  def topVocab(docs: DataFrame, k: Int = 50): DataFrame =
    terms(docs)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("tf"), count_distinct(col("doc_id")).as("df"))
      .orderBy(desc("tf"), asc("term"))
      .limit(k)

  /**
   * Per-document distinctive terms: the k terms ranked by
   * (tf desc, df asc, term asc) — the integer-exact skeleton of
   * tf-idf (monotone in tf·idf for any decreasing idf(df); exporting
   * the rank instead of a float score keeps the compare exact).
   *
   * Scale shape: groupBy(doc_id, term) with map-side combine, a
   * term-keyed join against the |vocab|-sized df table (broadcast
   * when it fits), then a window partitioned BY DOCUMENT — parallel
   * across docs, never a global sort.
   */
  def distinctiveTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    val tf = terms(docs).groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(desc("tf"), asc("df"), asc("term"))
    tf.join(df, "term")
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("rank"))
  }
}
