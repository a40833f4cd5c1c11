package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * End-to-end corpus curation — the composition the individual pipeline
 * operators exist for: a training-data pass keeps a document iff
 *
 *  1. it is the exact-dedup KEEPER of its text-hash group
 *     ([[Dedup.exact]]: `min(doc_id)` per md5),
 *  2. it passes the cheap quality gates ([[TextStats.quality]]:
 *     token-count band, punctuation ceiling, stopword floor),
 *  3. language ID matches the target corpus language
 *     ([[TextStats.langId]]).
 *
 * Plan shape at 100 TB: three independent scans of `documents` that
 * Catalyst collapses onto one source, two hash semi-joins on doc_id
 * (broadcast when the survivor side is small), no window functions, no
 * driver data — every gate is a column predicate pushed as far down as
 * the md5/agg allows. Driver query `q_curate`; thresholds are e4
 * integers like the rest of TextStats so the DuckDB oracle is exact.
 */
object Curate {

  def curate(
      docs: DataFrame,
      lang: String = "en",
      minTokens: Long = 20,
      maxTokens: Long = 10000,
      maxPunctE4: Long = 2000,
      minStopE4: Long = 200): DataFrame = {
    val keepers = Dedup.exact(docs).select(col("keeper_id").as("doc_id"))
    val quality = TextStats.quality(docs)
      .where(
        col("n_tokens").between(minTokens, maxTokens) &&
          col("punct_ratio_e4") <= maxPunctE4 &&
          col("stop_ratio_e4") >= minStopE4)
      .select(col("doc_id"), col("n_tokens"))
    val inLang = TextStats.langId(docs)
      .where(col("pred_lang") === lang)
      .select(col("doc_id"))
    quality
      .join(keepers, "doc_id")
      .join(inLang, "doc_id")
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"))
  }
}
