package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination: flag training documents that share word
 * n-grams with a held-out evaluation set. Standard practice before
 * training on a web-scale corpus — any doc overlapping an eval
 * benchmark leaks test data into the model.
 *
 * Scale design: the eval set is tiny relative to a 100 TB corpus
 * (benchmarks are thousands of docs), so its distinct n-gram set is
 * BROADCAST to the training-side shingle scan — the big side never
 * shuffles, and the per-doc counts are a partial-agg groupBy on
 * doc_id. No counterpart in the reference (pure graph engine).
 */
object Decontam {

  /** Deterministic eval-set membership: doc_id ≡ 0 (mod evalMod) —
   * stands in for "doc_id appears in the benchmark manifest". */
  def isEval(evalMod: Long) = pmod(col("doc_id"), lit(evalMod)) === 0

  /**
   * Per-training-doc contamination report.
   *
   * @param n       shingle width (production uses 8-13; the synthetic
   *                corpus has 30-70-token docs, so tests run n=3)
   * @param evalMod eval-set selector (see [[isEval]])
   * @return (doc_id, shared_ngrams, contaminated) for every
   *         NON-eval document; shared_ngrams counts distinct n-grams
   *         also present anywhere in the eval set
   */
  def contamination(docs: DataFrame, n: Int = 3, evalMod: Long = 97): DataFrame = {
    val sh = Dedup.shingles(docs, n) // distinct (doc_id, shingle)
    val evalGrams = sh.where(isEval(evalMod))
      .select(col("shingle")).distinct()
    val train = docs.where(!isEval(evalMod)).select(col("doc_id"))
    val trainSh = sh.join(train, "doc_id")
    val hits = trainSh
      .join(broadcast(evalGrams), Seq("shingle"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("shared_ngrams"))
    train
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("shared_ngrams"), lit(0L)).as("shared_ngrams"))
      .withColumn("contaminated", (col("shared_ngrams") > 0).cast("long"))
  }
}
