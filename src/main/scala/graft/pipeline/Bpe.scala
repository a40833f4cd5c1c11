package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * BPE (byte-pair-encoding) tokenizer MERGE TRAINING — the step that
 * turns a raw corpus into a subword vocabulary. Each round counts
 * adjacent symbol pairs over the corpus (weighted by word frequency),
 * adopts the most frequent pair as a new merged symbol, and rewrites
 * the working sequences by greedy left-to-right application — exactly
 * the classic sennrich-style loop.
 *
 * Determinism contract (the DuckDB oracle replays the whole
 * trajectory): pair choice orders by (count desc, sym_a asc, sym_b
 * asc) — a total order — and merge application is greedy
 * left-to-right, where within a chain of consecutive eligible
 * positions (only possible when sym_a = sym_b, e.g. runs of the same
 * char) merges start at even chain offsets. The fold below implements
 * that by construction: a just-merged symbol (string a+b) can never
 * equal sym_a (b is nonempty), so runs alternate merge/skip.
 *
 * Scale shape: training state is the DISTINCT-WORD frequency table —
 * the corpus collapses to it in one hash aggregate and never gets
 * re-scanned; each round is one pair aggregate over that table (pair
 * space ≤ Σ word lengths) plus one array-native rewrite (zero
 * shuffle). The chosen pair is driver-side model state, same pattern
 * as the IVF/k-means Lloyd loop.
 */
object Bpe {

  private def sqlLit(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** @return (round, sym_a, sym_b, pair_count) — the learned merge
   *          table, one row per round (stops early if no pair left) */
  def train(docs: DataFrame, rounds: Int = 6): DataFrame = {
    val (merges, words) = trainState(docs, rounds)
    words.unpersist()
    merges
  }

  /**
   * Per-document token counts under the learned vocabulary — the
   * ENCODE step's sizing readout (context-window packing and token
   * budgeting run on these numbers). The corpus never re-tokenizes:
   * merges act only within words, so a document's BPE length is the
   * sum of its words' final symbol counts — one join against the
   * (distinct-word → length) map.
   *
   * @return (doc_id, n_words, n_tokens_bpe)
   */
  def docTokenCounts(docs: DataFrame, rounds: Int = 6): DataFrame = {
    val (_, words) = trainState(docs, rounds)
    val wordLen = words.select(col("w"), size(col("syms")).cast("long").as("len"))
    val out = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .join(wordLen, "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("len")).as("n_tokens_bpe"))
    words.unpersist()
    out
  }

  /**
   * Token census of the corpus ENCODED under the learned vocabulary —
   * the readout a tokenizer-training pipeline ships: which subword
   * symbols exist after `rounds` merges and how often each occurs
   * (occurrences weighted by word frequency, i.e. true corpus counts).
   *
   * @return (sym, n_occurrences)
   */
  def tokenCensus(docs: DataFrame, rounds: Int = 6): DataFrame = {
    val (_, words) = trainState(docs, rounds)
    val out = words
      .select(col("freq"), explode(col("syms")).as("sym"))
      .groupBy(col("sym")).agg(sum(col("freq")).as("n_occurrences"))
    words.unpersist()
    out
  }

  private def trainState(docs: DataFrame, rounds: Int): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"),
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))").as("syms"))
      .persist()
    words.count()
    val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = words
        .where(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(slice(syms, 1, size(syms) - 1)," +
            " (x, i) -> struct(x AS a, element_at(syms, i + 2) AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r.toLong, a, b, cnt))
        val (la, lb, lab) = (sqlLit(a), sqlLit(b), sqlLit(a + b))
        val next = words.select(col("w"), col("freq"), expr(
          s"aggregate(syms, cast(array() AS array<string>), (acc, x) -> " +
            s"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = $la AND x = $lb " +
            s"THEN concat(slice(acc, 1, size(acc) - 1), array($lab)) " +
            s"ELSE concat(acc, array(x)) END)").as("syms"))
          .persist()
        next.count()
        words.unpersist()
        words = next
        r += 1
      }
    }
    val mergesDf = merges.toSeq.toDF("round", "sym_a", "sym_b", "pair_count")
      .repartition(1)
    (mergesDf, words)
  }
}
