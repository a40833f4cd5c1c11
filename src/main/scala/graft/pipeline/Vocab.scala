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
  /**
   * BM25 document ranking for a deterministic query — the retrieval
   * scorer completing the tf-idf surface (Robertson-Spärck Jones;
   * k1 = 6/5, b = 3/4 as exact rationals).
   *
   * Integer-exact across engines: with rational idf
   * (N−df+1)/(df+1), the per-term score
   * idf · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) reduces over the
   * common denominator 20·tot (avgdl = tot/N) to
   *
   *   contrib_e6 = ⌊10⁶·(N−df+1)·44·tf·tot /
   *                ((df+1)·(20·tot·tf + 6·tot + 18·dl·N))⌋
   *
   * computed in decimal(38,0) (HUGEINT in the oracle) — no floats,
   * no logs. Per-term floors sum to the exported score_e6 (documented
   * deviation ≤ |q| µ-units from the real-valued sum).
   *
   * The query is data-derived and deterministic: the `nQueryTerms`
   * highest-corpus-frequency terms with df·4 ≤ N (content words, not
   * stopwords), ties by term. Scale shape: the query table is
   * broadcast; everything else is partial-aggregated groupBys and a
   * TakeOrdered top-k — no global sort, no window beyond topK rows.
   */
  def bm25TopDocs(docs: DataFrame, nQueryTerms: Int = 5, topK: Int = 20): DataFrame = {
    val t = terms(docs)
    val n = docs.count()
    val tot = t.count()
    val tf = t.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dl = t.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val q = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("ctf"))
      .where(col("df") * 4 <= n)
      .orderBy(desc("ctf"), asc("term"))
      .limit(nQueryTerms)
      .select(col("term"), col("df"))
    val contrib = expr(
      s"(cast(1000000 AS decimal(38,0)) * (${n}L - df + 1) * 44 * tf * ${tot}L)" +
        s" div (cast(df + 1 AS decimal(38,0)) * (cast(20 AS decimal(38,0)) * ${tot}L * tf" +
        s" + cast(6 AS decimal(38,0)) * ${tot}L + cast(18 AS decimal(38,0)) * dl * ${n}L))")
    val scores = tf.join(broadcast(q), "term")
      .join(dl, "doc_id")
      .select(col("doc_id"), contrib.cast("long").as("c"))
      .groupBy(col("doc_id")).agg(sum(col("c")).as("score_e6"))
    val w = Window.orderBy(desc("score_e6"), asc("doc_id"))
    scores.orderBy(desc("score_e6"), asc("doc_id")).limit(topK)
      .withColumn("rank", row_number().over(w).cast("long"))
  }

  /**
   * Positional inverted index — the retrieval-index build as a table
   * operator: one posting row per (term, document) with the sorted
   * 0-based position list (phrase/proximity query support) and the
   * term's document frequency.
   *
   * Scale shape: ONE shuffle, keyed by term — which IS the index
   * partitioning a search cluster wants (a term's postings land
   * together, ready for per-shard serving). Positions stay bounded by
   * document length (rows are (term, doc)-grained — a stopword's
   * postings spread over many rows, never one giant cell); the
   * |vocab|-row df side broadcasts.
   */
  def invertedIndex(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      posexplode(split(lower(col("text")), " ")).as(Seq("pos", "term")))
    val postings = tok.groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"),
        concat_ws(",", array_sort(collect_list(col("pos")))).as("positions"))
    val df = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    postings.join(broadcast(df), "term")
      .select(col("term"), col("doc_id"), col("tf"), col("df"), col("positions"))
  }

  /**
   * Sparse tf-idf cosine all-pairs over the inverted index — the
   * lexical near-dup/similarity join that complements the embedding
   * side ([[Similarity.cosineDupPairs]]) when no embeddings exist:
   * pairs of documents whose CONTENT-WORD tf-idf vectors have
   * cos² ≥ threshold.
   *
   * Integer-exact: idf = bit_length(⌊N/df⌋) (the repo's exact-log2
   * convention — any decreasing idf works, this one needs no floats),
   * weight w = tf·idf, dot = Σ w_a·w_b over shared terms, and the
   * exported score is cos2_e6 = ⌊10⁶·dot² / (‖a‖²·‖b‖²)⌋ — squaring
   * avoids sqrt and loses nothing since weights are nonnegative.
   * The document VECTOR is defined as content words only (df·4 ≤ N,
   * the bm25 content-word gate, AND df ≤ `dfCap`), so the cosine is
   * exact for that representation.
   *
   * Scale shape: the pair generator is a postings self-join on term —
   * per-term fan-out is C(df, 2), so the df gates are simultaneously
   * the semantic definition and the hub guard (the AllPairs family's
   * stop-the-star-join move): with df ≤ dfCap the join is
   * Σ_term C(df,2) ≤ dfCap·Σdf = dfCap·|postings|, LINEAR in corpus
   * size with a constant cap factor. Norms are one partial-agg
   * groupBy; the df table broadcasts.
   */
  def sparseCosinePairs(
      docs: DataFrame,
      minCos2E6: Long = 250000,
      dfCap: Long = 1000): DataFrame = {
    val n = docs.count()
    val tf = terms(docs).groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = tf
      .join(broadcast(df.where(col("df") * 4 <= lit(n) && col("df") <= lit(dfCap))), "term")
      .select(col("doc_id"), col("term"),
        (col("tf") * expr(s"length(bin(${n}L div df))")).as("w"))
      .persist()
    val n2 = w.groupBy(col("doc_id")).agg(sum(col("w") * col("w")).as("n2"))
    val dot = w.as("a")
      .join(w.as("b"),
        col("a.term") === col("b.term") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(sum(col("a.w") * col("b.w")).as("dot"))
    dot
      .join(n2.select(col("doc_id").as("doc_a"), col("n2").as("na2")), "doc_a")
      .join(n2.select(col("doc_id").as("doc_b"), col("n2").as("nb2")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("dot"),
        expr("(cast(dot AS decimal(38,0)) * dot * 1000000)" +
          " div (cast(na2 AS decimal(38,0)) * nb2)")
          .cast("long").as("cos2_e6"))
      .where(col("cos2_e6") >= minCos2E6)
  }

  /**
   * Zipf frequency-of-frequencies census: word types bucketed by the
   * BIT LENGTH of their corpus frequency (bucket b holds types with
   * tf ∈ [2^(b-1), 2^b)), with per-bucket type and token totals — the
   * rank-frequency diagnostic behind tokenizer-vocab sizing and the
   * Heaps-curve twin ([[TextStats.heapsCurve]] grows the vocabulary
   * over time; this is its frequency-marginal at rest). A corpus
   * whose log-log histogram is straight with slope ≈ −1 between
   * adjacent buckets is Zipfian; a bulge in low buckets flags
   * boilerplate/near-dup inflation of the singleton tail.
   *
   * Exact integers only (counts and bit lengths: `length(conv(n,10,
   * 2))` ≡ DuckDB `length(bin(n))`). Scale shape: groupBy(term) with
   * map-side combine → |vocab| rows → a ≤64-row bucket aggregate.
   */
  def zipfHistogram(docs: DataFrame): DataFrame =
    terms(docs).groupBy(col("term")).agg(count(lit(1)).as("tf"))
      .withColumn("bucket", length(conv(col("tf"), 10, 2)).cast("long"))
      .groupBy(col("bucket")).agg(
        count(lit(1)).as("n_types"),
        sum(col("tf")).as("n_tokens"),
        min(col("tf")).as("min_tf"),
        max(col("tf")).as("max_tf"))

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
