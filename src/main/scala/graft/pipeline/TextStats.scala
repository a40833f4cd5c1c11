package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data curation over `documents`:
 * language-ID (stopword-profile heuristic), quality scoring
 * (length/punct/stopword ratios), token counting (whitespace + word
 * regex), and document fingerprinting (bottom-k shingle hashes, a
 * winnowing-style sketch).
 *
 * Everything is a codegen'd column expression (no UDFs); ratios are
 * exported ×10⁴ as integers for exact oracle compare. The heuristics
 * are deterministic functions of the text — they do not (and cannot)
 * recover the synthetic `lang` column, which is uncorrelated with the
 * generated vocabulary; the oracle checks the FUNCTION, the unit test
 * checks the semantics on hand-written multilingual snippets.
 */
object TextStats {

  /** Tiny stopword profiles (top function words per language). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "de", "un", "une", "dans", "pour"),
    "es" -> Seq("el", "la", "los", "y", "es", "de", "un", "una", "en", "por"))

  private def tokensCol: Column = split(lower(col("text")), " ")

  private def stopCount(lang: String): Column =
    size(filter(tokensCol, t => t.isin(stopwords(lang): _*)))

  /**
   * Corpus FRESHNESS / novelty curve: per UTC day, how much of the
   * day's n-gram mass is NEW (its n-gram first appeared that day) —
   * the telemetry a continuously-ingesting training pipeline watches
   * to decide whether more crawl is still adding information.
   *
   * Day = ⌊epoch_µs / 86 400·10⁶⌋ (integer, timezone-free, identical
   * in both engines). Grams are word `n`-grams WITHIN a turn's text.
   * Scale shape: one (gram, day) hash aggregate, one gram-level min,
   * one join back — all linear, no windows over the corpus.
   *
   * @param transcripts (conv_id, turn_idx, role, text, tool, ts)
   * @return (day, n_occ, new_occ, new_grams) per day
   */
  def noveltyByDay(transcripts: DataFrame, n: Int = 2): DataFrame = {
    val grams = transcripts.select(
      expr("unix_micros(cast(ts AS timestamp)) div 86400000000").as("day"),
      split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= n)
      .select(col("day"), explode(expr(
        s"transform(sequence(1, size(toks) - ${n - 1}), i -> array_join(slice(toks, i, $n), ' '))"))
        .as("gram"))
    val byGramDay = grams.groupBy(col("gram"), col("day")).agg(count(lit(1)).as("c"))
    val first = byGramDay.groupBy(col("gram")).agg(min(col("day")).as("fday"))
    byGramDay.join(first, "gram")
      .groupBy(col("day")).agg(
        sum(col("c")).as("n_occ"),
        sum(when(col("day") === col("fday"), col("c")).otherwise(0L)).as("new_occ"),
        sum(when(col("day") === col("fday"), 1L).otherwise(0L)).as("new_grams"))
  }

  /**
   * Heaps'-law vocabulary-growth curve: per UTC day, the corpus'
   * token volume and the count of NEVER-before-seen word types, with
   * running totals — the V(N) ≈ K·N^β curve a tokenizer/corpus
   * planner reads maturity from (unigram-TYPE sibling of
   * [[noveltyByDay]], which tracks n-gram occurrence mass).
   *
   * Integer UTC-day arithmetic, exact counts. Scale shape: one
   * (token, day) explode feeding two grouped aggregates (per-day
   * volume; min-day per type — both partially aggregated before the
   * shuffle); the cumulative window then runs over ONE ROW PER DAY,
   * trivially small at any corpus size.
   *
   * @return (day, n_tokens, new_types, cum_tokens, cum_types)
   */
  def heapsCurve(transcripts: DataFrame): DataFrame = {
    val tok = transcripts.select(
      expr("unix_micros(cast(ts AS timestamp)) div 86400000000").as("day"),
      explode(split(lower(col("text")), " ")).as("w"))
      .where(col("w") =!= "")
    val perDay = tok.groupBy(col("day")).agg(count(lit(1)).as("n_tokens"))
    val firstSeen = tok.groupBy(col("w")).agg(min(col("day")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("new_types"))
    val wd = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDay.join(firstSeen, Seq("day"), "left")
      .select(col("day"), col("n_tokens"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(wd))
      .withColumn("cum_types", sum(col("new_types")).over(wd))
  }

  /**
   * Pairwise total-variation distance between source unigram
   * distributions — the mixture-drift dashboard ("did crawl B's
   * token distribution move away from crawl A's") a data-mixing
   * pipeline watches; TV is the f-divergence that stays INTEGER-exact
   * (KL needs logs): with n_{s,w} the token counts and N_s totals,
   *
   *   TV(a,b) = ½ Σ_w |n_aw/N_a − n_bw/N_b|
   *   tv_e6   = ⌊10⁶·(Σ_shared |n_aw·N_b − n_bw·N_a|
   *                   + (N_a−M_a)·N_b + (N_b−M_b)·N_a) / (2·N_a·N_b)⌋
   *
   * where M_s sums each side's counts over the SHARED vocabulary —
   * the two closing terms add the one-sided mass without ever
   * materializing the vocabulary union. Cross-multiplied decimal(38)
   * arithmetic (HUGEINT in the oracle): no floats at any scale.
   *
   * Scale shape: one (source, word) grouped count, a word-keyed
   * self-join (fan-out = #sources per word, a small constant), and a
   * #source²-row aggregate. Totals broadcast via the grouped key.
   *
   * @return (source_a, source_b, n_shared, tv_e6), a < b
   */
  def sourceDivergence(docs: DataFrame): DataFrame = {
    val cnt = docs
      .select(col("source"), explode(split(lower(col("text")), " ")).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy(col("source")).agg(sum(col("n")).as("nt"))
    val c2 = cnt.join(tot, "source").persist()
    val agg = c2.as("a")
      .join(c2.as("b"), col("a.w") === col("b.w") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"),
        col("a.nt").as("na"), col("b.nt").as("nb"))
      .agg(
        sum(abs(col("a.n").cast("decimal(38,0)") * col("b.nt")
          - col("b.n").cast("decimal(38,0)") * col("a.nt"))).as("sh"),
        sum(col("a.n")).as("ma"), sum(col("b.n")).as("mb"),
        count(lit(1)).as("n_shared"))
    agg.select(col("source_a"), col("source_b"), col("n_shared"),
      expr("cast((1000000 * (sh + cast(na - ma AS decimal(38,0)) * nb" +
        " + cast(nb - mb AS decimal(38,0)) * na)) div" +
        " (2 * cast(na AS decimal(38,0)) * nb) AS bigint)").as("tv_e6"))
  }

  /**
   * Boilerplate-turn detection: turn texts that recur across ≥
   * `minConvs` DISTINCT conversations — the greeting/disclaimer/
   * template mass a transcript-curation pipeline strips before
   * training (cross-conversation sibling of the exact-dedup keeper).
   * Exported as md5 keys (texts may be arbitrarily long), top-`k` by
   * (n_convs, n_occ, text_md5) for a deterministic result set.
   *
   * Scale shape: one grouped aggregate keyed by the text hash
   * (partial agg before the shuffle), then TakeOrdered top-k — no
   * global sort, no text column crossing the shuffle.
   *
   * @return (text_md5, n_convs, n_occ)
   */
  def boilerplate(transcripts: DataFrame, minConvs: Int = 2,
      k: Int = 100): DataFrame =
    transcripts
      .select(md5(col("text")).as("text_md5"), col("conv_id"))
      .groupBy(col("text_md5"))
      .agg(count_distinct(col("conv_id")).as("n_convs"),
        count(lit(1)).as("n_occ"))
      .where(col("n_convs") >= minConvs)
      .orderBy(desc("n_convs"), desc("n_occ"), asc("text_md5"))
      .limit(k)

  /**
   * Language-ID with a CONFIDENCE MARGIN — the gate a curation
   * pipeline applies before trusting the label: margin = best-profile
   * hits − runner-up hits (0 on ties ⇒ the tie-broken label is
   * low-confidence by construction). Same scoring as [[langId]];
   * pure column expressions, zero extra shuffle.
   *
   * @return (doc_id, pred_lang, stop_hits, margin)
   */
  def langIdMargin(docs: DataFrame): DataFrame = {
    val langs = Seq("en", "de", "fr", "es")
    val scored = langs.foldLeft(docs.select(col("doc_id"), col("text"))) { (df, l) =>
      df.withColumn(s"s_$l", stopCount(l))
    }
    val best = langs.foldLeft(lit(0): Column)((acc, l) => greatest(acc, col(s"s_$l")))
    val pred = langs.foldRight(lit("und"): Column) { (l, rest) =>
      when(col(s"s_$l") === col("best") && col("best") > 0, lit(l)).otherwise(rest)
    }
    scored.withColumn("best", best)
      .withColumn("second",
        element_at(sort_array(array(langs.map(l => col(s"s_$l")): _*), asc = false), 2))
      .withColumn("pred_lang", pred)
      .select(col("doc_id"), col("pred_lang"),
        col("best").cast("long").as("stop_hits"),
        (col("best") - col("second")).cast("long").as("margin"))
  }

  /** Language-ID: argmax of stopword hits per profile; deterministic
   * tie-break by fixed language order (en > de > fr > es), 'und'
   * (undetermined) when no profile matches at all. */
  def langId(docs: DataFrame): DataFrame = {
    val langs = Seq("en", "de", "fr", "es")
    val scored = langs.foldLeft(docs.select(col("doc_id"), col("text"))) { (df, l) =>
      df.withColumn(s"s_$l", stopCount(l))
    }
    val best = langs.foldLeft(lit(0): Column)((acc, l) => greatest(acc, col(s"s_$l")))
    val pred = langs.foldRight(lit("und"): Column) { (l, rest) =>
      when(col(s"s_$l") === col("best") && col("best") > 0, lit(l)).otherwise(rest)
    }
    // foldRight gives en-first priority on ties
    scored.withColumn("best", best)
      .withColumn("pred_lang", pred)
      .select(col("doc_id"), col("pred_lang"), col("best").as("stop_hits"))
  }

  /** Corpus census with subtotal rows: doc counts and char mass by
   * (source, predicted language), ROLLUP'd — per-(source, lang),
   * per-source, and grand-total rows in one pass (Spark plans the
   * grouping sets as a single expanded aggregate, not three scans).
   * The grouping-sets member of the relational surface the reference
   * lacks entirely (SURVEY §2.6). */
  def langRollup(docs: DataFrame): DataFrame = {
    val lang = langId(docs).select(col("doc_id"), col("pred_lang"))
    docs.select(col("doc_id"), col("source"), length(col("text")).cast("long").as("nc"))
      .join(lang, "doc_id")
      .rollup(col("source"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nc")).as("tot_chars"))
      .select(col("source"), col("pred_lang"), col("n_docs"), col("tot_chars"))
  }

  /** Quality signals: char length, token count, mean token length,
   * punctuation ratio, stopword ratio, distinct-token ratio — the
   * standard cheap filters for corpus curation, ×10⁴ integers. */
  def quality(docs: DataFrame): DataFrame = {
    val toks = tokensCol
    val nTok = size(toks)
    val nChars = length(col("text"))
    val punct = nChars - length(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", ""))
    val stops = stopCount("en")
    val distinctRatio = size(array_distinct(toks)).cast("double") / nTok
    docs.select(
      col("doc_id"),
      nChars.as("n_chars_computed"),
      nTok.as("n_tokens"),
      round(nChars.cast("double") / nTok * 10000).cast("long").as("mean_tok_len_e4"),
      round(punct.cast("double") / nChars * 10000).cast("long").as("punct_ratio_e4"),
      round(stops.cast("double") / nTok * 10000).cast("long").as("stop_ratio_e4"),
      round(distinctRatio * 10000).cast("long").as("distinct_ratio_e4"))
  }

  /** Token counting: whitespace tokens + BPE-ish word-piece count
   * (alnum runs via regex — a cheap proxy for subword count). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).as("ws_tokens"),
      size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).as("word_tokens"),
      size(array_distinct(split(lower(col("text")), " "))).as("distinct_tokens"))

  /** Word n-grams of `text` as an array column (empty when the doc has
   * fewer than n tokens). */
  private def gramArray(n: Int): Column = {
    val toks = split(col("text"), " ")
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Max multiplicity of any element of `arr`: sort, then a single
   * fold tracking the current and best run length — O(n log n) per
   * row, zero shuffle. */
  private def maxRun(arr: Column): Column = {
    val folded = aggregate(
      array_sort(arr),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc("prev"), acc("run") + 1).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"), greatest(acc("best"), run).as("best"))
      })
    folded("best")
  }

  /**
   * Repetition signals (the Gopher/MassiveText repetition filters,
   * adapted to word n-grams): for n ∈ {2, 3}, the total and distinct
   * n-gram counts plus the occurrence count of the MOST FREQUENT
   * n-gram. `(n_grams − distinct_grams) / n_grams` is the duplicate
   * fraction and `top_gram / n_grams` the top-gram fraction — the two
   * standard repetition gates; counts are exported raw so the compare
   * is exact-integer and any threshold stays a consumer choice.
   *
   * Scale shape: pure per-row column expressions (sort + fold inside
   * the row) — NO shuffle, no explode; the 100 TB plan is a single
   * scan-project, embarrassing-parallel over document partitions.
   */
  def repetition(docs: DataFrame): DataFrame = {
    def stats(n: Int): Seq[Column] = {
      val g = gramArray(n)
      Seq(
        size(g).cast("long").as(s"n_grams$n"),
        size(array_distinct(g)).cast("long").as(s"distinct_grams$n"),
        maxRun(g).as(s"top_gram$n"))
    }
    docs.select(col("doc_id") +: (stats(2) ++ stats(3)): _*)
  }

  /**
   * Corpus-rarity scoring — the integer-exact stand-in for unigram-LM
   * perplexity filtering (CCNet-style): each token occurrence scores
   * floor(10⁶ / corpus-frequency), so documents of common boilerplate
   * score low and rare-vocabulary documents score high. The per-term
   * flooring keeps every sum order-independent (a float Σ −log p
   * would not hash-compare across engines).
   *
   * Scale: the term-frequency table is vocabulary-sized (≪ corpus) —
   * Catalyst broadcasts it into the scoring join; one explode + two
   * hash aggs, nothing quadratic.
   */
  def rarity(docs: DataFrame): DataFrame = {
    val t = docs.select(col("doc_id"),
      explode(split(lower(col("text")), " ")).as("term"))
    val tf = t.groupBy(col("term")).agg(count(lit(1)).as("tf"))
    t.join(tf, "term")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(floor(lit(1000000) / col("tf")).cast("long")).as("rarity_sum_e6"))
      .select(col("doc_id"), col("n_tokens"), col("rarity_sum_e6"),
        expr("rarity_sum_e6 div n_tokens").as("rarity_mean_e6"))
  }

  /**
   * Per-source document-length outliers by an EXACT k-sigma gate:
   * |x − μ| > k·σ cross-multiplied into pure integers —
   * (n·x − s)² > k²·(n·ssq − s²), with s = Σx, ssq = Σx² over the
   * doc's source — no float mean, no float sqrt, so the flag is
   * bit-identical across engines and parallelism. The data-quality
   * triage gate (truncated/concatenated crawl records show up as
   * length anomalies first).
   *
   * Scale: one per-source aggregate (broadcast back), one codegen'd
   * filter expression; squares run in decimal(38,0)/HUGEINT.
   *
   * @return (doc_id, source, n_chars, is_outlier)
   */
  def lengthOutliers(docs: DataFrame, kSigma: Long = 3): DataFrame = {
    val stats = docs.groupBy(col("source")).agg(
      count(lit(1)).as("n"),
      sum(col("n_chars")).as("s"),
      sum(col("n_chars") * col("n_chars")).as("ssq"))
    docs.select(col("doc_id"), col("source"), col("n_chars"))
      .join(broadcast(stats), "source")
      .select(col("doc_id"), col("source"), col("n_chars"),
        expr(s"cast(CASE WHEN (cast(n AS decimal(38,0)) * n_chars - s) *" +
          s" (cast(n AS decimal(38,0)) * n_chars - s) >" +
          s" ${kSigma * kSigma} * (cast(n AS decimal(38,0)) * ssq - cast(s AS decimal(38,0)) * s)" +
          s" THEN 1 ELSE 0 END AS bigint)").as("is_outlier"))
  }

  /** Document fingerprint: the k smallest md5(3-gram shingle) hashes,
   * joined — a bottom-k sketch (winnowing-style) stable under small
   * edits. Identical in DuckDB (string-min over md5). */
  def fingerprint(docs: DataFrame, k: Int = 3): DataFrame = {
    val sh = Dedup.shingles(docs, 3)
      .select(col("doc_id"), md5(col("shingle")).as("h"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("h"))
    sh.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .groupBy(col("doc_id"))
      .agg(concat_ws(",", array_sort(collect_list(col("h")))).as("fingerprint"))
  }

  /**
   * POSITIONAL winnowing (Schleimer–Wilkerson–Aiken, the MOSS
   * algorithm) — unlike [[fingerprint]]'s global bottom-k, winnowing
   * guarantees a match-detection window: every run of `w` consecutive
   * 3-gram hashes contributes its minimum, so any shared substring of
   * ≥ w+2 tokens between two documents shares at least one selected
   * (pos, hash) fingerprint. The plagiarism/near-dup-span detector
   * that bottom-k sketches cannot express.
   *
   * Selection rule (the paper's robust variant): per window the
   * minimum hash, ties broken by the RIGHTMOST position. Both
   * engines compute it as one integer: hp = h·2²⁰ + (2²⁰−1−pos)
   * (h < 2⁴⁰ from 10 md5 hex chars, pos < 2²⁰), whose window-min is
   * exactly (min h, max pos). Docs with fewer than w grams yield
   * their single all-gram window, so every tokenizable doc gets ≥ 1
   * fingerprint.
   *
   * Scale shape: one shuffle (by doc_id) feeds BOTH the gram windows
   * and the frame min — per-doc sorted windows, no self-join, no
   * global sort; output is a distinct over the selected rows.
   */
  /**
   * Conditional-trigram language-model predictability score — the
   * Markov upgrade of [[rarity]]'s unigram stand-in for perplexity
   * filtering (CCNet-style): train a word-trigram model ON THE CORPUS
   * ITSELF (one aggregation), then score every document by its mean
   * conditional probability p(w₃ | w₁w₂) = C(w₁w₂w₃) / C(w₁w₂·).
   * Gibberish and shuffled text score low (unseen continuations);
   * boilerplate scores suspiciously high — both ends are the filter
   * targets.
   *
   * Integer-exact across engines: each gram contributes
   * ⌊10⁶·C₃/C₂⌋ (C₂ = Σ_w₃ C₃ over the SAME gram rows, so the model
   * is a true conditional distribution and the max per-gram score is
   * 10⁶). No logs — `ln` is not correctly rounded and differs across
   * libm builds; the mean-probability score is filter-equivalent and
   * bit-stable.
   *
   * Scale shape: three linear shuffles — gram counts (groupBy gram),
   * prefix counts (second groupBy, map-side combinable), score join
   * back on the gram key (the trigram vocabulary is NOT broadcastable
   * at web scale — this stays a shuffle join by design), then one
   * groupBy(doc_id). Docs with < 3 tokens keep an all-zero row.
   *
   * @return (doc_id, n_grams, lm_sum_e6, lm_mean_e6)
   */
  def lmScore(docs: DataFrame): DataFrame = {
    val ord = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val grams = docs
      .select(col("doc_id"), posexplode(split(lower(col("text")), " ")).as(Seq("pos", "w1")))
      .withColumn("w2", lead(col("w1"), 1).over(ord))
      .withColumn("w3", lead(col("w1"), 2).over(ord))
      .where(col("w3").isNotNull)
    val c3 = grams.groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("n3"))
    val c2 = c3.groupBy(col("w1"), col("w2")).agg(sum(col("n3")).as("n2"))
    val scored = grams
      .join(c3, Seq("w1", "w2", "w3"))
      .join(c2, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(expr("(1000000L * n3) div n2")).as("lm_sum_e6"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("lm_sum_e6"), lit(0L)).as("lm_sum_e6"),
        expr("CASE WHEN n_grams IS NULL OR n_grams = 0 THEN 0L" +
          " ELSE lm_sum_e6 div n_grams END").as("lm_mean_e6"))
  }

  def winnow(docs: DataFrame, w: Int = 4): DataFrame = {
    val ord = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val grams = Dedup.tokens(docs)
      .withColumn("t1", lead(col("tok"), 1).over(ord))
      .withColumn("t2", lead(col("tok"), 2).over(ord))
      .where(col("t2").isNotNull)
      .select(col("doc_id"), col("pos"),
        expr("cast(conv(substring(md5(concat_ws(' ', tok, t1, t2)), 1, 10), 16, 10) as bigint)")
          .as("h"))
    val frame = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    grams
      .select(col("doc_id"), col("pos"),
        (col("h") * lit(1048576L) + (lit(1048575L) - col("pos"))).as("hp"))
      .withColumn("sel", min(col("hp")).over(frame))
      .withColumn("rn", row_number().over(ord))
      .withColumn("m", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .where(col("rn") <= greatest(col("m") - (w - 1), lit(1)))
      .select(col("doc_id"),
        (lit(1048575L) - pmod(col("sel"), lit(1048576L))).as("pos"),
        expr("sel div 1048576").as("h"))
      .distinct()
  }

  /**
   * Integer Flesch-style READABILITY score per document — the
   * classic quality-mix dial (pretraining mixes are routinely
   * stratified by readability band). Counting heuristics kept
   * engine-portable and deterministic: words = `[a-z0-9]+` runs of
   * the lowercased text, sentences = `[.!?]+` runs, syllables =
   * vowel-group (`[aeiou]+`) runs — the standard no-dictionary
   * approximation. Score in e3 fixed point with floor division:
   * flesch_e3 = 206835 − ⌊1015·W/S⌋ − ⌊84600·Y/W⌋, with W, S, Y
   * floored at 1 so degenerate texts score rather than crash.
   *
   * Scale shape: stateless per-row regexp projection (codegen'd,
   * pushdown-friendly) — no shuffle at all.
   *
   * @return (doc_id, words, sentences, syllables, flesch_e3)
   */
  def readability(docs: DataFrame): DataFrame = {
    def runs(c: Column, pat: String): Column =
      greatest(regexp_count(c, lit(pat)), lit(1)).cast("long")
    docs.select(col("doc_id"),
      runs(lower(col("text")), "[a-z0-9]+").as("words"),
      runs(col("text"), "[.!?]+").as("sentences"),
      runs(lower(col("text")), "[aeiou]+").as("syllables"))
      .withColumn("flesch_e3",
        lit(206835L) - expr("(1015L * words) div sentences")
          - expr("(84600L * syllables) div words"))
  }

  /** RAKE stopword set — deliberately small and FROZEN: it is part of
   * the operator's cross-engine contract (the oracle embeds the same
   * list), not a tunable. */
  val rakeStopwords: Seq[String] = Seq(
    "the", "of", "a", "an", "and", "or", "to", "in", "on", "for",
    "with", "is", "are", "was", "be", "as", "by", "at", "it", "this",
    "that", "from", "we", "you", "not")

  /**
   * RAKE keyword extraction (Rose et al. 2010): candidate phrases are
   * maximal stopword-free token runs; a word's score is
   * deg(w)/freq(w), where deg sums the lengths of the phrases its
   * occurrences sit in (words living in long multi-word phrases
   * outrank equally-frequent words that appear alone). Top-k per
   * document by (score desc, word asc) — the unsupervised
   * keyword/tag primitive for corpus browsing and weak labeling.
   *
   * No regex anywhere: phrase boundaries come from a running count
   * of stopword flags (window sum over unique positions — ROWS ≡
   * RANGE, so both engines agree), and the score is the usual
   * floor-scaled integer. Scale shape: windows partition BY DOCUMENT;
   * everything else is grouped aggregation.
   *
   * @return (doc_id, keyword, freq, rake_e4, rank)
   */
  def rakeKeywords(docs: DataFrame, k: Int = 3): DataFrame = {
    val toks = docs
      .select(col("doc_id"), posexplode(split(lower(col("text")), " ")).as(Seq("pos", "w")))
      .withColumn("stop", col("w").isin(rakeStopwords: _*) || col("w") === "")
    val wPh = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ph = toks
      .withColumn("pid", sum(when(col("stop"), 1L).otherwise(0L)).over(wPh))
      .where(!col("stop"))
    val plen = ph.groupBy(col("doc_id"), col("pid")).agg(count(lit(1)).as("len"))
    val sc = ph.join(plen, Seq("doc_id", "pid"))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("len")).as("degsum"))
      .withColumn("rake_e4", expr("degsum * 10000 div freq"))
    val wr = Window.partitionBy(col("doc_id"))
      .orderBy(desc("rake_e4"), asc("w"))
    sc.withColumn("rank", row_number().over(wr).cast("long"))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("w").as("keyword"), col("freq"),
        col("rake_e4"), col("rank"))
  }

  /**
   * Code-likeness screen: the code-vs-prose router every pretraining
   * mix runs before assigning documents to the code or text bucket.
   * Signal = density of code-surface characters (`;{}()=<>[]`) —
   * counted by per-character length differencing (exact, no regex
   * dialect surface), scaled to ⌊10⁴·n_sym/n_chars⌋. A prose doc
   * sits ≪ 300; real code ≫ 800. Pure column expressions, one pass.
   *
   * @return (doc_id, n_chars, n_sym, codey_e4, is_code)
   */
  def codeLikeness(docs: DataFrame, threshold: Long = 500): DataFrame = {
    val syms = ";{}()=<>[]".map(c => s"$c")
    val nSym = syms.map(s =>
      length(col("text")) - length(replace(col("text"), lit(s), lit(""))))
      .reduce(_ + _).cast("long")
    docs.select(col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      nSym.as("n_sym"))
      .withColumn("codey_e4",
        when(col("n_chars") === 0L, 0L)
          .otherwise(expr("(n_sym * 10000L) div n_chars")))
      .withColumn("is_code",
        when(col("codey_e4") >= threshold, 1L).otherwise(0L))
  }
}
