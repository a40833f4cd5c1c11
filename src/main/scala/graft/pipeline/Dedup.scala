package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Document deduplication operators for large-scale training-data
 * pipelines, over the `documents(doc_id, text, lang, source, n_chars)`
 * table. No counterpart in the reference (a pure graph engine) — these
 * are the data-curation capabilities a 100 TB corpus pipeline needs.
 *
 * Scale design notes:
 *  - everything is hash-partitioned groupBy/join (no global sorts);
 *  - MinHash-LSH candidate generation is the linear-cost path (band
 *    bucket join) and the quadratic exact-Jaccard verify runs only on
 *    candidates, never all pairs;
 *  - hashes are md5 strings so the DuckDB oracle can reproduce them
 *    bit-for-bit (`md5` agrees across engines; the "min" of a MinHash
 *    is plain string min).
 */
object Dedup {

  def docs(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** Exact dedup: one group per distinct text (md5-keyed), keeper =
   * min doc_id. Hash-groupBy — the cheapest dedup at any scale. */
  def exact(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper_id"))

  /** (doc_id, pos, tok) — documents are single-space tokenized. */
  def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))

  /** Distinct word n-gram shingles per doc (default 3-grams). */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val withNext = (1 until n).foldLeft(tokens(docs)) { (df, i) =>
      df.withColumn(s"t$i", lead(col("tok"), i).over(w))
    }
    val parts = col("tok") +: (1 until n).map(i => col(s"t$i"))
    withNext
      .where(col(s"t${n - 1}").isNotNull)
      .select(col("doc_id"), concat_ws(" ", parts: _*).as("shingle"))
      .distinct()
  }

  /** MinHash signature: `numHashes` independent hash functions
   * realized as md5 over a seed-prefixed shingle; the signature
   * component is the string-min. */
  def minhashSignature(sh: DataFrame, numHashes: Int): DataFrame = {
    val aggs = (0 until numHashes).map(i =>
      min(md5(concat(lit(s"$i:"), col("shingle")))).as(s"mh$i"))
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Default per-band-bucket size cap for the LSH candidate join —
   * far above any bucket this corpus shape produces (so sf-scale
   * results are exactly the uncapped results), but a hard bound at
   * 100 TB where one viral boilerplate text would otherwise put k
   * docs in one bucket and emit k² candidate rows. */
  val defaultMaxBandBucket = 1000L

  /** (doc_id, q=band index, bh=band hash) — one row per (doc, band),
   * the bucket key space of the LSH candidate join. */
  private def bandKeys(sh: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    val sig = minhashSignature(sh, numHashes)
    val bandCols: Seq[Column] = (0 until bands).map { b =>
      val cols = (b * rows until (b + 1) * rows).map(i => col(s"mh$i"))
      md5(concat_ws("|", cols: _*)).as(s"band$b")
    }
    // one projection computes every band, then an unpivot — the
    // signature agg runs once per scan, not once per band
    sig.select(col("doc_id") +: bandCols: _*)
      .select(col("doc_id"), expr(
        s"stack($bands, ${(0 until bands).map(b => s"$b, band$b").mkString(", ")}) as (q, bh)"))
  }

  /** LSH band-bucket candidate pairs (doc_a < doc_b, deduped) — the
   * linear-cost generator shared by the Jaccard, containment, and
   * edit-distance verifiers.
   *
   * Buckets larger than `maxBucket` are DROPPED before the self-join
   * (the quadratic kernel is bounded at any corpus scale; recall is
   * lost only on degenerate boilerplate buckets — measure the dropped
   * mass with [[bandBucketOverflow]] before raising the cap). Same
   * guard as `Similarity.bucketed(maxBucket)`. */
  private[graft] def bandCandidates(sh: DataFrame, numHashes: Int, bands: Int,
      maxBucket: Long = defaultMaxBandBucket): DataFrame = {
    val keys = bandKeys(sh, numHashes, bands)
    val ok = keys.groupBy(col("q"), col("bh"))
      .agg(count(lit(1)).as("bsz"))
      .where(col("bsz") <= maxBucket)
      .select(col("q"), col("bh"))
    val kept = keys.join(ok, Seq("q", "bh"), "left_semi")
    kept.as("l").join(kept.as("r"), Seq("q", "bh"))
      .where(col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
  }

  /** Dropped-mass report for the [[bandCandidates]] cap: the band
   * buckets above `maxBucket` with their sizes — what the cap cost in
   * recall, the number a pipeline owner reads before raising it.
   * Empty ⇔ the capped candidate set is exactly the uncapped one.
   *
   * @return (q, bh, bsz) for every over-cap bucket
   */
  def bandBucketOverflow(docs: DataFrame, numHashes: Int = 12, bands: Int = 4,
      maxBucket: Long = defaultMaxBandBucket, shingleN: Int = 3): DataFrame =
    bandKeys(shingles(docs, shingleN), numHashes, bands)
      .groupBy(col("q"), col("bh"))
      .agg(count(lit(1)).as("bsz"))
      .where(col("bsz") > maxBucket)

  /**
   * Edit-distance-verified near-duplicate pairs: LSH band candidates
   * (linear), then character-level Levenshtein ≤ maxDist on the
   * candidate texts only — the "small textual patch" dup signal that
   * set-based Jaccard waters down (a single long insertion moves
   * Jaccard a lot but edit distance only by the insertion length).
   *
   * Scale notes: the verify uses Spark's THRESHOLDED levenshtein
   * (early-exits the DP past maxDist — O(maxDist·len) not len²); the
   * full texts move only for candidate pairs, never corpus-wide.
   * Exactness caveat: DuckDB's levenshtein counts BYTES, Spark's
   * counts CHARACTERS — identical on this ASCII corpus (verified),
   * divergent on multi-byte text.
   *
   * @return (doc_a, doc_b, edit_dist) with doc_a < doc_b
   */
  def editDistancePairs(docs: DataFrame, maxDist: Int = 20, numHashes: Int = 12,
      bands: Int = 4, shingleN: Int = 3): DataFrame = {
    val sh = shingles(docs, shingleN).persist()
    val cand = bandCandidates(sh, numHashes, bands)
    val ta = docs.select(col("doc_id").as("doc_a"), col("text").as("text_a"))
    val tb = docs.select(col("doc_id").as("doc_b"), col("text").as("text_b"))
    val out = cand.join(ta, "doc_a").join(tb, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("text_a"), col("text_b"), maxDist).cast("long").as("edit_dist"))
      .where(col("edit_dist") >= 0) // thresholded DP returns −1 past maxDist
    sh.unpersist()
    out
  }

  /**
   * MinHash + LSH near-duplicate pairs:
   * shingle → minhash → band buckets → bucket join (candidates) →
   * exact-Jaccard verify ≥ threshold.
   *
   * @return (doc_a, doc_b, jaccard_e4) with doc_a < doc_b
   */
  def minhashPairs(
      docs: DataFrame,
      numHashes: Int = 12,
      bands: Int = 4,
      threshold: Double = 0.5,
      shingleN: Int = 3): DataFrame = {
    val sh = shingles(docs, shingleN).persist()
    val candidates = bandCandidates(sh, numHashes, bands)
    // exact Jaccard verify on candidates only
    val shA = sh.select(col("doc_id").as("doc_a"), col("shingle"))
    val shB = sh.select(col("doc_id").as("doc_b"), col("shingle"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = candidates
      .join(shA, "doc_a").join(shB, Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    val out = inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sza")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("szb")), "doc_b")
      .withColumn("jaccard", col("inter") / (col("sza") + col("szb") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(
        col("doc_a"), col("doc_b"),
        round(col("jaccard") * 10000).cast("long").as("jaccard_e4"))
    sh.unpersist()
    out
  }

  /** Number of signature bits — 15 md5 hex chars (60 bits) so the
   * token hash fits a signed Long via `conv(hex, 16, 10)`, which
   * DuckDB reproduces bit-for-bit (`('0x' || hex)::BIGINT`). */
  val simhashBits = 60

  /**
   * SimHash per document: each distinct token hashes to a 60-bit value
   * (md5-derived — engine-portable, see [[simhashBits]]), each bit
   * votes ±count, the sign vector packs back into a Long. Near-dup
   * check = Hamming distance on the signature (see [[simhashPairs]]).
   */
  def simhash(docs: DataFrame): DataFrame = {
    val t = tokens(docs)
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("w"))
      .select(col("doc_id"), col("w"),
        conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long").as("h"))
    val bits = t.select(
      col("doc_id"), col("w"),
      explode(sequence(lit(0), lit(simhashBits - 1))).as("bit"),
      col("h"))
      .withColumn("vote",
        when(expr("shiftright(h, cast(bit as int))").bitwiseAND(1) === 1, col("w"))
          .otherwise(-col("w")))
    bits.groupBy(col("doc_id"), col("bit")).agg(sum(col("vote")).as("v"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("v") > 0, expr("shiftleft(1L, cast(bit as int))")).otherwise(0L))
        .as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist.
   *
   * Candidate generation blocks on `maxDist + 1` disjoint bit ranges
   * of the signature: by pigeonhole, two signatures within Hamming
   * distance maxDist must agree EXACTLY on at least one block — so the
   * per-block bucket join is a complete (recall-1) candidate
   * generator at any maxDist, never all-pairs. (Round-1 shipped fixed
   * quarters, complete only for maxDist ≤ 3 — the advisor's finding.) */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist < simhashBits, s"maxDist $maxDist out of range")
    val nBlocks = maxDist + 1
    val sig = simhash(docs).persist()
    val blocks = (0 until nBlocks).map { b =>
      val lo = b * simhashBits / nBlocks
      val hi = (b + 1) * simhashBits / nBlocks
      val mask = (1L << (hi - lo)) - 1L
      sig.select(
        col("doc_id"), col("simhash"),
        lit(b).as("q"),
        shiftright(col("simhash"), lo).bitwiseAND(mask).as("qk"))
    }.reduce(_ unionByName _)
    val cand = blocks.as("l")
      .join(blocks.as("r"), Seq("q", "qk"))
      .where(col("l.doc_id") < col("r.doc_id"))
      .select(
        col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        col("l.simhash").as("sa"), col("r.simhash").as("sb"))
      .distinct()
    val out = cand
      .withColumn("dist", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .where(col("dist") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("dist"))
    out
  }

  /**
   * Near-duplicate CLUSTERS: connected components over the
   * MinHash-LSH pair graph, keeper = min doc_id per cluster.
   *
   * This is where the two halves of the engine meet: the pipeline's
   * LSH candidate generator produces the pair edges, and the graph
   * engine's HashMin superstep machinery (algos.ConnectedComponents,
   * the reference's cc.cpp:22-109 loop) computes the transitive
   * closure — pairwise dedup alone under-removes, because near-dup is
   * not transitive ((A,B) and (B,C) pairs must collapse to ONE keeper,
   * not two).
   *
   * Scale: the pair graph is tiny relative to the corpus (only docs
   * with a near-dup appear), so the CC runs on the reduced graph; the
   * final left join broadcasts cluster assignments back over the
   * corpus. Output covers every document (singletons cluster to
   * themselves) so the keeper set IS the dedup-retained corpus.
   *
   * @return (doc_id, cluster_id, is_keeper) for every document
   */
  def clusters(
      docs: DataFrame,
      numHashes: Int = 12,
      bands: Int = 4,
      threshold: Double = 0.5,
      shingleN: Int = 3,
      numPartitions: Int = 8): DataFrame = {
    val pairs = minhashPairs(docs, numHashes, bands, threshold, shingleN)
    // doc_ids are already Longs — feed them to the graph engine as-is
    // (fromIdEdges, no vertex dictionary). With the identity id space,
    // HashMin's fixpoint label IS the cluster id (min doc_id reachable)
    // and singletons label themselves — no rep join, no singleton fill.
    val edges = pairs.select(
      col("doc_a").as("src"), col("doc_b").as("dst"), lit(1.0).as("weight"))
    val nV = docs.agg(max(col("doc_id"))).first().getLong(0) + 1
    val g = graft.LinkGraph.fromIdEdges(edges, nV, symmetric = true, numPartitions)
    val labeled = graft.algos.ConnectedComponents.run(g).labels
      .select(
        col("id").as("doc_id"), col("lbl").as("cluster_id"),
        (col("id") === col("lbl")).cast("long").as("is_keeper"))
    // guard against non-dense doc_id spaces (range-synthesized vertices
    // without a document row are dropped)
    labeled.join(docs.select(col("doc_id")), "doc_id")
  }

  /**
   * Leakage-safe train/heldout split: hash the near-dup CLUSTER id,
   * not the document id — every transitive near-duplicate of a
   * heldout document is heldout too, so no evaluation example has a
   * paraphrase in training (the split-leakage failure mode doc-level
   * hashing cannot prevent). Deterministic md5-threshold assignment
   * like [[Mix.stratifiedSample]].
   *
   * @param heldoutPermille heldout fraction ×1000 (default 10%)
   * @return (doc_id, cluster_id, split)
   */
  def leakageSafeSplit(
      docs: DataFrame,
      heldoutPermille: Long = 100,
      numHashes: Int = 12,
      bands: Int = 4,
      threshold: Double = 0.5,
      shingleN: Int = 3): DataFrame = {
    val thresh = 4294967296L * heldoutPermille / 1000L
    clusters(docs, numHashes, bands, threshold, shingleN)
      .select(col("doc_id"), col("cluster_id"),
        when(
          conv(substring(md5(concat(lit("sp|"), col("cluster_id").cast("string"))), 1, 8), 16, 10)
            .cast("long") < thresh,
          lit("heldout")).otherwise(lit("train")).as("split"))
  }

  /**
   * Per-SOURCE duplication rollup over the near-dup clusters — the
   * corpus-health dashboard number ("source X is 40% near-duplicate")
   * that decides which crawls get re-ingested and which get capped.
   * A document counts as a duplicate when it is not its cluster's
   * keeper (global min doc_id), so the rate measures what GLOBAL
   * dedup removes from each source, cross-source duplicates included.
   *
   * Scale shape: rides [[clusters]] (LSH-banded, never all-pairs) +
   * one broadcast-sized per-source aggregate.
   *
   * @return (source, n_docs, n_keepers, n_clusters, dup_rate_e4)
   *         with dup_rate_e4 = ⌊10⁴·(n_docs − n_keepers)/n_docs⌋
   */
  def dupRateBySource(
      docs: DataFrame,
      numHashes: Int = 12,
      bands: Int = 4,
      threshold: Double = 0.5,
      shingleN: Int = 3): DataFrame =
    clusters(docs, numHashes, bands, threshold, shingleN)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("is_keeper")).as("n_keepers"),
        countDistinct(col("cluster_id")).as("n_clusters"))
      .withColumn("dup_rate_e4",
        expr("(n_docs - n_keepers) * 10000L div n_docs"))

  /**
   * Blocked exact-substring dedup stats (the scalable approximation
   * of suffix-array substring dedup, Lee et al. 2022): each document
   * splits into NON-overlapping `span`-token blocks; a block occurring
   * in ≥ 2 distinct documents is a duplicated span. Per document:
   * total spans, duplicated spans, and the integer-exact duplicated
   * ratio — the "fraction of my text that exists verbatim elsewhere
   * in the corpus" gate.
   *
   * Scale: one explode (rows = tokens/span, a span-th of the token
   * table), one hash groupBy for the global span counts (distinct-doc
   * count is the two-phase partial-agg form), one join back, one
   * per-doc agg — no all-pairs anything; the cross-doc signal rides
   * entirely on the span-hash shuffle key. Non-overlapping blocks
   * trade boundary-shifted recall (a duplicate offset by <span tokens
   * is missed) for a span-factor cost reduction vs sliding shingles —
   * the standard production tradeoff.
   */
  def dupSpans(docs: DataFrame, span: Int = 5): DataFrame = {
    // split() of a nonempty text has ≥ 1 element, so nBlocks ≥ 1 and
    // the sequence() below is never descending
    val blocks = docs
      .select(col("doc_id"), split(col("text"), " ").as("a"))
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, cast((size(a) + ${span - 1}) div $span as int) - 1)," +
          s" i -> array_join(slice(a, i * $span + 1, $span), ' '))")).as("blk"))
    val counts = blocks.groupBy(col("blk"))
      .agg(countDistinct(col("doc_id")).as("nd"))
    blocks.join(counts, "blk")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("dup_spans"))
      .select(col("doc_id"), col("n_spans"), col("dup_spans"),
        expr("10000 * dup_spans div n_spans").as("dup_ratio_e4"))
  }

  /**
   * Asymmetric containment near-dup pairs: containment(A in B) =
   * |A∩B| / |A| over the shingle sets — the subset-duplicate signal
   * Jaccard misses (a document embedded verbatim inside a much larger
   * one has tiny Jaccard but containment ≈ 1). Candidates come from
   * the SAME MinHash band-bucket join as [[minhashPairs]] (linear
   * cost, never all-pairs); the exact intersection runs on candidates
   * only. Thresholds and exports are integer-exact (10⁴·i // sz) so
   * the DuckDB replay is hash-identical.
   *
   * @return (doc_a, doc_b, cont_a_e4, cont_b_e4) with doc_a < doc_b,
   *         kept when EITHER direction's containment ≥ minContE4/10⁴
   */
  def containmentPairs(
      docs: DataFrame,
      numHashes: Int = 12,
      bands: Int = 4,
      minContE4: Long = 5000,
      shingleN: Int = 3): DataFrame = {
    val sh = shingles(docs, shingleN).persist()
    val candidates = bandCandidates(sh, numHashes, bands)
    val shA = sh.select(col("doc_id").as("doc_a"), col("shingle"))
    val shB = sh.select(col("doc_id").as("doc_b"), col("shingle"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val out = candidates
      .join(shA, "doc_a").join(shB, Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sza")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("szb")), "doc_b")
      // integer-exact threshold: 10⁴·i ≥ minContE4·sz ⇔ i/sz ≥ thr
      .where(lit(10000L) * col("inter") >= lit(minContE4) * col("sza") ||
        lit(10000L) * col("inter") >= lit(minContE4) * col("szb"))
      .select(col("doc_a"), col("doc_b"),
        expr("10000 * inter div sza").as("cont_a_e4"),
        expr("10000 * inter div szb").as("cont_b_e4"))
    sh.unpersist()
    out
  }

  /** Exact pairwise word-n-gram Jaccard within a blocking key (same
   * `source`) — the quadratic BASELINE, bounded by block size, for
   * validating the approximate paths at small scale. NOT the 100 TB
   * path: a single huge source block is quadratic — at corpus scale
   * use [[allPairsJoin]] (lossless, prefix-filtered, no blocking key)
   * or [[minhashPairs]] (approximate, capped). `maxBlock` drops
   * source blocks above the cap so a degenerate block cannot melt the
   * join (default keeps the baseline exact). */
  def ngramJaccard(docs: DataFrame, n: Int = 3, minJaccard: Double = 0.0,
      maxBlock: Long = Long.MaxValue): DataFrame = {
    val sh = shingles(docs, n)
    val okSrc = docs.groupBy(col("source")).agg(count(lit(1)).as("bsz"))
      .where(col("bsz") <= maxBlock).select(col("source"))
    val blocked = docs.select(col("doc_id"), col("source"))
      .join(broadcast(okSrc), Seq("source"), "left_semi")
    val a = sh.join(blocked, "doc_id")
      .select(col("doc_id").as("doc_a"), col("source"), col("shingle"))
    val b = sh.join(blocked, "doc_id")
      .select(col("doc_id").as("doc_b"), col("source"), col("shingle"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = a.join(b, Seq("source", "shingle"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sza")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("szb")), "doc_b")
      .withColumn("jaccard", col("inter") / (col("sza") + col("szb") - col("inter")))
      .where(col("jaccard") > minJaccard)
      .select(
        col("doc_a"), col("doc_b"),
        round(col("jaccard") * 10000).cast("long").as("jaccard_e4"))
  }

  /** Prefix-filter exact set-similarity self-join (AllPairs, Bayardo
   * et al. WWW'07; distributed kernel per Vernica et al. SIGMOD'10):
   * all pairs with shingle-set Jaccard ≥ t, EXACTLY, without the
   * all-pairs product and without blocking keys.
   *
   * Order tokens globally by ascending document frequency (rarest
   * first). A doc with sz tokens indexes only its first
   * p = sz − ⌈t·sz⌉ + 1 tokens; any pair with J ≥ t must share a
   * prefix token under the common order, so the prefix×prefix join is
   * a complete candidate generator. A length filter (t·max ≤ min)
   * prunes further; the exact-intersection verify runs on candidates
   * only. Lossless: result ≡ brute-force Jaccard ≥ t — which is
   * exactly what the DuckDB oracle computes.
   *
   * 100 TB shape: two hash aggs (sizes, dfreq), one window over
   * doc_id (per-doc rank, bounded by doc length), one equi-join on
   * prefix tokens. Cost scales with Σ prefix postings², per token —
   * rarest-first ordering makes hot tokens land last in prefixes, so
   * the giant stopword postings never join. No quadratic block.
   *
   * @param tE4 Jaccard threshold ×10⁴ (integer-exact gate)
   * @return (doc_a, doc_b, jaccard_e4) with doc_a < doc_b
   */
  def allPairsJoin(docs: DataFrame, tE4: Long = 5000, n: Int = 3): DataFrame = {
    val sh = shingles(docs, n).persist()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val dfreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("dfreq"))
    // per-doc token rank under the global (dfreq, shingle) order;
    // prefix length p = sz − ⌈t·sz⌉ + 1 (integer ceil in e4 space)
    val ranked = sh.join(dfreq, "shingle")
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("dfreq"), col("shingle"))))
      .join(sizes, "doc_id")
      .withColumn("plen",
        col("sz") - expr(s"($tE4 * sz + 9999) div 10000") + lit(1L))
    val prefix = ranked.where(col("rnk") <= col("plen"))
      .select(col("doc_id"), col("shingle"), col("sz"))
    val a = prefix.select(col("doc_id").as("doc_a"), col("shingle"), col("sz").as("sza"))
    val b = prefix.select(col("doc_id").as("doc_b"), col("shingle"), col("sz").as("szb"))
    val cand = a.join(b, "shingle")
      .where(col("doc_a") < col("doc_b") &&
        lit(tE4) * col("sza") <= lit(10000L) * col("szb") &&
        lit(tE4) * col("szb") <= lit(10000L) * col("sza"))
      .select(col("doc_a"), col("doc_b")).distinct()
    // exact verify on candidates only; integer-exact threshold:
    // i/(sza+szb−i) ≥ t ⇔ i·(10⁴+tE4) ≥ tE4·(sza+szb)
    val shA = sh.select(col("doc_id").as("doc_a"), col("shingle"))
    val shB = sh.select(col("doc_id").as("doc_b"), col("shingle"))
    val out = cand
      .join(shA, "doc_a").join(shB, Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sza")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("szb")), "doc_b")
      .where(col("inter") * lit(10000L + tE4) >= lit(tE4) * (col("sza") + col("szb")))
      // integer-exact round-half-up of 10⁴·i/u (u = union size > 0):
      // engine-independent, no float order sensitivity vs the oracle
      .select(col("doc_a"), col("doc_b"),
        expr("(20000 * inter + (sza + szb - inter)) div (2 * (sza + szb - inter))")
          .as("jaccard_e4"))
    sh.unpersist()
    out
  }

  /**
   * Cross-source shingle-overlap matrix — the corpus contamination /
   * provenance report: for every source pair, how many distinct
   * word n-grams they share, plus the containment ratio against the
   * smaller side (10⁴-scaled integer). High containment between a
   * "web" and a "curated" source means the curated set leaked into
   * the crawl (or vice versa) and dedup/decontam must run ACROSS the
   * pair, not within each.
   *
   * Scale shape: one distinct over (source, shingle), then a
   * shingle-keyed self-join whose fan-out per shingle is bounded by
   * (#sources choose 2) — sources are a small dimension, so the join
   * is linear in distinct shingles. Totals broadcast back. At web
   * scale, shrink the shuffle payload by hashing the shingle string
   * to 64 bits first (collisions only perturb counts ~2⁻⁶⁴).
   *
   * @return (source_a, source_b, n_shared, n_a, n_b, containment_e4)
   */
  /**
   * LSH candidate-recall SELF-EVALUATION: measures the MinHash band
   * candidates against the LOSSLESS ground truth ([[allPairsJoin]],
   * exact for J ≥ t) — the recall/cost dial a dedup pipeline owner
   * reads before trusting LSH parameters at corpus scale. One row:
   * how many true near-dup pairs exist, how many candidate pairs the
   * bands generated, and how many true pairs the bands caught.
   *
   * @return (n_true, n_candidates, n_hits)
   */
  def lshRecall(docs: DataFrame, tE4: Long = 5000, numHashes: Int = 12,
      bands: Int = 4): DataFrame = {
    val sh = shingles(docs).persist()
    val cand = bandCandidates(sh, numHashes, bands).persist()
    val truth = allPairsJoin(docs, tE4).select(col("doc_a"), col("doc_b")).persist()
    val hit = truth.join(cand, Seq("doc_a", "doc_b"), "left_semi")
    truth.agg(count(lit(1)).as("n_true"))
      .crossJoin(cand.agg(count(lit(1)).as("n_candidates")))
      .crossJoin(hit.agg(count(lit(1)).as("n_hits")))
  }

  /**
   * Segment-level dedup REWRITE (the CCNet/Gopher line-dedup shape,
   * over fixed `segLen`-token segments since transcripts carry no
   * newlines): a segment survives only at its FIRST corpus-wide
   * occurrence — keeper = minimal (doc_id, seg_idx) over the
   * segment's md5, deterministic — and the survivors reassemble in
   * order into the rewritten document. Unlike [[dupSpans]] (which
   * only censuses duplicated spans) this op rewrites the corpus, the
   * actual curation step.
   *
   * Scale shape: segmentation is array-native per row (zero shuffle);
   * first-occurrence election is ONE window over the segment hash
   * (hash-partitioned, no global sort); reassembly is ONE groupBy
   * doc_id whose state is bounded by the document's own segments.
   *
   * @return (doc_id, n_segs, kept_segs, new_md5) — new_md5 hashes the
   *         space-joined surviving segments ('' when none survive)
   */
  def segmentDedup(docs: DataFrame, segLen: Int = 8): DataFrame = {
    val segs = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, (size(toks)-1) div $segLen)," +
          s" i -> array_join(slice(toks, i*$segLen+1, $segLen), ' '))"))
        .as(Seq("seg_idx", "seg")))
    val w = Window.partitionBy(md5(col("seg")))
    val elected = segs
      .withColumn("first", min(struct(col("doc_id"), col("seg_idx"))).over(w))
      .withColumn("kept", col("first") === struct(col("doc_id"), col("seg_idx")))
    elected.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_segs"),
      sum(when(col("kept"), 1L).otherwise(0L)).as("kept_segs"),
      md5(array_join(
        transform(
          array_sort(collect_list(when(col("kept"), struct(col("seg_idx"), col("seg"))))),
          x => x.getField("seg")),
        " ")).as("new_md5"))
  }

  def sourceOverlap(docs: DataFrame, n: Int = 3): DataFrame = {
    val sg = shingles(docs, n)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .select(col("source"), col("shingle")).distinct()
      .persist()
    val totals = sg.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val shared = sg.as("a").join(sg.as("b"), "shingle")
      .where(col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    val out = shared
      .join(broadcast(totals.select(col("source").as("source_a"), col("n").as("n_a"))), "source_a")
      .join(broadcast(totals.select(col("source").as("source_b"), col("n").as("n_b"))), "source_b")
      .select(col("source_a"), col("source_b"), col("n_shared"),
        col("n_a"), col("n_b"),
        expr("(10000 * n_shared) div least(n_a, n_b)").as("containment_e4"))
    sg.unpersist(blocking = false)
    out
  }
}
