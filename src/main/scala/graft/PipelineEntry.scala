package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Bpe, Cooccur, Curate, Decontam, Dedup, Mix, Multimodal, Pca, Profile, Quantiles, Similarity, Sketch, TextStats, Vocab}

/** Driver-contract entries for the training-data pipeline operators
 * (dedup / similarity / text analysis / multimodal) over the
 * `documents` and `embeddings` tables. Split from SparkEntry only for
 * file size; SparkEntry merges both maps. */
object PipelineEntry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> ((s, dir) => Dedup.exact(Dedup.docs(s, dir))),
    // the streaming dedup gate in batch mode: one slice per text hash
    // ⇒ keeper = min doc_id = exact-dedup keepers (StreamingSpec
    // proves the cross-batch stream semantics)
    "q_stream_dedup" -> ((s, dir) =>
      streaming.DocStream.dedup(Dedup.docs(s, dir)).toDF()
        .select(col("doc_id"), col("text_md5"))),
    // BPE tokenizer merge training: 6 rounds of top-pair adoption
    // over the distinct-word frequency table (the oracle replays the
    // full adaptive trajectory with chained CTE rounds)
    "q_bpe" -> ((s, dir) => Bpe.train(Dedup.docs(s, dir), rounds = 6)),
    // corpus token census under the learned BPE vocabulary (encode
    // readout: which subwords exist and their true corpus counts)
    "q_bpe_census" -> ((s, dir) => Bpe.tokenCensus(Dedup.docs(s, dir), rounds = 6)),
    // per-document BPE token counts (the packing/budgeting input;
    // encode via the distinct-word length map, never re-tokenizing)
    "q_bpe_doclen" -> ((s, dir) => Bpe.docTokenCounts(Dedup.docs(s, dir), rounds = 6)),
    // segment-level dedup rewrite: first corpus-wide occurrence of
    // each 8-token segment survives; documents reassemble from the
    // survivors (the CCNet line-dedup shape)
    "q_segdedup" -> ((s, dir) => Dedup.segmentDedup(Dedup.docs(s, dir))),
    "q_minhash" -> ((s, dir) => Dedup.minhashPairs(Dedup.docs(s, dir))),
    // Levenshtein ≤ 20 on the LSH candidates (thresholded DP verify)
    "q_editdist" -> ((s, dir) => Dedup.editDistancePairs(Dedup.docs(s, dir))),
    "q_simhash" -> ((s, dir) =>
      Dedup.simhash(Dedup.docs(s, dir)).select(col("doc_id"), col("simhash"))),
    "q_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(Dedup.docs(s, dir), maxDist = 8)
        .select(col("doc_a"), col("doc_b"), col("dist").cast("long").as("dist"))),
    "q_ngram_jaccard" -> ((s, dir) => Dedup.ngramJaccard(Dedup.docs(s, dir))),
    // prefix-filter AllPairs join is LOSSLESS for J ≥ t: the oracle is
    // plain brute-force Jaccard, so a green row proves completeness
    "q_allpairs" -> ((s, dir) => Dedup.allPairsJoin(Dedup.docs(s, dir), tE4 = 5000)),
    // LSH recall self-evaluation: band candidates scored against the
    // lossless AllPairs ground truth (the dedup-parameter dial)
    "q_lsh_recall" -> ((s, dir) => Dedup.lshRecall(Dedup.docs(s, dir))),
    "q_ann_cosine" -> ((s, dir) => Similarity.cosineTopK(Similarity.embeddings(s, dir))),
    // contrastive hard negatives: nearest neighbors with a DIFFERENT
    // label (the confusable pairs an embedding trainer mines)
    "q_hardneg" -> ((s, dir) => Similarity.hardNegatives(Similarity.embeddings(s, dir))),
    // per-label centroid outliers: the mislabel/noise screen
    // (integer-exact quantized distance, floor per dimension)
    "q_outlier_emb" -> ((s, dir) => Similarity.centroidOutliers(Similarity.embeddings(s, dir))),
    // kNN label-agreement census: label-quality screen over the
    // exact cosine top-5 neighborhoods
    "q_label_agree" -> ((s, dir) => Similarity.labelAgreement(Similarity.embeddings(s, dir))),
    "q_ann_lsh" -> ((s, dir) => Similarity.lshTopK(Similarity.embeddings(s, dir))),
    "q_ann_ivf" -> ((s, dir) => Similarity.ivfTopK(Similarity.embeddings(s, dir))),
    // OR-amplified LSH: 2 independent 6-plane tables (recall per pair
    // 1-(1-p^6)^2 vs p^6 of the single table, cost still linear)
    "q_ann_lsh_multi" -> ((s, dir) =>
      Similarity.lshTopKMulti(Similarity.embeddings(s, dir), numTables = 2)),
    // threshold 0.30: the synthetic embeddings hold no true near-dups
    // (max pairwise cosine ≈ 0.49), so the driver check runs at a
    // similarity level the data actually contains (253 pairs at
    // sf0.01); production dedup would use ~0.9 on real embeddings
    // embedding-level decontamination: max cosine of each train
    // vector vs the (broadcast) eval set — catches paraphrased eval
    // leakage the n-gram q_decontam cannot see
    "q_decontam_emb" -> ((s, dir) =>
      Similarity.evalContamination(Similarity.embeddings(s, dir))),
    "q_embed_dedup" -> ((s, dir) =>
      Similarity.cosineDupPairs(Similarity.embeddings(s, dir), simThresholdE4 = 3000)),
    // language-ID with confidence margin (best − runner-up hits; the
    // gate before trusting the label)
    "q_langid_margin" -> ((s, dir) => TextStats.langIdMargin(Dedup.docs(s, dir))),
    // pairwise total-variation distance between source unigram
    // distributions (integer-exact mixture-drift dashboard)
    "q_source_tv" -> ((s, dir) => TextStats.sourceDivergence(Dedup.docs(s, dir))),
    "q_langid" -> ((s, dir) =>
      TextStats.langId(Dedup.docs(s, dir))
        .select(col("doc_id"), col("pred_lang"), col("stop_hits").cast("long").as("stop_hits"))),
    "q_quality" -> ((s, dir) =>
      TextStats.quality(Dedup.docs(s, dir)).select(
        col("doc_id"),
        col("n_chars_computed").cast("long").as("n_chars_computed"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("mean_tok_len_e4"), col("punct_ratio_e4"),
        col("stop_ratio_e4"), col("distinct_ratio_e4"))),
    "q_tokens" -> ((s, dir) =>
      TextStats.tokenCounts(Dedup.docs(s, dir)).select(
        col("doc_id"),
        col("ws_tokens").cast("long").as("ws_tokens"),
        col("word_tokens").cast("long").as("word_tokens"),
        col("distinct_tokens").cast("long").as("distinct_tokens"))),
    "q_fingerprint" -> ((s, dir) => TextStats.fingerprint(Dedup.docs(s, dir))),
    // positional winnowing (MOSS): guaranteed-window fingerprints —
    // any shared ≥6-token span between docs shares a selected hash
    "q_winnow" -> ((s, dir) => TextStats.winnow(Dedup.docs(s, dir))),
    // Gopher-style repetition gates: per-doc duplicate/top n-gram
    // counts, computed entirely inside the row (no shuffle)
    "q_repetition" -> ((s, dir) => TextStats.repetition(Dedup.docs(s, dir))),
    "q_vocab" -> ((s, dir) => Vocab.topVocab(Dedup.docs(s, dir))),
    // Zipf frequency-of-frequencies: word types bucketed by the bit
    // length of their corpus frequency — the rank-frequency
    // diagnostic behind vocab sizing (Heaps-curve's frequency
    // marginal at rest)
    "q_zipf" -> ((s, dir) => Vocab.zipfHistogram(Dedup.docs(s, dir))),
    // k-anonymity census over (source, lang, length bucket) — the
    // privacy screen before releasing a corpus slice
    "q_kanon" -> ((s, dir) => Profile.kAnonymity(Dedup.docs(s, dir))),
    // code-vs-prose router: code-surface character density per doc
    "q_codefrac" -> ((s, dir) => TextStats.codeLikeness(Dedup.docs(s, dir))),
    // RAKE keyword extraction: stopword-bounded phrases, deg/freq
    // scores, top-3 keywords per document
    "q_rake" -> ((s, dir) => TextStats.rakeKeywords(Dedup.docs(s, dir))),
    // exact corpus length percentiles via the value-histogram trick
    // (one scan, no global sort — see pipeline.Quantiles)
    "q_quantiles" -> ((s, dir) => Quantiles.tokenCountQuantiles(Dedup.docs(s, dir))),
    // grouped variant: the cumulative window partitions by source, so
    // even the histogram scan stage is a plain grouped shuffle
    "q_quantiles_src" -> ((s, dir) =>
      Quantiles.tokenCountQuantilesBy(Dedup.docs(s, dir), "source")),
    "q_tfidf" -> ((s, dir) => Vocab.distinctiveTerms(Dedup.docs(s, dir))),
    // sparse tf-idf cosine all-pairs: the lexical similarity join over
    // the inverted index (content-word vectors, integer cos² export)
    "q_sparse_cos" -> ((s, dir) => Vocab.sparseCosinePairs(Dedup.docs(s, dir))),
    // mergeable sketches: integer-exact register/counter tables
    "q_hll" -> ((s, dir) => Sketch.hll(Dedup.docs(s, dir))),
    // the streaming HLL register maintainer in batch mode: one slice,
    // empty prior state => emitted changelog rows ARE the batch
    // register table (StreamingSpec proves the cross-batch monotone
    // merge); shares q_hll's oracle
    "q_stream_hll" -> ((s, dir) =>
      streaming.SketchStream.hllRegisters(Dedup.docs(s, dir)).toDF()
        .select(col("source"), col("bucket"), col("max_rho"))),
    "q_cms" -> ((s, dir) => Sketch.countMin(Dedup.docs(s, dir))),
    // Bloom membership registers (third mergeable sketch; 60-bit words)
    "q_bloom" -> ((s, dir) => Sketch.bloom(Dedup.docs(s, dir))),
    // SemDeDup: IVF k-means clusters + within-cluster cosine keeper
    "q_semdedup" -> ((s, dir) => Similarity.semDedup(Similarity.embeddings(s, dir))),
    // the k-means assignment itself (integer-exact Lloyd)
    "q_kmeans" -> ((s, dir) => Similarity.kmeansAssign(Similarity.embeddings(s, dir))),
    // product-quantization codes: 4 subspaces × 8 codewords — the
    // billion-scale ANN memory story (12 bits/vector for ADC), exact
    // integer Lloyd per subspace so the oracle replays training
    "q_pq" -> ((s, dir) => Similarity.pqCodes(Similarity.embeddings(s, dir))),
    // BM25 retrieval over a deterministic data-derived query (top
    // content words) — exact rational arithmetic, no float idf
    "q_bm25" -> ((s, dir) => Vocab.bm25TopDocs(Dedup.docs(s, dir))),
    // RRF hybrid retrieval: BM25 pool ⊕ seeded-cosine pool, k=60
    "q_hybrid" -> ((s, dir) =>
      Similarity.hybridTopDocs(Dedup.docs(s, dir), Similarity.embeddings(s, dir))),
    // the index build itself: term-partitioned positional postings
    "q_invindex" -> ((s, dir) => Vocab.invertedIndex(Dedup.docs(s, dir))),
    // exact-k weighted sampling without replacement (priority order
    // statistics over a deterministic hash; weight = n_chars)
    "q_wsample" -> ((s, dir) => Mix.weightedSample(Dedup.docs(s, dir))),
    // ROLLUP aggregation over (source, predicted language) — the
    // grouping-sets member of the relational surface (SURVEY §2.6)
    "q_rollup" -> ((s, dir) => TextStats.langRollup(Dedup.docs(s, dir))),
    // the end-to-end curation pass: dedup keeper ∩ quality gates ∩ lang
    "q_curate" -> ((s, dir) => Curate.curate(Dedup.docs(s, dir))),
    // near-dup clusters = transitive closure of the MinHash pair graph
    // via the graph engine's HashMin CC (the pipeline×graph synergy op)
    "q_dedup_clusters" -> ((s, dir) => Dedup.clusters(Dedup.docs(s, dir))),
    // leakage-safe split: the hash is over the CLUSTER id, so near-dup
    // paraphrases can never straddle train/heldout
    "q_split" -> ((s, dir) => Dedup.leakageSafeSplit(Dedup.docs(s, dir))),
    // per-source duplication rollup over the near-dup clusters — the
    // "which crawl is 40% duplicate" dashboard census
    "q_dup_rate" -> ((s, dir) => Dedup.dupRateBySource(Dedup.docs(s, dir))),
    // integer Flesch-style readability bands (regexp run counts only)
    "q_readability" -> ((s, dir) => TextStats.readability(Dedup.docs(s, dir))),
    // deequ-style per-column profile of the documents drop (exact
    // null/distinct counts — the ingestion health check)
    "q_profile" -> ((s, dir) =>
      Profile.columnProfile(s.read.parquet(s"$dir/documents.parquet"))),
    // encoding-quality screen: non-printable + U+FFFD counts per doc
    "q_mojibake" -> ((s, dir) => Profile.mojibake(Dedup.docs(s, dir))),
    // embedding-norm census: exact quantized ‖v‖² + dim counts (the
    // vector-quality screen before ANN/dedup trusts a drop)
    "q_emb_norms" -> ((s, dir) =>
      Similarity.normCensus(Similarity.embeddings(s, dir))),
    // SQ-8 scalar-quantization codes (per-dim min/max grid on the
    // integer-quantized coordinates; per-vector checksum profile)
    "q_sq8" -> ((s, dir) =>
      Similarity.sq8Codes(Similarity.embeddings(s, dir))),
    // PQ asymmetric-distance search: per-query m-by-k integer LUT
    // broadcast against the code table; exact Lloyd codebooks
    "q_pq_adc" -> ((s, dir) =>
      Similarity.pqAdcTopK(Similarity.embeddings(s, dir))),
    // first principal component of the embedding cloud: distributed
    // exact-integer covariance + driver-side BigInt power iteration
    // (tiny d×d model state), one broadcast projection pass
    "q_pca" -> ((s, dir) => Pca.pc1(Similarity.embeddings(s, dir))),
    // mergeable-sketch set algebra: per-pair union registers reduced
    // to exact-integer sufficient statistics
    "q_hll_pairs" -> ((s, dir) => Sketch.hllPairStats(Dedup.docs(s, dir))),
    // windowed word co-occurrence lift (integer PMI core), top-100
    "q_word_pmi" -> ((s, dir) => Cooccur.wordPmi(Dedup.docs(s, dir))),
    // exact k-sigma length outliers per source (no float mean/sqrt)
    "q_outliers" -> ((s, dir) => TextStats.lengthOutliers(Dedup.docs(s, dir))),
    // REAL binary codec path: synthesize canonical RIFF/WAV blobs,
    // decode the 44-byte PCM header back from the bytes
    "q_wav" -> ((s, dir) =>
      Multimodal.decodeWav(Multimodal.wavTable(Dedup.docs(s, dir)))),
    // REAL raster codec path: synthesize genuine 24-bit BMPs (padded
    // bottom-up rows), decode dimensions + exact per-channel pixel
    // sums back from the bytes (stride and padding from the parsed
    // header) — replaces the hash-fake image story with a real codec
    "q_bmp" -> ((s, dir) =>
      Multimodal.decodeBmp(Multimodal.bmpTable(Dedup.docs(s, dir)))),
    // REAL video codec path: synthesize genuine uncompressed RIFF/AVI
    // containers (hdrl/strl headers + per-frame 00db chunks of padded
    // bottom-up BGR rasters), decode dimensions, frame count/timing,
    // per-chunk magics and exact per-frame channel sums back from the
    // bytes — completes the real-codec triple (audio, image, video)
    "q_avi" -> ((s, dir) =>
      Multimodal.decodeAvi(Multimodal.aviTable(Dedup.docs(s, dir)))),
    // eval-set n-gram decontamination (n=3 exercises the 30-70-token
    // synthetic docs; production would run 8-13)
    "q_decontam" -> ((s, dir) => Decontam.contamination(Dedup.docs(s, dir))),
    "q_sample" -> ((s, dir) => Mix.stratifiedSample(Dedup.docs(s, dir))),
    // temperature-2 source mixing: keep rate ∝ 1/√count_s, realized
    // share ∝ √count_s — integer-exact thresholds, hash-replayable
    "q_mix_temp" -> ((s, dir) => Mix.temperatureMix(Dedup.docs(s, dir))),
    "q_pack" -> ((s, dir) => Mix.pack(Dedup.docs(s, dir))),
    // blocked exact-substring dedup: duplicated 5-token spans across
    // documents (the scalable form of suffix-array substring dedup)
    "q_dupspans" -> ((s, dir) => Dedup.dupSpans(Dedup.docs(s, dir))),
    // corpus-rarity scoring (integer-exact stand-in for unigram-LM
    // perplexity filtering; rare vocabulary scores high)
    "q_rarity" -> ((s, dir) => TextStats.rarity(Dedup.docs(s, dir))),
    // conditional-trigram LM predictability (the Markov upgrade of
    // q_rarity: corpus-trained p(w3|w1w2), integer mean probability)
    "q_lm_score" -> ((s, dir) => TextStats.lmScore(Dedup.docs(s, dir))),
    // DBSCAN density clustering over embeddings: cosine eps-graph,
    // degree-gated cores, HashMin CC clusters, min-id border attach
    "q_dbscan" -> ((s, dir) => Similarity.dbscan(Similarity.embeddings(s, dir))),
    // LSH-bucketed SCALE mode of DBSCAN, oracle-checked: bucketed pair
    // generator, identical density/CC/border machinery downstream
    "q_dbscan_scale" -> ((s, dir) =>
      Similarity.dbscan(Similarity.embeddings(s, dir), planes = 6)),
    // cross-source shingle-overlap matrix (contamination/provenance
    // report; shingle-keyed join, fan-out bounded by #sources²)
    "q_source_overlap" -> ((s, dir) => Dedup.sourceOverlap(Dedup.docs(s, dir))),
    // mutual-kNN graph clusters (graph-based clustering: mutuality
    // prunes hub-attraction edges, components via HashMin)
    "q_knn_clusters" -> ((s, dir) =>
      Similarity.knnClusters(Similarity.embeddings(s, dir))),
    // the LSH-bucketed SCALE mode of the same operator, oracle-checked
    // (not just spec-pinned): candidates restricted to same-bucket
    // pairs of the quantized-integer hyperplane LSH (q_ann_lsh's
    // bucket formula), bucket cap mirrored in the oracle
    "q_knn_scale" -> ((s, dir) =>
      Similarity.knnClusters(Similarity.embeddings(s, dir), planes = 6)),
    // ZGL label spreading on the mutual-kNN graph: every 5th vector's
    // gold label clamped, 3 floored-average rounds, argmax export
    "q_labelspread" -> ((s, dir) =>
      Similarity.labelSpread(Similarity.embeddings(s, dir))),
    // asymmetric containment pairs over the MinHash-LSH candidates —
    // the subset-duplicate signal Jaccard misses
    "q_containment" -> ((s, dir) => Dedup.containmentPairs(Dedup.docs(s, dir))),
    "q_media" -> ((s, dir) => {
      val m = Multimodal.mediaTable(s, dir)
      Multimodal.decode(m)
        .join(Multimodal.features(m), "media_id")
        .select(
          col("media_id"), col("kind"), col("meta.nbytes").cast("long").as("nbytes"),
          col("width"), col("height"), col("duration_s"),
          size(col("features")).cast("long").as("feature_dim"))
    })
  )

  // ---- DuckDB oracle SQL ----------------------------------------

  /** doc tokenization + 3-gram shingles, identical to Dedup.shingles. */
  private val docPrefix: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
      |         generate_subscripts(string_split(text, ' '), 1) AS pos
      |  FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id, concat(tok, ' ', t1, ' ', t2) AS shingle FROM (
      |    SELECT doc_id, tok,
      |           lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1,
      |           lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
      |    FROM tok) x WHERE t2 IS NOT NULL
      |)""".stripMargin

  /** MinHash-LSH pair CTE chain ending in `mhp(doc_a, doc_b,
   * jaccard_e4)`; `mat = true` materializes every CTE (required when
   * a recursive consumer references them per recursion step). */
  private def minhashBody(mat: Boolean): String = {
    val m = if (mat) " MATERIALIZED" else ""
    val mhs = (0 until 12).map(i => s"min(md5(concat('$i:', shingle))) AS mh$i").mkString(",\n    ")
    // Band-bucket keys (q = band index, bh = concatenated signature
    // slice) with the SAME per-bucket size cap as the engine's
    // Dedup.bandCandidates — a bucket above the cap is dropped from
    // candidate generation in BOTH engines, so the exact-replay
    // contract holds at any scale factor, not just below the cap.
    val bandUnion = (0 until 4).map { b =>
      val cs = (b * 3 until (b + 1) * 3).map(i => s"mh$i").mkString(", ")
      s"SELECT doc_id, $b AS q, concat_ws('|', $cs) AS bh FROM sig"
    }.mkString("\n    UNION ALL\n    ")
    val cap = graft.pipeline.Dedup.defaultMaxBandBucket
    s""", sig AS$m (
       |  SELECT doc_id,
       |    $mhs
       |  FROM sh GROUP BY doc_id
       |), bkeys AS$m (
       |  $bandUnion
       |), bok AS$m (
       |  SELECT q, bh FROM bkeys GROUP BY 1, 2 HAVING count(*) <= $cap
       |), cand AS$m (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM bkeys l
       |  JOIN bok o ON o.q = l.q AND o.bh = l.bh
       |  JOIN bkeys r ON r.q = l.q AND r.bh = l.bh
       |  WHERE l.doc_id < r.doc_id
       |), szs AS$m (
       |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
       |), inter AS$m (
       |  SELECT c.doc_a, c.doc_b, count(*) AS i
       |  FROM cand c
       |  JOIN sh a ON a.doc_id = c.doc_a
       |  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
       |  GROUP BY 1, 2
       |), mhp AS$m (
       |  SELECT i.doc_a, i.doc_b,
       |         cast(round(i.i * 10000.0 / (sa.sz + sb.sz - i.i)) AS bigint) AS jaccard_e4
       |  FROM inter i
       |  JOIN szs sa ON sa.doc_id = i.doc_a
       |  JOIN szs sb ON sb.doc_id = i.doc_b
       |  WHERE i.i * 1.0 / (sa.sz + sb.sz - i.i) >= 0.5
       |)""".stripMargin
  }

  private val minhashSql: String =
    docPrefix + minhashBody(mat = false) +
      "\nSELECT doc_a, doc_b, jaccard_e4 FROM mhp"

  /** Mirrors Bpe.train(rounds = 6): replays the full adaptive merge
   * trajectory. Round r picks m{r} = argmax pair by (count desc, a,
   * b) over adjacent symbols of w{r}, then rewrites to w{r+1} by
   * greedy left-to-right application — consecutive eligible positions
   * (only runs, sym_a = sym_b) merge at odd row_numbers (even chain
   * offsets), the next position is consumed, and positions renumber. */
  private val bpeSql: String = {
    val step = bpeStep _
    val rounds = 6
    val union = (1 to rounds).map(r =>
      s"""SELECT cast($r AS bigint) AS "round", pa AS sym_a, pb AS sym_b,
         |       cast(cnt AS bigint) AS pair_count FROM m$r""".stripMargin)
      .mkString("\nUNION ALL\n")
    bpeCtes(step, rounds) + "\n" + union
  }

  /** Mirrors Bpe.tokenCensus(rounds = 6): the same CTE trajectory,
   * censusing the final symbol table instead of the merges. */
  private val bpeCensusSql: String =
    bpeCtes(bpeStep _, 6) +
      "\nSELECT sym, cast(sum(freq) AS bigint) AS n_occurrences FROM w7 GROUP BY 1"

  private def bpeStep(r: Int): String =
      s""", p$r AS MATERIALIZED (
         |  SELECT a.sym AS pa, b.sym AS pb, sum(a.freq) AS cnt
         |  FROM w$r a JOIN w$r b ON b.wid = a.wid AND b.pos = a.pos + 1
         |  GROUP BY 1, 2
         |), m$r AS MATERIALIZED (
         |  SELECT pa, pb, cnt FROM p$r ORDER BY cnt DESC, pa, pb LIMIT 1
         |), x$r AS MATERIALIZED (
         |  SELECT w.wid, w.freq, w.pos, w.sym, m.pa, m.pb,
         |         (w.sym = m.pa AND
         |          lead(w.sym) OVER (PARTITION BY w.wid ORDER BY w.pos) = m.pb) AS elig
         |  FROM w$r w LEFT JOIN m$r m ON true
         |), st$r AS MATERIALIZED (
         |  SELECT wid, pos FROM (
         |    SELECT wid, pos, row_number() OVER (PARTITION BY wid, grp ORDER BY pos) AS rn
         |    FROM (
         |      SELECT wid, pos, pos - row_number() OVER (PARTITION BY wid ORDER BY pos) AS grp
         |      FROM x$r WHERE elig) g) t
         |  WHERE rn % 2 = 1
         |), w${r + 1} AS MATERIALIZED (
         |  SELECT wid, freq, row_number() OVER (PARTITION BY wid ORDER BY pos) AS pos, sym
         |  FROM (
         |    SELECT w.wid, w.freq, w.pos,
         |           CASE WHEN s.pos IS NOT NULL THEN w.pa || w.pb ELSE w.sym END AS sym
         |    FROM x$r w
         |    LEFT JOIN st$r s ON s.wid = w.wid AND s.pos = w.pos
         |    LEFT JOIN st$r c ON c.wid = w.wid AND c.pos = w.pos - 1
         |    WHERE c.pos IS NULL) z
         |)""".stripMargin

  private def bpeCtes(step: Int => String, rounds: Int): String =
    """WITH wd AS MATERIALIZED (
      |  SELECT w, count(*) AS freq FROM (
      |    SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
      |  WHERE length(w) > 0 GROUP BY 1
      |), pos_idx AS MATERIALIZED (
      |  SELECT unnest(range(1, 1 + (SELECT coalesce(max(length(w)), 0) FROM wd))) AS pos
      |), w1 AS MATERIALIZED (
      |  SELECT dense_rank() OVER (ORDER BY d.w) AS wid, d.freq, p.pos,
      |         substring(d.w, cast(p.pos AS int), 1) AS sym
      |  FROM wd d JOIN pos_idx p ON p.pos <= length(d.w)
      |)""".stripMargin +
      (1 to rounds).map(step).mkString

  /** Mirrors Bpe.docTokenCounts(rounds = 6): final word lengths from
   * the same CTE trajectory, joined back to each document's words. */
  private val bpeDocLenSql: String =
    bpeCtes(bpeStep _, 6) +
      """
        |, wd2 AS (SELECT w, dense_rank() OVER (ORDER BY w) AS wid FROM wd)
        |, wlen AS (SELECT wid, count(*) AS len FROM w7 GROUP BY 1)
        |, dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        |SELECT d.doc_id, cast(count(*) AS bigint) AS n_words,
        |       cast(sum(l.len) AS bigint) AS n_tokens_bpe
        |FROM dw d JOIN wd2 ON wd2.w = d.w JOIN wlen l ON l.wid = wd2.wid
        |WHERE length(d.w) > 0
        |GROUP BY 1""".stripMargin

  /** Mirrors Dedup.segmentDedup (segLen = 8): grouped segment build,
   * first-occurrence election over md5(seg), ordered reassembly. */
  private val segDedupSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
      |         generate_subscripts(string_split(text, ' '), 1) AS pos
      |  FROM documents
      |), segs AS (
      |  SELECT doc_id, (pos - 1) // 8 AS seg_idx,
      |         string_agg(tok, ' ' ORDER BY pos) AS seg
      |  FROM tok GROUP BY 1, 2
      |), elected AS (
      |  SELECT doc_id, seg_idx, seg,
      |         row_number() OVER (PARTITION BY md5(seg)
      |                            ORDER BY doc_id, seg_idx) = 1 AS kept
      |  FROM segs
      |)
      |SELECT doc_id,
      |       cast(count(*) AS bigint) AS n_segs,
      |       cast(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS bigint) AS kept_segs,
      |       md5(coalesce(string_agg(CASE WHEN kept THEN seg END, ' ' ORDER BY seg_idx), ''))
      |         AS new_md5
      |FROM elected GROUP BY 1""".stripMargin

  /** Mirrors Multimodal.wavTable + decodeWav: the oracle builds the
   * same canonical WAV hex image (header fields little-endian) and
   * parses it back with the identical slices — DuckDB works in hex
   * space throughout (no blob substring in 1.0); the engine round-
   * trips through actual binary. */
  private val wavSql: String = {
    def le32(x: String): String =
      s"concat(lpad(hex(($x) % 256), 2, '0'), lpad(hex((($x) // 256) % 256), 2, '0')," +
        s" lpad(hex((($x) // 65536) % 256), 2, '0'), lpad(hex((($x) // 16777216) % 256), 2, '0'))"
    def le16(x: String): String =
      s"concat(lpad(hex(($x) % 256), 2, '0'), lpad(hex((($x) // 256) % 256), 2, '0'))"
    def rd32(p: Int): String =
      s"('0x' || substring(hx, ${(p + 3) * 2 - 1}, 2) || substring(hx, ${(p + 2) * 2 - 1}, 2)" +
        s" || substring(hx, ${(p + 1) * 2 - 1}, 2) || substring(hx, ${p * 2 - 1}, 2))::BIGINT"
    def rd16(p: Int): String =
      s"('0x' || substring(hx, ${(p + 1) * 2 - 1}, 2) || substring(hx, ${p * 2 - 1}, 2))::BIGINT"
    s"""WITH p AS (
       |  SELECT doc_id AS media_id,
       |         CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END AS sr,
       |         doc_id % 2 + 1 AS ch,
       |         octet_length(encode(text)) AS ds,
       |         hex(encode(text)) AS ph
       |  FROM documents
       |), w AS (
       |  SELECT media_id, upper(concat(
       |    '52494646', ${le32("ds + 36")}, '57415645', '666D7420', '10000000', '0100',
       |    ${le16("ch")}, ${le32("sr")}, ${le32("sr * ch * 2")}, ${le16("ch * 2")},
       |    '1000', '64617461', ${le32("ds")}, ph)) AS hx
       |  FROM p
       |)
       |SELECT media_id,
       |       cast(CASE WHEN substring(hx, 1, 8) = '52494646'
       |                  AND substring(hx, 17, 8) = '57415645'
       |                  AND substring(hx, 25, 8) = '666D7420' THEN 1 ELSE 0 END AS bigint) AS valid,
       |       cast(${rd16(23)} AS bigint) AS channels,
       |       cast(${rd32(25)} AS bigint) AS sample_rate,
       |       cast(${rd32(29)} AS bigint) AS byte_rate,
       |       cast(${rd16(35)} AS bigint) AS bits,
       |       cast(${rd32(41)} AS bigint) AS data_bytes,
       |       cast((${rd32(41)} * 1000) // ${rd32(29)} AS bigint) AS duration_ms,
       |       md5(substring(hx, 89, 1000000000)) AS payload_md5
       |FROM w""".stripMargin
  }

  /** BMP synthesize-and-decode replay (Multimodal.bmpTable/decodeBmp):
   * build the identical file hex (header fields little-endian, text
   * bytes repeated across the padded raster), then parse it back —
   * header reads, stride arithmetic, per-pixel channel sums — all in
   * exact integer arithmetic. */
  private val bmpSql: String = {
    def le32(x: String): String =
      s"concat(lpad(hex(($x) % 256), 2, '0'), lpad(hex((($x) // 256) % 256), 2, '0')," +
        s" lpad(hex((($x) // 65536) % 256), 2, '0'), lpad(hex((($x) // 16777216) % 256), 2, '0'))"
    def rd32(p: Int): String =
      s"('0x' || substring(hx, ${(p + 3) * 2 - 1}, 2) || substring(hx, ${(p + 2) * 2 - 1}, 2)" +
        s" || substring(hx, ${(p + 1) * 2 - 1}, 2) || substring(hx, ${p * 2 - 1}, 2))::BIGINT"
    def rd16(p: Int): String =
      s"('0x' || substring(hx, ${(p + 1) * 2 - 1}, 2) || substring(hx, ${p * 2 - 1}, 2))::BIGINT"
    val off = "(h.data_off + (idx.i // h.width) * h.row_size + (idx.i % h.width) * 3)"
    s"""WITH p AS (
       |  SELECT doc_id AS media_id, doc_id % 5 + 2 AS w, doc_id % 4 + 2 AS h,
       |         hex(encode(text)) AS th
       |  FROM documents
       |), r AS (
       |  SELECT media_id, w, h, ((3 * w + 3) // 4) * 4 * h AS img_size,
       |         ((3 * w + 3) // 4) * 4 AS row_size, th
       |  FROM p
       |), b AS (
       |  SELECT media_id, upper(concat(
       |    '424D', ${le32("img_size + 54")}, '00000000', ${le32("54")},
       |    ${le32("40")}, ${le32("w")}, ${le32("h")}, '0100', '1800', ${le32("0")},
       |    ${le32("img_size")}, ${le32("2835")}, ${le32("2835")}, ${le32("0")}, ${le32("0")},
       |    substring(repeat(th, cast((img_size * 2) // length(th) + 1 AS int)),
       |              1, cast(img_size * 2 AS int)))) AS hx
       |  FROM r
       |), hd AS (
       |  SELECT media_id, hx,
       |         CASE WHEN substring(hx, 1, 4) = '424D' AND ${rd16(27)} = 1
       |                   AND ${rd16(29)} = 24 AND ${rd32(31)} = 0 THEN 1 ELSE 0 END AS valid,
       |         ${rd32(11)} AS data_off, ${rd32(19)} AS width, ${rd32(23)} AS height
       |  FROM b
       |), hd2 AS (
       |  SELECT *, ((3 * width + 3) // 4) * 4 AS row_size FROM hd
       |), idx AS (SELECT unnest(range(64)) AS i
       |), px AS (
       |  SELECT h.media_id,
       |         ('0x' || substring(h.hx, cast($off * 2 + 1 AS int), 2))::BIGINT AS bb,
       |         ('0x' || substring(h.hx, cast($off * 2 + 3 AS int), 2))::BIGINT AS gg,
       |         ('0x' || substring(h.hx, cast($off * 2 + 5 AS int), 2))::BIGINT AS rr
       |  FROM hd2 h JOIN idx ON idx.i < h.width * h.height
       |  WHERE h.valid = 1
       |), ag AS (
       |  SELECT media_id, count(*) AS n_pixels, sum(bb) AS sum_b,
       |         sum(gg) AS sum_g, sum(rr) AS sum_r
       |  FROM px GROUP BY 1
       |)
       |SELECT h.media_id, cast(h.valid AS bigint) AS valid,
       |       cast(h.width AS bigint) AS width, cast(h.height AS bigint) AS height,
       |       cast(coalesce(a.n_pixels, 0) AS bigint) AS n_pixels,
       |       cast(coalesce(a.sum_b, 0) AS bigint) AS sum_b,
       |       cast(coalesce(a.sum_g, 0) AS bigint) AS sum_g,
       |       cast(coalesce(a.sum_r, 0) AS bigint) AS sum_r
       |FROM hd2 h LEFT JOIN ag a USING (media_id)""".stripMargin
  }

  /** AVI synthesize-and-decode replay (Multimodal.aviTable/decodeAvi):
   * build the identical container hex (RIFF + hdrl/strl headers +
   * per-frame 00db chunks), then parse it back — header reads, chunk
   * walk by the first chunk's own size field, stride arithmetic,
   * per-frame per-channel pixel sums — exact integer throughout. */
  private val aviSql: String = {
    def le32(x: String): String =
      s"concat(lpad(hex(($x) % 256), 2, '0'), lpad(hex((($x) // 256) % 256), 2, '0')," +
        s" lpad(hex((($x) // 65536) % 256), 2, '0'), lpad(hex((($x) // 16777216) % 256), 2, '0'))"
    def le16(x: String): String =
      s"concat(lpad(hex(($x) % 256), 2, '0'), lpad(hex((($x) // 256) % 256), 2, '0'))"
    def rd32(p: Int): String =
      s"('0x' || substring(hx, ${(p + 3) * 2 - 1}, 2) || substring(hx, ${(p + 2) * 2 - 1}, 2)" +
        s" || substring(hx, ${(p + 1) * 2 - 1}, 2) || substring(hx, ${p * 2 - 1}, 2))::BIGINT"
    def rd16(p: Int): String =
      s"('0x' || substring(hx, ${(p + 1) * 2 - 1}, 2) || substring(hx, ${p * 2 - 1}, 2))::BIGINT"
    val off = "(f.doff + (pidx.i // f.width) * f.row_size + (pidx.i % f.width) * 3)"
    s"""WITH p AS (
       |  SELECT doc_id AS media_id,
       |         doc_id % 3 + 2 AS w, doc_id % 2 + 2 AS h, doc_id % 3 + 2 AS nf,
       |         CASE doc_id % 3 WHEN 0 THEN 33333 WHEN 1 THEN 40000 ELSE 66667 END AS usf,
       |         hex(encode(text)) AS th
       |  FROM documents
       |), r AS (
       |  SELECT media_id, w, h, nf, usf,
       |         ((3 * w + 3) // 4) * 4 * h AS fs, th
       |  FROM p
       |), r2 AS (
       |  SELECT *, substring(repeat(th, cast((nf * fs * 2) // length(th) + 1 AS int)),
       |                      1, cast(nf * fs * 2 AS int)) AS pix_hex
       |  FROM r
       |), b AS (
       |  SELECT media_id, upper(concat(
       |    '52494646', ${le32("216 + nf * (fs + 8)")}, '41564920',
       |    '4C495354', ${le32("192")}, '6864726C',
       |    '61766968', ${le32("56")},
       |    ${le32("usf")}, ${le32("0")}, ${le32("0")}, ${le32("0")},
       |    ${le32("nf")}, ${le32("0")}, ${le32("1")}, ${le32("fs")}, ${le32("w")}, ${le32("h")},
       |    ${le32("0")}, ${le32("0")}, ${le32("0")}, ${le32("0")},
       |    '4C495354', ${le32("116")}, '7374726C',
       |    '73747268', ${le32("56")},
       |    '76696473', '44494220', ${le32("0")}, ${le16("0")}, ${le16("0")},
       |    ${le32("0")}, ${le32("1")}, ${le32("25")}, ${le32("0")}, ${le32("nf")}, ${le32("fs")},
       |    ${le32("10000")}, ${le32("0")}, ${le16("0")}, ${le16("0")}, ${le16("w")}, ${le16("h")},
       |    '73747266', ${le32("40")},
       |    ${le32("40")}, ${le32("w")}, ${le32("h")}, ${le16("1")}, ${le16("24")}, ${le32("0")},
       |    ${le32("fs")}, ${le32("2835")}, ${le32("2835")}, ${le32("0")}, ${le32("0")},
       |    '4C495354', ${le32("4 + nf * (fs + 8)")}, '6D6F7669',
       |    array_to_string(list_transform(range(0, nf), i -> concat('30306462', ${le32("fs")},
       |      substring(pix_hex, cast(i * fs * 2 + 1 AS int), cast(fs * 2 AS int)))), ''))) AS hx
       |  FROM r2
       |), hd AS (
       |  SELECT media_id, hx,
       |         CASE WHEN substring(hx, 1, 8) = '52494646' AND substring(hx, 17, 8) = '41564920'
       |                   AND substring(hx, 41, 8) = '6864726C' AND substring(hx, 49, 8) = '61766968'
       |                   AND substring(hx, 217, 8) = '76696473' AND ${rd32(169)} = 40
       |                   AND ${rd16(185)} = 1 AND ${rd16(187)} = 24 AND ${rd32(189)} = 0
       |                   AND substring(hx, 441, 8) = '6D6F7669' THEN 1 ELSE 0 END AS valid,
       |         ${rd32(33)} AS us_per_frame, ${rd32(49)} AS n_frames,
       |         ${rd32(65)} AS width, ${rd32(69)} AS height, ${rd32(229)} AS fs
       |  FROM b
       |), hd2 AS (
       |  SELECT *, ((3 * width + 3) // 4) * 4 AS row_size FROM hd
       |), fidx AS (SELECT unnest(range(8)) AS i
       |), pidx AS (SELECT unnest(range(64)) AS i
       |), fr AS (
       |  SELECT h.media_id, h.hx, h.width, h.height, h.row_size, h.fs,
       |         h.us_per_frame, h.n_frames, fidx.i AS frame_idx,
       |         224 + fidx.i * (h.fs + 8) AS coff
       |  FROM hd2 h JOIN fidx ON fidx.i < h.n_frames
       |  WHERE h.valid = 1 AND h.n_frames >= 1 AND h.width >= 1 AND h.height >= 1
       |), fr2 AS (
       |  SELECT *, CASE WHEN substring(hx, cast(coff * 2 + 1 AS int), 8) = '30306462'
       |                 THEN 1 ELSE 0 END AS frame_ok,
       |         coff + 8 AS doff
       |  FROM fr
       |), px AS (
       |  SELECT f.media_id, f.frame_idx,
       |         ('0x' || substring(f.hx, cast($off * 2 + 1 AS int), 2))::BIGINT AS bb,
       |         ('0x' || substring(f.hx, cast($off * 2 + 3 AS int), 2))::BIGINT AS gg,
       |         ('0x' || substring(f.hx, cast($off * 2 + 5 AS int), 2))::BIGINT AS rr
       |  FROM fr2 f JOIN pidx ON pidx.i < f.width * f.height
       |  WHERE f.frame_ok = 1
       |), ag AS (
       |  SELECT media_id, frame_idx, count(*) AS n_pixels, sum(bb) AS sum_b,
       |         sum(gg) AS sum_g, sum(rr) AS sum_r
       |  FROM px GROUP BY 1, 2
       |)
       |SELECT f.media_id, cast(f.frame_idx AS bigint) AS frame_idx,
       |       cast(f.width AS bigint) AS width, cast(f.height AS bigint) AS height,
       |       cast(f.n_frames AS bigint) AS n_frames,
       |       cast(f.us_per_frame AS bigint) AS us_per_frame,
       |       cast(f.frame_ok AS bigint) AS frame_ok,
       |       cast(coalesce(a.n_pixels, 0) AS bigint) AS n_pixels,
       |       cast(coalesce(a.sum_b, 0) AS bigint) AS sum_b,
       |       cast(coalesce(a.sum_g, 0) AS bigint) AS sum_g,
       |       cast(coalesce(a.sum_r, 0) AS bigint) AS sum_r
       |FROM fr2 f LEFT JOIN ag a ON a.media_id = f.media_id AND a.frame_idx = f.frame_idx""".stripMargin
  }

  /** Mirrors Dedup.editDistancePairs over the same cand CTE (byte ≡
   * char Levenshtein on this ASCII corpus; unused CTEs are pruned). */
  private val editDistSql: String =
    docPrefix + minhashBody(mat = false) +
      """
        |SELECT c.doc_a, c.doc_b, levenshtein(da.text, db.text) AS edit_dist
        |FROM cand c
        |JOIN documents da ON da.doc_id = c.doc_a
        |JOIN documents db ON db.doc_id = c.doc_b
        |WHERE levenshtein(da.text, db.text) <= 20""".stripMargin

  /** Min-label transitive closure over the symmetric pair graph —
   * same recursion shape as SparkEntry.ccSql; every upstream CTE is
   * MATERIALIZED so a recursion step does not re-derive the whole
   * MinHash pipeline (the SparkEntry BC-oracle lesson: 55 s → 1 s). */
  /** Shared near-dup cluster CTE chain ending in lab(d, cluster_id). */
  private val dedupClustersCtes: String = {
    // docPrefix with WITH RECURSIVE; sh must be materialized too
    val recPrefix = "WITH RECURSIVE " + docPrefix.stripPrefix("WITH ")
      .replace("), sh AS (", "), sh AS MATERIALIZED (")
    recPrefix + minhashBody(mat = true) +
      """, pe AS MATERIALIZED (
        |  SELECT doc_a AS a, doc_b AS b FROM mhp
        |  UNION ALL
        |  SELECT doc_b, doc_a FROM mhp
        |), r(d, l) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT pe.b, r.l FROM r JOIN pe ON pe.a = r.d WHERE r.l < pe.b
        |), lab AS (
        |  SELECT d, min(l) AS cluster_id FROM r GROUP BY d
        |)""".stripMargin
  }

  private val dedupClustersSql: String = dedupClustersCtes +
    """
      |SELECT d AS doc_id, cluster_id,
      |       cast(CASE WHEN d = cluster_id THEN 1 ELSE 0 END AS bigint) AS is_keeper
      |FROM lab""".stripMargin

  /** Mirrors Dedup.dupRateBySource: the per-source rollup of the
   * same cluster closure (keeper = global min doc_id of the cluster,
   * so cross-source duplicates count against the non-keeper source). */
  private val dupRateSql: String = dedupClustersCtes +
    """
      |SELECT d.source,
      |       cast(count(*) AS bigint) AS n_docs,
      |       cast(sum(CASE WHEN lab.d = lab.cluster_id THEN 1 ELSE 0 END) AS bigint) AS n_keepers,
      |       cast(count(DISTINCT lab.cluster_id) AS bigint) AS n_clusters,
      |       cast((count(*) - sum(CASE WHEN lab.d = lab.cluster_id THEN 1 ELSE 0 END)) * 10000
      |            // count(*) AS bigint) AS dup_rate_e4
      |FROM lab JOIN documents d ON d.doc_id = lab.d
      |GROUP BY 1""".stripMargin

  /** Mirrors TextStats.readability (regexp run counts are RE2/Java
   * agnostic for these plain character classes). */
  /** Per-column profile replay: one UNION ALL branch per column of
   * the documents drop (must stay in sync with its parquet schema). */
  private val profileSql: String =
    Seq("doc_id", "lang", "n_chars", "source", "text").map { c =>
      s"""SELECT '$c' AS col_name, cast(count(*) AS bigint) AS n_rows,
         |       cast(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS bigint) AS n_nulls,
         |       cast(count(DISTINCT $c) AS bigint) AS n_distinct
         |FROM documents""".stripMargin
    }.mkString("\nUNION ALL\n")

  private val mojibakeSql: String =
    """WITH m AS (
      |  SELECT doc_id, length(text) AS n_chars,
      |         length(text) - length(regexp_replace(text, '[^ -~\t\n\r]', '', 'g')) AS n_nonprint,
      |         length(text) - length(replace(text, chr(65533), '')) AS n_repl
      |  FROM documents
      |)
      |SELECT doc_id, cast(n_chars AS bigint) AS n_chars,
      |       cast(n_nonprint AS bigint) AS n_nonprint,
      |       cast(n_repl AS bigint) AS n_repl,
      |       cast(CASE WHEN n_chars = 0 THEN 0
      |                 ELSE (n_nonprint * 10000) // n_chars END AS bigint) AS nonprint_e4
      |FROM m""".stripMargin

  private val embNormsSql: String =
    """WITH q AS (
      |  SELECT vec_id,
      |         cast(round(cast(unnest(embedding) AS double) * 1000000) AS bigint) AS xq
      |  FROM embeddings
      |), n AS (
      |  SELECT vec_id, count(*) AS n_dims, sum(xq * xq) AS norm2_q FROM q GROUP BY 1
      |)
      |SELECT vec_id, cast(n_dims AS bigint) AS n_dims,
      |       cast(norm2_q AS bigint) AS norm2_q,
      |       cast(length(bin(cast(norm2_q AS bigint))) AS bigint) AS bucket
      |FROM n""".stripMargin

  /** PC1 power-iteration replay — identical 8-round integer
   * trajectory as pipeline.Pca (HUGEINT matvec ≡ BigInt; sign-split
   * floor division; canonical sign). */
  private val pcaSql: String = {
    // every round CTE is referenced 2-3× downstream — without
    // MATERIALIZED DuckDB inlines per reference and the 8-round chain
    // re-derives exponentially (the prefixBody gotcha, measured: >10
    // min inlined vs <1 s materialized)
    val round = (r: Int) =>
      s""", u$r AS MATERIALIZED (
         |  SELECT cov.j, sum(cast(cov.c AS hugeint) * w${r - 1}.w) AS u
         |  FROM cov JOIN w${r - 1} ON w${r - 1}.j = cov.k GROUP BY 1
         |), m$r AS MATERIALIZED (SELECT max(abs(u)) AS m FROM u$r
         |), w$r AS MATERIALIZED (
         |  SELECT j, CASE WHEN (SELECT m FROM m$r) = 0 THEN 0
         |                 WHEN u < 0 THEN -cast((-u) * 1000000 // (SELECT m FROM m$r) AS bigint)
         |                 ELSE cast(u * 1000000 // (SELECT m FROM m$r) AS bigint) END AS w
         |  FROM u$r
         |)""".stripMargin
    """WITH q AS MATERIALIZED (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
      |         cast(round(cast(unnest(embedding) AS double) * 1000) AS bigint) AS xq
      |  FROM embeddings
      |), cov AS MATERIALIZED (
      |  SELECT a.i AS j, b.i AS k, sum(a.xq * b.xq) AS c
      |  FROM q a JOIN q b ON a.vec_id = b.vec_id GROUP BY 1, 2
      |), w0 AS (SELECT DISTINCT i AS j, cast(1000000 AS bigint) AS w FROM q)""".stripMargin +
      (1 to 8).map(round).mkString +
      """
        |, sg AS MATERIALIZED (
        |  SELECT CASE WHEN (SELECT w FROM w8
        |                    WHERE j = (SELECT min(j) FROM w8 WHERE w <> 0)) < 0
        |              THEN -1 ELSE 1 END AS s
        |), wf AS MATERIALIZED (SELECT j, w * (SELECT s FROM sg) AS w FROM w8)
        |SELECT q.vec_id, cast(sum(q.xq * wf.w) AS bigint) AS pc1_q
        |FROM q JOIN wf ON wf.j = q.i GROUP BY 1""".stripMargin
  }

  private val sq8Sql: String =
    """WITH q AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
      |         cast(round(cast(unnest(embedding) AS double) * 1000000) AS bigint) AS xq
      |  FROM embeddings
      |), rng AS (
      |  SELECT i, min(xq) AS mn, max(xq) AS mx FROM q GROUP BY 1
      |), c AS (
      |  SELECT q.vec_id,
      |         CASE WHEN r.mx = r.mn THEN 0
      |              ELSE ((q.xq - r.mn) * 255) // (r.mx - r.mn) END AS code
      |  FROM q JOIN rng r ON r.i = q.i
      |)
      |SELECT vec_id, cast(count(*) AS bigint) AS n_dims,
      |       cast(sum(code) AS bigint) AS code_sum,
      |       cast(min(code) AS bigint) AS code_min,
      |       cast(max(code) AS bigint) AS code_max
      |FROM c GROUP BY 1""".stripMargin

  private val readabilitySql: String =
    """WITH c AS (
      |  SELECT doc_id,
      |         greatest(len(regexp_extract_all(lower(text), '[a-z0-9]+')), 1) AS words,
      |         greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS sentences,
      |         greatest(len(regexp_extract_all(lower(text), '[aeiou]+')), 1) AS syllables
      |  FROM documents
      |)
      |SELECT doc_id, cast(words AS bigint) AS words,
      |       cast(sentences AS bigint) AS sentences,
      |       cast(syllables AS bigint) AS syllables,
      |       cast(206835 - (1015 * words) // sentences
      |            - (84600 * syllables) // words AS bigint) AS flesch_e3
      |FROM c""".stripMargin

  /** Mirrors Dedup.leakageSafeSplit (10% heldout by cluster hash). */
  private val splitSql: String = dedupClustersCtes +
    s"""
       |SELECT d AS doc_id, cluster_id,
       |       CASE WHEN ('0x' || substr(md5(concat('sp|', cast(cluster_id AS varchar))), 1, 8))::BIGINT
       |                 < ${4294967296L * 100 / 1000} THEN 'heldout' ELSE 'train' END AS split
       |FROM lab""".stripMargin

  private val decontamSql: String = docPrefix +
    """, ev AS (
      |  SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0
      |), hits AS (
      |  SELECT s.doc_id, count(*) AS n
      |  FROM sh s JOIN ev ON ev.shingle = s.shingle
      |  WHERE s.doc_id % 97 <> 0 GROUP BY 1
      |)
      |SELECT d.doc_id,
      |       cast(coalesce(h.n, 0) AS bigint) AS shared_ngrams,
      |       cast(CASE WHEN coalesce(h.n, 0) > 0 THEN 1 ELSE 0 END AS bigint) AS contaminated
      |FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
      |WHERE d.doc_id % 97 <> 0""".stripMargin

  private val sampleSql: String =
    """WITH cnt AS (
      |  SELECT source, count(*) AS cnt FROM documents GROUP BY 1
      |), th AS (
      |  SELECT source,
      |         least(cast(floor(10 * 4294967296.0 / cnt) AS bigint), 4294967296) AS thresh
      |  FROM cnt
      |)
      |SELECT d.doc_id, d.source
      |FROM documents d JOIN th ON th.source = d.source
      |WHERE ('0x' || substr(md5(concat('s|', d.source, '|', cast(d.doc_id AS varchar))), 1, 8))::BIGINT < th.thresh""".stripMargin

  /** Temperature-2 mix replay — ⌊√cnt⌋ weights, integer thresholds,
   * salt 't'; mirrors Mix.temperatureMix exactly. */
  private val mixTempSql: String =
    """WITH cnt AS (
      |  SELECT source, count(*) AS cnt FROM documents GROUP BY 1
      |), w AS (
      |  SELECT source, cast(floor(sqrt(cnt)) AS bigint) AS isq FROM cnt
      |), s AS (
      |  SELECT sum(isq) AS tot FROM w
      |), th AS (
      |  SELECT w.source,
      |         least(120 * 4294967296 // (s.tot * w.isq), 4294967296) AS thresh
      |  FROM w, s
      |)
      |SELECT d.doc_id, d.source
      |FROM documents d JOIN th ON th.source = d.source
      |WHERE ('0x' || substr(md5(concat('t|', d.source, '|', cast(d.doc_id AS varchar))), 1, 8))::BIGINT < th.thresh""".stripMargin

  // Brute-force Jaccard ≥ 0.5 over ALL pairs — deliberately ignorant
  // of the engine's prefix filter; equality proves the filter lossless.
  /** Mirrors Dedup.lshRecall: band candidates (minhashBody's `cand`)
   * scored against brute-force true pairs at J ≥ 0.5. */
  private val lshRecallSql: String = docPrefix + minhashBody(mat = false) +
    """, szs2 AS (
      |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
      |), inter2 AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      |  FROM sh a JOIN sh b ON b.shingle = a.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |), tp AS (
      |  SELECT i.doc_a, i.doc_b
      |  FROM inter2 i
      |  JOIN szs2 sa ON sa.doc_id = i.doc_a
      |  JOIN szs2 sb ON sb.doc_id = i.doc_b
      |  WHERE i.i * 15000 >= 5000 * (sa.sz + sb.sz)
      |)
      |SELECT cast((SELECT count(*) FROM tp) AS bigint) AS n_true,
      |       cast((SELECT count(*) FROM cand) AS bigint) AS n_candidates,
      |       cast((SELECT count(*) FROM tp JOIN cand USING (doc_a, doc_b)) AS bigint) AS n_hits""".stripMargin

  private val allPairsSql: String = docPrefix +
    """, szs AS (
      |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
      |), inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      |  FROM sh a JOIN sh b ON b.shingle = a.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT i.doc_a, i.doc_b,
      |       cast((20000 * i.i + (sa.sz + sb.sz - i.i)) // (2 * (sa.sz + sb.sz - i.i)) AS bigint) AS jaccard_e4
      |FROM inter i
      |JOIN szs sa ON sa.doc_id = i.doc_a
      |JOIN szs sb ON sb.doc_id = i.doc_b
      |WHERE i.i * 15000 >= 5000 * (sa.sz + sb.sz)""".stripMargin

  private val packSql: String =
    """WITH b AS (
      |  SELECT doc_id, source, cast(len(string_split(text, ' ')) AS bigint) AS n_tokens
      |  FROM documents
      |), c AS (
      |  SELECT *, coalesce(sum(n_tokens) OVER (
      |    PARTITION BY source ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      |  FROM b
      |)
      |SELECT doc_id, source, n_tokens,
      |       cast(cum_before // 512 AS bigint) AS bin_id,
      |       cast(cum_before % 512 AS bigint) AS bin_offset
      |FROM c""".stripMargin

  private val ngramJaccardSql: String = docPrefix +
    """, szs AS (
      |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
      |), inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      |  FROM sh a
      |  JOIN documents da ON da.doc_id = a.doc_id
      |  JOIN documents db ON db.source = da.source
      |  JOIN sh b ON b.doc_id = db.doc_id AND b.shingle = a.shingle
      |  WHERE a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT i.doc_a, i.doc_b,
      |       cast(round(i.i * 10000.0 / (sa.sz + sb.sz - i.i)) AS bigint) AS jaccard_e4
      |FROM inter i
      |JOIN szs sa ON sa.doc_id = i.doc_a
      |JOIN szs sb ON sb.doc_id = i.doc_b""".stripMargin

  /** Mirrors Similarity.centroidOutliers: quantized component sums
   * per label, e = |n·xq − S| // n per dimension, d2 = Σe², top-5
   * per label by (d2 desc, vec_id). */
  private val outlierEmbSql: String =
    """WITH q AS (
      |  SELECT vec_id, cast(label AS bigint) AS lab,
      |         generate_subscripts(embedding, 1) AS i,
      |         cast(round(cast(unnest(embedding) AS double) * 1000000) AS bigint) AS xq
      |  FROM embeddings
      |), cent AS (
      |  SELECT lab, i, sum(xq) AS s, count(*) AS n FROM q GROUP BY 1, 2
      |), e AS (
      |  SELECT q.lab, q.vec_id, abs(c.n * q.xq - c.s) // c.n AS e
      |  FROM q JOIN cent c ON c.lab = q.lab AND c.i = q.i
      |), d AS (
      |  SELECT lab, vec_id, sum(e * e) AS d2 FROM e GROUP BY 1, 2
      |)
      |SELECT lab, vec_id, cast(d2 AS bigint) AS d2, cast(rank AS bigint) AS rank FROM (
      |  SELECT *, row_number() OVER (PARTITION BY lab ORDER BY d2 DESC, vec_id) AS rank
      |  FROM d) r
      |WHERE rank <= 5""".stripMargin

  /** Mirrors Similarity.hardNegatives: brute cosine restricted to
   * label-mismatched pairs, top-3 per query by (sim_e4 desc, neg_id). */
  private val hardNegSql: String =
    """WITH v AS (
      |  SELECT vec_id, cast(unnest(embedding) AS double) AS x,
      |         generate_subscripts(embedding, 1) AS i
      |  FROM embeddings
      |), norms AS (
      |  SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM v GROUP BY 1
      |), labs AS (
      |  SELECT vec_id, label FROM embeddings
      |), dots AS (
      |  SELECT a.vec_id AS vec_id, b.vec_id AS neg_id, sum(a.x*b.x) AS d
      |  FROM v a JOIN v b ON a.i = b.i AND a.vec_id <> b.vec_id
      |  WHERE a.vec_id < 500
      |  GROUP BY 1, 2
      |), sims AS (
      |  SELECT d.vec_id, d.neg_id,
      |         cast(round(d.d / (na.nrm * nb.nrm) * 10000) AS bigint) AS sim_e4
      |  FROM dots d
      |  JOIN norms na ON na.vec_id = d.vec_id
      |  JOIN norms nb ON nb.vec_id = d.neg_id
      |  JOIN labs la ON la.vec_id = d.vec_id
      |  JOIN labs lb ON lb.vec_id = d.neg_id
      |  WHERE la.label <> lb.label
      |)
      |SELECT vec_id, neg_id, sim_e4, cast(rank AS bigint) AS rank FROM (
      |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim_e4 DESC, neg_id) AS rank
      |  FROM sims) r
      |WHERE rank <= 3""".stripMargin

  /** Mirrors Similarity.labelAgreement: same brute top-5 ranking,
   * label joins, per-label census. */
  private val labelAgreeSql: String =
    """WITH v AS (
      |  SELECT vec_id, cast(unnest(embedding) AS double) AS x,
      |         generate_subscripts(embedding, 1) AS i
      |  FROM embeddings
      |), norms AS (
      |  SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM v GROUP BY 1
      |), dots AS (
      |  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id, sum(a.x*b.x) AS d
      |  FROM v a JOIN v b ON a.i = b.i AND a.vec_id <> b.vec_id
      |  WHERE a.vec_id < 500
      |  GROUP BY 1, 2
      |), sims AS (
      |  SELECT d.vec_id, d.nbr_id,
      |         cast(round(d.d / (na.nrm * nb.nrm) * 10000) AS bigint) AS sim_e4
      |  FROM dots d
      |  JOIN norms na ON na.vec_id = d.vec_id
      |  JOIN norms nb ON nb.vec_id = d.nbr_id
      |), topk AS (
      |  SELECT vec_id, nbr_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim_e4 DESC, nbr_id) AS rank
      |    FROM sims) r
      |  WHERE rank <= 5
      |), labs AS (
      |  SELECT vec_id, cast(label AS bigint) AS lab FROM embeddings
      |)
      |SELECT la.lab, cast(count(DISTINCT t.vec_id) AS bigint) AS n_queries,
      |       cast(sum(CASE WHEN la.lab = lb.lab THEN 1 ELSE 0 END) AS bigint) AS agree
      |FROM topk t
      |JOIN labs la ON la.vec_id = t.vec_id
      |JOIN labs lb ON lb.vec_id = t.nbr_id
      |GROUP BY 1""".stripMargin

  private val annCosineSql: String =
    """WITH v AS (
      |  SELECT vec_id, cast(unnest(embedding) AS double) AS x,
      |         generate_subscripts(embedding, 1) AS i
      |  FROM embeddings
      |), norms AS (
      |  SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM v GROUP BY 1
      |), dots AS (
      |  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id, sum(a.x*b.x) AS d
      |  FROM v a JOIN v b ON a.i = b.i AND a.vec_id <> b.vec_id
      |  WHERE a.vec_id < 500
      |  GROUP BY 1, 2
      |), sims AS (
      |  SELECT d.vec_id, d.nbr_id,
      |         cast(round(d.d / (na.nrm * nb.nrm) * 10000) AS bigint) AS sim_e4
      |  FROM dots d
      |  JOIN norms na ON na.vec_id = d.vec_id
      |  JOIN norms nb ON nb.vec_id = d.nbr_id
      |)
      |SELECT vec_id, nbr_id, sim_e4, cast(rank AS bigint) AS rank FROM (
      |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim_e4 DESC, nbr_id) AS rank
      |  FROM sims) r
      |WHERE rank <= 5""".stripMargin

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ",", ")")

  /** Shared language-ID CTE chain ending in `lang(doc_id, pred_lang,
   * stop_hits)` — used by both q_langid and q_rollup. */
  private val langCtes: String = {
    val cases = Seq("en", "de", "fr", "es").map(l =>
      s"sum(CASE WHEN tok IN ${inList(TextStats.stopwords(l))} THEN 1 ELSE 0 END) AS s_$l")
      .mkString(",\n    ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents
       |), sc AS (
       |  SELECT doc_id,
       |    $cases
       |  FROM tok GROUP BY 1
       |), g AS (
       |  SELECT *, greatest(s_en, s_de, s_fr, s_es) AS best FROM sc
       |), lang AS (
       |  SELECT doc_id,
       |       CASE WHEN best = 0 THEN 'und'
       |            WHEN s_en = best THEN 'en'
       |            WHEN s_de = best THEN 'de'
       |            WHEN s_fr = best THEN 'fr'
       |            ELSE 'es' END AS pred_lang,
       |       cast(best AS bigint) AS stop_hits
       |  FROM g
       |)""".stripMargin
  }

  private val langidSql: String =
    langCtes + "\nSELECT doc_id, pred_lang, stop_hits FROM lang"

  /** Mirrors TextStats.langIdMargin: margin = best − runner-up. */
  private val langidMarginSql: String = langCtes +
    """
      |SELECT l.doc_id, l.pred_lang, l.stop_hits,
      |       cast(g.best - (list_sort([g.s_en, g.s_de, g.s_fr, g.s_es], 'DESC'))[2]
      |            AS bigint) AS margin
      |FROM lang l JOIN g ON g.doc_id = l.doc_id""".stripMargin

  /** Mirrors TextStats.langRollup: ROLLUP over (source, pred_lang). */
  private val rollupSql: String = langCtes +
    """
      |SELECT d.source, l.pred_lang,
      |       cast(count(*) AS bigint) AS n_docs,
      |       cast(sum(length(d.text)) AS bigint) AS tot_chars
      |FROM documents d JOIN lang l ON l.doc_id = d.doc_id
      |GROUP BY ROLLUP (d.source, l.pred_lang)""".stripMargin

  /** Mirrors Sketch.bloom: 3 disjoint 12-bit slices of the 60-bit text
   * hash, packed into 60-bit words (bit 63 would trip DuckDB's
   * overflow-checked `<<`). */
  private val bloomSql: String =
    s"""WITH hs AS (
       |  SELECT source, ('0x' || substr(md5(text), 1, 15))::BIGINT AS h FROM documents
       |), ps AS (
       |  SELECT source,
       |         unnest([h % 4096, (h >> 12) % 4096, (h >> 24) % 4096]) AS pos
       |  FROM hs
       |)
       |SELECT source, pos // 60 AS word,
       |       bit_or(1::BIGINT << cast(pos % 60 AS int)) AS bits
       |FROM ps GROUP BY 1, 2""".stripMargin

  private val qualitySql: String = {
    val en = inList(TextStats.stopwords("en"))
    s"""WITH b AS (
       |  SELECT doc_id,
       |         length(text) AS nc,
       |         len(string_split(text, ' ')) AS nt,
       |         length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS punct,
       |         len(list_filter(string_split(lower(text), ' '), t -> t IN $en)) AS stops,
       |         len(list_distinct(string_split(lower(text), ' '))) AS dt
       |  FROM documents
       |)
       |SELECT doc_id,
       |       cast(nc AS bigint) AS n_chars_computed,
       |       cast(nt AS bigint) AS n_tokens,
       |       cast(round(nc * 1.0 / nt * 10000) AS bigint) AS mean_tok_len_e4,
       |       cast(round(punct * 1.0 / nc * 10000) AS bigint) AS punct_ratio_e4,
       |       cast(round(stops * 1.0 / nt * 10000) AS bigint) AS stop_ratio_e4,
       |       cast(round(dt * 1.0 / nt * 10000) AS bigint) AS distinct_ratio_e4
       |FROM b""".stripMargin
  }

  /** Composition of the dedup-keeper, quality, and langid oracles
   * with Curate.curate's default thresholds. */
  private val curateSql: String = {
    val en = inList(TextStats.stopwords("en"))
    val cases = Seq("en", "de", "fr", "es").map(l =>
      s"sum(CASE WHEN tok IN ${inList(TextStats.stopwords(l))} THEN 1 ELSE 0 END) AS s_$l")
      .mkString(",\n    ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents
       |), sc AS (
       |  SELECT doc_id,
       |    $cases
       |  FROM tok GROUP BY 1
       |), lg AS (
       |  SELECT doc_id,
       |         CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
       |              WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
       |              WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
       |              WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
       |              ELSE 'es' END AS pred_lang
       |  FROM sc
       |), qb AS (
       |  SELECT doc_id,
       |         length(text) AS nc,
       |         len(string_split(text, ' ')) AS nt,
       |         length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS punct,
       |         len(list_filter(string_split(lower(text), ' '), t -> t IN $en)) AS stops
       |  FROM documents
       |), qv AS (
       |  SELECT doc_id, cast(nt AS bigint) AS n_tokens,
       |         cast(round(punct * 1.0 / nc * 10000) AS bigint) AS punct_e4,
       |         cast(round(stops * 1.0 / nt * 10000) AS bigint) AS stop_e4
       |  FROM qb
       |), keep AS (
       |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
       |)
       |SELECT q.doc_id, q.n_tokens
       |FROM qv q
       |JOIN keep k ON k.doc_id = q.doc_id
       |JOIN lg l ON l.doc_id = q.doc_id
       |WHERE l.pred_lang = 'en'
       |  AND q.n_tokens BETWEEN 20 AND 10000
       |  AND q.punct_e4 <= 2000
       |  AND q.stop_e4 >= 200""".stripMargin
  }

  private val tokensSql: String =
    """SELECT doc_id,
      |       cast(len(string_split(text, ' ')) AS bigint) AS ws_tokens,
      |       cast(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS bigint) AS word_tokens,
      |       cast(len(list_distinct(string_split(lower(text), ' '))) AS bigint) AS distinct_tokens
      |FROM documents""".stripMargin

  private val fingerprintSql: String = docPrefix +
    """, h AS (
      |  SELECT doc_id, md5(shingle) AS h FROM sh
      |), r AS (
      |  SELECT doc_id, h, row_number() OVER (PARTITION BY doc_id ORDER BY h) AS rn FROM h
      |)
      |SELECT doc_id, string_agg(h, ',' ORDER BY h) AS fingerprint
      |FROM r WHERE rn <= 3 GROUP BY doc_id""".stripMargin

  /** Positional winnowing replay: same packed hp = h·2²⁰+(2²⁰−1−pos)
   * window-min trick as TextStats.winnow; generate_subscripts is
   * 1-based, Spark's posexplode 0-based, hence `pos - 1`. */
  private val winnowSql: String =
    """WITH g AS (
      |  SELECT doc_id, pos,
      |         ('0x' || substr(md5(concat(tok, ' ', t1, ' ', t2)), 1, 10))::BIGINT AS h
      |  FROM (
      |    SELECT doc_id, pos - 1 AS pos, tok,
      |           lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1,
      |           lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
      |    FROM (
      |      SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
      |             generate_subscripts(string_split(text, ' '), 1) AS pos
      |      FROM documents) x) y
      |  WHERE t2 IS NOT NULL
      |), c AS (
      |  SELECT doc_id, pos, h * 1048576 + (1048575 - pos) AS hp,
      |         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn,
      |         count(*) OVER (PARTITION BY doc_id) AS m
      |  FROM g
      |), s AS (
      |  SELECT doc_id, rn, m,
      |         min(hp) OVER (PARTITION BY doc_id ORDER BY pos
      |                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel
      |  FROM c
      |)
      |SELECT DISTINCT doc_id,
      |       cast(1048575 - (sel % 1048576) AS bigint) AS pos,
      |       cast(sel // 1048576 AS bigint) AS h
      |FROM s WHERE rn <= greatest(m - 3, 1)""".stripMargin

  /** Word-n-gram repetition stats; LEFT JOIN keeps docs shorter than n
   * tokens (all-zero rows), matching the Spark side's empty-array
   * guard. */
  private val repetitionSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |), i2 AS (
      |  SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks
      |), c2 AS (
      |  SELECT doc_id, g, count(*) AS c FROM (
      |    SELECT doc_id, t[i] || ' ' || t[i+1] AS g FROM i2) x GROUP BY 1, 2
      |), a2 AS (
      |  SELECT doc_id, sum(c) AS n2, count(*) AS d2, max(c) AS t2 FROM c2 GROUP BY 1
      |), i3 AS (
      |  SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i FROM toks
      |), c3 AS (
      |  SELECT doc_id, g, count(*) AS c FROM (
      |    SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g FROM i3) x GROUP BY 1, 2
      |), a3 AS (
      |  SELECT doc_id, sum(c) AS n3, count(*) AS d3, max(c) AS t3 FROM c3 GROUP BY 1
      |)
      |SELECT d.doc_id,
      |       cast(coalesce(a2.n2, 0) AS bigint) AS n_grams2,
      |       cast(coalesce(a2.d2, 0) AS bigint) AS distinct_grams2,
      |       cast(coalesce(a2.t2, 0) AS bigint) AS top_gram2,
      |       cast(coalesce(a3.n3, 0) AS bigint) AS n_grams3,
      |       cast(coalesce(a3.d3, 0) AS bigint) AS distinct_grams3,
      |       cast(coalesce(a3.t3, 0) AS bigint) AS top_gram3
      |FROM documents d
      |LEFT JOIN a2 ON a2.doc_id = d.doc_id
      |LEFT JOIN a3 ON a3.doc_id = d.doc_id""".stripMargin

  /** Exact ceil-rank percentiles of ws token counts — mirrors
   * Quantiles.tokenCountQuantiles (integer rank arithmetic). */
  private val quantilesSql: String =
    """WITH b AS (
      |  SELECT len(string_split(text, ' ')) AS v FROM documents
      |), h AS (
      |  SELECT v, count(*) AS c FROM b GROUP BY 1
      |), cc AS (
      |  SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM h
      |), n AS (
      |  SELECT count(*) AS n FROM b
      |), p AS (
      |  SELECT unnest([25, 50, 75, 90, 99]) AS pct
      |), r AS (
      |  SELECT cast(pct AS bigint) AS pct, (pct * n.n + 99) // 100 AS rank
      |  FROM p CROSS JOIN n
      |)
      |SELECT r.pct, cast(r.rank AS bigint) AS rank, cast(min(cc.v) AS bigint) AS value
      |FROM r JOIN cc ON cc.cum >= r.rank GROUP BY 1, 2""".stripMargin

  /** Per-source exact percentiles — mirrors tokenCountQuantilesBy. */
  private val quantilesSrcSql: String =
    """WITH b AS (
      |  SELECT source AS grp, len(string_split(text, ' ')) AS v FROM documents
      |), h AS (
      |  SELECT grp, v, count(*) AS c FROM b GROUP BY 1, 2
      |), cc AS (
      |  SELECT grp, v, sum(c) OVER (PARTITION BY grp ORDER BY v) AS cum,
      |         sum(c) OVER (PARTITION BY grp) AS n
      |  FROM h
      |), p AS (
      |  SELECT unnest([25, 50, 75, 90, 99]) AS pct
      |)
      |SELECT cc.grp AS source, cast(p.pct AS bigint) AS pct,
      |       cast((p.pct * cc.n + 99) // 100 AS bigint) AS rank,
      |       cast(min(cc.v) AS bigint) AS value
      |FROM cc JOIN p ON cc.cum >= (p.pct * cc.n + 99) // 100
      |GROUP BY 1, 2, 3""".stripMargin

  private val vocabSql: String =
    """WITH t AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
      |), a AS (
      |  SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df FROM t GROUP BY 1
      |)
      |SELECT term, cast(tf AS bigint) AS tf, cast(df AS bigint) AS df
      |FROM a ORDER BY tf DESC, term LIMIT 50""".stripMargin

  /** Zipf bucket census — `length(bin(tf))` ≡ Spark
   * `length(conv(tf,10,2))` (minimal-width bit length on BIGINT). */
  private val zipfSql: String =
    """WITH t AS (
      |  SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents
      |), a AS (
      |  SELECT term, count(*) AS tf FROM t GROUP BY 1
      |)
      |SELECT cast(length(bin(tf)) AS bigint) AS bucket,
      |       cast(count(*) AS bigint) AS n_types,
      |       cast(sum(tf) AS bigint) AS n_tokens,
      |       cast(min(tf) AS bigint) AS min_tf,
      |       cast(max(tf) AS bigint) AS max_tf
      |FROM a GROUP BY 1""".stripMargin

  private val tfidfSql: String =
    """WITH t AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
      |), tf AS (
      |  SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2
      |), dfq AS (
      |  SELECT term, count(*) AS df FROM tf GROUP BY 1
      |), r AS (
      |  SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
      |         row_number() OVER (PARTITION BY tf.doc_id ORDER BY tf.tf DESC, dfq.df, tf.term) AS rank
      |  FROM tf JOIN dfq USING (term)
      |)
      |SELECT doc_id, term, cast(tf AS bigint) AS tf, cast(df AS bigint) AS df,
      |       cast(rank AS bigint) AS rank
      |FROM r WHERE rank <= 3""".stripMargin

  /** Sparse tf-idf cosine pairs — mirrors Vocab.sparseCosinePairs:
   * content-word gate df·4 ≤ N (∧ df ≤ 1000, inert at this scale),
   * idf = bit_length(⌊N/df⌋), cos2_e6 in HUGEINT. */
  private val sparseCosSql: String =
    """WITH tq AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
      |), tfq AS (
      |  SELECT doc_id, term, count(*) AS tf FROM tq GROUP BY 1, 2
      |), dfq AS (
      |  SELECT term, count(*) AS df FROM tfq GROUP BY 1
      |), nq AS (SELECT count(*) AS n FROM documents
      |), wq AS (
      |  SELECT tfq.doc_id, tfq.term,
      |         tfq.tf * length(bin((SELECT n FROM nq) // dfq.df)) AS w
      |  FROM tfq JOIN dfq USING (term)
      |  WHERE dfq.df * 4 <= (SELECT n FROM nq) AND dfq.df <= 1000
      |), n2 AS (
      |  SELECT doc_id, sum(w * w) AS n2 FROM wq GROUP BY 1
      |), dotq AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.w * b.w) AS dot
      |  FROM wq a JOIN wq b ON b.term = a.term AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT doc_a, doc_b, cast(dot AS bigint) AS dot,
      |       cast((dot * dot * 1000000) // (na.n2 * nb.n2) AS bigint) AS cos2_e6
      |FROM dotq
      |JOIN n2 na ON na.doc_id = doc_a
      |JOIN n2 nb ON nb.doc_id = doc_b
      |WHERE (dot * dot * 1000000) // (na.n2 * nb.n2) >= 250000""".stripMargin

  /** HLL registers — mirrors Sketch.hll: 60-bit md5 token hash,
   * bucket = low p bits, rho = 53 − bitlen(h >> p) (bin() is
   * minimal-width on BIGINT, so length(bin(w)) = bitlen). */
  private val hllCtes: String =
    """WITH t AS (
      |  SELECT source, ('0x' || substr(md5(term), 1, 15))::BIGINT AS h FROM (
      |    SELECT source, unnest(string_split(lower(text), ' ')) AS term FROM documents) u
      |), b AS (
      |  SELECT source, h % 256 AS bucket, h // 256 AS w FROM t
      |), regs AS (
      |  SELECT source, cast(bucket AS bigint) AS bucket,
      |         cast(max(CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END) AS bigint) AS max_rho
      |  FROM b GROUP BY 1, 2
      |)""".stripMargin

  private val hllSql: String =
    hllCtes + "\nSELECT source, bucket, max_rho FROM regs"

  /** Mirrors Sketch.hllPairStats: register-wise max per source pair,
   * dyadic harmonic sum scaled to exact integers. */
  private val hllPairsSql: String = hllCtes +
    """, srcs AS (SELECT DISTINCT source FROM documents
      |), prs AS (
      |  SELECT x.source AS source_a, y.source AS source_b
      |  FROM srcs x JOIN srcs y ON x.source < y.source
      |), uu AS (
      |  SELECT p.source_a, p.source_b, r.bucket, r.max_rho
      |  FROM prs p JOIN regs r ON r.source = p.source_a
      |  UNION ALL
      |  SELECT p.source_a, p.source_b, r.bucket, r.max_rho
      |  FROM prs p JOIN regs r ON r.source = p.source_b
      |), mm AS (
      |  SELECT source_a, source_b, bucket, max(max_rho) AS r FROM uu GROUP BY 1, 2, 3
      |)
      |SELECT source_a, source_b,
      |       cast(256 - count(*) AS bigint) AS zeros,
      |       cast(sum(1::BIGINT << (53 - r)) + (256 - count(*)) * (1::BIGINT << 53) AS bigint) AS sum_scaled
      |FROM mm GROUP BY 1, 2""".stripMargin

  /** Count-min counter cells — mirrors Sketch.countMin (md5 salted by
   * the row index). */
  private val cmsSql: String =
    """WITH t AS (
      |  SELECT source, unnest(string_split(lower(text), ' ')) AS term FROM documents
      |), r AS (
      |  SELECT source, rw,
      |         ('0x' || substr(md5(cast(rw AS varchar) || ':' || term), 1, 15))::BIGINT % 256 AS cl
      |  FROM t CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS rw) d
      |)
      |SELECT source, cast(rw AS bigint) AS hrow, cast(cl AS bigint) AS hcol, count(*) AS cnt
      |FROM r GROUP BY 1, 2, 3""".stripMargin

  /** SimHash signature per doc — mirrors Dedup.simhash exactly: 60-bit
   * md5-derived token hash (DuckDB `('0x'||hex)::BIGINT` ≡ Spark
   * `conv(hex,16,10)`), ±count votes per bit, sign vector packed. */
  private val simhashPrefix: String =
    """WITH tok AS (
      |  SELECT doc_id, tok, count(*) AS w FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) u GROUP BY 1, 2
      |), th AS (
      |  SELECT doc_id, w, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM tok
      |), bits AS (
      |  SELECT doc_id, bit, sum(CASE WHEN (h >> bit) & 1 = 1 THEN w ELSE -w END) AS v
      |  FROM th CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS bit) bb
      |  GROUP BY 1, 2
      |), sig AS (
      |  SELECT doc_id, cast(sum(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS bigint) AS simhash
      |  FROM bits GROUP BY doc_id
      |)""".stripMargin

  private val simhashSql: String = simhashPrefix + "\nSELECT doc_id, simhash FROM sig"

  /** The oracle is BRUTE-FORCE all-pairs Hamming — deliberately
   * stronger than the engine's blocked candidate generation: a green
   * row proves the maxDist+1-block pigeonhole scheme has recall 1. */
  private val simhashPairsSql: String = simhashPrefix +
    """
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |       cast(bit_count(xor(a.simhash, b.simhash)) AS bigint) AS dist
      |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.simhash, b.simhash)) <= 8""".stripMargin

  /** Mirrors Similarity.bucketed: quantized-integer hyperplane buckets
   * (order-independent → engine-portable) + per-bucket exact cosine. */
  private val lshPrefix: String =
    """WITH vv AS (
      |  SELECT vec_id, cast(unnest(embedding) AS double) AS x,
      |         generate_subscripts(embedding, 1) - 1 AS i
      |  FROM embeddings
      |), proj AS (
      |  SELECT vec_id, pl,
      |         sum(cast(round(x * 1000000) AS bigint) *
      |             (CASE WHEN ((i * 2654435761 + pl * 40503) % 1000003) % 2 = 0 THEN 1 ELSE -1 END)) AS p
      |  FROM vv CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS pl) pp
      |  GROUP BY 1, 2
      |), bk AS (
      |  SELECT vec_id, cast(sum(CASE WHEN p >= 0 THEN (1::BIGINT << pl) ELSE 0 END) AS bigint) AS bucket
      |  FROM proj GROUP BY vec_id
      |), norms AS (
      |  SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM vv GROUP BY 1
      |)""".stripMargin

  /** Per-bucket top-k ranking (deterministic (sim_e4 desc, nbr_id)). */
  private val annLshSql: String = lshPrefix +
    """, dots AS (
      |  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id, sum(va.x * vb.x) AS d
      |  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
      |  JOIN vv va ON va.vec_id = a.vec_id
      |  JOIN vv vb ON vb.vec_id = b.vec_id AND vb.i = va.i
      |  GROUP BY 1, 2
      |), sims AS (
      |  SELECT d.vec_id, d.nbr_id,
      |         cast(round(d.d / (na.nrm * nb.nrm) * 10000) AS bigint) AS sim_e4
      |  FROM dots d
      |  JOIN norms na ON na.vec_id = d.vec_id
      |  JOIN norms nb ON nb.vec_id = d.nbr_id
      |)
      |SELECT vec_id, nbr_id, sim_e4, cast(rank AS bigint) AS rank FROM (
      |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim_e4 DESC, nbr_id) AS rank
      |  FROM sims) r
      |WHERE rank <= 5""".stripMargin

  /** Multi-table LSH: `tables` independent `planes`-plane families
   * (the sign PRNG is seeded by the GLOBAL plane index pl, so table t
   * covers pl ∈ [t·planes, (t+1)·planes)); candidates collide in ANY
   * (tab, bucket), deduped before the exact kernel. */
  private def annLshMultiSql(planes: Int = 6, tables: Int = 2, k: Int = 5): String =
    s"""WITH vv AS (
       |  SELECT vec_id, cast(unnest(embedding) AS double) AS x,
       |         generate_subscripts(embedding, 1) - 1 AS i
       |  FROM embeddings
       |), proj AS (
       |  SELECT vec_id, pl,
       |         sum(cast(round(x * 1000000) AS bigint) *
       |             (CASE WHEN ((i * 2654435761 + pl * 40503) % 1000003) % 2 = 0 THEN 1 ELSE -1 END)) AS p
       |  FROM vv CROSS JOIN (SELECT unnest(generate_series(0, ${tables * planes - 1})) AS pl) pp
       |  GROUP BY 1, 2
       |), bk AS (
       |  SELECT vec_id, pl // $planes AS tab,
       |         cast(sum(CASE WHEN p >= 0 THEN (1::BIGINT << (pl % $planes)) ELSE 0 END) AS bigint) AS bucket
       |  FROM proj GROUP BY vec_id, pl // $planes
       |), norms AS (
       |  SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM vv GROUP BY 1
       |), cand AS (
       |  SELECT DISTINCT a.vec_id, b.vec_id AS nbr_id
       |  FROM bk a JOIN bk b ON a.tab = b.tab AND a.bucket = b.bucket AND a.vec_id <> b.vec_id
       |), dots AS (
       |  SELECT c.vec_id, c.nbr_id, sum(va.x * vb.x) AS d
       |  FROM cand c
       |  JOIN vv va ON va.vec_id = c.vec_id
       |  JOIN vv vb ON vb.vec_id = c.nbr_id AND vb.i = va.i
       |  GROUP BY 1, 2
       |), sims AS (
       |  SELECT d.vec_id, d.nbr_id,
       |         cast(round(d.d / (na.nrm * nb.nrm) * 10000) AS bigint) AS sim_e4
       |  FROM dots d
       |  JOIN norms na ON na.vec_id = d.vec_id
       |  JOIN norms nb ON nb.vec_id = d.nbr_id
       |)
       |SELECT vec_id, nbr_id, sim_e4, cast(rank AS bigint) AS rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim_e4 DESC, nbr_id) AS rank
       |  FROM sims) r
       |WHERE rank <= $k""".stripMargin

  /** Mirrors Similarity.ivfTopK exactly: integer-quantized vectors,
   * seeded centroids (nlist smallest vec_ids), `lloydIters` exact-
   * integer Lloyd iterations with empty-cluster fallback, nprobe-probed
   * inverted lists, per-list exact cosine top-k. Every quantizer step
   * is integer (or a floor of an exact double quotient ≪ 2^53), so the
   * replayed training is bit-identical to the Spark side. */
  private def annIvfSql(nlist: Int = 16, nprobe: Int = 2, k: Int = 5,
      lloydIters: Int = 2, maxQueries: Long = 500): String =
    ivfTrainCtes(nlist, lloydIters) +
      s""", lists AS (
         |  SELECT vec_id AS nbr_id, cid FROM rk WHERE rn = 1
         |), probes AS (
         |  SELECT vec_id, cid FROM rk WHERE rn <= $nprobe AND vec_id < $maxQueries
         |), dots AS (
         |  SELECT p.vec_id, l.nbr_id, sum(va.x * vb.x) AS d
         |  FROM probes p JOIN lists l ON l.cid = p.cid AND l.nbr_id <> p.vec_id
         |  JOIN vv va ON va.vec_id = p.vec_id
         |  JOIN vv vb ON vb.vec_id = l.nbr_id AND vb.i = va.i
         |  GROUP BY 1, 2
         |), sims AS (
         |  SELECT d.vec_id, d.nbr_id,
         |         cast(round(d.d / (na.nrm * nb.nrm) * 10000) AS bigint) AS sim_e4
         |  FROM dots d
         |  JOIN norms na ON na.vec_id = d.vec_id
         |  JOIN norms nb ON nb.vec_id = d.nbr_id
         |)
         |SELECT vec_id, nbr_id, sim_e4, cast(rank AS bigint) AS rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim_e4 DESC, nbr_id) AS rank
         |  FROM sims) r
         |WHERE rank <= $k""".stripMargin

  /** Mirrors Similarity.semDedup: same Lloyd training as q_ann_ivf,
   * then drop every vector with a smaller-id cluster-mate at
   * cosine ≥ thr. */
  private def semDedupSql(nlist: Int = 16, lloydIters: Int = 2, thr: Long = 3000): String =
    ivfTrainCtes(nlist, lloydIters) +
      s""", asg AS (
         |  SELECT vec_id, cid FROM rk WHERE rn = 1
         |), sdots AS (
         |  SELECT a.vec_id, b.vec_id AS nbr_id, sum(va.x * vb.x) AS d
         |  FROM asg a JOIN asg b ON b.cid = a.cid AND b.vec_id < a.vec_id
         |  JOIN vv va ON va.vec_id = a.vec_id
         |  JOIN vv vb ON vb.vec_id = b.vec_id AND vb.i = va.i
         |  GROUP BY 1, 2
         |), drops AS (
         |  SELECT DISTINCT d.vec_id
         |  FROM sdots d
         |  JOIN norms na ON na.vec_id = d.vec_id
         |  JOIN norms nb ON nb.vec_id = d.nbr_id
         |  WHERE cast(round(d.d / (na.nrm * nb.nrm) * 10000) AS bigint) >= $thr
         |)
         |SELECT vec_id, cast(cid AS bigint) AS cid FROM asg
         |WHERE vec_id NOT IN (SELECT vec_id FROM drops)""".stripMargin

  /** The exact-integer Lloyd training replay shared by q_ann_ivf and
   * q_semdedup: CTE chain ending in `rk(vec_id, cid, rn)` (rn ranked
   * by squared-L2, rn = 1 is the assignment), plus `vv`/`vq`/`norms`. */
  private def ivfTrainCtes(nlist: Int, lloydIters: Int): String = {
    val iters = (1 to lloydIters).map { t =>
      val prev = s"c${t - 1}"
      s"""dist$t AS (
         |  SELECT v.vec_id, c.cid, sum((v.q - c.q) * (v.q - c.q)) AS d2
         |  FROM vq v JOIN $prev c ON c.i = v.i GROUP BY 1, 2
         |), a$t AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |    FROM dist$t) z WHERE rn = 1
         |), m$t AS (
         |  SELECT a.cid, v.i, cast(floor(sum(v.q) * 1.0 / count(*)) AS bigint) AS q
         |  FROM a$t a JOIN vq v ON v.vec_id = a.vec_id GROUP BY 1, 2
         |), c$t AS (
         |  SELECT cid, i, q FROM m$t
         |  UNION ALL
         |  SELECT c.cid, c.i, c.q FROM $prev c
         |  WHERE c.cid NOT IN (SELECT DISTINCT cid FROM m$t)
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH vv AS (
       |  SELECT vec_id, cast(unnest(embedding) AS double) AS x,
       |         generate_subscripts(embedding, 1) - 1 AS i
       |  FROM embeddings
       |), vq AS (
       |  SELECT vec_id, i, cast(round(x * 1000000) AS bigint) AS q FROM vv
       |), norms AS (
       |  SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM vv GROUP BY 1
       |), seeds AS (
       |  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
       |  FROM (SELECT DISTINCT vec_id FROM vq ORDER BY vec_id LIMIT $nlist) s
       |), c0 AS (
       |  SELECT s.cid, v.i, v.q FROM seeds s JOIN vq v ON v.vec_id = s.vec_id
       |), $iters, distF AS (
       |  SELECT v.vec_id, c.cid, sum((v.q - c.q) * (v.q - c.q)) AS d2
       |  FROM vq v JOIN c$lloydIters c ON c.i = v.i GROUP BY 1, 2
       |), rk AS (
       |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
       |  FROM distF
       |)""".stripMargin
  }

  /** Mirrors Vocab.bm25TopDocs: rational-BM25 with per-term floors in
   * HUGEINT (engine: decimal(38,0)); the query = top-5 corpus-frequency
   * terms with df·4 ≤ N, ties by term. */
  private def bm25Ctes(pool: Int): String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
       |), tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
       |), dl AS (
       |  SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1
       |), st AS (
       |  SELECT (SELECT count(*) FROM documents) AS n, (SELECT count(*) FROM tok) AS tot
       |), q AS (
       |  SELECT term, df FROM (
       |    SELECT term, count(*) AS df, sum(tf) AS ctf FROM tf GROUP BY 1) d, st
       |  WHERE d.df * 4 <= st.n
       |  ORDER BY ctf DESC, term LIMIT 5
       |), sc AS (
       |  SELECT tf.doc_id,
       |         sum(cast((1000000::HUGEINT * (st.n - q.df + 1) * 44 * tf.tf * st.tot)
       |             // ((q.df + 1)::HUGEINT * (20::HUGEINT * st.tot * tf.tf + 6::HUGEINT * st.tot + 18::HUGEINT * dl.dl * st.n)) AS bigint)) AS score_e6
       |  FROM tf JOIN q USING (term) JOIN dl USING (doc_id), st
       |  GROUP BY 1
       |), lexr AS (
       |  SELECT doc_id, score_e6, rank FROM (
       |    SELECT doc_id, cast(score_e6 AS bigint) AS score_e6,
       |           cast(row_number() OVER (ORDER BY score_e6 DESC, doc_id) AS bigint) AS rank
       |    FROM sc) x
       |  WHERE rank <= $pool
       |)""".stripMargin

  private val bm25Sql: String =
    bm25Ctes(20) + "\nSELECT doc_id, score_e6, rank FROM lexr"

  /** Mirrors Similarity.hybridTopDocs: BM25 pool 50 + cosine pool 50
   * seeded at the lexical rank-1 document, RRF k = 60 in integers. */
  private val hybridSql: String =
    bm25Ctes(50) +
      """, vv AS (
        |  SELECT vec_id, cast(unnest(embedding) AS double) AS x,
        |         generate_subscripts(embedding, 1) AS i
        |  FROM embeddings
        |), norms AS (
        |  SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM vv GROUP BY 1
        |), seedv AS (
        |  SELECT i, x FROM vv WHERE vec_id = (SELECT doc_id FROM lexr WHERE rank = 1)
        |), seedn AS (
        |  SELECT nrm FROM norms WHERE vec_id = (SELECT doc_id FROM lexr WHERE rank = 1)
        |), sd AS (
        |  SELECT vv.vec_id, sum(vv.x * s.x) AS d FROM vv JOIN seedv s ON s.i = vv.i GROUP BY 1
        |), sims AS (
        |  SELECT sd.vec_id,
        |         cast(round(sd.d / (n1.nrm * (SELECT nrm FROM seedn)) * 10000) AS bigint) AS sim_e4
        |  FROM sd JOIN norms n1 ON n1.vec_id = sd.vec_id
        |), semr AS (
        |  SELECT doc_id, rank FROM (
        |    SELECT vec_id AS doc_id,
        |           cast(row_number() OVER (ORDER BY sim_e4 DESC, vec_id) AS bigint) AS rank
        |    FROM sims) x
        |  WHERE rank <= 50
        |), fused AS (
        |  SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
        |         cast(coalesce(l.rank, 0) AS bigint) AS lex_rank,
        |         cast(coalesce(s.rank, 0) AS bigint) AS sem_rank,
        |         cast(coalesce(1000000 // (60 + l.rank), 0)
        |              + coalesce(1000000 // (60 + s.rank), 0) AS bigint) AS rrf_e6
        |  FROM lexr l FULL OUTER JOIN semr s ON s.doc_id = l.doc_id
        |)
        |SELECT doc_id, lex_rank, sem_rank, rrf_e6, rank FROM (
        |  SELECT *, cast(row_number() OVER (ORDER BY rrf_e6 DESC, doc_id) AS bigint) AS rank
        |  FROM fused) x
        |WHERE rank <= 20""".stripMargin

  /** Mirrors Similarity.pqCodes: per-subspace slice of the quantized
   * vectors, then the identical Lloyd replay as ivfTrainCtes (same
   * seeds, floor-div means, empty-cluster carry, (d2, cid) ties). */
  /** Shared PQ training CTE chain (per-subspace Lloyd → final
   * assignment ranks rk$s) — body of [[pqSql]], reused by the ADC
   * oracle. */
  private def pqCtes(m: Int, k: Int, lloydIters: Int, dim: Int): String = {
    val sub = dim / m
    val perSub = (0 until m).map { s =>
      val lo = s * sub
      val iters = (1 to lloydIters).map { t =>
        val prev = s"c${s}_${t - 1}"
        s""", dist${s}_$t AS (
           |  SELECT v.vec_id, c.cid, sum((v.q - c.q) * (v.q - c.q)) AS d2
           |  FROM vq$s v JOIN $prev c ON c.i = v.i GROUP BY 1, 2
           |), a${s}_$t AS (
           |  SELECT vec_id, cid FROM (
           |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
           |    FROM dist${s}_$t) z WHERE rn = 1
           |), m${s}_$t AS (
           |  SELECT a.cid, v.i, cast(floor(sum(v.q) * 1.0 / count(*)) AS bigint) AS q
           |  FROM a${s}_$t a JOIN vq$s v ON v.vec_id = a.vec_id GROUP BY 1, 2
           |), c${s}_$t AS (
           |  SELECT cid, i, q FROM m${s}_$t
           |  UNION ALL
           |  SELECT c.cid, c.i, c.q FROM $prev c
           |  WHERE c.cid NOT IN (SELECT DISTINCT cid FROM m${s}_$t)
           |)""".stripMargin
      }.mkString
      s""", vq$s AS (
         |  SELECT vec_id, i - $lo AS i, q FROM vq WHERE i >= $lo AND i < ${lo + sub}
         |), c${s}_0 AS (
         |  SELECT s.cid, v.i, v.q FROM seeds s JOIN vq$s v ON v.vec_id = s.vec_id
         |)""".stripMargin + iters +
        s""", distF$s AS (
           |  SELECT v.vec_id, c.cid, sum((v.q - c.q) * (v.q - c.q)) AS d2
           |  FROM vq$s v JOIN c${s}_$lloydIters c ON c.i = v.i GROUP BY 1, 2
           |), rk$s AS (
           |  SELECT vec_id, cid, d2,
           |         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
           |  FROM distF$s
           |)""".stripMargin
    }.mkString
    s"""WITH vv AS (
       |  SELECT vec_id, cast(unnest(embedding) AS double) AS x,
       |         generate_subscripts(embedding, 1) - 1 AS i
       |  FROM embeddings
       |), vq AS (
       |  SELECT vec_id, i, cast(round(x * 1000000) AS bigint) AS q FROM vv
       |), seeds AS (
       |  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
       |  FROM (SELECT DISTINCT vec_id FROM vq ORDER BY vec_id LIMIT $k) s
       |)""".stripMargin + perSub
  }

  private def pqSql(m: Int = 4, k: Int = 8, lloydIters: Int = 2, dim: Int = 64): String = {
    val finals = (0 until m).map { s =>
      s"SELECT vec_id, cast($s AS bigint) AS sub, cast(cid AS bigint) AS code, cast(d2 AS bigint) AS d2 FROM rk$s WHERE rn = 1"
    }.mkString("\nUNION ALL\n")
    pqCtes(m, k, lloydIters, dim) + "\n" + finals
  }

  /** ADC replay: codes from the shared PQ chain, per-query m×k LUT of
   * exact squared subvector-to-codeword distances, score = Σ lookups,
   * top-10 per query (mirrors Similarity.pqAdcTopK). */
  private def pqAdcSql(
      m: Int = 4, k: Int = 8, lloydIters: Int = 2, dim: Int = 64,
      nQueries: Int = 5, topK: Int = 10): String = {
    val sub = dim / m
    val codes = (0 until m).map { s =>
      s"SELECT vec_id, cast($s AS bigint) AS sub, cast(cid AS bigint) AS code FROM rk$s WHERE rn = 1"
    }.mkString("\n  UNION ALL\n  ")
    val lut = (0 until m).map { s =>
      s"""SELECT q.vec_id AS qid, cast($s AS bigint) AS sub,
         |         cast(c.cid AS bigint) AS code,
         |         sum((v.q - c.q) * (v.q - c.q)) AS pd2
         |  FROM qs q JOIN vq$s v ON v.vec_id = q.vec_id
         |  JOIN c${s}_$lloydIters c ON c.i = v.i
         |  GROUP BY 1, 2, 3""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    pqCtes(m, k, lloydIters, dim) +
      s""", codes AS MATERIALIZED (
         |  $codes
         |), qs AS MATERIALIZED (
         |  SELECT DISTINCT vec_id FROM vq ORDER BY vec_id LIMIT $nQueries
         |), lut AS MATERIALIZED (
         |  $lut
         |), est AS MATERIALIZED (
         |  SELECT l.qid, cd.vec_id, sum(l.pd2) AS est_d2
         |  FROM codes cd JOIN lut l ON l.sub = cd.sub AND l.code = cd.code
         |  GROUP BY 1, 2
         |)
         |SELECT qid, vec_id, cast(est_d2 AS bigint) AS est_d2,
         |       cast(rank AS bigint) AS rank
         |FROM (SELECT qid, vec_id, est_d2,
         |             row_number() OVER (PARTITION BY qid ORDER BY est_d2, vec_id) AS rank
         |      FROM est) x
         |WHERE rank <= $topK""".stripMargin
  }

  /** Mirrors Similarity.cosineDupPairs at threshold 0.30 (q_embed_dedup). */
  /** Mirrors TextStats.sourceDivergence: shared-vocab cross-multiplied
   * TV core + one-sided mass closing terms, HUGEINT throughout. */
  private val sourceTvSql: String =
    """WITH cw AS (
      |  SELECT source, unnest(string_split(lower(text), ' ')) AS w FROM documents
      |), cnt AS (
      |  SELECT source, w, count(*) AS n FROM cw GROUP BY 1, 2
      |), tot AS (
      |  SELECT source, sum(n) AS nt FROM cnt GROUP BY 1
      |), c2 AS (
      |  SELECT cnt.source, cnt.w, cnt.n, tot.nt FROM cnt JOIN tot USING (source)
      |), agg AS (
      |  SELECT a.source AS source_a, b.source AS source_b, a.nt AS na, b.nt AS nb,
      |         sum(abs(cast(a.n AS hugeint) * b.nt - cast(b.n AS hugeint) * a.nt)) AS sh,
      |         sum(a.n) AS ma, sum(b.n) AS mb, count(*) AS n_shared
      |  FROM c2 a JOIN c2 b ON b.w = a.w AND a.source < b.source
      |  GROUP BY 1, 2, 3, 4
      |)
      |SELECT source_a, source_b, n_shared,
      |       cast((1000000 * (sh + cast(na - ma AS hugeint) * nb
      |              + cast(nb - mb AS hugeint) * na))
      |            // (2 * cast(na AS hugeint) * nb) AS bigint) AS tv_e6
      |FROM agg""".stripMargin

  /** Mirrors Similarity.evalContamination: eval = vec_id ≡ 0 (mod 97),
   * max cosine per train vector, flag at sim_e4 ≥ 3000. */
  private val decontamEmbSql: String =
    """WITH vv AS (
      |  SELECT vec_id, cast(unnest(embedding) AS double) AS x,
      |         generate_subscripts(embedding, 1) - 1 AS i
      |  FROM embeddings
      |), norms AS (
      |  SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM vv GROUP BY 1
      |), ev AS (SELECT vec_id FROM embeddings WHERE vec_id % 97 = 0
      |), tr AS (SELECT vec_id FROM embeddings WHERE vec_id % 97 <> 0
      |), dots AS (
      |  SELECT t.vec_id AS vec_id, e.vec_id AS eval_id, sum(va.x * vb.x) AS d
      |  FROM tr t CROSS JOIN ev e
      |  JOIN vv va ON va.vec_id = t.vec_id
      |  JOIN vv vb ON vb.vec_id = e.vec_id AND vb.i = va.i
      |  GROUP BY 1, 2
      |), sims AS (
      |  SELECT d.vec_id, cast(round(d.d / (na.nrm * nb.nrm) * 10000) AS bigint) AS s
      |  FROM dots d
      |  JOIN norms na ON na.vec_id = d.vec_id
      |  JOIN norms nb ON nb.vec_id = d.eval_id
      |)
      |SELECT vec_id, max(s) AS max_sim_e4,
      |       cast(max(s) >= 3000 AS bigint) AS contaminated
      |FROM sims GROUP BY 1""".stripMargin

  private val embedDedupSql: String = lshPrefix +
    """, dots AS (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, sum(va.x * vb.x) AS d
      |  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      |  JOIN vv va ON va.vec_id = a.vec_id
      |  JOIN vv vb ON vb.vec_id = b.vec_id AND vb.i = va.i
      |  GROUP BY 1, 2
      |)
      |SELECT d.vec_a, d.vec_b,
      |       cast(round(d.d / (na.nrm * nb.nrm) * 10000) AS bigint) AS sim_e4
      |FROM dots d
      |JOIN norms na ON na.vec_id = d.vec_a
      |JOIN norms nb ON nb.vec_id = d.vec_b
      |WHERE round(d.d / (na.nrm * nb.nrm) * 10000) >= 3000""".stripMargin

  /** Mirrors Dedup.dupSpans: non-overlapping 5-token blocks, global
   * distinct-doc counts, integer-exact duplicated ratio. DuckDB list
   * slice a[x:y] is 1-based end-inclusive ↔ Spark slice(a, x, 5). */
  private val dupSpansSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS a FROM documents
      |), ix AS (
      |  SELECT doc_id, a, unnest(generate_series(1, (len(a) + 4) // 5)) AS i FROM t
      |), b AS (
      |  SELECT doc_id, array_to_string(a[(i-1)*5+1:i*5], ' ') AS blk FROM ix
      |), c AS (
      |  SELECT blk, count(DISTINCT doc_id) AS nd FROM b GROUP BY 1
      |), p AS (
      |  SELECT b.doc_id, count(*) AS n_spans,
      |         sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS dup_spans
      |  FROM b JOIN c USING (blk) GROUP BY 1
      |)
      |SELECT doc_id, cast(n_spans AS bigint) AS n_spans,
      |       cast(dup_spans AS bigint) AS dup_spans,
      |       cast(10000 * dup_spans // n_spans AS bigint) AS dup_ratio_e4
      |FROM p""".stripMargin

  /** Mirrors TextStats.rarity: per-occurrence floor(10⁶/corpus-tf),
   * integer sums and means. */
  private val raritySql: String =
    """WITH t AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
      |), tf AS (
      |  SELECT term, count(*) AS tf FROM t GROUP BY 1
      |), p AS (
      |  SELECT t.doc_id, count(*) AS n_tokens, sum(1000000 // tf.tf) AS rsum
      |  FROM t JOIN tf USING (term) GROUP BY 1
      |)
      |SELECT doc_id, cast(n_tokens AS bigint) AS n_tokens,
      |       cast(rsum AS bigint) AS rarity_sum_e6,
      |       cast(rsum // n_tokens AS bigint) AS rarity_mean_e6
      |FROM p""".stripMargin

  /** Mirrors TextStats.lmScore: corpus-trained conditional trigram
   * p(w3|w1w2) as ⌊10⁶·C₃/C₂⌋ per gram; C₂ summed over the same gram
   * rows so the model is a true conditional. Docs with < 3 tokens
   * keep an all-zero row (LEFT JOIN). */
  private val lmScoreSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w1,
      |         generate_subscripts(string_split(lower(text), ' '), 1) AS pos
      |  FROM documents
      |), g AS (
      |  SELECT doc_id, w1,
      |         lead(w1, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
      |         lead(w1, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w3
      |  FROM tok
      |), t AS (
      |  SELECT * FROM g WHERE w3 IS NOT NULL
      |), c3 AS (
      |  SELECT w1, w2, w3, count(*) AS n3 FROM t GROUP BY 1, 2, 3
      |), c2 AS (
      |  SELECT w1, w2, sum(n3) AS n2 FROM c3 GROUP BY 1, 2
      |), s AS (
      |  SELECT t.doc_id, (1000000 * c3.n3) // c2.n2 AS p6
      |  FROM t JOIN c3 USING (w1, w2, w3) JOIN c2 USING (w1, w2)
      |), agg AS (
      |  SELECT doc_id, count(*) AS n_grams, sum(p6) AS lm_sum_e6 FROM s GROUP BY 1
      |)
      |SELECT d.doc_id,
      |       cast(coalesce(a.n_grams, 0) AS bigint) AS n_grams,
      |       cast(coalesce(a.lm_sum_e6, 0) AS bigint) AS lm_sum_e6,
      |       cast(CASE WHEN a.n_grams IS NULL OR a.n_grams = 0 THEN 0
      |                 ELSE a.lm_sum_e6 // a.n_grams END AS bigint) AS lm_mean_e6
      |FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id""".stripMargin

  /** Mirrors Similarity.dbscan (threshold 3300, minPts 3): quadratic
   * cosine pairs, degree-gated cores, HashMin CC over the core-core
   * subgraph (plateau-to-cap recursion — every core re-emits each
   * step, so `it = CAP` is the fixpoint), min-cluster border attach.
   * Cap 30 ≫ the core-graph diameter at this density. */
  /** `planes = 0`: exact all-pairs neighbor graph (the engine's
   * default mode). `planes > 0`: the LSH-bucketed SCALE mode — the
   * pair generator becomes the same-bucket join over the
   * quantized-integer hyperplane buckets (q_ann_lsh formula, bucket
   * cap mirrored); everything downstream identical. */
  private def dbscanSql(cap: Int = 30, planes: Int = 0, maxBucket: Long = 10000L): String = {
    val bucketCtes = if (planes == 0) "" else
      s"""proj AS MATERIALIZED (
         |  SELECT vec_id, pl,
         |         sum(cast(round(x * 1000000) AS bigint) *
         |             (CASE WHEN (((i - 1) * 2654435761 + pl * 40503) % 1000003) % 2 = 0 THEN 1 ELSE -1 END)) AS p
         |  FROM v CROSS JOIN (SELECT unnest(generate_series(0, ${planes - 1})) AS pl) pp
         |  GROUP BY 1, 2
         |), bk0 AS MATERIALIZED (
         |  SELECT vec_id,
         |         cast(sum(CASE WHEN p >= 0 THEN (1::BIGINT << pl) ELSE 0 END) AS bigint) AS bucket
         |  FROM proj GROUP BY vec_id
         |), bok AS MATERIALIZED (
         |  SELECT bucket FROM bk0 GROUP BY 1 HAVING count(*) <= $maxBucket
         |), bk AS MATERIALIZED (
         |  SELECT b.vec_id, b.bucket FROM bk0 b JOIN bok o ON o.bucket = b.bucket
         |), """.stripMargin
    val candJoin =
      if (planes == 0)
        """SELECT a.vec_id AS a, b.vec_id AS b, sum(a.x*b.x) AS d
          |      FROM v a JOIN v b ON a.i = b.i AND a.vec_id < b.vec_id
          |      GROUP BY 1, 2""".stripMargin
      else
        """SELECT ba.vec_id AS a, bb.vec_id AS b, sum(a.x*b.x) AS d
          |      FROM bk ba JOIN bk bb ON ba.bucket = bb.bucket AND ba.vec_id < bb.vec_id
          |      JOIN v a ON a.vec_id = ba.vec_id
          |      JOIN v b ON b.vec_id = bb.vec_id AND b.i = a.i
          |      GROUP BY 1, 2""".stripMargin
    s"""WITH RECURSIVE v AS MATERIALIZED (
       |  SELECT vec_id, cast(unnest(embedding) AS double) AS x,
       |         generate_subscripts(embedding, 1) AS i
       |  FROM embeddings
       |), ${bucketCtes}norms AS MATERIALIZED (
       |  SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM v GROUP BY 1
       |), pairs AS MATERIALIZED (
       |  SELECT a, b FROM (
       |    SELECT d.a, d.b,
       |           cast(round(d.d / (na.nrm * nb.nrm) * 10000) AS bigint) AS sim_e4
       |    FROM (
       |      $candJoin) d
       |    JOIN norms na ON na.vec_id = d.a
       |    JOIN norms nb ON nb.vec_id = d.b) s
       |  WHERE sim_e4 >= 3300
       |), deg AS MATERIALIZED (
       |  SELECT vec_id, count(*) AS n_nbrs FROM (
       |    SELECT a AS vec_id FROM pairs UNION ALL SELECT b FROM pairs) u
       |  GROUP BY 1
       |), cores AS MATERIALIZED (
       |  SELECT vec_id FROM deg WHERE n_nbrs >= 3
       |), ce AS MATERIALIZED (
       |  SELECT p.a AS u, p.b AS w FROM pairs p
       |  JOIN cores ca ON ca.vec_id = p.a JOIN cores cb ON cb.vec_id = p.b
       |  UNION ALL
       |  SELECT p.b, p.a FROM pairs p
       |  JOIN cores ca ON ca.vec_id = p.a JOIN cores cb ON cb.vec_id = p.b
       |), r(it, id, lbl) AS (
       |  SELECT 0, vec_id, vec_id FROM cores
       |  UNION ALL
       |  SELECT r.it + 1, r.id, least(r.lbl, coalesce(min(r2.lbl), r.lbl))
       |  FROM r
       |  LEFT JOIN ce ON ce.u = r.id
       |  LEFT JOIN r r2 ON r2.id = ce.w
       |  WHERE r.it < $cap
       |  GROUP BY r.it, r.id, r.lbl
       |), fin AS (
       |  SELECT id AS vec_id, lbl AS cluster FROM r WHERE it = $cap
       |), border AS (
       |  SELECT vec_id, min(cluster) AS cluster FROM (
       |    SELECT p.b AS vec_id, f.cluster FROM pairs p JOIN fin f ON f.vec_id = p.a
       |    UNION ALL
       |    SELECT p.a, f.cluster FROM pairs p JOIN fin f ON f.vec_id = p.b) u
       |  WHERE vec_id NOT IN (SELECT vec_id FROM cores)
       |  GROUP BY 1
       |)
       |SELECT e.vec_id,
       |       cast(coalesce(f.cluster, b.cluster, -1) AS bigint) AS cluster,
       |       CASE WHEN f.vec_id IS NOT NULL THEN 'core'
       |            WHEN b.vec_id IS NOT NULL THEN 'border'
       |            ELSE 'noise' END AS role,
       |       cast(coalesce(deg.n_nbrs, 0) AS bigint) AS n_nbrs
       |FROM embeddings e
       |LEFT JOIN fin f ON f.vec_id = e.vec_id
       |LEFT JOIN border b ON b.vec_id = e.vec_id
       |LEFT JOIN deg ON deg.vec_id = e.vec_id""".stripMargin
  }

  /** Mirrors Dedup.sourceOverlap: distinct (source, 3-gram shingle),
   * pairwise shared counts, containment vs the smaller side. */
  private val sourceOverlapSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
      |         generate_subscripts(string_split(text, ' '), 1) AS pos
      |  FROM documents
      |), g AS (
      |  SELECT doc_id, concat_ws(' ', tok, t1, t2) AS shingle FROM (
      |    SELECT doc_id, tok,
      |           lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1,
      |           lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
      |    FROM tok) x WHERE t2 IS NOT NULL
      |), sg AS MATERIALIZED (
      |  SELECT DISTINCT d.source, g.shingle FROM g JOIN documents d USING (doc_id)
      |), tot AS (
      |  SELECT source, count(*) AS n FROM sg GROUP BY 1
      |), sh AS (
      |  SELECT a.source AS sa, b.source AS sb, count(*) AS n_shared
      |  FROM sg a JOIN sg b ON a.shingle = b.shingle AND a.source < b.source
      |  GROUP BY 1, 2
      |)
      |SELECT sa AS source_a, sb AS source_b,
      |       cast(n_shared AS bigint) AS n_shared,
      |       cast(ta.n AS bigint) AS n_a, cast(tb.n AS bigint) AS n_b,
      |       cast((10000 * n_shared) // least(ta.n, tb.n) AS bigint) AS containment_e4
      |FROM sh JOIN tot ta ON ta.source = sa JOIN tot tb ON tb.source = sb""".stripMargin

  /** Mirrors Similarity.knnClusters (k=5): uncapped quadratic top-k,
   * mutual-pair filter, HashMin plateau-to-cap CC over the mutual
   * edges (identity id space: label = min vec_id, exactly the
   * engine's HashMin fixpoint). Singletons fall out of the
   * all-vectors base. */
  private def knnClustersSql(cap: Int = 60): String =
    s"""WITH RECURSIVE v AS MATERIALIZED (
       |  SELECT vec_id, cast(unnest(embedding) AS double) AS x,
       |         generate_subscripts(embedding, 1) AS i
       |  FROM embeddings
       |), norms AS MATERIALIZED (
       |  SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM v GROUP BY 1
       |), sims AS MATERIALIZED (
       |  SELECT d.a AS vec_id, d.b AS nbr_id,
       |         cast(round(d.d / (na.nrm * nb.nrm) * 10000) AS bigint) AS sim_e4
       |  FROM (
       |    SELECT a.vec_id AS a, b.vec_id AS b, sum(a.x*b.x) AS d
       |    FROM v a JOIN v b ON a.i = b.i AND a.vec_id <> b.vec_id
       |    GROUP BY 1, 2) d
       |  JOIN norms na ON na.vec_id = d.a
       |  JOIN norms nb ON nb.vec_id = d.b
       |), knn AS MATERIALIZED (
       |  SELECT vec_id, nbr_id FROM (
       |    SELECT vec_id, nbr_id,
       |           row_number() OVER (PARTITION BY vec_id
       |                              ORDER BY sim_e4 DESC, nbr_id) AS rank
       |    FROM sims) x WHERE rank <= 5
       |), mu AS MATERIALIZED (
       |  SELECT k1.vec_id AS u, k1.nbr_id AS w FROM knn k1
       |  JOIN knn k2 ON k2.vec_id = k1.nbr_id AND k2.nbr_id = k1.vec_id
       |), r(it, id, lbl) AS (
       |  SELECT 0, vec_id, vec_id FROM embeddings
       |  UNION ALL
       |  SELECT r.it + 1, r.id, least(r.lbl, coalesce(min(r2.lbl), r.lbl))
       |  FROM r LEFT JOIN mu ON mu.u = r.id LEFT JOIN r r2 ON r2.id = mu.w
       |  WHERE r.it < $cap GROUP BY r.it, r.id, r.lbl
       |)
       |SELECT id AS vec_id, cast(lbl AS bigint) AS cluster
       |FROM r WHERE it = $cap""".stripMargin

  /** Mirror of Similarity.knnClusters(planes = 6) — the LSH-bucketed
   * SCALE mode as an oracle-checked row: the knnClustersSql kernel
   * with the quadratic all-pairs candidate generator swapped for the
   * same-bucket join (quantized-integer hyperplane signs, exactly the
   * q_ann_lsh formula; engine i is 0-based hence the (i - 1)), and
   * the engine's bucket-size cap mirrored as a HAVING. Vectors whose
   * bucket is dropped (or that are mutual-kNN isolated) label
   * themselves — same as the engine's identity-id HashMin. */
  private def knnScaleSql(
      planes: Int = 6, k: Int = 5, maxBucket: Long = 10000L, cap: Int = 60): String =
    s"""WITH RECURSIVE v AS MATERIALIZED (
       |  SELECT vec_id, cast(unnest(embedding) AS double) AS x,
       |         generate_subscripts(embedding, 1) AS i
       |  FROM embeddings
       |), proj AS MATERIALIZED (
       |  SELECT vec_id, pl,
       |         sum(cast(round(x * 1000000) AS bigint) *
       |             (CASE WHEN (((i - 1) * 2654435761 + pl * 40503) % 1000003) % 2 = 0 THEN 1 ELSE -1 END)) AS p
       |  FROM v CROSS JOIN (SELECT unnest(generate_series(0, ${planes - 1})) AS pl) pp
       |  GROUP BY 1, 2
       |), bk0 AS MATERIALIZED (
       |  SELECT vec_id,
       |         cast(sum(CASE WHEN p >= 0 THEN (1::BIGINT << pl) ELSE 0 END) AS bigint) AS bucket
       |  FROM proj GROUP BY vec_id
       |), bok AS MATERIALIZED (
       |  SELECT bucket FROM bk0 GROUP BY 1 HAVING count(*) <= $maxBucket
       |), bk AS MATERIALIZED (
       |  SELECT b.vec_id, b.bucket FROM bk0 b JOIN bok o ON o.bucket = b.bucket
       |), norms AS MATERIALIZED (
       |  SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM v GROUP BY 1
       |), sims AS MATERIALIZED (
       |  SELECT d.a AS vec_id, d.b AS nbr_id,
       |         cast(round(d.d / (na.nrm * nb.nrm) * 10000) AS bigint) AS sim_e4
       |  FROM (
       |    SELECT ba.vec_id AS a, bb.vec_id AS b, sum(va.x * vb.x) AS d
       |    FROM bk ba JOIN bk bb ON ba.bucket = bb.bucket AND ba.vec_id <> bb.vec_id
       |    JOIN v va ON va.vec_id = ba.vec_id
       |    JOIN v vb ON vb.vec_id = bb.vec_id AND vb.i = va.i
       |    GROUP BY 1, 2) d
       |  JOIN norms na ON na.vec_id = d.a
       |  JOIN norms nb ON nb.vec_id = d.b
       |), knn AS MATERIALIZED (
       |  SELECT vec_id, nbr_id FROM (
       |    SELECT vec_id, nbr_id,
       |           row_number() OVER (PARTITION BY vec_id
       |                              ORDER BY sim_e4 DESC, nbr_id) AS rank
       |    FROM sims) x WHERE rank <= $k
       |), mu AS MATERIALIZED (
       |  SELECT k1.vec_id AS u, k1.nbr_id AS w FROM knn k1
       |  JOIN knn k2 ON k2.vec_id = k1.nbr_id AND k2.nbr_id = k1.vec_id
       |), r(it, id, lbl) AS (
       |  SELECT 0, vec_id, vec_id FROM embeddings
       |  UNION ALL
       |  SELECT r.it + 1, r.id, least(r.lbl, coalesce(min(r2.lbl), r.lbl))
       |  FROM r LEFT JOIN mu ON mu.u = r.id LEFT JOIN r r2 ON r2.id = mu.w
       |  WHERE r.it < $cap GROUP BY r.it, r.id, r.lbl
       |)
       |SELECT id AS vec_id, cast(lbl AS bigint) AS cluster
       |FROM r WHERE it = $cap""".stripMargin

  /** ZGL label-spreading replay: the knnClusters kernel CTEs (cosine
   * kNN → mutual edges) + 3 unrolled floored-average rounds with the
   * seed set clamped; argmax (mass desc, label asc) export. */
  private val labelSpreadSql: String = {
    val round = (r: Int) =>
      s""", p$r AS MATERIALIZED (
         |  SELECT x.id, x.l, x.s // dgm.deg AS m
         |  FROM (
         |    SELECT mu.u AS id, s.l, sum(s.m) AS s
         |    FROM mu JOIN s${r - 1} s ON s.id = mu.w GROUP BY 1, 2) x
         |  JOIN dgm ON dgm.u = x.id
         |  WHERE x.s // dgm.deg > 0
         |), s$r AS MATERIALIZED (
         |  SELECT * FROM s0
         |  UNION ALL
         |  SELECT p.id, p.l, p.m FROM p$r p
         |  WHERE p.id NOT IN (SELECT id FROM s0)
         |)""".stripMargin
    """WITH v AS MATERIALIZED (
      |  SELECT vec_id, cast(unnest(embedding) AS double) AS x,
      |         generate_subscripts(embedding, 1) AS i
      |  FROM embeddings
      |), norms AS MATERIALIZED (
      |  SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM v GROUP BY 1
      |), sims AS MATERIALIZED (
      |  SELECT d.a AS vec_id, d.b AS nbr_id,
      |         cast(round(d.d / (na.nrm * nb.nrm) * 10000) AS bigint) AS sim_e4
      |  FROM (
      |    SELECT a.vec_id AS a, b.vec_id AS b, sum(a.x*b.x) AS d
      |    FROM v a JOIN v b ON a.i = b.i AND a.vec_id <> b.vec_id
      |    GROUP BY 1, 2) d
      |  JOIN norms na ON na.vec_id = d.a
      |  JOIN norms nb ON nb.vec_id = d.b
      |), knn AS MATERIALIZED (
      |  SELECT vec_id, nbr_id FROM (
      |    SELECT vec_id, nbr_id,
      |           row_number() OVER (PARTITION BY vec_id
      |                              ORDER BY sim_e4 DESC, nbr_id) AS rank
      |    FROM sims) x WHERE rank <= 5
      |), mu AS MATERIALIZED (
      |  SELECT k1.vec_id AS u, k1.nbr_id AS w FROM knn k1
      |  JOIN knn k2 ON k2.vec_id = k1.nbr_id AND k2.nbr_id = k1.vec_id
      |), dgm AS MATERIALIZED (SELECT u, count(*) AS deg FROM mu GROUP BY 1
      |), s0 AS MATERIALIZED (
      |  SELECT vec_id AS id, cast(label AS bigint) AS l,
      |         cast(1000000 AS bigint) AS m
      |  FROM embeddings WHERE vec_id % 5 = 0)""".stripMargin +
      (1 to 3).map(round).mkString +
      """
        |SELECT id AS vec_id, cast(l AS bigint) AS pred_label, cast(m AS bigint) AS mass
        |FROM (SELECT id, l, m,
        |             row_number() OVER (PARTITION BY id ORDER BY m DESC, l) AS rn
        |      FROM s3) x
        |WHERE rn = 1""".stripMargin
  }

  /** Mirrors Dedup.containmentPairs: the minhash band candidates'
   * exact intersections, kept when either direction's containment
   * ≥ 0.5 (integer-exact threshold), exports 10⁴·i // sz. */
  private val containmentSql: String = docPrefix + minhashBody(mat = false) +
    """
      |SELECT i.doc_a, i.doc_b,
      |       cast(10000 * i.i // sa.sz AS bigint) AS cont_a_e4,
      |       cast(10000 * i.i // sb.sz AS bigint) AS cont_b_e4
      |FROM inter i
      |JOIN szs sa ON sa.doc_id = i.doc_a
      |JOIN szs sb ON sb.doc_id = i.doc_b
      |WHERE 10000 * i.i >= 5000 * sa.sz OR 10000 * i.i >= 5000 * sb.sz""".stripMargin

  /** Mirrors Multimodal.mediaTable + decode (md5-segment fake codec)
   * + the constant feature dim. */
  private val mediaSql: String =
    """SELECT doc_id AS media_id,
      |       (ARRAY['image','audio','video'])[(doc_id % 3) + 1] AS kind,
      |       cast(length(text) AS bigint) AS nbytes,
      |       CASE WHEN doc_id % 3 = 0 THEN ('0x'||substr(md5(text),1,10))::BIGINT % 1280 + 32 END AS width,
      |       CASE WHEN doc_id % 3 = 0 THEN ('0x'||substr(md5(text),11,10))::BIGINT % 720 + 32 END AS height,
      |       CASE WHEN doc_id % 3 <> 0 THEN cast(('0x'||substr(md5(text),21,10))::BIGINT % 300 + 1 AS double) END AS duration_s,
      |       cast(16 AS bigint) AS feature_dim
      |FROM documents""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_simhash" -> simhashSql,
    "q_simhash_pairs" -> simhashPairsSql,
    "q_ann_lsh" -> annLshSql,
    "q_ann_lsh_multi" -> annLshMultiSql(),
    "q_ann_ivf" -> annIvfSql(),
    "q_embed_dedup" -> embedDedupSql,
    "q_decontam_emb" -> decontamEmbSql,
    "q_source_tv" -> sourceTvSql,
    "q_media" -> mediaSql,
    "q_dedup_exact" ->
      """SELECT md5(text) AS text_md5, count(*) AS n_copies, min(doc_id) AS keeper_id
        |FROM documents GROUP BY 1""".stripMargin,
    "q_stream_dedup" ->
      """SELECT min(doc_id) AS doc_id, md5(text) AS text_md5
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "q_minhash" -> minhashSql,
    "q_segdedup" -> segDedupSql,
    "q_bpe" -> bpeSql,
    "q_bpe_census" -> bpeCensusSql,
    "q_bpe_doclen" -> bpeDocLenSql,
    "q_dedup_clusters" -> dedupClustersSql,
    "q_split" -> splitSql,
    "q_dup_rate" -> dupRateSql,
    "q_readability" -> readabilitySql,
    "q_profile" -> profileSql,
    "q_mojibake" -> mojibakeSql,
    "q_emb_norms" -> embNormsSql,
    "q_sq8" -> sq8Sql,
    "q_pca" -> pcaSql,
    "q_decontam" -> decontamSql,
    "q_sample" -> sampleSql,
    "q_mix_temp" -> mixTempSql,
    "q_pack" -> packSql,
    "q_ngram_jaccard" -> ngramJaccardSql,
    "q_allpairs" -> allPairsSql,
    "q_lsh_recall" -> lshRecallSql,
    "q_ann_cosine" -> annCosineSql,
    "q_hardneg" -> hardNegSql,
    "q_outlier_emb" -> outlierEmbSql,
    "q_label_agree" -> labelAgreeSql,
    "q_langid" -> langidSql,
    "q_langid_margin" -> langidMarginSql,
    "q_quality" -> qualitySql,
    "q_tokens" -> tokensSql,
    "q_fingerprint" -> fingerprintSql,
    "q_winnow" -> winnowSql,
    "q_repetition" -> repetitionSql,
    "q_vocab" -> vocabSql,
    "q_zipf" -> zipfSql,
    "q_rake" -> {
      val stops = graft.pipeline.TextStats.rakeStopwords
        .map(s => s"'$s'").mkString(", ")
      s"""WITH t AS (
         |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w,
         |         generate_subscripts(string_split(lower(text), ' '), 1) AS pos
         |  FROM documents
         |), s AS (
         |  SELECT doc_id, pos, w, (w IN ($stops) OR w = '') AS stop FROM t
         |), p AS (
         |  SELECT doc_id, pos, w, stop,
         |         sum(CASE WHEN stop THEN 1 ELSE 0 END)
         |           OVER (PARTITION BY doc_id ORDER BY pos) AS pid
         |  FROM s
         |), ph AS (
         |  SELECT doc_id, pid, w FROM p WHERE NOT stop
         |), pl AS (
         |  SELECT doc_id, pid, count(*) AS len FROM ph GROUP BY 1, 2
         |), sc AS (
         |  SELECT ph.doc_id, ph.w, count(*) AS freq, sum(pl.len) AS degsum
         |  FROM ph JOIN pl ON pl.doc_id = ph.doc_id AND pl.pid = ph.pid
         |  GROUP BY 1, 2
         |)
         |SELECT doc_id, w AS keyword, cast(freq AS bigint) AS freq,
         |       cast(degsum * 10000 // freq AS bigint) AS rake_e4,
         |       cast(rank AS bigint) AS rank
         |FROM (SELECT doc_id, w, freq, degsum,
         |             row_number() OVER (PARTITION BY doc_id
         |               ORDER BY degsum * 10000 // freq DESC, w) AS rank
         |      FROM sc) x
         |WHERE rank <= 3""".stripMargin
    },
    "q_codefrac" -> {
      val nSym = ";{}()=<>[]".map(c =>
        s"(length(text) - length(replace(text, '$c', '')))").mkString(" + ")
      s"""WITH c AS (
         |  SELECT doc_id, cast(length(text) AS bigint) AS n_chars,
         |         cast($nSym AS bigint) AS n_sym
         |  FROM documents
         |)
         |SELECT doc_id, n_chars, n_sym,
         |       CASE WHEN n_chars = 0 THEN 0
         |            ELSE (n_sym * 10000) // n_chars END AS codey_e4,
         |       cast(CASE WHEN n_chars > 0 AND (n_sym * 10000) // n_chars >= 500
         |                 THEN 1 ELSE 0 END AS bigint) AS is_code
         |FROM c""".stripMargin
    },
    "q_kanon" ->
      """SELECT source, lang,
        |       cast(length(bin(n_chars)) AS bigint) AS len_bucket,
        |       cast(count(*) AS bigint) AS n_docs,
        |       cast(CASE WHEN count(*) >= 5 THEN 1 ELSE 0 END AS bigint) AS anon_ok
        |FROM documents GROUP BY 1, 2, 3""".stripMargin,
    "q_quantiles" -> quantilesSql,
    "q_quantiles_src" -> quantilesSrcSql,
    "q_tfidf" -> tfidfSql,
    "q_sparse_cos" -> sparseCosSql,
    "q_hll" -> hllSql,
    "q_stream_hll" -> hllSql,
    "q_hll_pairs" -> hllPairsSql,
    "q_word_pmi" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w,
        |         generate_subscripts(string_split(lower(text), ' '), 1) - 1 AS pos
        |  FROM documents
        |), st AS (
        |  SELECT (SELECT count(*) FROM tok) AS t
        |), pr AS (
        |  SELECT least(a.w, b.w) AS word_a, greatest(a.w, b.w) AS word_b, count(*) AS n_ab
        |  FROM tok a JOIN tok b ON b.doc_id = a.doc_id
        |    AND b.pos > a.pos AND b.pos <= a.pos + 3 AND a.w <> b.w
        |  GROUP BY 1, 2
        |), npt AS (SELECT coalesce(sum(n_ab), 0) AS np FROM pr
        |), mg AS (SELECT w, count(*) AS n FROM tok GROUP BY 1)
        |SELECT word_a, word_b, n_ab, lift_e4 FROM (
        |  SELECT p.word_a, p.word_b, p.n_ab,
        |         cast((p.n_ab::HUGEINT * 10000 * st.t * st.t)
        |              // (npt.np::HUGEINT * ma.n * mb.n) AS bigint) AS lift_e4,
        |         row_number() OVER (ORDER BY p.n_ab DESC, p.word_a, p.word_b) AS rk
        |  FROM pr p
        |  JOIN mg ma ON ma.w = p.word_a
        |  JOIN mg mb ON mb.w = p.word_b
        |  CROSS JOIN st CROSS JOIN npt
        |  WHERE p.n_ab >= 5) x
        |WHERE rk <= 100""".stripMargin,
    "q_outliers" ->
      """WITH st AS (
        |  SELECT source, count(*) AS n, sum(n_chars) AS s, sum(n_chars * n_chars) AS ssq
        |  FROM documents GROUP BY 1
        |)
        |SELECT d.doc_id, d.source, d.n_chars,
        |       cast(CASE WHEN (st.n::HUGEINT * d.n_chars - st.s)
        |                      * (st.n::HUGEINT * d.n_chars - st.s)
        |                      > 9 * (st.n::HUGEINT * st.ssq - st.s::HUGEINT * st.s)
        |                 THEN 1 ELSE 0 END AS bigint) AS is_outlier
        |FROM documents d JOIN st ON st.source = d.source""".stripMargin,
    "q_cms" -> cmsSql,
    "q_bloom" -> bloomSql,
    "q_semdedup" -> semDedupSql(),
    "q_pq" -> pqSql(),
    "q_pq_adc" -> pqAdcSql(),
    "q_bm25" -> bm25Sql,
    "q_hybrid" -> hybridSql,
    "q_editdist" -> editDistSql,
    "q_wav" -> wavSql,
    "q_bmp" -> bmpSql,
    "q_avi" -> aviSql,
    "q_wsample" ->
      """WITH p AS (
        |  SELECT doc_id, source, n_chars,
        |         ('0x' || substr(md5(concat('ws|', cast(doc_id AS varchar))), 1, 10))::BIGINT
        |           * 1000000 // n_chars AS prio
        |  FROM documents
        |)
        |SELECT doc_id, source, n_chars, prio, rank FROM (
        |  SELECT *, cast(row_number() OVER (ORDER BY prio, doc_id) AS bigint) AS rank
        |  FROM p) x
        |WHERE rank <= 50""".stripMargin,
    "q_invindex" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term,
        |         generate_subscripts(string_split(lower(text), ' '), 1) - 1 AS pos
        |  FROM documents
        |), p AS (
        |  SELECT term, doc_id, count(*) AS tf,
        |         string_agg(pos, ',' ORDER BY pos) AS positions
        |  FROM tok GROUP BY 1, 2
        |), d AS (
        |  SELECT term, count(*) AS df FROM p GROUP BY 1
        |)
        |SELECT p.term, p.doc_id, p.tf, d.df, p.positions
        |FROM p JOIN d USING (term)""".stripMargin,
    "q_kmeans" -> (ivfTrainCtes(16, 2) +
      "\nSELECT vec_id, cast(cid AS bigint) AS cid FROM rk WHERE rn = 1"),
    "q_rollup" -> rollupSql,
    "q_dupspans" -> dupSpansSql,
    "q_rarity" -> raritySql,
    "q_lm_score" -> lmScoreSql,
    "q_dbscan" -> dbscanSql(),
    "q_dbscan_scale" -> dbscanSql(planes = 6),
    "q_source_overlap" -> sourceOverlapSql,
    "q_knn_clusters" -> knnClustersSql(),
    "q_knn_scale" -> knnScaleSql(),
    "q_labelspread" -> labelSpreadSql,
    "q_containment" -> containmentSql,
    "q_curate" -> curateSql)
}
