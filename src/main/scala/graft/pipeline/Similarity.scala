package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`embeddings(vec_id, embedding: array<float>, label)`).
 *
 *  - [[cosineTopK]]: brute-force cosine top-k — the exactness
 *    baseline. All-pairs join; O(N²·d). Correct at any scale but only
 *    affordable for moderate N (or as the per-bucket kernel below).
 *  - [[lshTopK]]: random-hyperplane LSH — the scale path. Vectors
 *    hash to a sign-pattern bucket (hyperplane coefficients are a
 *    deterministic arithmetic PRNG, reproducible in plain SQL, no
 *    engine-specific hash), and the quadratic kernel runs per bucket.
 *    Linear candidate generation, tunable recall via `planes`.
 *
 * All dot products run through `zip_with` + `aggregate` on DOUBLE —
 * codegen'd column expressions, no UDFs — and similarities are
 * exported as `sim_e4` scaled integers so the DuckDB oracle compare
 * is exact-integer (floats straddling a rounding boundary differ
 * across engines in the last bits).
 */
object Similarity {

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** Codegen'd dot product (custom Catalyst expression — Spark's
   * zip_with/aggregate higher-order functions are lambda-interpreted
   * and dominated the ANN profile). Accumulates in double. */
  private def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftFunctions.dot(a, b)

  /** (vec_id, v: array<float>, norm). Repartitioned to the session's
   * shuffle parallelism: the source parquet is a handful of input
   * splits, and the all-pairs nested-loop join inherits the STREAM
   * side's partitioning — without this the quadratic kernel runs on
   * 1-2 cores. */
  def prepared(emb: DataFrame): DataFrame = {
    val parts = emb.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    emb.select(col("vec_id"), col("embedding").as("v"))
      .repartition(parts, col("vec_id"))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))
  }

  /**
   * Embedding-norm census — the vector-quality screen an ANN/dedup
   * pipeline runs before trusting an embedding drop: per vector, the
   * dimension count and the EXACT INTEGER quantized squared norm
   * (each coordinate rounded to ×10⁶, then Σ xq² — the same
   * quantization contract as the centroid-outlier screen), plus its
   * power-of-two bucket. Zero vectors land in bucket 1 with
   * norm2_q = 0; truncated or ragged vectors show up as n_dims
   * outliers.
   *
   * Scale shape: one explode + one grouped aggregate keyed by vec_id
   * (partial agg before the shuffle), pure column expressions.
   *
   * @return (vec_id, n_dims, norm2_q, bucket)
   */
  def normCensus(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      posexplode(col("embedding")).as(Seq("i", "x")))
      .select(col("vec_id"),
        expr("cast(round(cast(x AS double) * 1000000) AS bigint)").as("xq"))
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_dims"), sum(col("xq") * col("xq")).as("norm2_q"))
      .withColumn("bucket", length(conv(col("norm2_q"), 10, 2)).cast("long"))

  /**
   * Int8 scalar quantization (SQ-8) codec — the memory-4×-cheaper
   * sibling of the PQ codes: per DIMENSION the corpus min/max define
   * a 256-step grid, each coordinate maps to
   * code = (xq − min_d)·255 ÷ (max_d − min_d). All arithmetic runs on
   * the ×10⁶-quantized integer coordinates (the centroid-outlier
   * contract), so codes are bit-identical in any engine — no float
   * division crosses the oracle boundary. Constant dimensions code
   * to 0. Exported as a per-vector code checksum profile rather than
   * 2500×d rows.
   *
   * Scale shape: one per-dimension min/max aggregate (d rows,
   * broadcast back), then pure column arithmetic + one per-vector
   * aggregate.
   *
   * @return (vec_id, n_dims, code_sum, code_min, code_max)
   */
  def sq8Codes(emb: DataFrame): DataFrame = {
    val q = emb.select(col("vec_id"),
      posexplode(col("embedding")).as(Seq("i", "x")))
      .select(col("vec_id"), col("i"),
        expr("cast(round(cast(x AS double) * 1000000) AS bigint)").as("xq"))
    val rng = q.groupBy(col("i"))
      .agg(min(col("xq")).as("mn"), max(col("xq")).as("mx"))
    q.join(broadcast(rng), "i")
      .select(col("vec_id"),
        when(col("mx") === col("mn"), 0L)
          .otherwise(expr("((xq - mn) * 255L) div (mx - mn)")).as("code"))
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_dims"), sum(col("code")).as("code_sum"),
        min(col("code")).as("code_min"), max(col("code")).as("code_max"))
  }

  /** Brute-force cosine top-k per query vector. Deterministic output:
   * ranking on (sim_e4 desc, nbr_id asc) so rounding-boundary float
   * noise cannot reorder results across engines/runs.
   *
   * `maxQueries` bounds the QUERY side (all vectors stay candidates) —
   * brute force is the exactness baseline, deliberately quadratic;
   * unbounded-query ANN at scale is [[lshTopK]]. */
  def cosineTopK(emb: DataFrame, k: Int = 5, maxQueries: Long = 500): DataFrame = {
    val p = prepared(emb).persist()
    val a = p.select(col("vec_id"), col("v"), col("norm"))
      .where(col("vec_id") < maxQueries)
    val b = p.select(col("vec_id").as("nbr_id"), col("v").as("w"), col("norm").as("nrm2"))
    val sims = a.join(b, col("vec_id") =!= col("nbr_id"))
      .select(
        col("vec_id"), col("nbr_id"),
        round(dot(col("v"), col("w")) / (col("norm") * col("nrm2")) * 10000)
          .cast("long").as("sim_e4"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("sim_e4").desc, col("nbr_id").asc)
    val out = sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("vec_id"), col("nbr_id"), col("sim_e4"), col("rank"))
    out
  }

  /**
   * kNN LABEL-AGREEMENT census — the label-quality screen: for each
   * query vector, how many of its top-k cosine neighbors share its
   * label, aggregated per label. Low agreement flags label noise or
   * an embedding space that does not separate the classes; run it
   * before training a classifier on the labels.
   *
   * Rides [[cosineTopK]]'s exact ranking (same determinism contract);
   * at corpus scale the same census runs over [[lshTopK]] candidates.
   *
   * @return (lab, n_queries, agree) — agree = Σ same-label neighbors
   *         over the label's queries (max k·n_queries)
   */
  def labelAgreement(emb: DataFrame, k: Int = 5, maxQueries: Long = 500): DataFrame = {
    val lab = emb.select(col("vec_id"), col("label").cast("long").as("lab"))
    cosineTopK(emb, k, maxQueries)
      .join(lab, "vec_id")
      .join(lab.select(col("vec_id").as("nbr_id"), col("lab").as("nlab")), "nbr_id")
      .groupBy(col("lab"))
      .agg(countDistinct(col("vec_id")).as("n_queries"),
        sum(when(col("lab") === col("nlab"), 1L).otherwise(0L)).as("agree"))
  }

  /**
   * Per-label embedding OUTLIERS by distance to the label centroid —
   * the mislabel/noise screen a curation pipeline runs before
   * training on labeled embeddings.
   *
   * Integer-exact across engines: components quantize to
   * xq = round(x·10⁶) (the LSH projection's proven trick — long sums
   * are order-independent, float sums are not); the per-dimension
   * deviation is e = ⌊|n·xq − S| / n⌋ with S the label's component
   * sum (abs keeps both engines' integer division identical), and the
   * score is d2 = Σ e² — the squared centroid distance in 10⁻⁶ units,
   * floor per dimension. e ≤ ~10⁷ ⇒ d2 ≤ dims·10¹⁴, safely long.
   *
   * Scale shape: one 64-rows-per-label centroid aggregate (broadcast
   * back), one partial-agg sum per vector, one per-label top-k
   * window over ≤ |V| rows — no quadratic stage anywhere.
   *
   * @return (lab, vec_id, d2, rank) for the topK outliers per label
   */
  def centroidOutliers(emb: DataFrame, topK: Int = 5): DataFrame = {
    val q = emb.select(
      col("vec_id"), col("label").cast("long").as("lab"),
      posexplode(expr(
        "transform(embedding, x -> cast(round(cast(x AS double) * 1000000) AS long))"))
        .as(Seq("i", "xq")))
    val cent = q.groupBy(col("lab"), col("i"))
      .agg(sum(col("xq")).as("s"), count(lit(1)).as("n"))
    val d2 = q.join(broadcast(cent), Seq("lab", "i"))
      .select(col("lab"), col("vec_id"),
        expr("abs(n * xq - s) div n").as("e"))
      .groupBy(col("lab"), col("vec_id"))
      .agg(sum(col("e") * col("e")).as("d2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lab")).orderBy(col("d2").desc, col("vec_id").asc)
    d2.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= topK)
      .select(col("lab"), col("vec_id"), col("d2"), col("rank"))
  }

  /** Contrastive hard-negative mining: for each query vector, the
   * top-`k` most-similar vectors carrying a DIFFERENT label — the
   * pairs a contrastive/embedding trainer wants as negatives
   * precisely because the current representation confuses them.
   *
   * Exactness baseline like [[cosineTopK]] (query side capped, all
   * vectors stay candidates, deterministic (sim_e4 desc, neg_id)
   * ranking); at corpus scale the same label-mismatch gate composes
   * with [[lshTopK]]'s bucketed candidates instead of the full cross
   * product — the gate is one codegen'd predicate either way.
   *
   * @return (vec_id, neg_id, sim_e4, rank) for rank ≤ k
   */
  def hardNegatives(emb: DataFrame, k: Int = 3, maxQueries: Long = 500): DataFrame = {
    val pl = prepared(emb)
      .join(emb.select(col("vec_id"), col("label")), "vec_id")
      .persist()
    val a = pl.where(col("vec_id") < maxQueries)
    val b = pl.select(col("vec_id").as("neg_id"), col("v").as("w"),
      col("norm").as("nrm2"), col("label").as("lab2"))
    val sims = a.join(b, col("vec_id") =!= col("neg_id") && col("label") =!= col("lab2"))
      .select(
        col("vec_id"), col("neg_id"),
        round(dot(col("v"), col("w")) / (col("norm") * col("nrm2")) * 10000)
          .cast("long").as("sim_e4"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("sim_e4").desc, col("neg_id").asc)
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("vec_id"), col("neg_id"), col("sim_e4"), col("rank"))
  }

  /** LSH-bucketed cosine top-k: the 100 TB-scale variant. Buckets via
   * `planes` random ±1 hyperplanes, brute-force kernel within buckets.
   *
   * The projection is computed in QUANTIZED INTEGER arithmetic
   * (`round(x·10^6)` per component, summed as Long): integer addition
   * is order-independent, so the bucket sign — and therefore the whole
   * result — is reproducible bit-for-bit across engines and
   * parallelism levels. (Round 1 summed doubles, whose sign at proj≈0
   * depends on summation order → the oracle-less driver row.)
   *
   * `maxBucket` caps the quadratic per-bucket kernel: buckets larger
   * than the cap are dropped from the candidate join (bounded work at
   * any scale, at recall cost on degenerate bucket skew). The default
   * is off so results stay exact w.r.t. the bucketing. */
  def lshTopK(emb: DataFrame, planes: Int = 6, k: Int = 5,
      maxBucket: Long = Long.MaxValue): DataFrame = {
    val p = bucketed(emb, planes, maxBucket).persist()
    val a = p.select(col("bucket"), col("vec_id"), col("v"), col("norm"))
    val b = p.select(
      col("bucket"), col("vec_id").as("nbr_id"), col("v").as("w"), col("norm").as("nrm2"))
    val sims = a.join(b, Seq("bucket")).where(col("vec_id") =!= col("nbr_id"))
      .select(
        col("vec_id"), col("nbr_id"),
        round(dot(col("v"), col("w")) / (col("norm") * col("nrm2")) * 10000)
          .cast("long").as("sim_e4"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("sim_e4").desc, col("nbr_id").asc)
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("vec_id"), col("nbr_id"), col("sim_e4"), col("rank"))
  }

  /** (bucket, vec_id, v, norm) with the quantized-integer hyperplane
   * bucket (see [[lshTopK]]); buckets above `maxBucket` are dropped. */
  def bucketed(emb: DataFrame, planes: Int, maxBucket: Long = Long.MaxValue): DataFrame =
    bucketedFrom(prepared(emb), planes, maxBucket)

  /** [[bucketed]] over an already-[[prepared]] frame; `planeOffset`
   * selects an independent hyperplane family (table t of a
   * multi-table index uses offset t·planes — the PRNG seed is the
   * GLOBAL plane index, so tables never share a hyperplane). */
  private def bucketedFrom(
      p: DataFrame, planes: Int, maxBucket: Long = Long.MaxValue,
      planeOffset: Int = 0): DataFrame = {
    val p0 = p
      .withColumn(
        "bucket", {
          val signs: Seq[Column] = (0 until planes).map { pl =>
            val g = pl + planeOffset // global plane index
            val proj = aggregate(
              zip_with(
                col("v"),
                transform(col("v"), (_, i) => i.cast("long")),
                (x, i) => round(x.cast("double") * lit(1000000.0)).cast("long") * when(
                  pmod(i * lit(2654435761L) + lit(g * 40503L), lit(1000003L)) % 2 === 0,
                  lit(1L)).otherwise(lit(-1L))),
              lit(0L), (acc, x) => acc + x)
            when(proj >= 0, lit(1L << pl)).otherwise(lit(0L))
          }
          signs.reduce(_ + _)
        })
    if (maxBucket == Long.MaxValue) p0
    else {
      val sizes = p0.groupBy(col("bucket")).agg(count(lit(1)).as("bsz"))
      p0.join(broadcast(sizes.where(col("bsz") <= maxBucket)), "bucket").drop("bsz")
    }
  }

  /**
   * Multi-table LSH cosine top-k — OR-amplification over `numTables`
   * independent hyperplane families: a candidate pair needs to
   * collide in ANY table, so recall per pair rises from pᵖ (p =
   * 1 − θ/π per plane) to 1 − (1 − pᵖ)ᵀ while cost stays linear
   * (T bucket joins over distinct-deduped candidates; the exact
   * kernel runs once per candidate pair, not per collision). The
   * standard recall/cost dial when a single table's `planes` is too
   * selective — at corpus scale, tables shard trivially (the bucket
   * join is keyed by (table, bucket)).
   */
  def lshTopKMulti(emb: DataFrame, planes: Int = 6, k: Int = 5,
      numTables: Int = 2, maxBucket: Long = Long.MaxValue): DataFrame = {
    require(numTables >= 1, "need at least one table")
    val p = prepared(emb).persist()
    val cands = (0 until numTables).map { t =>
      val bk = bucketedFrom(p, planes, maxBucket, planeOffset = t * planes)
        .select(col("bucket"), col("vec_id"))
      bk.join(bk.select(col("bucket"), col("vec_id").as("nbr_id")), Seq("bucket"))
        .where(col("vec_id") =!= col("nbr_id"))
        .select(col("vec_id"), col("nbr_id"))
    }.reduce(_ unionByName _).distinct()
    val a = p.select(col("vec_id"), col("v"), col("norm"))
    val b = p.select(col("vec_id").as("nbr_id"), col("v").as("w"), col("norm").as("nrm2"))
    val sims = cands.join(a, "vec_id").join(b, "nbr_id")
      .select(
        col("vec_id"), col("nbr_id"),
        round(dot(col("v"), col("w")) / (col("norm") * col("nrm2")) * 10000)
          .cast("long").as("sim_e4"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("sim_e4").desc, col("nbr_id").asc)
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("vec_id"), col("nbr_id"), col("sim_e4"), col("rank"))
  }

  /**
   * IVF-flat cosine top-k — the second scale path next to [[lshTopK]],
   * mirroring the inverted-file index family (nlist coarse-quantizer
   * centroids, nprobe-probed candidate lists).
   *
   *  - Train: `nlist` centroids seeded from the `nlist` smallest
   *    vec_ids, refined by `lloydIters` Lloyd iterations. Centroids are
   *    tiny driver-side model state (nlist·d longs — the coarse
   *    quantizer); the big table never leaves the executors. Each
   *    iteration = one broadcast nested-loop assignment (no shuffle of
   *    the vector side beyond its resident partitioning) + one
   *    nlist·d-group partial-aggregated mean. At 100 TB you train on a
   *    sample; here the full (small) table keeps the oracle exact.
   *  - Query: probe the `nprobe` nearest centroids, brute-force exact
   *    cosine inside the probed inverted lists, top-k. Cost per query
   *    is nprobe/nlist of the data — the recall/cost dial.
   *
   * ALL quantizer arithmetic is exact-integer (vectors quantized to
   * `round(x·10^6)` longs, squared-L2 in longs, means as
   * `floor(sum·1.0/count)` with sums ≪ 2^53): assignments are
   * bit-reproducible across engines and parallelism, so the DuckDB
   * oracle replays training exactly (same trick as [[bucketed]]).
   * Ties (equal d2) break on centroid id; ranking is deterministic on
   * (sim_e4 desc, nbr_id asc) like the other ANN variants.
   */
  def ivfTopK(emb: DataFrame, nlist: Int = 16, nprobe: Int = 2, k: Int = 5,
      lloydIters: Int = 2, maxQueries: Long = 500): DataFrame = {
    val (p, fin) = ivfTrained(emb, nlist, lloydIters)
    val lists = fin.where(col("rn") === 1).select(col("vec_id").as("nbr_id"), col("cid"))
    val probes = fin.where(col("rn") <= nprobe && col("vec_id") < maxQueries)
      .select(col("vec_id"), col("cid"))
    val a = probes.join(p.select(col("vec_id"), col("v"), col("norm")), "vec_id")
    val b = lists.join(
      p.select(col("vec_id").as("nbr_id"), col("v").as("w"), col("norm").as("nrm2")), "nbr_id")
    val sims = a.join(b, Seq("cid")).where(col("vec_id") =!= col("nbr_id"))
      .select(
        col("vec_id"), col("nbr_id"),
        round(dot(col("v"), col("w")) / (col("norm") * col("nrm2")) * 10000)
          .cast("long").as("sim_e4"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("sim_e4").desc, col("nbr_id").asc)
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("vec_id"), col("nbr_id"), col("sim_e4"), col("rank"))
  }

  /** Train the IVF coarse quantizer (see [[ivfTopK]] for the exactness
   * contract). @return (p, fin): `p` = prepared vectors + quantized
   * `vq` (persisted); `fin` = exact-integer centroid ranking
   * (vec_id, vq, cid, d2, rn) after `lloydIters` Lloyd iterations
   * (persisted; rn = 1 is the cluster assignment). */
  private def ivfTrained(
      emb: DataFrame, nlist: Int, lloydIters: Int): (DataFrame, DataFrame) = {
    val p = prepared(emb)
      .withColumn("vq",
        transform(col("v"), x => round(x.cast("double") * lit(1000000.0)).cast("long")))
      .persist()
    val fin = lloydAssign(p.select(col("vec_id"), col("vq")), nlist, lloydIters).persist()
    (p, fin)
  }

  /** Exact-integer Lloyd on a quantized vector table
   * `(vec_id, vq: array<long>)` — the kernel shared by the IVF coarse
   * quantizer and the per-subspace PQ codebooks. Seeds = the k
   * smallest vec_ids' vectors; means floor-divide; empty clusters
   * keep their previous centroid. @return (vec_id, vq, cid, d2, rn)
   * ranked by (d2, cid) — rn = 1 is the assignment. */
  private def lloydAssign(vecs: DataFrame, k: Int, lloydIters: Int): DataFrame =
    lloydAssignCents(vecs, k, lloydIters)._1

  /** [[lloydAssign]] + the trained centroids (tiny driver-side model
   * state — the ADC lookup tables are built from them). */
  private def lloydAssignCents(
      vecs: DataFrame, k: Int, lloydIters: Int): (DataFrame, IndexedSeq[(Int, Seq[Long])]) = {
    val spark = vecs.sparkSession
    import spark.implicits._
    var cents: IndexedSeq[(Int, Seq[Long])] = vecs
      .orderBy(col("vec_id")).limit(k)
      .select(col("vec_id"), col("vq")).collect()
      .sortBy(_.getLong(0)).zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Long](1)) }.toIndexedSeq

    // (vec_id, cid, rn) ranked by exact-integer squared L2 to each centroid
    def ranked(cs: IndexedSeq[(Int, Seq[Long])]): DataFrame = {
      val c = broadcast(cs.toDF("cid", "cq"))
      val d2 = aggregate(
        zip_with(col("vq"), col("cq"), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("d2").asc, col("cid").asc)
      vecs.select(col("vec_id"), col("vq")).crossJoin(c)
        .withColumn("d2", d2)
        .withColumn("rn", row_number().over(w))
    }

    for (_ <- 1 to lloydIters) {
      val means = ranked(cents).where(col("rn") === 1)
        .select(col("cid"), posexplode(col("vq")).as(Seq("pos", "q")))
        .groupBy(col("cid"), col("pos"))
        .agg(floor(sum(col("q")) * lit(1.0) / count(lit(1))).cast("long").as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
        }
      // empty clusters keep their previous centroid
      cents = cents.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
    }
    (ranked(cents), cents)
  }

  /**
   * Product-quantization codes (Jégou et al., PAMI'11): split the
   * d-dim space into `m` subspaces, train a `k`-codeword codebook per
   * subspace (the same exact-integer Lloyd as [[ivfTopK]], on the
   * slice), emit each vector's code + exact squared quantization
   * error per subspace. The memory story at 100 TB: m·log₂k bits per
   * vector (here 4 × 3 bits) replace d floats for the ADC distance
   * phase of a billion-scale ANN index.
   *
   * @return (vec_id, sub, code, d2) — one row per vector × subspace
   */
  def pqCodes(emb: DataFrame, m: Int = 4, k: Int = 8, lloydIters: Int = 2): DataFrame = {
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    val p = prepared(emb)
      .withColumn("vq",
        transform(col("v"), x => round(x.cast("double") * lit(1000000.0)).cast("long")))
      .persist()
    val out = (0 until m).map { s =>
      val svq = p.select(col("vec_id"), slice(col("vq"), s * sub + 1, sub).as("vq"))
      lloydAssign(svq, k, lloydIters)
        .where(col("rn") === 1)
        .select(col("vec_id"), lit(s.toLong).as("sub"),
          col("cid").cast("long").as("code"), col("d2"))
    }.reduce(_ unionByName _)
    out
  }

  /**
   * PQ asymmetric-distance search (ADC, Jégou et al. PAMI'11 §IV) —
   * the QUERY half of the product-quantization story ([[pqCodes]]
   * trains the codebooks and encodes the corpus): per query, build
   * the m×k lookup table of exact squared distances from the query's
   * subvectors to every codeword (m·k = 32 integers — driver-side
   * model state, broadcast), then score each database vector as the
   * SUM OF TABLE LOOKUPS selected by its code — never touching the
   * original floats. At 10^9 vectors the scan reads m·log₂k bits per
   * vector plus one broadcast join against the 32-row LUT; the exact
   * re-rank (if wanted) runs only on the returned top-k.
   *
   * All-integer end to end (quantized subvectors, exact Lloyd
   * codebooks, integer LUT) — the oracle retrains and replays the
   * same distances bit-for-bit.
   *
   * @return (qid, vec_id, est_d2, rank) — top `topK` per query by
   *         (est_d2 asc, vec_id asc)
   */
  def pqAdcTopK(
      emb: DataFrame, m: Int = 4, k: Int = 8, lloydIters: Int = 2,
      nQueries: Int = 5, topK: Int = 10): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // empty corpus: no dimension to probe and no queries — return the
    // empty top-k (the oracle's answer) instead of .first() throwing
    if (emb.isEmpty)
      return Seq.empty[(Long, Long, Long, Long)].toDF("qid", "vec_id", "est_d2", "rank")
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    val p = prepared(emb)
      .withColumn("vq",
        transform(col("v"), x => round(x.cast("double") * lit(1000000.0)).cast("long")))
      .persist()

    // per-subspace codes + trained codebooks
    val trained = (0 until m).map { s =>
      val svq = p.select(col("vec_id"), slice(col("vq"), s * sub + 1, sub).as("vq"))
      val (ranked, cents) = lloydAssignCents(svq, k, lloydIters)
      val codes = ranked.where(col("rn") === 1)
        .select(col("vec_id"), lit(s.toLong).as("sub"), col("cid").cast("long").as("code"))
      (codes, cents)
    }
    val codes = trained.map(_._1).reduce(_ unionByName _)

    // query subvectors, driver-side (nQueries·dim longs)
    val qrows = p.orderBy(col("vec_id")).limit(nQueries)
      .select(col("vec_id"), col("vq")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
    val lut = for {
      (qid, vq) <- qrows.toSeq
      s <- 0 until m
      qsub = vq.slice(s * sub, (s + 1) * sub)
      (cid, cq) <- trained(s)._2
    } yield (qid, s.toLong, cid.toLong,
      qsub.zip(cq).map { case (a, b) => (a - b) * (a - b) }.sum)
    val lutDf = lut.toDF("qid", "sub", "code", "pd2")

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("est_d2").asc, col("vec_id").asc)
    val out = codes.join(broadcast(lutDf), Seq("sub", "code"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("pd2")).as("est_d2"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= topK)
      .select(col("qid"), col("vec_id"), col("est_d2"), col("rank"))
    p.unpersist(blocking = false)
    out
  }

  /** K-means cluster assignments over the embedding table — the IVF
   * coarse quantizer exposed as its own operator (corpus
   * auto-categorization, stratified-by-cluster sampling, SemDeDup's
   * first stage). Exact-integer Lloyd (see [[ivfTopK]]) ⇒ the DuckDB
   * oracle replays the same assignment bit-for-bit. */
  def kmeansAssign(emb: DataFrame, nlist: Int = 16, lloydIters: Int = 2): DataFrame = {
    val (_, fin) = ivfTrained(emb, nlist, lloydIters)
    fin.where(col("rn") === 1)
      .select(col("vec_id"), col("cid").cast("long").as("cid"))
  }

  /**
   * SemDeDup-style semantic deduplication (Abbas et al. 2023,
   * arXiv:2303.09540): k-means-cluster the embedding space — the IVF
   * coarse quantizer reused verbatim — then inside each cluster drop
   * every vector that has a SMALLER-id cluster-mate with cosine ≥
   * threshold. Returns the kept vectors with their cluster:
   * (vec_id, cid).
   *
   * The scale contract is the clustering: the quadratic cosine kernel
   * runs per cluster (nlist partitions the corpus), never all-pairs,
   * and the min-id keeper rule is a single anti-join — no sequential
   * scan-order dependence, unlike the paper's greedy sweep, so the
   * result is deterministic under any parallelism. Exactness: same
   * integer-quantized Lloyd as [[ivfTopK]], so the DuckDB oracle
   * replays training bit-for-bit.
   */
  def semDedup(emb: DataFrame, nlist: Int = 16, lloydIters: Int = 2,
      simThresholdE4: Long = 3000): DataFrame = {
    val (p, fin) = ivfTrained(emb, nlist, lloydIters)
    val assign = fin.where(col("rn") === 1).select(col("vec_id"), col("cid"))
      .join(p.select(col("vec_id"), col("v"), col("norm")), "vec_id")
    val mates = assign.select(
      col("cid"), col("vec_id").as("nbr_id"), col("v").as("w"), col("norm").as("nrm2"))
    val drops = assign.join(mates, Seq("cid"))
      .where(col("nbr_id") < col("vec_id"))
      .where(round(dot(col("v"), col("w")) / (col("norm") * col("nrm2")) * 10000)
        .cast("long") >= simThresholdE4)
      .select(col("vec_id")).distinct()
    assign.join(drops, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cid").cast("long").as("cid"))
  }

  /** Embedding-cosine near-duplicate pairs — the dedup-flavored twin
   * of [[lshTopK]]: LSH-bucketed candidate generation (linear), exact
   * cosine within buckets, keep pairs with sim ≥ threshold. The scale
   * path for "drop training docs whose embeddings almost coincide". */
  /**
   * Embedding-level benchmark decontamination — the SEMANTIC
   * complement of [[Decontam.contamination]]'s n-gram overlap: flag
   * training vectors whose cosine to ANY eval-set vector reaches the
   * threshold (paraphrased eval leakage that shares no n-gram).
   * Eval membership mirrors Decontam.isEval: vec_id ≡ 0 (mod evalMod).
   *
   * Scale shape: benchmarks are thousands of vectors against a
   * 100 TB corpus, so the eval side is BROADCAST and the train side
   * is one linear scan (|train|·|eval| codegen'd dot products, no
   * shuffle before the per-vector max). For eval sets too big to
   * broadcast, route through the IVF quantizer ([[ivfTopK]]) first.
   *
   * @return (vec_id, max_sim_e4, contaminated) for every train vector
   */
  def evalContamination(
      emb: DataFrame,
      evalMod: Long = 97,
      simThresholdE4: Long = 3000): DataFrame = {
    val p = prepared(emb)
    val eval = p.where(pmod(col("vec_id"), lit(evalMod)) === 0)
      .select(col("v").as("w"), col("norm").as("en"))
    val train = p.where(pmod(col("vec_id"), lit(evalMod)) =!= 0)
    train.join(broadcast(eval))
      .select(col("vec_id"),
        round(dot(col("v"), col("w")) / (col("norm") * col("en")) * 10000)
          .cast("long").as("s"))
      .groupBy(col("vec_id")).agg(max(col("s")).as("max_sim_e4"))
      .withColumn("contaminated", (col("max_sim_e4") >= simThresholdE4).cast("long"))
  }

  def cosineDupPairs(
      emb: DataFrame,
      planes: Int = 6,
      simThresholdE4: Long = 9000,
      maxBucket: Long = Long.MaxValue): DataFrame = {
    val p = bucketed(emb, planes, maxBucket).persist()
    val a = p.select(col("bucket"), col("vec_id").as("vec_a"), col("v"), col("norm"))
    val b = p.select(
      col("bucket"), col("vec_id").as("vec_b"), col("v").as("w"), col("norm").as("nrm2"))
    a.join(b, Seq("bucket")).where(col("vec_a") < col("vec_b"))
      .select(
        col("vec_a"), col("vec_b"),
        round(dot(col("v"), col("w")) / (col("norm") * col("nrm2")) * 10000)
          .cast("long").as("sim_e4"))
      .where(col("sim_e4") >= simThresholdE4)
  }

  /**
   * Hybrid retrieval via reciprocal-rank fusion (Cormack et al.,
   * SIGIR'09): fuse the lexical BM25 pool with a semantic cosine pool
   * and re-rank by RRF. `doc_id ≡ vec_id` (paired tables).
   *
   *  - lexical list: [[Vocab.bm25TopDocs]] top `poolK` (integer-exact);
   *  - semantic list: cosine of every embedding against the SEED —
   *    the BM25 rank-1 document's embedding (deterministic,
   *    data-derived "more like the best lexical hit"), ranked on
   *    (sim_e4 desc, vec_id);
   *  - fusion: rrf_e6 = Σ_list ⌊10⁶ / (60 + rank)⌋, absent → 0 —
   *    pure integers, the standard k = 60.
   *
   * Scale shape: both pools end in TakeOrdered top-poolK; the fusion
   * is a poolK-row full-outer join; the only per-corpus work is one
   * broadcast dot-product scan per list.
   */
  def hybridTopDocs(docs: DataFrame, emb: DataFrame, nQueryTerms: Int = 5,
      poolK: Int = 50, topK: Int = 20, rrfK: Int = 60): DataFrame = {
    val lex = Vocab.bm25TopDocs(docs, nQueryTerms, poolK)
      .select(col("doc_id"), col("rank").as("lex_rank")).persist()
    val seedId = lex.where(col("lex_rank") === 1).select(col("doc_id"))
      .first().getLong(0)
    val p = prepared(emb)
    val seed = p.where(col("vec_id") === seedId)
      .select(col("v").as("w"), col("norm").as("nrm2"))
    val sims = p.crossJoin(broadcast(seed))
      .select(col("vec_id"),
        round(dot(col("v"), col("w")) / (col("norm") * col("nrm2")) * 10000)
          .cast("long").as("sim_e4"))
    val wSem = org.apache.spark.sql.expressions.Window
      .orderBy(col("sim_e4").desc, col("vec_id").asc)
    val sem = sims.orderBy(col("sim_e4").desc, col("vec_id").asc).limit(poolK)
      .withColumn("sem_rank", row_number().over(wSem).cast("long"))
      .select(col("vec_id").as("doc_id"), col("sem_rank"))
    val fused = lex.join(sem, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
        coalesce(col("sem_rank"), lit(0L)).as("sem_rank"),
        (coalesce(expr(s"1000000 div ($rrfK + lex_rank)"), lit(0L)) +
          coalesce(expr(s"1000000 div ($rrfK + sem_rank)"), lit(0L))).as("rrf_e6"))
    val wOut = org.apache.spark.sql.expressions.Window
      .orderBy(col("rrf_e6").desc, col("doc_id").asc)
    // lex stays persisted until the caller's action (Bench's isolated{}
    // / session teardown reclaims it — poolK rows)
    fused.orderBy(col("rrf_e6").desc, col("doc_id").asc).limit(topK)
      .withColumn("rank", row_number().over(wOut).cast("long"))
  }

  /**
   * Mutual-k-NN graph clustering — the graph-based member of the
   * clustering family ([[dbscan]] = density, [[semDedup]]/kmeans =
   * centroid): connect a and b iff EACH is in the other's cosine
   * top-k (mutuality prunes the hub-attraction false edges a one-way
   * k-NN graph suffers in high dimensions), then clusters = connected
   * components, run through the same HashMin engine as everything
   * else. Vectors with no mutual neighbor are singleton clusters.
   *
   * Exactness baseline: full quadratic top-k (every vector a query —
   * unlike [[cosineTopK]]'s capped exactness probe); the scale path
   * swaps in [[lshTopK]]/[[ivfTopK]] candidates. Ranking ties break
   * (sim desc, nbr asc) as everywhere in this file.
   *
   * @return (vec_id, cluster) — cluster = min member vec_id.
   */
  /** Mutual-kNN half edges (src < dst): u and v each rank the other
   * in their cosine top-k. Shared by [[knnClusters]] and
   * [[labelSpread]].
   *
   * `planes = 0` (default): exactness-baseline quadratic kernel
   * (codegen'd dot) — the DuckDB-replayable mode every driver query
   * runs. `planes > 0`: the 100 TB scale mode — candidates restricted
   * to [[bucketed]] same-bucket pairs (linear in Σ bucket², bounded by
   * `maxBucket`), identical ranking/mutuality downstream. Recall < 1
   * ⇒ approximate kNN graph (edges only lost, never invented), so
   * clusters can only split, never wrongly merge. */
  private[graft] def mutualKnnHalf(emb: DataFrame, k: Int,
      planes: Int = 0, maxBucket: Long = 10000L): DataFrame = {
    val p = (if (planes > 0) bucketed(emb, planes, maxBucket)
             else prepared(emb)).persist()
    val joinedRaw =
      if (planes > 0) {
        val a0 = p.select(col("bucket"), col("vec_id"), col("v"), col("norm"))
        val b0 = p.select(col("bucket"), col("vec_id").as("nbr_id"),
          col("v").as("w"), col("norm").as("nrm2"))
        a0.join(b0, Seq("bucket")).where(col("vec_id") =!= col("nbr_id"))
      } else {
        val a0 = p.select(col("vec_id"), col("v"), col("norm"))
        val b0 = p.select(col("vec_id").as("nbr_id"), col("v").as("w"),
          col("norm").as("nrm2"))
        a0.join(b0, col("vec_id") =!= col("nbr_id"))
      }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("sim_e4").desc, col("nbr_id").asc)
    val knn = joinedRaw
      .select(col("vec_id"), col("nbr_id"),
        round(dot(col("v"), col("w")) / (col("norm") * col("nrm2")) * 10000)
          .cast("long").as("sim_e4"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("vec_id"), col("nbr_id"))
      .persist()
    val mutual = knn.where(col("vec_id") < col("nbr_id"))
      .join(knn.select(col("nbr_id").as("vec_id"), col("vec_id").as("nbr_id")),
        Seq("vec_id", "nbr_id"), "left_semi")
      .select(col("vec_id").as("src"), col("nbr_id").as("dst"), lit(1.0).as("weight"))
    knn.unpersist(blocking = false)
    p.unpersist(blocking = false)
    mutual
  }

  def knnClusters(emb: DataFrame, k: Int = 5, numPartitions: Int = 8,
      planes: Int = 0, maxBucket: Long = 10000L): DataFrame = {
    val mutual = mutualKnnHalf(emb, k, planes, maxBucket)
    val nV = emb.agg(max(col("vec_id"))).first().getLong(0) + 1
    val g = graft.LinkGraph.fromIdEdges(mutual, nV, symmetric = true, numPartitions)
    val out = graft.algos.ConnectedComponents.run(g).labels
      .join(emb.select(col("vec_id")), col("id") === col("vec_id"))
      .select(col("vec_id"), col("lbl").cast("long").as("cluster"))
    out
  }

  /**
   * ZGL label spreading (Zhu-Ghahramani semi-supervised node
   * classification) over the mutual-kNN graph: every 5th vector
   * (vec_id % 5 = 0) keeps its gold label CLAMPED as a one-hot
   * ×10⁶ mass; unlabeled vectors re-estimate their label
   * distribution each round as the FLOORED average of their
   * neighbors' distributions. After `rounds` rounds each vector
   * reporting any mass exports its argmax label (tie → smaller
   * label id) — the transductive classifier a curation pipeline uses
   * to extend sparse human labels across an embedding corpus.
   *
   * All-integer trajectory (sums + floor division), so the oracle
   * replays it exactly. Long-format state (id, label, mass): one
   * co-partitioned edge join + grouped sum per round, label count
   * never widens the schema.
   *
   * @return (vec_id, pred_label, mass)
   */
  def labelSpread(emb: DataFrame, k: Int = 5, rounds: Int = 3,
      planes: Int = 0, maxBucket: Long = 10000L): DataFrame = {
    val half = mutualKnnHalf(emb, k, planes, maxBucket)
    val mu = half.select(col("src"), col("dst"))
      .unionByName(half.select(col("dst").as("src"), col("src").as("dst")))
      .persist()
    val deg = mu.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val seeds = emb.where(pmod(col("vec_id"), lit(5)) === 0)
      .select(col("vec_id").as("id"), col("label").cast("long").as("l"),
        lit(1000000L).as("m"))
    val seedIds = seeds.select(col("id"))
    var st = seeds
    for (_ <- 1 to rounds) {
      val unl = mu.join(st.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"), col("l")).agg(sum(col("m")).as("s"))
        .join(deg, "id")
        .select(col("id"), col("l"), expr("s div deg").as("m"))
        .where(col("m") > 0)
        .join(seedIds, Seq("id"), "left_anti")
      st = seeds.unionByName(unl)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(desc("m"), asc("l"))
    // mu stays persisted: the final plan references it 2×/round and
    // the quadratic kernel must not be recomputed per reference (the
    // bench's per-query cleanup reclaims it)
    st.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("id").as("vec_id"), col("l").as("pred_label"), col("m").as("mass"))
  }

  /**
   * DBSCAN density clustering over the embedding column, with cosine
   * similarity as the (inverted) metric: `u ~ v` iff
   * sim_e4(u,v) ≥ `simThresholdE4`. Core points have ≥ `minPts`
   * neighbors; clusters are the connected components of the
   * core–core subgraph (run through the SAME HashMin engine as the
   * graph queries — cluster id = min core vec_id, deterministic);
   * border points attach to the smallest cluster id among their core
   * neighbors (the paper's "first claimer" made order-free); the rest
   * is noise (cluster −1). No centroids, no k — the density dual of
   * [[semDedup]]'s centroid clustering.
   *
   * `planes = 0` (default): exactness baseline — the neighbor graph
   * is the full quadratic kernel (same codegen'd dot as
   * [[cosineTopK]]), so the DuckDB oracle replays it bit-for-bit.
   * `planes > 0`: the 100 TB scale mode — the pair generator becomes
   * the [[bucketed]] same-bucket join (recall < 1 ⇒ approximate
   * DBSCAN — fewer cores, never wrong merges of far points);
   * everything downstream (degree gate, CC, border attach) is
   * unchanged and linear.
   *
   * @return (vec_id, cluster, role, n_nbrs) — role ∈ core|border|noise
   */
  def dbscan(
      emb: DataFrame,
      simThresholdE4: Long = 3300,
      minPts: Int = 3,
      numPartitions: Int = 8,
      planes: Int = 0,
      maxBucket: Long = 10000L): DataFrame = {
    val p = (if (planes > 0) bucketed(emb, planes, maxBucket)
             else prepared(emb)).persist()
    val pairsRaw =
      if (planes > 0) {
        val a = p.select(col("bucket"), col("vec_id").as("va"), col("v"),
          col("norm").as("na"))
        val b = p.select(col("bucket"), col("vec_id").as("vb"),
          col("v").as("w"), col("norm").as("nb"))
        a.join(b, Seq("bucket")).where(col("va") < col("vb"))
      } else {
        val a = p.select(col("vec_id").as("va"), col("v"), col("norm").as("na"))
        val b = p.select(col("vec_id").as("vb"), col("v").as("w"), col("norm").as("nb"))
        a.join(b, col("va") < col("vb"))
      }
    val pairs = pairsRaw
      .where(round(dot(col("v"), col("w")) / (col("na") * col("nb")) * 10000)
        .cast("long") >= simThresholdE4)
      .select(col("va"), col("vb"))
      .persist()
    val deg = pairs.select(col("va").as("vec_id"))
      .unionByName(pairs.select(col("vb").as("vec_id")))
      .groupBy(col("vec_id")).agg(count(lit(1)).as("n_nbrs"))
    val cores = deg.where(col("n_nbrs") >= minPts).select(col("vec_id")).persist()

    val coreEdges = pairs
      .join(cores.select(col("vec_id").as("va")), "va")
      .join(cores.select(col("vec_id").as("vb")), "vb")
      .select(col("va").as("src"), col("vb").as("dst"), lit(1.0).as("weight"))
    val nV = emb.agg(max(col("vec_id"))).first().getLong(0) + 1
    val g = graft.LinkGraph.fromIdEdges(coreEdges, nV, symmetric = true, numPartitions)
    // identity id space: HashMin's label IS min core id in the cluster;
    // isolated cores (no core neighbor) label themselves — still clusters
    val coreClu = graft.algos.ConnectedComponents.run(g).labels
      .join(cores.select(col("vec_id")), col("id") === col("vec_id"))
      .select(col("vec_id"), col("lbl").as("cluster"))

    val adjCore = pairs
      .join(coreClu.select(col("vec_id").as("va"), col("cluster")), "va")
      .select(col("vb").as("vec_id"), col("cluster"))
      .unionByName(pairs
        .join(coreClu.select(col("vec_id").as("vb"), col("cluster")), "vb")
        .select(col("va").as("vec_id"), col("cluster")))
    val border = adjCore
      .join(cores, Seq("vec_id"), "left_anti")
      .groupBy(col("vec_id")).agg(min(col("cluster")).as("cluster"))

    val out = emb.select(col("vec_id"))
      .join(deg, Seq("vec_id"), "left")
      .join(coreClu.select(col("vec_id"), col("cluster").as("cc")), Seq("vec_id"), "left")
      .join(border.select(col("vec_id"), col("cluster").as("bc")), Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("cc"), col("bc"), lit(-1L)).cast("long").as("cluster"),
        when(col("cc").isNotNull, "core")
          .when(col("bc").isNotNull, "border")
          .otherwise("noise").as("role"),
        coalesce(col("n_nbrs"), lit(0L)).as("n_nbrs"))
    p.unpersist(blocking = false)
    out
  }
}
