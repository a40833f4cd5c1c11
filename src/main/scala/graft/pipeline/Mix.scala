package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Data-mixing operators for assembling a training corpus: stratified
 * down-sampling per source, and packing documents into fixed
 * token-capacity context windows. No counterpart in the reference.
 *
 * Determinism contract (shared with Dedup): all randomness is md5 on
 * stable keys, so every engine (Spark, DuckDB, a future Flink port)
 * draws the identical sample — reproducible corpus builds, the
 * property that matters when a 100 TB mix must be re-derivable
 * bit-for-bit months later.
 */
object Mix {

  /**
   * Stratified sampling: keep ~`targetPerSource` documents per source
   * via a deterministic hash threshold — the scale path: NO sort, NO
   * window; one tiny per-source count aggregate broadcast back over
   * the corpus, then a codegen'd filter.
   *
   * The threshold is exact integer arithmetic
   * (`target·2^32 / count_s`, floor division) against the first 8 md5
   * hex chars of a salted key (uniform on [0, 2^32)), so the kept set
   * is engine-portable and the realized rate is within O(1/√n) of
   * target/count — the classic hash-sample tradeoff (exact-n needs a
   * per-source ranking sort; at 100 TB the approximation is the right
   * default, and re-running never changes the sample).
   */
  def stratifiedSample(docs: DataFrame, targetPerSource: Long = 10): DataFrame = {
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("cnt"))
    // floor(target·2^32 / cnt) in IEEE double is exact for any
    // numerator < 2^53 (an integer quotient is representable and
    // returned exactly; otherwise the fractional part ≥ 1/cnt dwarfs
    // the 0.5-ulp division error) — so Spark and DuckDB agree bit-wise
    val thresh = counts.select(
      col("source"),
      least(
        floor(lit(targetPerSource.toDouble) * lit(4294967296.0) / col("cnt"))
          .cast("long"),
        lit(4294967296L)).as("thresh"))
    docs
      .join(broadcast(thresh), "source")
      .where(
        conv(substring(md5(concat_ws("|", lit("s"), col("source"),
          col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long") < col("thresh"))
      .select(col("doc_id"), col("source"))
  }

  /**
   * Temperature-flattened source mixing (T = 2): keep probability per
   * document ∝ 1/√count_s, so a source's realized share of the mix is
   * ∝ √count_s — the standard up-weighting of small/rare sources in a
   * pretraining mix (against raw-proportional sampling that lets one
   * giant crawl dominate).
   *
   * Exactness contract: the per-source weight is `isqrt = ⌊√count_s⌋`.
   * IEEE-754 sqrt is correctly rounded and count_s ≪ 2^52, so the
   * floor is the true integer square root in every engine; from there
   * the threshold `⌊target·2^32 / (Σ isqrt · isqrt_s)⌋` is pure
   * integer arithmetic. T = 2 is hardcoded BECAUSE `pow` (any other
   * temperature) is not correctly rounded and would break the
   * cross-engine bit-for-bit replay contract.
   *
   * Same scale shape as [[stratifiedSample]]: one tiny per-source
   * aggregate (the only driver scalar is Σ isqrt — an exact integer
   * Allreduce), broadcast back, codegen'd hash filter. NO sort, NO
   * window.
   */
  /**
   * Weighted priority sampling WITHOUT replacement (Duffield-Lund-
   * Thorup / A-Res order statistics): item priority = h / w with h a
   * deterministic uniform hash — the k SMALLEST priorities form the
   * sample, so an item's inclusion odds scale with its weight
   * (n_chars: long documents count more), yet the result is exact-k,
   * replayable, and engine-portable.
   *
   * Integer-exact: h = 40-bit md5 prefix (< 2^40), priority =
   * ⌊h·10⁶ / n_chars⌋ — the numerator tops out at ~1.1e18, inside
   * long range, so both engines compute the identical priority and
   * the (prio, doc_id) order is total. Scale shape: TakeOrdered
   * top-k, no global sort.
   */
  def weightedSample(docs: DataFrame, k: Int = 50): DataFrame = {
    val prio = expr(
      "cast(conv(substring(md5(concat('ws|', cast(doc_id as string))), 1, 10), 16, 10) as bigint)" +
        " * 1000000L div n_chars")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("prio").asc, col("doc_id").asc)
    docs.select(col("doc_id"), col("source"), col("n_chars"), prio.as("prio"))
      .orderBy(col("prio").asc, col("doc_id").asc).limit(k)
      .withColumn("rank", row_number().over(w).cast("long"))
  }

  def temperatureMix(docs: DataFrame, totalTarget: Long = 120): DataFrame = {
    val w = docs.groupBy(col("source")).agg(count(lit(1)).as("cnt"))
      .select(col("source"),
        floor(sqrt(col("cnt").cast("double"))).cast("long").as("isq"))
    // coalesce: sum() over zero rows is NULL — an empty corpus must
    // yield an empty mix, not a driver NPE / div-by-zero threshold
    val tot = w.agg(coalesce(sum(col("isq")), lit(0L))).first().getLong(0)
    if (tot == 0L)
      return docs.select(col("doc_id"), col("source")).limit(0)
    val thresh = w.select(
      col("source"),
      least(expr(s"(${totalTarget}L * 4294967296L) div (${tot}L * isq)"),
        lit(4294967296L)).as("thresh"))
    docs
      .join(broadcast(thresh), "source")
      .where(
        conv(substring(md5(concat_ws("|", lit("t"), col("source"),
          col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long") < col("thresh"))
      .select(col("doc_id"), col("source"))
  }

  /**
   * Sequence packing: concat-then-chunk documents into context windows
   * of `capacity` tokens, per source, in stable doc_id order — the
   * standard pretraining batcher (a true first-fit bin pack is a
   * sequential recurrence; concat-then-chunk is what production
   * pipelines run because it is a pure prefix sum).
   *
   * One shuffle (by source) + an in-partition running sum. Skew note:
   * a single giant source serializes into one task's sort — at corpus
   * scale pre-split hot sources on a salt of floor(doc_id / B) and
   * offset bin ids per salt range (bin boundaries within a range
   * depend only on that range's local prefix sums once ranges start at
   * multiples of capacity).
   *
   * @return (doc_id, source, n_tokens, bin_id, bin_offset): doc
   *         `doc_id` contributes its tokens to window `bin_id`
   *         starting at offset `bin_offset` (docs straddling a
   *         boundary spill into bin_id+1, as in concat-then-chunk)
   */
  def pack(docs: DataFrame, capacity: Long = 512): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(
        col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(
        col("doc_id"), col("source"), col("n_tokens"),
        (col("cum_before") / capacity).cast("long").as("bin_id"),
        pmod(col("cum_before"), lit(capacity)).as("bin_offset"))
  }
}
