package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed first-principal-component extraction over the
 * embedding table — the whitening/anisotropy diagnostic (a strongly
 * dominant PC1 is the "common-direction" pathology that makes raw
 * cosine retrieval collapse; ABTT-style post-processing removes it).
 *
 * Scale decomposition, the IVF precedent ([[Similarity]]: tiny
 * driver-side model state, big table never moves):
 *  - the DATA pass is one grouped aggregate building the d×d
 *    quantized covariance (d = 64 → 4,096 cells, CONSTANT in corpus
 *    size; map-side combine collapses each partition to ≤ d² rows);
 *  - power iteration runs driver-side on those 4,096 longs in exact
 *    BigInt arithmetic (8 rounds, renormalizing to ×10⁶ by the max
 *    |component| each round — a deterministic integer trajectory);
 *  - the PROJECTION pass broadcasts the 64-entry eigenvector and
 *    takes one exact integer dot product per vector.
 *
 * Integer-exactness contract: coordinates quantize to xq =
 * round(x·10³) (the proven cross-engine rounding, cf. normCensus);
 * covariance cells are exact Σ xq·xq; the matvec runs in
 * decimal-width arithmetic (BigInt here, HUGEINT in the oracle) so
 * no overflow below ~10⁹ vectors at 10³ quantization; division by
 * the max uses sign-split floor division (both engines floor
 * NONNEGATIVE operands identically — `div`/`//` disagree on
 * negatives, so negatives are negated around the division). Sign
 * canonicalization: the lowest-indexed nonzero component is made
 * positive. The DuckDB oracle replays the identical 8-round
 * trajectory.
 */
object Pca {

  /** (vec_id, i, xq) quantized coordinates (i is 1-based to match
   * DuckDB's generate_subscripts). */
  private def quantized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      posexplode(col("embedding")).as(Seq("i0", "x")))
      .select(col("vec_id"), (col("i0") + 1).as("i"),
        expr("cast(round(cast(x AS double) * 1000) AS bigint)").as("xq"))

  /** Exact integer power iteration on the collected covariance. */
  private def powerIterate(
      cov: Map[(Int, Int), BigInt], dims: Seq[Int], rounds: Int): Map[Int, BigInt] = {
    val scale = BigInt(1000000)
    var w: Map[Int, BigInt] = dims.map(_ -> scale).toMap
    for (_ <- 1 to rounds) {
      val u = dims.map { j =>
        j -> dims.map(k => cov.getOrElse((j, k), BigInt(0)) * w(k)).sum
      }.toMap
      val m = u.values.map(_.abs).max
      w =
        if (m == 0) u
        else u.map { case (j, v) =>
          j -> (if (v < 0) -((-v) * scale / m) else v * scale / m)
        }
    }
    // canonical sign: lowest-indexed nonzero component positive
    dims.sorted.find(j => w(j) != 0) match {
      case Some(j0) if w(j0) < 0 => w.map { case (j, v) => j -> -v }
      case _ => w
    }
  }

  /** @return (vec_id, pc1_q): exact integer projection onto the
   * 8-round power-iteration PC1 estimate. */
  def pc1(emb: DataFrame, rounds: Int = 8): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val q = quantized(emb).persist()
    // covariance WITHOUT a self-join: quantize the array once, chain
    // two generators so each row fans out to its d² products locally,
    // and let the single groupBy's map-side combine collapse every
    // partition to ≤ d² rows before the only shuffle. A vec_id
    // self-join would shuffle the exploded table twice for the same
    // arithmetic.
    val qarr = emb.select(
      expr("transform(embedding, x -> cast(round(cast(x AS double) * 1000) AS long))")
        .as("qa"))
    val covDf = qarr
      .select(posexplode(col("qa")).as(Seq("j0", "xj")), col("qa"))
      .select(col("j0"), col("xj"), posexplode(col("qa")).as(Seq("k0", "xk")))
      .groupBy((col("j0") + 1).as("j"), (col("k0") + 1).as("k"))
      .agg(sum(col("xj") * col("xk")).as("c"))
    val cov = covDf.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> BigInt(r.getLong(2))).toMap
    if (cov.isEmpty) {
      // empty embeddings table: no covariance, no PC1 — return the
      // empty projection (the oracle's answer) instead of letting
      // powerIterate's max() throw on the empty dim set
      q.unpersist(blocking = false)
      return Seq.empty[(Long, Long)].toDF("vec_id", "pc1_q")
    }
    val dims = cov.keys.map(_._1).toSeq.distinct.sorted
    val w = powerIterate(cov, dims, rounds)

    val wDf = dims.map(j => (j, w(j).toLong)).toDF("i", "w")
    val out = q.join(broadcast(wDf), "i")
      .groupBy(col("vec_id"))
      .agg(sum(col("xq") * col("w")).as("pc1_q"))
    q.unpersist(blocking = false)
    out
  }
}
