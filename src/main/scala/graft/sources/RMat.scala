package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic R-MAT (recursive-matrix / Kronecker) edge generator —
 * the synthetic power-law graph SOURCE for exercising the engine at
 * scales no fixture can ship: the reference reads binary edge lists
 * off a shared FS (core/graph.hpp:771-795); at 10^12 edges GENERATING
 * the graph beats reading it, and a pure function of (seed, i) needs
 * no storage at all.
 *
 * Per recursion level the quadrant draw is a dyadic-probability md5
 * coin: h = 16-bit md5 prefix of `seed|i|level`; the classic skewed
 * R-MAT mix (a,b,c,d) = (9,3,3,1)/16 in exact sixteenths —
 * src bit ⟺ h ≥ 49152, dst bit ⟺ h ∈ [36864,49152) ∪ [61440,2^16).
 * Everything is exact integer arithmetic on a hash, so any engine
 * replays the identical graph (the DuckDB oracle regenerates it).
 *
 * Scale shape: `spark.range(n)` + codegen'd column expressions — no
 * input, no shuffle, embarrassingly parallel; 2·scale md5 calls per
 * edge is the entire cost.
 */
object RMat {

  /** @return (i, src, dst) — edge i of an R-MAT multigraph over
   *          2^scale vertices (self-loops/duplicates possible, as in
   *          the standard generator; feed through LinkGraph's build
   *          for the deduped simple graph). */
  def edges(spark: SparkSession, n: Long, scale: Int,
      seed: String = "rmat"): DataFrame = {
    require(scale >= 1 && scale <= 62, "scale must be in [1, 62]")
    val df = spark.range(n).toDF("i")
    def h(l: Int): String =
      s"cast(conv(substring(md5(concat('$seed|', cast(i AS string), '|', '$l')), 1, 4), 16, 10) AS bigint)"
    val srcExpr = (0 until scale).map { l =>
      s"(CASE WHEN ${h(l)} >= 49152 THEN ${1L << (scale - 1 - l)}L ELSE 0L END)"
    }.mkString(" + ")
    val dstExpr = (0 until scale).map { l =>
      s"(CASE WHEN (${h(l)} >= 36864 AND ${h(l)} < 49152) OR ${h(l)} >= 61440" +
        s" THEN ${1L << (scale - 1 - l)}L ELSE 0L END)"
    }.mkString(" + ")
    df.select(col("i"), expr(srcExpr).as("src"), expr(dstExpr).as("dst"))
  }
}
