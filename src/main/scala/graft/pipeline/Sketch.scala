package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Mergeable sketch operators for corpus-scale approximate statistics —
 * the structures a 100 TB pipeline actually ships between stages
 * (register/counter TABLES, not finished estimates: sketches from two
 * partitions/days/shards merge by max/sum, estimates don't).
 *
 * Both sketches are DETERMINISTIC (md5-derived hashes, no RNG), so
 * the exported tables are integer-exact and engine-portable — the
 * DuckDB oracle replays the identical registers. The float-valued
 * estimators (`estimateHll`, `cmsQuery`) live driver-side and are
 * sbt-tested against exact counts; only integer register tables cross
 * the oracle boundary.
 */
object Sketch {

  /** 2^p HLL registers. */
  val hllP = 8
  val hllM: Int = 1 << hllP // 256

  /** 60-bit md5 hash of a column (matches the Dedup/Mix determinism
   * contract: DuckDB `('0x'||substr(md5(x),1,15))::BIGINT`). */
  private def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /**
   * HyperLogLog register table for distinct-token counts per source:
   * bucket = h mod 2^p, rho = leading-zero rank of the remaining
   * 52 bits (53 − bitlen(w), an exact integer — no float log2), the
   * register = max rho per (source, bucket).
   *
   * Scale shape: ONE groupBy with map-side combine (max is
   * associative+idempotent — duplicate tokens cost nothing); output
   * is ≤ 256 rows per source regardless of corpus size. Registers
   * from different shards merge by `max` — the property that lets a
   * 1000-executor job compute global distinct counts with a
   * 256-row exchange.
   */
  def hll(docs: DataFrame): DataFrame = {
    val t = docs
      .select(col("source"), explode(split(lower(col("text")), " ")).as("term"))
      .select(col("source"), h60(col("term")).as("h"))
    val w = shiftright(col("h"), hllP) // exact: h is a 60-bit non-negative long
    val rho = when(w === 0, lit(53))
      .otherwise(lit(53) - length(conv(w, 10, 2)))
    t.select(col("source"), pmod(col("h"), lit(hllM.toLong)).as("bucket"), rho.as("rho"))
      .groupBy(col("source"), col("bucket"))
      .agg(max(col("rho")).cast("long").as("max_rho"))
      .select(col("source"), col("bucket").cast("long").as("bucket"), col("max_rho"))
  }

  /** Driver-side HLL estimator (Flajolet et al. 2007) with the
   * small-range linear-counting correction; registers absent from the
   * table are zero. */
  def estimateHll(registers: Seq[(Long, Long)]): Double = {
    val m = hllM.toDouble
    val regs = Array.fill(hllM)(0L)
    registers.foreach { case (b, r) => regs(b.toInt) = r }
    val alpha = 0.7213 / (1 + 1.079 / m)
    val e = alpha * m * m / regs.map(r => math.pow(2.0, -r.toDouble)).sum
    val zeros = regs.count(_ == 0L)
    if (e <= 2.5 * m && zeros > 0) m * math.log(m / zeros) else e
  }

  /** Count-min depth (independent hash rows) and width (counters). */
  val cmsDepth = 4
  val cmsWidth = 256

  /**
   * Count-min sketch of token frequencies per source: `cmsDepth`
   * md5-salted hash rows × `cmsWidth` counters; cell (row, col) =
   * Σ count(token) over tokens with h_row(token) mod width = col.
   * Point query = min over rows (never under-counts).
   *
   * Scale shape: explode → ONE groupBy(source, row, col) with
   * map-side combine; output is depth·width rows per source. Merges
   * by cell-wise `sum` across shards/days — the heavy-hitter
   * prefilter for vocabularies too large to count exactly.
   */
  def countMin(docs: DataFrame): DataFrame = {
    val term = explode(split(lower(col("text")), " "))
    val t = docs.select(col("source"), term.as("term"))
    val rows = (0 until cmsDepth).map { r =>
      t.select(
        col("source"),
        lit(r.toLong).as("hrow"),
        pmod(h60(concat(lit(s"$r:"), col("term"))), lit(cmsWidth.toLong)).as("hcol"))
    }.reduce(_ unionByName _)
    rows.groupBy(col("source"), col("hrow"), col("hcol"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Driver-side point query: min over the depth rows' counters. */
  def cmsQuery(cells: Map[(Long, Long), Long], source: String, term: String): Long = {
    (0 until cmsDepth).map { r =>
      val h = new java.math.BigInteger(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"$r:$term".getBytes("UTF-8"))
          .take(8).map(b => f"$b%02x").mkString, 16)
        .shiftRight(4) // first 15 hex chars = 60 bits
        .mod(java.math.BigInteger.valueOf(cmsWidth.toLong)).longValue()
      cells.getOrElse((r.toLong, h), 0L)
    }.min
  }
}
