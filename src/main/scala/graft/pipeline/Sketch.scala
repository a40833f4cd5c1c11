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
  /** Pre-aggregation register rows (source, bucket, rho) — one per
   * token occurrence; shared by the batch [[hll]] and the streaming
   * register maintainer (streaming/SketchStream). */
  def hllRegisterRows(docs: DataFrame): DataFrame = {
    val t = docs
      .select(col("source"), explode(split(lower(col("text")), " ")).as("term"))
      .select(col("source"), h60(col("term")).as("h"))
    val w = shiftright(col("h"), hllP) // exact: h is a 60-bit non-negative long
    val rho = when(w === 0, lit(53))
      .otherwise(lit(53) - length(conv(w, 10, 2)))
    t.select(col("source"), pmod(col("h"), lit(hllM.toLong)).as("bucket"),
      rho.cast("long").as("rho"))
  }

  def hll(docs: DataFrame): DataFrame =
    hllRegisterRows(docs)
      .groupBy(col("source"), col("bucket"))
      .agg(max(col("rho")).as("max_rho"))
      .select(col("source"), col("bucket").cast("long").as("bucket"), col("max_rho"))

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

  /**
   * HLL register ALGEBRA: for every source pair, the union sketch's
   * integer sufficient statistics — register-wise max (the HLL merge)
   * reduced to (zeros, Σ 2^(53−r) scaled by 2^53-for-absent). The
   * consumer turns these into |A∪B| via the standard estimator and
   * |A∩B| via inclusion-exclusion with the per-source q_hll rows; the
   * ENGINE's export stays exact-integer (the 2^-r harmonic sum is
   * dyadic, so it scales to an exact long — same trick as the decay
   * weights). Mergeability is the point: set overlap between any two
   * 100 TB shards from kilobyte sketches, no rescan.
   *
   * @return (source_a, source_b, zeros, sum_scaled)
   */
  def hllPairStats(docs: DataFrame): DataFrame = {
    val regs = hll(docs)
    val srcs = docs.select(col("source")).distinct()
    val pairs = srcs.as("x").join(srcs.as("y"), col("x.source") < col("y.source"))
      .select(col("x.source").as("source_a"), col("y.source").as("source_b"))
    val ra = regs.select(col("source").as("source_a"), col("bucket"), col("max_rho"))
    val rb = regs.select(col("source").as("source_b"), col("bucket"), col("max_rho"))
    val u = pairs.join(ra, "source_a")
      .select(col("source_a"), col("source_b"), col("bucket"), col("max_rho"))
      .unionByName(pairs.join(rb, "source_b")
        .select(col("source_a"), col("source_b"), col("bucket"), col("max_rho")))
      .groupBy(col("source_a"), col("source_b"), col("bucket"))
      .agg(max(col("max_rho")).as("r"))
    u.groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("present"),
        sum(expr("shiftleft(1L, cast(53 - r as int))")).as("s"))
      .select(col("source_a"), col("source_b"),
        (lit(hllM.toLong) - col("present")).as("zeros"),
        (col("s") + (lit(hllM.toLong) - col("present")) * lit(1L << 53)).as("sum_scaled"))
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

  /** Bloom geometry: 2^12 bit positions, 3 hash slices. Words pack 60
   * bits, not 64: DuckDB's `<<` is overflow-checked, so a mask at bit
   * 63 (sign bit) would error in the oracle replay; 60-bit words keep
   * every mask positive in both engines. */
  val bloomBits = 4096
  val bloomK = 3
  val bloomWordBits = 60

  /**
   * Bloom-filter register table for per-source document membership:
   * element = the doc's 60-bit text hash; its `bloomK` bit positions
   * are disjoint 12-bit slices of that hash; registers = the packed
   * words `(source, word, bits)` with `bits = OR of set-bit masks`.
   *
   * The third mergeable sketch next to [[hll]]/[[countMin]] — filters
   * from different shards/days merge by word-wise `bit_or`, and a
   * membership probe ([[bloomContains]]) never false-negatives. At
   * 100 TB this is the cheap "have we already ingested this doc?"
   * pre-gate in front of exact dedup: ≤ 69 words per source cross the
   * wire regardless of corpus size, one groupBy with map-side combine.
   */
  def bloom(docs: DataFrame): DataFrame = {
    val h = h60(col("text"))
    val slices: Seq[Column] = (0 until bloomK).map { i =>
      pmod(shiftright(h, i * 12), lit(bloomBits.toLong))
    }
    docs
      .select(col("source"), explode(array(slices: _*)).as("pos"))
      .select(
        col("source"),
        expr(s"pos div $bloomWordBits").as("word"),
        expr(s"shiftleft(cast(1 as bigint), cast(pos % $bloomWordBits as int))").as("mask"))
      .groupBy(col("source"), col("word"))
      .agg(expr("bit_or(mask)").as("bits"))
  }

  /** Driver-side membership probe: true iff all `bloomK` bits are set
   * (may false-positive, never false-negative). */
  def bloomContains(words: Map[Long, Long], text: String): Boolean = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(15)
    val h = java.lang.Long.parseLong(hex, 16)
    (0 until bloomK).forall { i =>
      val pos = (h >> (i * 12)) % bloomBits
      val mask = 1L << (pos % bloomWordBits).toInt
      (words.getOrElse(pos / bloomWordBits, 0L) & mask) != 0L
    }
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
