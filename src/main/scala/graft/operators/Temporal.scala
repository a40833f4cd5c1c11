package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal join operators — the two classic "Spark lacks the operator,
 * compose it from primitives" cases (task-brief custom-operator
 * preference (a): compose existing ops).
 *
 * Both avoid the planner's default for inequality conditions — a
 * BroadcastNestedLoopJoin that is quadratic in rows and single-stage —
 * by reshaping the computation so every exchange is an equi-key hash
 * shuffle, which is what survives a 100 TB input.
 */
object Temporal {

  /**
   * As-of join: for every probe row, attach the LATEST quote row with
   * the same key and strictly smaller order value (the trade⋈quote /
   * event⋈snapshot join). Probes with no earlier quote are dropped
   * (inner as-of).
   *
   * Implementation is the MERGE as-of join, not a join at all: union
   * the two sides, ONE hash shuffle by `key`, and a running
   * `max(quote-struct)` over the order-value range frame
   * `(-∞, current-1]` — O(n log n) per key for the sort, zero
   * candidate blow-up, no nested loop. The range frame (not a row
   * frame) is what makes the semantics strict: a quote AT the probe's
   * order value is excluded regardless of row-order ties, and
   * `max(struct(ord, payload…))` makes equal-`ord` quote ties
   * deterministic (lexicographically largest payload wins).
   *
   * @param probes       left side; all its columns pass through
   * @param quotes       right side
   * @param key          equi-key column name (both sides)
   * @param ord          numeric order column name (both sides) —
   *                     numeric because a range frame needs arithmetic
   *                     (timestamps: pass epoch micros)
   * @param quotePayload quote columns to carry; returned inside a
   *                     struct column `asof` as (ord, payload…)
   */
  def asOfJoin(
      probes: DataFrame,
      quotes: DataFrame,
      key: String,
      ord: String,
      quotePayload: Seq[String]): DataFrame = {
    val q = quotes.select(
      col(key), col(ord),
      struct((col(ord).as("q_" + ord) +: quotePayload.map(col)): _*).as("__quote"))
    val p = probes.withColumn("__probe", lit(true))
    val u = p.unionByName(q, allowMissingColumns = true)
    val w = Window.partitionBy(col(key)).orderBy(col(ord))
      .rangeBetween(Window.unboundedPreceding, -1)
    u.withColumn("asof", max(col("__quote")).over(w))
      .where(col("__probe") && col("asof").isNotNull)
      .drop("__quote", "__probe")
  }

  /**
   * Range (interval) join: points ⋈ intervals on
   * `start <= point < end`, NO equi key. The scale path is bucketed
   * blocking: quantize time into `bucketWidth` buckets, explode each
   * interval onto the buckets it covers, and equi-join on the bucket —
   * every exchange is a hash shuffle, the nested loop shrinks to
   * within-bucket pairs. Each qualifying (point, interval) pair is
   * produced EXACTLY once (a point lives in one bucket; an interval
   * covers that bucket at most once), so no dedup pass is needed.
   *
   * Skew/size dial: `bucketWidth` trades replication of long intervals
   * (end−start)/W copies against bucket fan-in; pick it near the
   * median interval length. Intervals are exploded, points are not —
   * at 100 TB the point side is the big one and moves exactly once.
   *
   * @param points    table with numeric column `pt`
   * @param intervals table with numeric columns `start`, `end`
   *                  (half-open [start, end))
   * @return one row per qualifying pair, with all columns of both
   *         sides (names must not collide)
   */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      pt: String,
      start: String,
      end: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    val p = points.withColumn("__bucket", floor(col(pt) / w))
    val iv = intervals.withColumn(
      "__bucket",
      explode(sequence(floor(col(start) / w),
        floor((col(end) - 1) / w))))
    p.join(iv, Seq("__bucket"))
      .where(col(pt) >= col(start) && col(pt) < col(end))
      .drop("__bucket")
  }
}
