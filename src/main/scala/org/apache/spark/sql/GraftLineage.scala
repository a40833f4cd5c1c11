package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.physical.UnknownPartitioning
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/**
 * Iterative-lineage cut for superstep loops (SURVEY.md §7.4.1).
 *
 * `Dataset.localCheckpoint` in Spark 4.1 rewrites plan STATISTICS onto
 * the produced `LogicalRDD` (`LogicalRDD.rewriteStatsAndConstraints`,
 * sql/execution/ExistingRDD.scala). Size-only join stats are the
 * PRODUCT of children's sizeInBytes, so when iteration k's plan
 * references iteration k-1's LogicalRDD more than once (state joined
 * for both update and delta), the BigInt digit count DOUBLES per
 * iteration — after ~30 supersteps the driver spends minutes inside
 * `BigInteger.multiply` (observed via jstack in this repo's bench).
 *
 * This shim materializes the plan like localCheckpoint (persisted
 * InternalRow RDD, eager) but builds the LogicalRDD with
 * `originStats = None`, so each iteration's stats fall back to
 * `defaultSizeInBytes` and stay O(1). Lives in `org.apache.spark.sql`
 * solely for `private[sql]` access to `Dataset.ofRows` — uses only
 * public Spark source APIs, no reflection.
 */
object GraftLineage {

  /** Materialize `df` (persisted) and return a plan-truncated, stats-free
   * DataFrame. The backing RDD is freed by the ContextCleaner once the
   * returned Dataset becomes unreachable. */
  def cut(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val spark = ds.sparkSession
    val qe = ds.queryExecution
    // toRdd reuses UnsafeRow buffers per partition — copy before caching
    val rdd = qe.toRdd.map(_.copy())
    rdd.persist(StorageLevel.MEMORY_AND_DISK)
    rdd.count() // eager
    val plan = LogicalRDD(
      qe.analyzed.output, rdd,
      UnknownPartitioning(0), Nil, isStreaming = false, stream = None)(
      spark, originStats = None, originConstraints = None)
    classic.Dataset.ofRows(spark, plan)
  }
}
