package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
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
 * `defaultSizeInBytes` and stay O(1). Unlike localCheckpoint it DOES
 * preserve hash output partitioning (rewritten onto the analyzed
 * output attributes), so a state table that ends an iteration
 * clustered by `id` starts the next iteration's gather join without a
 * fresh Exchange — the Spark analogue of Gemini keeping vertex state
 * NUMA-resident across supersteps (core/graph.hpp:227-236).
 *
 * Lives in `org.apache.spark.sql` solely for `private[sql]` access to
 * `Dataset.ofRows`; uses only public Spark source APIs, no reflection.
 */
object GraftLineage {

  /** Materialize `df` (persisted) and return a plan-truncated,
   * stats-free DataFrame. The backing RDD is freed by the
   * ContextCleaner once the returned Dataset becomes unreachable. */
  def cut(df: DataFrame): DataFrame = cutCounted(df)._1

  /** [[cut]] that also sums a double column during the materialization
   * pass — one job instead of cut + aggregate. Uses `rdd.aggregate`
   * (an ACTION, so exactly-once under task retries — a column-sum
   * accumulator inside the map would double-count retried tasks and
   * could shift a convergence loop's stopping iteration). PageRank's
   * per-iteration delta (the reference's Allreduce,
   * core/graph.hpp:1856-1858) rides the state materialization. */
  def cutSummed(df: DataFrame, sumCol: String): (DataFrame, Double) = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val spark = ds.sparkSession
    val qe = ds.queryExecution
    val idx = qe.analyzed.output.indexWhere(_.name == sumCol)
    require(idx >= 0, s"column $sumCol not found")
    val rdd = qe.toRdd.map(_.copy())
    rdd.persist(StorageLevel.MEMORY_AND_DISK)
    rdd.localCheckpoint()
    val s = rdd.aggregate(0.0)((acc, row) => acc + row.getDouble(idx), _ + _)
    val plan = LogicalRDD(
      qe.analyzed.output, rdd,
      rewrittenPartitioning(qe), Nil, isStreaming = false, stream = None)(
      spark, originStats = None, originConstraints = None)
    (classic.Dataset.ofRows(spark, plan), s)
  }

  /** [[cut]] that also returns the materialized row count — the
   * eager materialization is a count() anyway, so frontier loops that
   * need the active count (every frontier algorithm does) get it for
   * free instead of paying a second job per superstep. */
  def cutCounted(df: DataFrame): (DataFrame, Long) = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val spark = ds.sparkSession
    val qe = ds.queryExecution
    // toRdd reuses UnsafeRow buffers per partition — copy before caching
    val rdd = qe.toRdd.map(_.copy())
    rdd.persist(StorageLevel.MEMORY_AND_DISK)
    // Sever the RDD dependency chain too: preserved partitioning means
    // no Exchange between iterations, so without this every superstep's
    // narrow lineage fuses into ONE stage whose task binary grows until
    // task deserialization StackOverflows (observed at ~60 supersteps).
    rdd.localCheckpoint()
    val n = rdd.count() // eager — materializes, truncates, finalizes AQE plan
    val plan = LogicalRDD(
      qe.analyzed.output, rdd,
      rewrittenPartitioning(qe), Nil, isStreaming = false, stream = None)(
      spark, originStats = None, originConstraints = None)
    (classic.Dataset.ofRows(spark, plan), n)
  }

  /** Explicitly unpersist the RDD behind a [[cut]] DataFrame (no-op for
   * anything else). The ContextCleaner would get there eventually via
   * GC, but superstep loops allocate one cached state per iteration —
   * relying on GC lets dozens of dead states pile up and evict live
   * cache under memory pressure (observed: 6× CC slowdown when run
   * after 40 PageRank iterations in one session). */
  def free(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Final physical outputPartitioning, with its attribute references
   * rewritten from the optimized plan's output ids to the analyzed
   * plan's (the ids a consumer of the new LogicalRDD will see).
   * Falls back to UnknownPartitioning whenever anything is off —
   * costing at most one redundant Exchange, never correctness. */
  private def rewrittenPartitioning(
      qe: execution.QueryExecution): Partitioning = {
    try {
      val physical = qe.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.finalPhysicalPlan
        case p => p
      }
      physical.outputPartitioning match {
        case hp: HashPartitioning =>
          LogicalRDD.buildOutputAssocForRewrite(qe.optimizedPlan.output, qe.analyzed.output) match {
            case Some(assoc) =>
              val rewritten = hp.expressions.map(_.transform {
                case a: Attribute => assoc.getOrElse(a, a)
              })
              val outIds = qe.analyzed.output.map(_.exprId).toSet
              val ok = rewritten.forall(_.references.forall(r => outIds.contains(r.exprId)))
              if (ok) HashPartitioning(rewritten, hp.numPartitions)
              else UnknownPartitioning(0)
            case None => UnknownPartitioning(0)
          }
        case _ => UnknownPartitioning(0)
      }
    } catch { case _: Throwable => UnknownPartitioning(0) }
  }
}
