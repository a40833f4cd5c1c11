package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.syntax._

/**
 * Greedy maximal coverage — the classic (1−1/e)-approximation pick
 * order (and, run to completion, the ln n set-cover greedy): k times,
 * choose the conversation covering the most NOT-YET-COVERED tools
 * (ties by conv_id). The coreset-selection primitive of data
 * curation: "which k conversations exercise the widest tool surface"
 * is the same computation as "which k documents cover the most
 * vocabulary" — swap the membership table.
 *
 * Adaptive by nature (pick i+1 depends on pick i), so each round is
 * one grouped count + one driver argmax scalar (the Allreduce
 * analog) + one anti-join shrinking the uncovered set — k rounds
 * total, k fixed and small. The uncovered set stays a DataFrame
 * (never collected), so the tool/vocab universe can be arbitrarily
 * large. The DuckDB oracle replays the trajectory as k mechanically
 * generated chained CTE steps.
 *
 * @return one row per pick: (pick, conv_id, n_new) in pick order —
 *         stops early if coverage completes before k picks.
 */
object Cover {

  def greedyCover(transcripts: DataFrame, k: Int = 12): DataFrame = {
    val spark = transcripts.sparkSession
    import spark.implicits._
    val ct = transcripts
      .where(col("tool").isNotNull)
      .select(col("conv_id"), col("tool"))
      .distinct()
      .persist()
    var uncovered = ct.select(col("tool")).distinct().graftCut
    var nUnc = uncovered.count()
    val picks = scala.collection.mutable.ArrayBuffer[(Long, String, Long)]()
    var i = 1
    while (i <= k && nUnc > 0) {
      val best = ct.join(uncovered, "tool")
        .groupBy(col("conv_id")).agg(count(lit(1)).as("n_new"))
        .orderBy(col("n_new").desc, col("conv_id").asc).limit(1)
        .collect()(0)
      val (conv, nNew) = (best.getString(0), best.getLong(1))
      picks += ((i.toLong, conv, nNew))
      val prev = uncovered
      val (u2, n2) = uncovered
        .join(ct.where(col("conv_id") === conv).select(col("tool")),
          Seq("tool"), "left_anti")
        .graftCutCount
      prev.graftFree()
      uncovered = u2
      nUnc = n2
      i += 1
    }
    uncovered.graftFree()
    ct.unpersist(blocking = false)
    picks.toSeq.toDF("pick", "conv_id", "n_new")
  }
}
