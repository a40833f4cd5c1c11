package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{EdgeBuilder, Transcripts}

/** Dev-only profiling / plan-inspection scratchpad. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = LinkGraph.fromKeyEdges(
      EdgeBuilder.keyEdges(Transcripts.fromEvents(spark, sfDir)), symmetric = false, 8)

    // one PageRank gather step: is the edge side exchange-free?
    val degs = g.degrees.select(col("id"), col("out_degree"))
    val curr = org.apache.spark.sql.GraftLineage.cut(
      degs.select(col("id"),
        when(col("out_degree") > 0, lit(1.0) / col("out_degree")).otherwise(1.0).as("v")))
    val sums = Superstep.gather(g, curr, col("v"), sum, g.numEdges, g.numVertices)
    val step = degs.join(sums, Seq("id"), "left")
      .select(col("id"), (lit(0.15) + lit(0.85) * coalesce(col("msg"), lit(0.0))).as("raw"))
    System.err.println("==== PageRank superstep plan ====")
    step.explain("formatted")
    spark.stop()
  }
}
