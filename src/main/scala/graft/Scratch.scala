package graft

import org.apache.spark.sql.SparkSession

import graft.sources.{EdgeBuilder, Transcripts, VertexDict}

/** Dev-only profiling scratchpad. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[t] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val tr = t("transcripts.count")(Transcripts.fromEvents(spark, sfDir).count())
    val ke = Transcripts.fromEvents(spark, sfDir)
    val keyEdges = EdgeBuilder.keyEdges(ke)
    t("keyEdges.count")(keyEdges.count())
    val dict = t("dict.build")(VertexDict.build(keyEdges, 8))
    t("dict.count")(dict.count())
    t("linkgraph")(LinkGraph.fromKeyEdges(keyEdges, symmetric = false, 8))
    t("linkgraph-sym")(LinkGraph.fromKeyEdges(keyEdges, symmetric = true, 8))
    spark.stop()
  }
}
