package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{EdgeBuilder, Transcripts}

/** Dev-only profiling / plan-inspection scratchpad. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.file.transferTo", "false") // gVisor: NIO transferTo mmap/unmap churn is pathological
      .config("spark.shuffle.sort.bypassMergeThreshold", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[t] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val gDir = t("build-dir")(LinkGraph.fromKeyEdges(
      EdgeBuilder.keyEdges(Transcripts.fromEvents(spark, sfDir)), symmetric = false, cpus.toInt))
    val gSym = t("build-sym")(LinkGraph.fromKeyEdges(
      EdgeBuilder.keyEdges(Transcripts.fromEvents(spark, sfDir)), symmetric = true, cpus.toInt))
    for (r <- 1 to 4) {
      val pr = t(s"pr-converge-dir-$r")(algos.PageRank.run(gDir, iterations = 0, maxIterations = 60, tol = 1e-6))
      System.err.println(s"[t] run $r iters=${pr.iterations}")
    }
    spark.stop()
  }
}
