package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{EdgeBuilder, Transcripts}

/**
 * Two-parallelism-level scaling benchmark (BASELINE.md protocol).
 *
 * The north rule's "N and 4N executors, scaling efficiency ≥0.8"
 * cannot use a real cluster in this sandbox, so the same job runs on
 * the same deterministic input at `local[8]` and `local[32]` (shuffle
 * partitions scaled alike) and we report PageRank edges/sec/iteration
 * at both plus `efficiency = (throughput_32 / throughput_8) / 4`.
 *
 * Timing mirrors the reference (pagerank.cpp:27-28,102-105,144-147):
 * compute loop only (load excluded), 1 untimed warmup run then
 * `repeats` timed runs, median reported.
 *
 * Input: synthetic transcripts (fixed arithmetic generator — identical
 * at any parallelism), sized so a run is compute-bound, not
 * job-overhead-bound.
 *
 * Usage: runMain graft.ScalingBench [numConvs] [turnsPerConv] [iters] [repeats]
 */
object ScalingBench {

  def main(args: Array[String]): Unit = {
    val numConvs = args.lift(0).map(_.toLong).getOrElse(300000L)
    val turnsPerConv = args.lift(1).map(_.toInt).getOrElse(20)
    val iters = args.lift(2).map(_.toInt).getOrElse(5)
    val repeats = args.lift(3).map(_.toInt).getOrElse(3)
    val levels = Seq(8, 32)

    val results = levels.map { cpus =>
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .appName(s"graft-scaling-$cpus")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.file.transferTo", "false") // gVisor: NIO transferTo mmap/unmap churn is pathological
      .config("spark.shuffle.sort.bypassMergeThreshold", "8")
      .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")

      val tr = Transcripts.synthetic(spark, numConvs, turnsPerConv, numTools = 5000)
      val g = LinkGraph.fromKeyEdges(EdgeBuilder.keyEdges(tr), symmetric = false, cpus)
      System.err.println(s"[scale] local[$cpus]: |V|=${g.numVertices} |E|=${g.numEdges}")

      // warmup (1 run, untimed) then timed repeats — reference protocol
      algos.PageRank.run(g, iterations = iters)
      val times = (1 to repeats).map { r =>
        val t0 = System.nanoTime()
        algos.PageRank.run(g, iterations = iters)
        val s = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[scale] local[$cpus] run $r: $s%.2f s")
        s
      }.sorted
      val median = times(times.length / 2)
      val eps = g.numEdges.toDouble * iters / median
      val out = (cpus, g.numEdges, median, eps)
      spark.stop()
      // allow a fresh context for the next level
      org.apache.spark.sql.classic.SparkSession.clearActiveSession()
      org.apache.spark.sql.classic.SparkSession.clearDefaultSession()
      out
    }

    val (c8, edges, t8, e8) = results(0)
    val (c32, _, t32, e32) = results(1)
    val efficiency = (e32 / e8) / (c32.toDouble / c8)
    println(
      f"""{"metric":"scaling_efficiency","value":$efficiency%.3f,"edges":$edges,"iters_per_run":$iters,"levels":{"local[$c8]":{"sec_median":$t8%.2f,"edges_per_sec_iter":$e8%.0f},"local[$c32]":{"sec_median":$t32%.2f,"edges_per_sec_iter":$e32%.0f}}}""")
  }
}
