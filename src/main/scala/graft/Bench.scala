package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main (driver contract): runs the headline queries on
 * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line.
 *
 * Timing protocol mirrors the reference (pagerank.cpp:27-28,102-105):
 * the headline metric is PageRank **edges/sec/iteration to 1e-6
 * convergence**, timed around the compute loop only (graph load
 * excluded), after one untimed warmup iteration batch (the graph
 * build itself warms the persisted layouts).
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.file.transferTo", "false") // gVisor: NIO transferTo mmap/unmap churn is pathological
      .config("spark.shuffle.sort.bypassMergeThreshold", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](name: String)(f: => T): (T, Double) = {
      System.err.println(s"[bench] $name ...")
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name done in $s%.2f s")
      (r, s)
    }

    // Graph build (excluded from the headline metric, timed separately)
    val (gDir, buildDirSec) = timed("build-directed")(
      Graphs.get(spark, sfDir, symmetric = false))
    val (gSym, buildSymSec) = timed("build-symmetric")(
      Graphs.get(spark, sfDir, symmetric = true))

    // Headline: PageRank to 1e-6 convergence, edges/sec/iteration.
    // Reference protocol (pagerank.cpp:144-147): 1 untimed warmup +
    // timed repeats, median — the median also rides out this host's
    // nondeterministic slow windows (see BASELINE.md).
    val (pr, _) = timed("pagerank-converge-warmup")(
      algos.PageRank.run(gDir, iterations = 0, maxIterations = 60, tol = 1e-6))
    val prIters = pr.iterations
    val repeats = (1 to 3).map { r =>
      timed(s"pagerank-converge-$r")(
        algos.PageRank.run(gDir, iterations = 0, maxIterations = 60, tol = 1e-6))._2
    }.sorted
    val prSec = repeats(repeats.length / 2)
    val edgesPerSecIter =
      if (prSec > 0) gDir.numEdges.toDouble * prIters / prSec else 0.0

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    results += "pagerank_converge" -> prSec
    results += "cc" -> timed("cc")(algos.ConnectedComponents.run(gSym))._2
    results += "lp" -> timed("lp")(algos.LabelPropagation.run(gSym))._2
    results += "triangles" -> timed("triangles")(algos.TriangleCount.count(gSym))._2
    val queryTimes = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (_, s) = timed(name)(
        try fn(spark, sfDir).count()
        catch { case e: Throwable => System.err.println(s"[bench] $name FAILED: $e"); -1L })
      name -> s
    }
    results ++= queryTimes

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.values.sum
    println(
      s"""{"metric":"pagerank_edges_per_sec_per_iter","value":$edgesPerSecIter,"unit":"edges/sec/iter","pr_iterations":$prIters,"pr_seconds":$prSec,"num_edges":${gDir.numEdges},"num_vertices":${gDir.numVertices},"build_seconds":${buildDirSec + buildSymSec},"total_query_seconds":$total,"queries":$qs,"cpus":$cpus,"sf":"$sfDir"}""")
    spark.stop()
  }
}
