package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiling / plan-inspection scratchpad. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = args.lift(1).getOrElse("8")
    val query = args.lift(2).getOrElse("q_walks")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.file.transferTo", "false") // gVisor: NIO transferTo mmap/unmap churn is pathological
      .config("spark.shuffle.sort.bypassMergeThreshold", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    query.split(',').foreach { q =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.coalesce(1).write.mode("overwrite").parquet(s"/tmp/scratch_out/$q")
      System.err.println(f"[t] $q: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.read.parquet(s"/tmp/scratch_out/$q").show(5, truncate = false)
    }
    spark.stop()
  }
}
