package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.BucketedLayout

/** Degree-aware range bucketing (Gemini α·|V_p|+|E_p| chunking,
 * core/graph.hpp:823-846) — balance, locality, and layout tests. */
class BucketedLayoutSpec extends SparkSpec {

  /** Skewed fixture: one hub with out-degree 40 + a long chain. */
  lazy val skewed: LinkGraph = {
    val hub = (1 to 40).map(i => (0, i))
    val chain = (41 until 80).map(i => (i, i + 1))
    graphOf(hub ++ chain, symmetric = false)
  }

  test("buckets balance edge cost within greedy bound on a hub graph") {
    val nb = 4
    val buckets = BucketedLayout.assignBuckets(
      skewed.degrees, nb, degreeCol = "out_degree", alpha = 0.0)
    val hist = BucketedLayout.histogram(buckets, skewed.edgesBySrc).collect()
    assert(hist.length <= nb)
    val totalEdges = hist.map(_.getAs[Long]("edges")).sum
    assert(totalEdges == skewed.numEdges)
    val budget = totalEdges.toDouble / nb
    val maxW = 40.0 // hub out-degree — one vertex is never split
    hist.foreach { r =>
      val c = r.getAs[Long]("edges").toDouble
      assert(c <= budget + maxW, s"bucket ${r.get(0)} cost $c exceeds budget+maxW")
    }
    buckets.unpersist()
  }

  test("buckets are contiguous id ranges (locality preserved)") {
    val buckets = BucketedLayout.assignBuckets(skewed.degrees, 4, alpha = 1.0)
    val ranges = buckets.groupBy(col("bucket"))
      .agg(min(col("id")).as("lo"), max(col("id")).as("hi"))
      .orderBy(col("bucket")).collect()
      .map(r => (r.getAs[Int]("bucket"), r.getAs[Long]("lo"), r.getAs[Long]("hi")))
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 < lo2, "ranges must not interleave")
      case _ =>
    }
    buckets.unpersist()
  }

  test("bucket assignment is deterministic across parallelism of the input") {
    val b1 = BucketedLayout.assignBuckets(skewed.degrees.repartition(2), 4)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val b2 = BucketedLayout.assignBuckets(skewed.degrees.repartition(7), 4)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(b1 == b2)
  }

  test("writeBucketed produces bucket=K dirs with the exact edge set") {
    val dir = Files.createTempDirectory("graft-bucketed").toString
    val buckets = BucketedLayout.assignBuckets(skewed.degrees, 4, alpha = 0.0)
    BucketedLayout.writeBucketed(skewed.edgesBySrc, buckets, dir)
    val back = spark.read.parquet(dir)
    assert(back.select(col("bucket")).distinct().count() >= 2)
    val a = skewed.edgesBySrc.select(col("src"), col("dst"))
    val b = back.select(col("src"), col("dst"))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    buckets.unpersist()
  }
}
