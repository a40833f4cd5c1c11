package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession + toy-graph helpers for all specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSpec.session

  def numPartitions = 4

  /** Key for vertex index i, zero-padded so key order == index order. */
  def keyOf(i: Int): String = f"v$i%04d"

  /** Build a LinkGraph from directed integer edge pairs. */
  def graphOf(
      pairs: Seq[(Int, Int)],
      symmetric: Boolean,
      weights: Map[(Int, Int), Double] = Map.empty): LinkGraph = {
    import spark.implicits._
    val keyEdges = pairs
      .map { case (a, b) =>
        (keyOf(a), keyOf(b), "adj", weights.getOrElse((a, b), 1.0)) }
      .toDF("src_key", "dst_key", "kind", "weight")
    LinkGraph.fromKeyEdges(keyEdges, symmetric, numPartitions)
  }

  /** id → original integer index, via the zero-padded key. */
  def indexOf(g: LinkGraph): Map[Long, Int] =
    g.vertices.collect().map(r => r.getLong(0) -> r.getString(1).drop(1).toInt).toMap

  /** (id, value) DataFrame → Map[index, value]. */
  def byIndex[T](g: LinkGraph, df: DataFrame, col2: String): Map[Int, Any] = {
    val idx = indexOf(g)
    df.select(col("id"), col(col2)).collect()
      .map(r => idx(r.getLong(0)) -> r.get(1)).toMap
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.file.transferTo", "false") // gVisor: NIO transferTo mmap/unmap churn is pathological
      .config("spark.shuffle.sort.bypassMergeThreshold", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
