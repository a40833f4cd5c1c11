package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.LinkGraph

/**
 * Targeted-attack robustness census: delete the top-`k` DEGREE HUBS
 * (deterministic order: degree desc, key asc) and census the
 * surviving components in power-of-two size buckets — the
 * attack-tolerance dual of [[Percolation]]'s random-failure view
 * (scale-free graphs shrug off random failure but shatter under hub
 * removal; this measures exactly that on the tool-hub transcript
 * graph).
 *
 * Output is label-agnostic (sizes only), so the engine's star
 * contraction and the oracle's HashMin fixpoint only need to agree
 * on the partition into components, not on label naming.
 *
 * Scale shape: the hub set is k rows — broadcast to two anti-joins
 * over the co-clustered edge layout (one codegen'd filter pass, no
 * shuffle); then a fresh graph build on the survivors + CCStar
 * (O(log n) rounds). Deleted hubs resurface as synthesized
 * singletons in the id-space rebuild and are anti-joined away
 * before the census.
 */
object Attack {

  /** @return (bucket, n_components, min_size, max_size) over the
   *          components that survive deleting the top-k hubs;
   *          bucket = bit-length of the component size. */
  def census(graph: LinkGraph, k: Int = 20): DataFrame = {
    require(graph.symmetric, "attack census expects the symmetrized graph")
    val np = graph.numPartitions
    val hubs = graph.degrees.join(graph.vertices, "id")
      .orderBy(desc("out_degree"), asc("key"))
      .limit(k).select(col("id"))
    val kept = graph.edgesBySrc
      .where(col("src") < col("dst")) // one row per undirected edge
      .join(broadcast(hubs.withColumnRenamed("id", "src")), Seq("src"), "left_anti")
      .join(broadcast(hubs.withColumnRenamed("id", "dst")), Seq("dst"), "left_anti")
      .select(col("src"), col("dst"), lit(1.0).as("weight"))
    val sg = LinkGraph.fromIdEdges(kept, graph.numVertices, symmetric = true, np)
    val labels = CCStar.run(sg).labels
    val szs = labels
      .join(broadcast(hubs), Seq("id"), "left_anti")
      .groupBy(col("lbl")).agg(count(lit(1)).as("sz")).select(col("sz"))
    val out = szs
      .withColumn("bucket", length(conv(col("sz"), 10, 2)).cast("long"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_components"),
        min(col("sz")).as("min_size"),
        max(col("sz")).as("max_size"))
    sg.unpersist()
    out
  }
}
