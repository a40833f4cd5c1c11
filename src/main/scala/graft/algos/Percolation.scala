package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.LinkGraph

/**
 * Bond-percolation component census: delete each undirected edge
 * independently with a DETERMINISTIC md5 coin (survival iff
 * 10⁴·h < pE4·2⁴⁰, h = 40-bit md5 of the key pair — replayable in
 * plain SQL, uniform by construction), then census the surviving
 * components in power-of-two size buckets. The random-failure
 * resilience report that complements [[Bridges]]' single-point-of-
 * failure view: bridges say WHICH edges are critical, percolation
 * says how the component structure degrades when a fraction
 * (1 − p) of links fail blindly — the giant-component
 * existence/fragmentation readout of percolation theory.
 *
 * Output is label-agnostic (sizes only), so the oracle's HashMin
 * fixpoint and the engine's star contraction need not agree on
 * naming — only on the partition into components.
 *
 * Scale shape: one codegen'd filter over the edge list, a fresh
 * graph build on the survivors, CCStar (O(log n) rounds), one tiny
 * aggregate. Vertices whose every edge failed leave the rebuilt
 * graph entirely and are re-added as singleton components by count.
 */
object Percolation {

  /** @param pE4 survival probability ×10⁴
   *  @return (bucket, n_components, min_size, max_size) — bucket =
   *          bit-length of the component size. */
  def census(graph: LinkGraph, pE4: Long = 7000): DataFrame = {
    require(graph.symmetric, "percolation census expects the symmetrized graph")
    val np = graph.numPartitions
    val vk = graph.vertices
    // coin in KEY space (replayable), edges kept in the ORIGINAL id
    // space — fromIdEdges skips the vertex-dictionary rebuild, and its
    // synthesized full id range turns coinless vertices into
    // self-labeled singletons for free
    val sampled = graph.edgesBySrc
      .join(vk.select(col("id").as("src"), col("key").as("uk")), "src")
      .join(vk.select(col("id").as("dst"), col("key").as("vk")), "dst")
      .where(col("uk") < col("vk")) // one coin per undirected edge
      .where(expr("10000L * cast(conv(substring(md5(concat(uk, '|', vk)), 1, 10), 16, 10) as bigint)") <
        lit(pE4 * (1L << 40)))
      .select(col("src"), col("dst"), lit(1.0).as("weight"))
    val sg = LinkGraph.fromIdEdges(sampled, graph.numVertices, symmetric = true, np)
    val labels = CCStar.run(sg).labels
    val szs = labels.groupBy(col("lbl")).agg(count(lit(1)).as("sz")).select(col("sz"))
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
