package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{LinkGraph, Superstep}
import graft.syntax._

/**
 * Bipartiteness / odd-cycle census per connected component: a parity
 * BFS from every component's representative at once (seeds come in as
 * a DataFrame — no driver-side root list, so a graph with millions of
 * components costs the same one frontier loop), then one join pass
 * counting CONFLICT edges — edges whose endpoints sit at equal BFS
 * parity. A component is bipartite iff it has zero conflict edges
 * (König); each conflict edge certifies an odd cycle through the BFS
 * tree. The 2-colorability gate behind sign-consistent embeddings and
 * two-mode modeling of an unknown graph.
 *
 * Determinism: levels are MIN distances from the component's
 * lexicographically smallest KEY (ids are hash-assigned and engine-
 * internal, so the seed is pinned in key space) — unique regardless
 * of traversal schedule. In a non-bipartite component the conflict
 * EDGE SET depends on the seed (only the zero/non-zero verdict does
 * not), so the seed choice is part of the cross-engine contract.
 *
 * Scale shape: identical to [[MultiSourceBfs]] with one root per
 * component but WITHOUT the K-fold state: each vertex is reached by
 * exactly its own component's seed, so the visited set is O(|V|)
 * rows total; the frontier loop is O(max component diameter)
 * supersteps; the conflict count is one co-partitioned join over the
 * oriented edge set. Same compaction/free discipline as [[Bfs]].
 */
object OddCycle {

  final case class Result(census: DataFrame, rounds: Int)

  val compactEvery = 8

  /** @param labels (id, lbl) from any CC run on the same graph
   *  @return census: (component, n_vertices, n_conflicts, bipartite)
   *          — component named by its smallest member key. */
  def run(graph: LinkGraph, labels: DataFrame, maxIterations: Int = 100000): Result = {
    require(graph.symmetric, "parity BFS expects the symmetrized graph")
    val np = graph.numPartitions

    var visited = labels.join(graph.vertices, "id")
      .groupBy(col("lbl")).agg(min_by(col("id"), col("key")).as("id"))
      .select(col("id"), lit(0).as("level"))
      .repartition(np, col("id")).graftCut
    var frontier = visited
    var frontierCount = visited.count()
    var level = 0
    var base = visited
    var pendingFree = List[DataFrame]()
    while (frontierCount > 0 && level < maxIterations) {
      val mass = Superstep.massOrBound(graph, frontier, frontierCount)
      val msgs = Superstep.gather(
        graph, frontier.select(col("id")),
        signal = lit(level + 1), combine = min,
        activeEdges = mass, activeCount = frontierCount)
      val (claimed, n) = msgs
        .join(visited, Seq("id"), "left_anti")
        .select(col("id"), col("msg").cast("int").as("level"))
        .graftCutCount
      frontierCount = n
      level += 1
      if (frontierCount > 0) {
        pendingFree = frontier :: pendingFree
        visited = visited.unionByName(claimed)
        frontier = claimed
        if (level % compactEvery == 0) {
          visited = visited.graftCut
          (base :: pendingFree).filter(_ ne frontier).foreach(_.graftFree())
          pendingFree = Nil
          base = visited
        }
      }
    }
    val lv = visited.graftCut
    (base :: frontier :: pendingFree).filter(_ ne lv).distinct.foreach(_.graftFree())

    val conflicts = graph.edgesBySrc
      .where(col("src") < col("dst")) // each undirected edge once
      .join(lv.select(col("id").as("src"), col("level").as("ls")), "src")
      .join(lv.select(col("id").as("dst"), col("level").as("ld")), "dst")
      .where((col("ls") + col("ld")) % 2 === 0)
      .join(labels.select(col("id").as("src"), col("lbl")), "src")
      .groupBy(col("lbl")).agg(count(lit(1)).as("n_conflicts"))

    val keyed = labels.join(graph.vertices, "id")
      .select(col("key"), col("lbl"))
    val reps = keyed.groupBy(col("lbl"))
      .agg(min(col("key")).as("component"), count(lit(1)).as("n_vertices"))
    val census = reps.join(conflicts, Seq("lbl"), "left")
      .select(col("component"), col("n_vertices"),
        coalesce(col("n_conflicts"), lit(0L)).as("n_conflicts"),
        (coalesce(col("n_conflicts"), lit(0L)) === 0).cast("long").as("bipartite"))
    Result(census, level)
  }
}
