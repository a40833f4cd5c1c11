package graft.algos

import org.apache.spark.sql.functions._

import graft.LinkGraph
import graft.syntax._

/**
 * Double-sweep diameter estimation (the standard 2-BFS lower bound):
 * BFS from a start vertex, hop to the farthest vertex found
 * (tie-break: minimum KEY — deterministic and dictionary-independent,
 * so an external oracle can reproduce the choice), BFS again; the
 * second eccentricity is a lower bound on the diameter that is exact
 * on trees and empirically tight on real graphs. Composition of two
 * [[Bfs]] runs — O(2·diameter) jobs regardless of graph size, the
 * only affordable diameter probe at 10^12 edges (exact diameter is
 * all-pairs). No reference counterpart (toolkits stop at one BFS);
 * standard technique (Magnien/Latapy/Habib).
 */
object Diameter {

  /** `eccFar` is the diameter lower bound; `farKey`/`far2Key` realize
   * the endpoints of the two sweeps. */
  final case class Result(startKey: String, farKey: String, eccStart: Long,
      far2Key: String, eccFar: Long)

  /** Farthest vertex from a BFS tree: max level, tie-break min key.
   * ONE top-k job (TakeOrdered — no global sort). */
  private def farthest(graph: LinkGraph,
      tree: org.apache.spark.sql.DataFrame): (Long, String, Long) = {
    val r = tree.join(graph.vertices, "id")
      .orderBy(desc("level"), asc("key"))
      .select(col("id"), col("key"), col("level").cast("long"))
      .head()
    (r.getLong(0), r.getString(1), r.getLong(2))
  }

  def run(graph: LinkGraph, startId: Long): Result = {
    val startKey = graph.vertices.where(col("id") === startId)
      .select(col("key")).head().getString(0)
    val sweep1 = Bfs.run(graph, startId)
    val (far1, farKey, ecc1) = farthest(graph, sweep1.tree)
    sweep1.tree.graftFree()
    val sweep2 = Bfs.run(graph, far1)
    val (_, far2Key, ecc2) = farthest(graph, sweep2.tree)
    sweep2.tree.graftFree()
    Result(startKey, farKey, ecc1, far2Key, ecc2)
  }
}
