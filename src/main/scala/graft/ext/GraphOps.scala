package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph traversal as pure DataFrame rounds — the third graph
  * algorithm family next to hash-min propagation and star contraction
  * (Dedup.connectedComponents / connectedComponentsStar).
  */
object GraphOps {

  /** BFS layer discovery: label every node reachable within `maxDepth`
    * hops of the source set with its hop distance (a node's layer is
    * its FIRST discovery round — the BFS min-distance invariant, so the
    * result is deterministic regardless of traversal order).
    *
    * `edges` must carry (src, dst) with both directions present for an
    * undirected graph. Each round is one equi join on the frontier +
    * one anti join against the visited set — both shuffle on node id,
    * so a round's cost is bounded by frontier-adjacency size, never by
    * total graph size; `localCheckpoint` cuts lineage so the plan does
    * not grow with depth (the same discipline as the dedup cluster
    * rounds). The loop exits as soon as a frontier comes back empty —
    * the reachable set can only stop growing, so the remaining rounds
    * would all be no-op jobs; the count is over the just-checkpointed
    * frontier, so the per-round convergence check costs one cheap
    * action (the same discipline as the CC loops).
    */
  def bfsLayers(edges: DataFrame, sources: DataFrame, maxDepth: Int): DataFrame = {
    require(maxDepth >= 0)
    var visited = sources.select(col("node"), lit(0).as("dist")).localCheckpoint()
    var frontier = visited.select(col("node"))
    var d = 1
    var exhausted = false
    while (d <= maxDepth && !exhausted) {
      val next = frontier.join(edges, col("node") === col("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .localCheckpoint()
      if (next.count() == 0) exhausted = true
      else {
        visited = visited.unionByName(next.withColumn("dist", lit(d)))
          .localCheckpoint()
        frontier = next.select(col("node"))
        d += 1
      }
    }
    visited
  }
}
