package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation to fixpoint —
  * the canonical-cluster step that follows near-duplicate pair generation
  * (every node in a dup cluster gets the cluster's smallest id as its
  * component).
  *
  * Scale design: each round is ONE propagation join + ONE partial-aggregable
  * min, both hash-partitioned on the node key; lineage is truncated per round
  * (localCheckpoint) so the plan never grows with the iteration count, and
  * round counts are small in practice — near-dup clusters are near-cliques,
  * so label propagation converges in O(diameter) rounds, typically 1–2 plus
  * one no-change confirmation. Long-chain worst cases converge too (the
  * property spec proves a path graph), just in more rounds; a graph with
  * diameter in the hundreds would want the doubling (large-star/small-star)
  * variant instead.
  */
object Components {

  /** Connected components over an undirected pair list.
    *
    * @param pairs two numeric columns (a, b), one row per undirected edge;
    *              self-loops and duplicates are tolerated
    * @return (node, component) — every node that appears in `pairs`, labeled
    *         with the minimum node id reachable from it
    */
  def connected(pairs: DataFrame): DataFrame = {
    val Array(a, b) = pairs.columns
    // materialize the pair list BEFORE mirroring it: the union's two
    // branches would otherwise each evaluate the (often expensive)
    // pair-generation subtree — LSH joins, knn scoring — once
    val p = pairs.select(col(a).as("src"), col(b).as("dst")).localCheckpoint()
    val edges = p.union(p.select(col("dst"), col("src"))).localCheckpoint()
    // seed with round 1 already applied: component = min(self, neighbors)
    // — the node set is distinct(src) either way (edges are bidirected),
    // so seeding costs the same single aggregation as a plain distinct
    // but saves one full loop iteration (two joins + checkpoint + count)
    var labels = edges.groupBy(col("src"))
      .agg(min(col("dst")).as("mn"))
      .select(col("src").as("node"),
        least(col("src"), col("mn")).as("component"))
      .localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      val prop = edges.join(labels, col("src") === col("node"))
        .groupBy(col("dst")).agg(min(col("component")).as("p"))
        .withColumnRenamed("dst", "pnode")
      // carry the previous label through the propagation join so the
      // convergence count reads the SAME checkpointed result — a separate
      // old-vs-new self-join would add a join + shuffle per iteration
      val next = labels.join(prop, col("node") === col("pnode"), "left")
        .select(col("node"), col("component").as("prev"),
          least(col("component"), coalesce(col("p"), col("component")))
            .as("component"))
        .localCheckpoint()
      changed = next.filter(col("component") =!= col("prev")).count()
      labels = next.select(col("node"), col("component"))
    }
    labels
  }
}
