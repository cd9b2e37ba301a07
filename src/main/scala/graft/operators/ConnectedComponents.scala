package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation
  * (Pregel-style), for clustering near-duplicate document pairs into
  * groups with one canonical representative each.
  *
  * Scale design (the 100 TB dedup endgame): pair finders
  * (q_dedup_near_jaccard / minhash / simhash) emit edges, but the
  * *actionable* output is one surviving doc per duplicate CLUSTER —
  * transitive closure, not pairs. The edge graph is orders of magnitude
  * smaller than the corpus (only docs with a near-dup appear), so the
  * iteration runs on metadata-scale data relative to the scan that
  * produced it.
  *
  *  - Each sweep is one shuffle join of labels against the symmetric
  *    edge list plus a map-side-combinable min aggregate — no driver
  *    data path; the driver sees only the converged-yet count.
  *  - Iterations = graph diameter. Near-dup clusters are dense (a hub
  *    doc matches most members), so diameter is small in practice;
  *    `maxIter` fails loudly rather than looping forever on an
  *    adversarial chain. (The O(log n) alternating large-star /
  *    small-star algorithm is the documented upgrade if chain-shaped
  *    graphs ever dominate; same public MapReduce literature.)
  *  - `localCheckpoint` truncates lineage each sweep — without it the
  *    plan doubles per iteration and Catalyst analysis, not the data,
  *    becomes the bottleneck.
  */
object ConnectedComponents {

  /** Label every node of the undirected edge set (u, v) with the
    * minimum node id reachable from it. Returns (node, comp); only
    * nodes that appear in an edge are labeled (isolated nodes are
    * trivially their own component and never enter the pair graph).
    *
    * Uses the first two columns of `edges` whatever their names; node
    * ids must be non-null (pair finders join on concrete doc ids).
    */
  def label(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val e = edges.select(col(edges.columns(0)).cast("long").as("u"),
      col(edges.columns(1)).cast("long").as("v"))
    // Symmetric closure once, checkpointed: every sweep re-reads it.
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint()
    var labels = sym.select(col("u").as("node")).distinct()
      .withColumn("comp", col("node"))
      .localCheckpoint()
    var iter = 0
    var changed = 1L
    while (changed > 0) {
      require(iter < maxIter,
        s"connected components did not converge in $maxIter sweeps — " +
          "graph diameter exceeds the near-dup-cluster assumption; " +
          "raise maxIter or switch to large-star/small-star")
      // min label among each node's neighbours, then keep the smaller
      // of (own, neighbourhood) — nodes with no improving neighbour
      // keep their label via the left join.
      val nbrMin = sym
        .join(labels.hint("shuffle_hash"), col("v") === col("node"))
        .groupBy(col("u")).agg(min(col("comp")).as("nbr"))
      val next = labels
        .join(nbrMin, col("node") === col("u"), "left")
        .select(col("node"), col("comp").as("old"),
          least(col("comp"), coalesce(col("nbr"), col("comp")))
            .as("comp"))
        .localCheckpoint()
      changed = next.filter(col("comp") < col("old")).count()
      labels = next.select(col("node"), col("comp"))
      iter += 1
    }
    labels
  }
}
