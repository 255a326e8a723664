package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation —
  * the missing last step of every near-dup pipeline: pairwise matches
  * (q17/q18/q39) say "A~B, B~C", but training-data dedup must keep ONE
  * doc per transitive cluster {A,B,C}.
  *
  * Each vertex starts labeled with itself; every round each vertex takes
  * the min of its own label and its neighbors' labels; fixpoint = every
  * vertex labeled with its component's minimum id. Each round combines
  * the neighbor min with a pointer-jumping hop (adopt the label OF the
  * current label), so convergence is O(log diameter) rather than
  * diameter rounds, and the loop stops the first round nothing changes.
  *
  * Scale shape: the iteration runs ONLY over vertices that appear in an
  * edge — the corpus-sized set of singleton docs never enters the loop.
  * Each round is one equi-join + one groupBy on vertex id, both
  * partitioned the same way, over a relation proportional to the number
  * of near-dup pairs, not the corpus. Lineage is cut per round
  * (checkpointed plan) so the loop's query plan stays O(1) deep; this is
  * derived state — recompute on failure, no durability needed. For
  * graphs with continent-sized components (web link graphs — not dedup
  * clusters), swap the per-round rule for the large-star/small-star
  * rounds of Kiveris et al., "Connected Components in MapReduce and
  * Beyond" (SoCC'14); the driver loop and join shapes stay the same.
  */
object GraphOps {

  /** Labels every vertex incident to an edge with its component's min
    * vertex id. `edges` needs long-typed columns `src`/`dst` (undirected;
    * one direction suffices). Returns (id, lbl). */
  def connectedComponents(edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist()
    try {
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint()
    var round = 0
    var changed = 1L
    while (changed > 0 && round < maxRounds) {
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("lbl")), "dst")
        .groupBy(col("src").as("id")).agg(min("lbl").as("nlbl"))
      // Pointer-jumping hop: also adopt the label OF the current label
      // (always a vertex in `labels` — labels are min ids of incident
      // vertices). Neighbor propagation alone needs diameter rounds; the
      // hop doubles the effective reach each round, so convergence is
      // O(log diameter) and maxRounds=50 covers any real graph instead
      // of failing on a 50+-long near-dup chain.
      val hop = labels.select(col("id"), col("lbl").as("hid"))
        .join(labels.select(col("id").as("hid"), col("lbl").as("hlbl")), "hid")
        .select(col("id"), col("hlbl"))
      // The previous label rides along into the checkpointed output, so
      // the convergence check is a filter over materialized data — not
      // another join that re-shuffles the labels relation every round.
      val next = labels.join(nbrMin, Seq("id"), "left")
        .join(hop, Seq("id"), "left")
        .select(col("id"), col("lbl").as("prev"),
          least(col("lbl"),
            coalesce(col("nlbl"), col("lbl")),
            coalesce(col("hlbl"), col("lbl"))).as("lbl"))
        .localCheckpoint()
      changed = next.where(col("lbl") =!= col("prev")).count()
      labels = next.select("id", "lbl")
      round += 1
    }
    require(changed == 0, s"components did not converge in $maxRounds rounds")
    labels
    // finally, not happy-path only: a mid-loop failure (or the
    // non-convergence require) must still release the edge cache.
    } finally sym.unpersist()
  }
}
