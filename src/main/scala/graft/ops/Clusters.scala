package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed connected components — the cluster-assignment step of the
  * dedup pipeline. Near-dup detection yields PAIRS (LSH/SimHash/n-gram
  * candidates); turning pairs into "keep one doc per duplicate cluster"
  * requires the transitive closure: A~B and B~C must land A, B, C in ONE
  * cluster even though (A, C) was never emitted as a pair.
  *
  * Algorithm: iterative min-label propagation. Every vertex starts
  * labelled with its own id; each round, every vertex takes the min of its
  * label and its neighbors' labels. A fixpoint is reached in O(component
  * diameter) rounds — duplicate clusters in real corpora are
  * near-cliques (diameter ≤ 2-3), so this converges in a handful of
  * rounds. For adversarial long-chain graphs the O(log n) alternative is
  * two-phase large-star/small-star (Kiveris et al., "Connected Components
  * in MapReduce and Beyond", SoCC'14); min-label is the right default for
  * dedup workloads and is simpler to audit.
  *
  * Scale shape: each round shuffles only compact (id, label) long pairs —
  * never document payloads — and the edge relation is re-joined from its
  * own shuffle output (ReusedExchange). `localCheckpoint` truncates the
  * lineage each round so the plan does not grow with iteration count
  * (an unbounded iterative lineage re-executes every prior round per
  * action and eventually overflows the planner). Convergence is detected
  * with one tiny aggregate per round: labels only ever decrease, so the
  * label-sum is strictly monotone until the fixpoint.
  */
object Clusters {

  /** @param vertices single column `id`
    * @param edges columns `src`, `dst` (undirected; one row per pair)
    * @return (id, label) — label = min vertex id of the component
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
      maxIter: Int = 20): DataFrame = {
    // symmetrize once; labels flow both directions along every edge
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var labels = vertices.select(col("id"), col("id").as("label"))
      .localCheckpoint()
    // decimal sum: immune to long overflow at billion-vertex id ranges
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast(DecimalType(38, 0)))).head.getDecimal(0)
    var prevSum = labelSum(labels)
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val prop = sym.join(labels, sym("src") === labels("id"))
        .select(sym("dst").as("id"), col("label"))
      val next = labels.union(prop)
        .groupBy("id").agg(min("label").as("label"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
      it += 1
    }
    labels
  }
}
