package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation — the cluster
  * step of near-duplicate deduplication: LSH/SimHash emit *pairs*; turning
  * pairs into duplicate *groups* (keep one survivor per group) is a
  * connected-components problem over the pair graph.
  *
  * Algorithm: every node starts labeled with its own id; each iteration
  * pushes labels across edges and keeps the minimum; fixpoint when no label
  * changes. Each iteration is one equi-join + one aggregation — both plain
  * hash shuffles on the node id, so the step parallelizes like any groupBy
  * and needs O(diameter) rounds. Near-dup graphs are unions of small dense
  * clusters (diameter ≤ 3 in practice), so this converges in 2–4 rounds;
  * for adversarial long-chain graphs the large-star/small-star variant
  * (O(log n) rounds) would replace the propagation step, same join shape.
  *
  * `localCheckpoint` truncates the lineage each round — without it the plan
  * doubles per iteration and the final job replays every round's shuffle.
  */
object ConnectedComponents {

  /** @param edges two-column DataFrame of undirected edges (long ids);
    *              direction and duplicates are normalized away here.
    * @return (id, comp) — comp = min node id of the component. Only nodes
    *         that appear in some edge are returned (isolated nodes have no
    *         dup relation to resolve).
    */
  def apply(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val e = edges.toDF("a", "b")
    val und = e.union(e.select(col("b"), col("a")))
      .toDF("src", "dst").distinct()
      .localCheckpoint(true)

    var labels = und.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)

    // Convergence via the label sum: labels are per-node non-increasing, so
    // the sum strictly decreases every round that changes anything — an
    // unchanged sum IS the fixpoint. One aggregation per round instead of a
    // join-and-count of next vs previous.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp").cast("decimal(38,0)"))).head.getDecimal(0)

    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val msgs = und.join(labels, und("src") === labels("id"))
        .select(col("dst").as("id"), col("comp"))
      labels = labels.select("id", "comp").union(msgs)
        .groupBy("id").agg(min("comp").as("comp"))
        .localCheckpoint(true)
      val s = labelSum(labels)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      iter += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")
    labels
  }
}
