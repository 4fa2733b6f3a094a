package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the
  * clustering step a dedup pipeline runs over its candidate-pair graph
  * (cluster id = component-min node, the deterministic keeper).
  *
  * Each round is one shuffle join plus one min-aggregate; rounds are
  * bounded by the component diameter. Duplicate clusters are near-cliques
  * (every member collides with most others in some LSH band), so 2-3
  * rounds converge in practice; the alternating large-star/small-star
  * formulation gives O(log n) worst case on pathological chains and
  * drops in under the same loop shape. The driver carries only a
  * convergence bit per round — never data.
  */
object ConnectedComponents {

  /** `pairs`: two long columns (a, b), undirected edges. Returns
    * (id, cluster) for every node appearing in at least one pair.
    */
  def clusters(pairs: DataFrame, a: String = "doc_a", b: String = "doc_b",
      maxRounds: Int = 50): DataFrame = {
    val edges = pairs.select(col(a).as("src"), col(b).as("dst"))
      .union(pairs.select(col(b).as("src"), col(a).as("dst")))
      .persist()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .persist()
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val prop = edges.join(labels, col("dst") === col("id"))
        .groupBy(col("src")).agg(min(col("label")).as("nbr"))
      // Carry old + new in one frame so the convergence probe needs no
      // second join: one action per round, reading the freshly cached
      // `next`.
      val next = labels.join(prop, col("id") === col("src"), "left_outer")
        .select(col("id"), col("label").as("old"),
          least(col("label"), coalesce(col("nbr"), col("label"))).as("label"))
        .persist()
      converged = next.filter(col("label") =!= col("old")).limit(1).count() == 0L
      labels.unpersist()
      labels = next
      rounds += 1
    }
    edges.unpersist()
    labels.select(col("id"), col("label").as("cluster"))
  }
}
