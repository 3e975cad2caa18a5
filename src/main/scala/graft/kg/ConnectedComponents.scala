package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative connected components over an edge DataFrame — the
  * canonicalization engine (north rule). Hand-rolled alternating
  * large-star/small-star (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC'14 — public algorithm) since no
  * GraphFrames jar ships in /opt/spark/jars.
  *
  * Scale notes: each iteration is two shuffles on the node id; lineage is
  * truncated with localCheckpoint every iteration so the plan does not
  * grow exponentially (SURVEY.md §4). Converges in O(log n) rounds; node
  * ids are compared as strings, so the component representative — the
  * minimum id — is deterministic under any parallelism.
  */
object ConnectedComponents {

  /** edges: DataFrame with string columns (src, dst).
    * Returns (node, component) with component = min node id reachable.
    */
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // undirected closure + self-loops so isolated endpoints keep themselves
    var e = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .union(edges.select(col("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()

    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // large-star: connect every strictly-larger neighbor to the minimum
      // neighbor (including self) of each node
      val largeStar = e.groupBy("src")
        .agg(min(col("dst")).as("m"), collect_set(col("dst")).as("nbrs"))
        .select(col("m"), explode(col("nbrs")).as("n"), col("src"))
        .where(col("n") > col("src"))
        .select(col("n").as("src"), col("m").as("dst"))
      // small-star: connect all smaller-or-equal neighbors to the minimum
      val smallStar = e.where(col("dst") <= col("src"))
        .groupBy("src")
        .agg(min(col("dst")).as("m"), collect_set(col("dst")).as("nbrs"))
        .select(col("m"), explode(col("nbrs")).as("n"))
        .select(col("n").as("src"), col("m").as("dst"))
      val next = largeStar.union(smallStar)
        .union(e.select(col("src"), col("src").as("dst"))) // keep self-loops
        .where(col("src") >= col("dst"))
        .distinct()
        .localCheckpoint()
      // converged when the edge multiset is stable (single action: both
      // difference directions unioned, probed with limit 1)
      val changed = next.exceptAll(e).limit(1)
        .union(e.exceptAll(next).limit(1)).count()
      converged = changed == 0
      e = next
      iter += 1
    }
    e.groupBy("src").agg(min(col("dst")).as("component"))
      .select(col("src").as("node"), col("component"))
  }

  /** Canonical entity map from the alias dictionary: bipartite graph of
    * surface nodes ("s:<surface>") and entity-record nodes ("e:<id>");
    * canonical id of a record = min record id in its component.
    */
  def canonicalMap(spark: SparkSession, aliases: DataFrame): DataFrame = {
    val edges = aliases.select(
      concat(lit("s:"), col("surface_norm")).as("src"),
      concat(lit("e:"), col("entity_id")).as("dst"))
    val cc = run(spark, edges)
    // component representative among RECORD nodes only
    val reps = cc.where(col("node").startsWith("e:"))
      .groupBy("component").agg(min(col("node")).as("canon_node"))
    cc.where(col("node").startsWith("e:"))
      .join(reps, "component")
      .select(
        expr("substring(node, 3)").as("entity_id"),
        expr("substring(canon_node, 3)").as("canonical_id"))
  }
}
