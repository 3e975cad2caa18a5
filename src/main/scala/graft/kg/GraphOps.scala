package graft.kg

import graft.model.Triple
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Analytics over the MATERIALIZED knowledge graph — the consumption
  * side of the north rule's triple store: entity degree distribution and
  * PageRank over the co-occurrence subgraph.
  *
  * PageRank is computed in exact INTEGER micro-rank units (10^6 = rank
  * 1.0): r' = 150000 + (850 · Σ_in (r_u div deg_u)) div 1000. Integer
  * `div` everywhere means every engine — and every partitioning —
  * produces bit-identical ranks (a floating-point formulation would
  * depend on summation order), at the cost of ≤ deg·1 µrank of
  * quantization per step. Fixed iteration count, no driver-side data.
  */
object GraphOps {

  /** Symmetric distinct co-occurrence edge list from the triple store. */
  def coEdges(triples: Dataset[Triple]): DataFrame = {
    val co = triples.toDF().where(col("pred") === "co_occurs_with")
      .select(col("subj").as("src"), col("obj").as("dst")).distinct()
    co.unionByName(co.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** Entity degree distribution: one row per degree value with the
    * number of entities at that degree (the shape a KG health check
    * reads first).
    */
  def degreeDistribution(triples: Dataset[Triple]): DataFrame =
    coEdges(triples)
      .groupBy("src").agg(count(lit(1)).as("degree"))
      .groupBy("degree").agg(count(lit(1)).as("n_entities"))

  /** Integer-quantized PageRank over the co-occurrence graph, fixed
    * `iters` rounds, damping 0.85. Each round is ONE join edges⋈ranks on
    * the entity id + one aggregation — the standard Pregel-free Spark
    * formulation; the edge list is dictionary-scale (entities, not
    * corpus), so rounds are cheap and the loop is bounded.
    */
  def pageRank(triples: Dataset[Triple], iters: Int = 3): DataFrame = {
    val spark = triples.sparkSession
    val edges = coEdges(triples).localCheckpoint()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val withDeg = edges.join(deg, "src").localCheckpoint()
    var ranks = deg.select(col("src").as("entity"), lit(1000000L).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = withDeg
        .join(ranks, withDeg("src") === ranks("entity"))
        .select(col("dst"), expr("rank div deg").as("c"))
        .groupBy("dst").agg(sum("c").as("in_sum"))
      val nodes = deg.select(col("src").as("entity"))
      ranks = nodes
        .join(contrib, nodes("entity") === contrib("dst"), "left")
        .select(col("entity"),
          (lit(150000L) + expr("850 * coalesce(in_sum, 0L) div 1000"))
            .as("rank"))
    }
    ranks.select(col("entity"), col("rank").cast("long").as("rank"))
  }
}
