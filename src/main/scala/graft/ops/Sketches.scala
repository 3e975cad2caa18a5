package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TextOps.hexInt

/** Deterministic sketches for 100 TB-scale approximate analytics.
  *
  * Unlike approx_count_distinct (HLL++ — implementation-defined binary
  * state, not replayable cross-engine), these sketches derive every draw
  * from md5, so the DuckDB oracle reproduces the ESTIMATE bit-for-bit:
  * the approximation is deterministic, auditable, and testable — the
  * property a production data-quality pipeline wants from its sketches.
  */
object Sketches {

  /** KMV (k-minimum-values) distinct-count estimator per group
    * (Bar-Yossef et al. 2002, public algorithm): keep the k smallest
    * distinct 60-bit hashes; if fewer than k exist the count is exact,
    * else estimate = (k-1) · 2^60 / h_k.
    *
    * PRODUCTION PATH — no exact distinct aggregation anywhere in this
    * plan (that is the whole point of the sketch: it replaces
    * COUNT(DISTINCT) when the group no longer fits anywhere; asserted in
    * PlanSpec). The k smallest are found scalably: after the distinct,
    * every partition keeps at most k candidates per group (bounded
    * max-heap — state is groups×k per task), so the final per-group
    * selection runs over ≤ partitions·k rows instead of sorting the
    * group's entire hash set.
    */
  def kmvEstimate(docs: DataFrame, k: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val h = docs.select(col("source"), hexInt(col("text")).as("h")).distinct()
    val cand = h.as[(String, Long)]
      .mapPartitions { it =>
        val heaps = new java.util.HashMap[String,
          java.util.PriorityQueue[java.lang.Long]]()
        it.foreach { case (src, v) =>
          val pq = heaps.computeIfAbsent(src, _ =>
            new java.util.PriorityQueue[java.lang.Long](
              k + 1, java.util.Collections.reverseOrder()))
          if (pq.size < k) pq.add(v)
          else if (pq.peek() > v) { pq.poll(); pq.add(v) }
        }
        import scala.jdk.CollectionConverters._
        heaps.entrySet().iterator().asScala.flatMap(e =>
          e.getValue.iterator().asScala.map(v => (e.getKey, v.longValue())))
      }
      .toDF("source", "h")
    val w = Window.partitionBy("source").orderBy("h")
    val kmin = cand.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .groupBy("source")
      .agg(max(col("h")).as("hk"), count(lit(1)).as("n_kept"))
    val est = when(col("n_kept") < k, col("n_kept"))
      .otherwise(floor(lit((k - 1).toDouble * 1152921504606846976.0) / col("hk"))
        .cast("long"))
    kmin.select(col("source"), est.as("kmv_estimate"))
  }

  /** Evaluation query (q39): [[kmvEstimate]] joined with the exact
    * COUNT(DISTINCT) it approximates — the accuracy report, NOT the
    * production operator (the exact side deliberately pays the cost the
    * estimate avoids).
    */
  def kmvDistinct(docs: DataFrame, k: Int = 16): DataFrame = {
    val exact = docs.groupBy("source")
      .agg(countDistinct(col("text")).as("exact_distinct"))
    kmvEstimate(docs, k).join(exact, "source")
      .select(col("source"), col("exact_distinct"), col("kmv_estimate"))
  }
}
