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
    * else estimate = (k-1) · 2^60 / h_k. One shuffle on the group key;
    * per-group state is k values regardless of group size — this is what
    * replaces COUNT(DISTINCT) when the group no longer fits anywhere.
    */
  def kmvDistinct(docs: DataFrame, k: Int = 16): DataFrame = {
    val h = docs.select(col("source"), hexInt(col("text")).as("h")).distinct()
    val w = Window.partitionBy("source").orderBy("h")
    val kmin = h.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .groupBy("source")
      .agg(max(col("h")).as("hk"), count(lit(1)).as("n_kept"))
    val exact = docs.groupBy("source")
      .agg(countDistinct(col("text")).as("exact_distinct"))
    val est = when(col("n_kept") < k, col("n_kept"))
      .otherwise(floor(lit((k - 1).toDouble * 1152921504606846976.0) / col("hk"))
        .cast("long"))
    kmin.join(exact, "source")
      .select(col("source"), col("exact_distinct"), est.as("kmv_estimate"))
  }
}
