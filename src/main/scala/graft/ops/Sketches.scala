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

  /** Count-min sketch over word frequencies (Cormode & Muthukrishnan
    * 2005, public algorithm) with deterministic md5 row-hashes, so the
    * DuckDB oracle reproduces every counter bit-for-bit. The sketch is
    * built from the word-count table — the corpus is aggregated ONCE and
    * only the vocab-sized table fans out ×depth; counters merge
    * associatively (the property that lets a 1000-executor job build one
    * global sketch with a tiny final reduce). Returns the evaluation
    * view: top-k words with exact count and CMS estimate — estimate ≥
    * exact by construction (one-sided error), asserted in OpsSpec.
    */
  def cmsWordCounts(docs: DataFrame, depth: Int = 4, width: Int = 64,
                    topK: Int = 20): DataFrame = {
    def bucket = pmod(hexInt(concat(col("j"), lit("_"), col("word"))), lit(width))
    val wc = docs.select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // counters AND the top-k probe set read it
    val seeded = wc
      .withColumn("j", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn("h", bucket)
    val counters = seeded.groupBy("j", "h").agg(sum("cnt").as("c"))
    val probes = wc.orderBy(desc("cnt"), asc("word")).limit(topK)
      .withColumn("j", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn("h", bucket)
    probes.join(counters, Seq("j", "h"))
      .groupBy("word")
      .agg(max("cnt").as("exact_count"), min("c").as("cms_estimate"))
      .select(col("word"), col("exact_count"), col("cms_estimate"))
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
