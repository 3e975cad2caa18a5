package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TextOps.hexInt

/** Masked-LM pre-training instance generation — the data plumbing of the
  * reference's `pregenerate_training_data.py` (M5), re-expressed as lazy
  * Spark plans with every random draw keyed by (doc_id, purpose) through
  * md5, so the output is deterministic under any partitioning AND
  * replayable bit-for-bit by the DuckDB oracle.
  *
  * Reference semantics carried over:
  *  - doc-length-weighted negative sampling for the NextSentence task
  *    (pregenerate_training_data.py:42-58): cumulative token counts,
  *    a draw in [cumsum[i], cumsum[i] + total - len_i) mod total, then
  *    searchsorted-right — which provably never resamples the current
  *    doc (:59 asserts this);
  *  - 50% is_random_next (:183), A/B split of the doc (:172-177);
  *  - 80/10/10 masking with num_to_mask = min(max_pred,
  *    max(1, round(len·0.15))) (:113-131);
  *  - per-epoch JSON-lines sink with a sidecar metrics file (:278-298).
  *
  * Documented divergences (plumbing-preserving simplifications):
  * whitespace tokens instead of wordpieces; the PRNG is a keyed hash, not
  * Python's global Mersenne state; the 10% random replacement draws from
  * the instance rather than the vocab file; truncation slices
  * deterministically from the back (:86-101 flips a coin per removed
  * token).
  *
  * Scale note: the cumulative sum and searchsorted run through a global
  * ordered window here (exactly replayable in SQL). At 10^12 docs the
  * same algebra runs as a range-partitioned prefix scan: per-partition
  * partial sums, a tiny driver-side offset table, then the same
  * rank-by-(value, kind) merge co-partitioned on value ranges — the
  * standard distributed searchsorted. The draws themselves stay pure
  * column expressions either way.
  */
object MlmGen {

  /** Per-doc stats + 0-based index + inclusive cumulative token count. */
  private def cumStats(docs: DataFrame): DataFrame = {
    val w = Window.orderBy("doc_id")
    docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .withColumn("idx", row_number().over(w).cast("long") - 1)
      .withColumn("cum", sum("n").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** NSP pair construction: one instance per doc — (doc_id,
    * is_random_next, b_doc_id, n_a, n_b). The negative's B-side document
    * is drawn length-weighted via cumsum + searchsorted (the reference's
    * sample_doc), computed distributively as a sorted union of cumsum
    * rows and draw rows with a running count (no N² join, no driver loop).
    */
  def nspPairs(docs: DataFrame, maxA: Int = 64, maxB: Int = 63): DataFrame = {
    val c = cumStats(docs)
    val tot = c.agg(max("cum").as("total"))
    // the reference refuses to run on a ≤1-doc corpus (:270-275 exits:
    // negatives would have nowhere to sample from); the lazy analog drops
    // rows whose sampling window is empty (total == n ⟺ single doc) —
    // also keeps the modulus strictly positive under ANSI mode
    val q = c.crossJoin(broadcast(tot))
      .where(col("total") > col("n"))
      .withColumn("is_random_next",
        hexInt(concat(col("doc_id"), lit("_nsp"))) % 2 === 0)
      .withColumn("sent_idx",
        (col("cum") + hexInt(concat(col("doc_id"), lit("_draw")))
          % (col("total") - col("n"))) % col("total"))
    // searchsorted-right(cum, sent_idx) = #(cum <= sent_idx): sort cum
    // rows (kind 0) and draw rows (kind 1) together on (value, kind) and
    // take the running count of kind-0 rows at each draw row
    val longNull = lit(null).cast("long")
    val left = c.select(col("cum").as("v"), lit(0).as("kind"),
      col("idx").as("cidx"), longNull.as("q_doc"))
    val right = q.select(col("sent_idx").as("v"), lit(1).as("kind"),
      longNull.as("cidx"), col("doc_id").as("q_doc"))
    val wScan = Window.orderBy("v", "kind")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sampledIdx = left.unionByName(right)
      .withColumn("cnt", sum(when(col("kind") === 0, 1L).otherwise(0L)).over(wScan))
      .where(col("kind") === 1)
      .select(col("q_doc").as("doc_id"), col("cnt"))
    val sampled = sampledIdx.join(
      c.select(col("idx").as("cnt"), col("doc_id").as("s_doc"), col("n").as("s_n")),
      "cnt")
    val aFull = floor((col("n") + 1) / 2).cast("long")
    q.join(sampled.select("doc_id", "s_doc", "s_n"), "doc_id")
      .select(col("doc_id"), col("is_random_next"),
        when(col("is_random_next"), col("s_doc")).otherwise(col("doc_id"))
          .as("b_doc_id"),
        least(aFull, lit(maxA.toLong)).as("n_a"),
        when(col("is_random_next"), least(col("s_n"), lit(maxB.toLong)))
          .otherwise(least(col("n") - aFull, lit(maxB.toLong))).as("n_b"))
  }

  /** 80/10/10 masking over the first `maxInstTokens` tokens of each doc:
    * rank positions by a keyed hash (the distributed analog of
    * shuffle+sample, :116-117), mask the lowest num_to_mask ranks; per
    * masked position draw 0-7 → [MASK], 8 → keep, 9 → random in-instance
    * token. One row per masked position: (doc_id, pos, label,
    * replacement). Pure column expressions + one window on doc_id.
    */
  def maskedLm(docs: DataFrame, maxInstTokens: Int = 128,
               maxPred: Int = 20, prob: Double = 0.15): DataFrame = {
    val base = docs.select(col("doc_id"),
        slice(split(col("text"), " "), 1, maxInstTokens).as("toks"))
      .withColumn("m", size(col("toks")))
      .withColumn("ntm",
        least(lit(maxPred), greatest(lit(1), round(col("m") * prob))))
    val pos = base
      .select(col("doc_id"), col("toks"), col("m"), col("ntm"),
        posexplode(col("toks")))
      .withColumnRenamed("pos", "pos0")
      .withColumnRenamed("col", "token")
      .withColumn("rank_key",
        hexInt(concat(col("doc_id"), lit("_m_"), col("pos0"))))
    val w = Window.partitionBy("doc_id").orderBy("rank_key", "pos0")
    pos.withColumn("rn", row_number().over(w))
      .where(col("rn") <= col("ntm"))
      .withColumn("r", hexInt(concat(col("doc_id"), lit("_r_"), col("pos0"))) % 10)
      .select(col("doc_id"), col("pos0").cast("long").as("pos"),
        col("token").as("label"),
        when(col("r") <= 7, lit("[MASK]"))
          .when(col("r") === 8, col("token"))
          .otherwise(element_at(col("toks"),
            (hexInt(concat(col("doc_id"), lit("_w_"), col("pos0")))
              % col("m") + 1).cast("int")))
          .as("replacement"))
  }

  /** Per-epoch JSON-lines sink with sidecar metrics, the reference's
    * epoch_N.json + epoch_N_metrics.json layout (:278-298). Returns the
    * instance count. Sidecar goes through the Hadoop FS API (DFS-safe).
    */
  def writeEpochJson(spark: SparkSession, instances: DataFrame,
                     outDir: String, epoch: Int, maxSeqLen: Int = 128): Long = {
    val path = s"$outDir/epoch_$epoch.json"
    val n = instances.count()
    instances.write.mode("overwrite").json(path)
    val side = new org.apache.hadoop.fs.Path(s"$outDir/epoch_${epoch}_metrics.json")
    val fs = side.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(side, true)
    out.write(
      s"""{"num_training_examples":$n,"max_seq_len":$maxSeqLen}"""
        .getBytes("UTF-8"))
    out.close()
    n
  }
}
