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
  *    max(1, round(len·0.15))) (:113-131) — round is PYTHON round, i.e.
  *    banker's/HALF_EVEN (Spark `bround`, DuckDB `round_even`): at
  *    len=30 the reference masks 4 positions, not 5;
  *  - per-epoch JSON-lines sink with a sidecar metrics file (:278-298).
  *
  * Documented divergences (plumbing-preserving simplifications):
  * whitespace tokens instead of wordpieces; the PRNG is a keyed hash, not
  * Python's global Mersenne state; the 10% random replacement draws from
  * the instance rather than the vocab file; truncation slices
  * deterministically from the back (:86-101 flips a coin per removed
  * token).
  *
  * Scale note: the cumulative sum AND the searchsorted both run as
  * range-partitioned two-pass prefix scans (per-partition partials → a
  * tiny O(partitions) driver collect → broadcast offsets → per-partition
  * running state) — no global single-partition window anywhere, so the
  * sampler scales with the cluster. The SQL oracle replays the same
  * algebra as ordered windows; results are identical (hash-checked).
  */
object MlmGen {

  /** Per-doc stats + 0-based index + inclusive cumulative token count,
    * as a RANGE-PARTITIONED prefix scan (same two-pass shape as
    * [[searchSorted]]: per-partition partials → broadcast offsets →
    * per-partition running state). A global ordered window would funnel
    * the whole corpus through one partition; this form scales with the
    * cluster.
    */
  private def cumStats(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val parts = math.max(2, spark.sparkContext.defaultParallelism)
    val sel = docs
      .select(col("doc_id").cast("long"),
        size(split(col("text"), " ")).cast("long").as("n"))
    // adaptive physical choice (the CC smallInputEdges precedent, r8):
    // a ≤2-partition input provably fits the volume a single task
    // already holds, so ONE local sort replaces the range-sample job +
    // full shuffle; the offsets/counts algebra below is identical (the
    // per-partition collect just sees one partition). Gated on the
    // OBSERVED scan partitioning — at scale the input carries many
    // partitions and the distributed path runs unchanged.
    val ranged = (if (sel.rdd.getNumPartitions <= 2)
        sel.coalesce(1).sortWithinPartitions("doc_id")
      else sel.repartitionByRange(parts, col("doc_id"))
        .sortWithinPartitions("doc_id"))
      .as[(Long, Long)]
      .localCheckpoint(eager = false, graft.ops.Par.cutLevel)
    val perPart = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var cnt = 0L; var sum = 0L
      it.foreach { case (_, n) => cnt += 1; sum += n }
      Iterator.single((pid, cnt, sum))
    }.collect().sortBy(_._1)
    val idxOff = spark.sparkContext.broadcast(
      perPart.map(_._2).scanLeft(0L)(_ + _))
    val cumOff = spark.sparkContext.broadcast(
      perPart.map(_._3).scanLeft(0L)(_ + _))
    ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var idx = idxOff.value(pid)
      var cum = cumOff.value(pid)
      it.map { case (d, n) =>
        cum += n
        val row = (d, n, idx, cum)
        idx += 1
        row
      }
    }.toDF("doc_id", "n", "idx", "cum")
  }

  /** Distributed searchsorted-right: for each query value, the count of
    * `cums.v` values ≤ it. The algebra is a sorted merge of cum rows
    * (kind 0) and query rows (kind 1) with a running kind-0 count — run
    * here as a RANGE-PARTITIONED prefix scan, the form that holds at
    * 10^12 rows: repartitionByRange on (v, kind) → per-partition kind-0
    * counts (one tiny collect, O(partitions)) → broadcast prefix offsets
    * → per-partition running count. No global single-partition window
    * anywhere. (RDD zone is justified: the running scan is genuine
    * per-partition imperative state that needs the partition index.)
    *
    * cums: (v: Long, idx: Long); queries: (v: Long, q_doc: Long).
    * Returns (doc_id = q_doc, cnt = searchsorted index).
    */
  def searchSorted(spark: SparkSession, cums: DataFrame,
                   queries: DataFrame): DataFrame = {
    import spark.implicits._
    val longNull = lit(null).cast("long")
    val union = cums.select(col("v"), lit(0).as("kind"), longNull.as("q_doc"))
      .unionByName(queries.select(col("v"), lit(1).as("kind"),
        col("q_doc").cast("long").as("q_doc")))
    val parts = math.max(2, spark.sparkContext.defaultParallelism)
    // eager localCheckpoint: both passes read the same materialized
    // range-partitioned blocks (ties: kind 0 sorts before kind 1 —
    // searchsorted-RIGHT counts equal cums).
    // Small-input fast path gated on the CUMS side's partitioning (an
    // RDD-backed frame in the sampler, so the probe plans no shuffle):
    // one local sort instead of range-sample + shuffle; the running
    // kind-0 count below is partition-count agnostic.
    val small = cums.rdd.getNumPartitions <= 2
    val ranged = (if (small)
        union.coalesce(1).sortWithinPartitions("v", "kind")
      else union.repartitionByRange(parts, col("v"), col("kind"))
        .sortWithinPartitions("v", "kind"))
      .as[(Long, Int, Option[Long])]
      .localCheckpoint(eager = false, graft.ops.Par.cutLevel)
    val perPart = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var c = 0L
      it.foreach { case (_, k, _) => if (k == 0) c += 1 }
      Iterator.single((pid, c))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = spark.sparkContext.broadcast(perPart.scanLeft(0L)(_ + _))
    ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = offsets.value(pid)
      it.flatMap { case (_, k, q) =>
        if (k == 0) { run += 1; None } else Some((q.get, run))
      }
    }.toDF("doc_id", "cnt")
  }

  /** NSP pair construction: one instance per doc — (doc_id,
    * is_random_next, b_doc_id, n_a, n_b). The negative's B-side document
    * is drawn length-weighted via cumsum + [[searchSorted]] (the
    * reference's sample_doc :46-58 — no N² join, no driver loop).
    */
  def nspPairs(docs: DataFrame, maxA: Int = 64, maxB: Int = 63): DataFrame = {
    val spark = docs.sparkSession
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
    // only the ~half of docs drawing a RANDOM next consume the sample —
    // restrict the query side BEFORE the two-pass searchsorted scan
    // (halves its union/range-partition volume at corpus scale), then
    // left-join the draws back so the 50% with the sequential next pass
    // through with a null (never selected) sample
    val sampledIdx = searchSorted(spark,
      c.select(col("cum").as("v"), col("idx")),
      q.where(col("is_random_next"))
        .select(col("sent_idx").as("v"), col("doc_id").as("q_doc")))
    val sampled = sampledIdx.join(
      c.select(col("idx").as("cnt"), col("doc_id").as("s_doc"), col("n").as("s_n")),
      "cnt")
    val aFull = floor((col("n") + 1) / 2).cast("long")
    q.join(sampled.select("doc_id", "s_doc", "s_n"), Seq("doc_id"), "left")
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
        // bround (HALF_EVEN) = Python round — the reference's
        // round(len*0.15) is banker's, so m=30 masks 4, not 5; the
        // DuckDB oracle replays round_even
        least(lit(maxPred), greatest(lit(1), bround(col("m") * prob))))
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

  /** Deterministic negative sampling for contrastive training pairs: k
    * md5-drawn negatives per anchor document, drawn over the doc RANK
    * space (via the range-partitioned rank scan, so doc ids need not be
    * dense), self-collisions shifted +1 mod N. The draw is a pure column
    * expression; resolving rank → doc id is one equi-join — the standard
    * distributed random-access pattern, no driver-side iteration (the
    * only collected scalar is N).
    */
  def negativeSamples(docs: DataFrame, k: Int = 4): DataFrame = {
    import org.apache.spark.sql.functions._
    val ranked = Scans.zeroBasedRank(docs.select("doc_id").distinct(), "doc_id")
      .localCheckpoint(eager = false, graft.ops.Par.cutLevel) // anchor side + rank-lookup side both read it
    val n = ranked.count()
    // no negatives exist for a 0/1-doc corpus: pmod by n=0 throws under
    // ANSI, and at n=1 the collision shift maps every draw back to the
    // anchor itself (self-pairs) — empty result, same schema
    if (n <= 1)
      return ranked.select(col("doc_id"), lit(0L).as("j"),
        col("doc_id").as("neg_doc_id")).limit(0)
    val anchors = ranked
      .withColumn("j", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("draw",
        pmod(TextOps.hexInt(concat(col("doc_id"), lit("_neg_"), col("j"))), lit(n)))
      .withColumn("neg_idx",
        when(col("draw") === col("idx"), pmod(col("draw") + 1, lit(n)))
          .otherwise(col("draw")))
    anchors.join(
        ranked.select(col("idx").as("neg_idx"), col("doc_id").as("neg_doc_id")),
        "neg_idx")
      .select(col("doc_id"), col("j").cast("long").as("j"), col("neg_doc_id"))
  }

  /** Per-epoch JSON-lines sink with sidecar metrics, the reference's
    * epoch_N.json + epoch_N_metrics.json layout (:278-298). Returns the
    * instance count. Sidecar goes through the Hadoop FS API (DFS-safe).
    */
  def writeEpochJson(spark: SparkSession, instances: DataFrame,
                     outDir: String, epoch: Int, maxSeqLen: Int = 128): Long = {
    val path = s"$outDir/epoch_$epoch.json"
    // persist: count + write share ONE execution of the NSP/masking
    // pipeline instead of running it end-to-end twice
    val persisted = instances.persist()
    val n = persisted.count()
    persisted.write.mode("overwrite").json(path)
    persisted.unpersist()
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
