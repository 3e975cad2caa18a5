package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range-partitioned prefix scans — the distributed replacement for
  * global ordered windows (`Window.orderBy(...)` with no partitionBy
  * funnels the whole input through ONE partition). Two passes: range
  * partition + in-partition sort, per-partition partials collected to
  * the driver (O(partitions)), broadcast offsets, then a per-partition
  * running scan. Used by the MLM sampler (cumsum + searchsorted) and
  * cross-validation fold assignment.
  */
object Scans {

  /** Shared first pass of the single-long-column scans: range partition
    * + in-partition sort + localCheckpoint the values, then ONE
    * per-partition count job collected to the driver (O(partitions)).
    * Returns the checkpointed values and the global start offset of
    * each partition — offsets has partitions+1 entries and
    * `offsets.last` is the total row count, so callers needing N reuse
    * it instead of paying a second full scan of the raw input.
    */
  private def rangedOffsets(df: DataFrame, valueCol: String)
      : (org.apache.spark.sql.Dataset[Long], Array[Long]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = math.max(2, spark.sparkContext.defaultParallelism)
    val ranged = df.select(col(valueCol).cast("long").as("v"))
      .repartitionByRange(parts, col("v"))
      .sortWithinPartitions("v")
      .as[Long]
      .localCheckpoint(eager = false, graft.ops.Par.cutLevel)
    val counts = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var c = 0L; it.foreach(_ => c += 1); Iterator.single((pid, c))
    }.collect().sortBy(_._1).map(_._2)
    (ranged, counts.scanLeft(0L)(_ + _))
  }

  /** 0-based rank of UNIQUE long keys in ascending order:
    * (key, idx) with idx ∈ [0, N). Equivalent to
    * `row_number().over(Window.orderBy(key)) - 1` without the
    * single-partition window.
    */
  def zeroBasedRank(df: DataFrame, key: String): DataFrame =
    rankedWithTotal(df, key)._1

  private def rankedWithTotal(df: DataFrame, key: String)
      : (DataFrame, Long) = {
    val spark = df.sparkSession
    import spark.implicits._
    val (ranged, offsets) = rangedOffsets(df, key)
    val off = spark.sparkContext.broadcast(offsets)
    val ranked = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var i = off.value(pid)
      it.map { k => val row = (k, i); i += 1; row }
    }.toDF(key, "idx")
    (ranked, offsets.last)
  }

  /** Exact global percentiles over a (non-unique) long value column,
    * `percentile_disc` semantics: for each p the value at 1-indexed rank
    * max(1, ceil(p·n)) in ascending order. No global sort to one node
    * and no single-partition window: range-partition the values, count
    * per partition (O(partitions) driver collect), broadcast the global
    * offsets + target ranks, then each partition emits ONLY the rows
    * sitting at a target rank — two passes, O(|ps|) output, the form
    * that holds at 10^12 rows where approx_percentile would be the
    * lossy alternative. Equal values land in one range partition, so
    * the in-partition sort yields a correct global order for ranking.
    *
    * Returns (p, value), one row per requested percentile.
    */
  def exactPercentiles(df: DataFrame, valueCol: String,
                       ps: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (ranged, offsets) = rangedOffsets(df, valueCol)
    val n = offsets.last
    // ceil(p·n) in IEEE double on BOTH sides of the oracle compare —
    // representability of p (0.9, 0.99, …) cancels out
    val targets: Map[Long, Seq[Double]] = ps
      .map(p => (math.max(1L, math.ceil(p * n).toLong) - 1L) -> p)
      .groupBy(_._1).map { case (i, xs) => i -> xs.map(_._2) }
    val bcTargets = spark.sparkContext.broadcast(targets)
    val off = spark.sparkContext.broadcast(offsets)
    ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var i = off.value(pid)
      it.flatMap { v =>
        val hit = bcTargets.value.get(i).map(_.map(p => (p, v)))
          .getOrElse(Nil)
        i += 1
        hit
      }
    }.toDF("p", "value")
  }

  /** Per-GROUP exact percentiles, same machinery as
    * [[exactPercentiles]]: range-partition by (group, value) — each
    * group occupies a contiguous run of partitions, so the
    * per-(partition, group) count table collected to the driver has at
    * most partitions + groups rows (each partition adds one row per
    * group it touches, and a group can only straddle a partition
    * boundary partitions-1 times). Broadcast per-group offsets + target
    * ranks, second pass emits only the hit rows. percentile_disc
    * semantics per group; returns (grp, p, value).
    */
  def groupedExactPercentiles(df: DataFrame, grpCol: String,
                              valueCol: String,
                              ps: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = math.max(2, spark.sparkContext.defaultParallelism)
    val ranged = df
      .select(col(grpCol).cast("string").as("g"),
        col(valueCol).cast("long").as("v"))
      .repartitionByRange(parts, col("g"), col("v"))
      .sortWithinPartitions("g", "v")
      .as[(String, Long)]
      .localCheckpoint(eager = false, graft.ops.Par.cutLevel)
    val counts: Array[(Int, String, Long)] =
      ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
        val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        it.foreach { case (g, _) => m(g) = m.getOrElse(g, 0L) + 1 }
        m.iterator.map { case (g, c) => (pid, g, c) }
      }.collect()
    // per-group totals and the group-local start offset of each partition
    val offsets: Map[(Int, String), Long] = counts.groupBy(_._2).flatMap {
      case (g, xs) =>
        val sorted = xs.sortBy(_._1)
        sorted.map(_._1).zip(sorted.map(_._3).scanLeft(0L)(_ + _))
          .map { case (pid, off) => (pid, g) -> off }
    }
    val targets: Map[String, Map[Long, Seq[Double]]] =
      counts.groupBy(_._2).map { case (g, xs) =>
        val n = xs.map(_._3).sum
        g -> ps.map(p => (math.max(1L, math.ceil(p * n).toLong) - 1L) -> p)
          .groupBy(_._1).map { case (i, ys) => i -> ys.map(_._2) }
      }
    val bcOff = spark.sparkContext.broadcast(offsets)
    val bcTgt = spark.sparkContext.broadcast(targets)
    ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      val idx = scala.collection.mutable.Map.empty[String, Long]
      it.flatMap { case (g, v) =>
        val i = idx.getOrElse(g, bcOff.value((pid, g)))
        idx(g) = i + 1
        bcTgt.value(g).get(i).map(_.map(p => (g, p, v))).getOrElse(Nil)
      }
    }.toDF("grp", "p", "value")
  }

  /** ntile(k) over ordered UNIQUE keys without a global window: the
    * first N mod k folds get one extra key (exact SQL ntile semantics,
    * oracle-verified), ranks from [[zeroBasedRank]]. Returns
    * (key, fold ∈ [0, k)).
    */
  def ntileFolds(df: DataFrame, key: String, k: Int): DataFrame = {
    // N comes from the rank pass's own per-partition counts — a
    // df.count() here would be a second complete scan of the raw input
    val (ranked, n) = rankedWithTotal(df, key)
    val q = n / k; val r = n % k
    val fold =
      if (q == 0) col("idx") // fewer keys than folds: one key per fold
      else when(col("idx") < r * (q + 1),
          floor(col("idx") / (q + 1)))
        .otherwise(lit(r) + floor((col("idx") - r * (q + 1)) / q))
    ranked.select(col(key), fold.cast("int").as("fold"))
  }

  /** Fixed-width histogram quantiles per group — the bounded-state
    * APPROXIMATE percentile that replaces [[groupedExactPercentiles]]
    * when even the rank-select scan is too much (e.g. percentiles per
    * key over 10^12 rows, recomputed every batch): state per group is
    * O(value range / binWidth) histogram buckets, aggregated map-side,
    * never the rows themselves. The answer is exact up to binWidth —
    * each p reports the smallest bin whose cumulative count reaches
    * ceil(p·n) (percentile_disc rounding, like the exact scan), plus
    * the bin's value bounds [lo, hi].
    *
    * Entirely integer (bin = value div binWidth; the ceil(p·n) target is
    * the one IEEE-double step, identical on every engine per the q60
    * recipe), so results are bit-identical across engines and
    * partitionings. The per-group cumulative window runs over bins, not
    * rows — bounded, skew-free state.
    *
    * Returns (grp, p, bin, lo, hi).
    */
  def histogramQuantiles(df: DataFrame, grpCol: String, valueCol: String,
                         binWidth: Long, ps: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    // FLOOR division, not Spark's truncating `div`: truncation gives
    // negative values a double-width bin 0 and mislabeled [lo, hi]
    // bounds (DuckDB's `//` — the oracle's operator — floors). The
    // pmod form stays in exact integer arithmetic.
    val bins = df.select(col(grpCol).cast("string").as("grp"),
        expr(s"(cast($valueCol as bigint) - pmod(cast($valueCol as bigint), " +
          s"${binWidth}L)) div ${binWidth}L").as("bin"))
      .groupBy("grp", "bin").agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = false, graft.ops.Par.cutLevel) // reused: cumulative pass + per-group totals
    val cum = bins.withColumn("cum",
      sum("n").over(Window.partitionBy("grp").orderBy("bin")))
    val psDf = spark.createDataFrame(ps.map(Tuple1(_))).toDF("p")
    val targets = bins.groupBy("grp").agg(sum("n").as("total"))
      .crossJoin(broadcast(psDf))
      .select(col("grp"), col("p"),
        greatest(lit(1L), ceil(col("p") * col("total"))).as("target"))
    cum.join(targets, "grp")
      .where(col("cum") >= col("target"))
      .groupBy("grp", "p").agg(min("bin").as("bin"))
      .select(col("grp"), col("p"), col("bin"),
        (col("bin") * binWidth).as("lo"),
        ((col("bin") + 1) * binWidth - 1).as("hi"))
  }
}
