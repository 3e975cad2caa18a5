package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range (interval) join — the time-window companion to
  * [[AsofJoin]]: all right rows whose timestamp falls within a window
  * BEFORE each left row's timestamp, per key (click→purchase
  * attribution, error→deploy blame, sensor correlation).
  *
  * Spark has no native range-join operator; the naive formulation
  * (equi-join on the key + BETWEEN filter) degenerates to a per-key
  * cross product that a hot key turns into the whole job. This one maps
  * the window onto COARSE TIME BUCKETS of exactly the window width: a
  * left row at bucket b can only match right rows in buckets {b−1, b},
  * so the left side is exploded to those two bucket keys, the join is a
  * plain equi-join on (key, bucket), and the exact BETWEEN predicate
  * filters inside the bucket pair. Per-key-per-bucket row counts bound
  * the fan-out — the standard distributed interval-join shape (same
  * binning idea as Flink's interval join, re-expressed relationally).
  * Each right row carries ONE bucket, so no pair is produced twice.
  *
  * All arithmetic is integer microseconds (`unix_micros` /
  * `epoch_us`) — engine-exact, no timestamp-to-double rounding.
  */
object RangeJoin {

  /** left (key, leftId, leftTs) ⋈ right (key, rightId, rightTs) where
    * rightTs ∈ [leftTs − windowSec, leftTs]. Returns
    * (key, <leftId>, <rightId>, lag_us = leftTs − rightTs ≥ 0).
    */
  def windowJoin(left: DataFrame, right: DataFrame, key: String,
                 leftId: String, rightId: String,
                 leftTs: String, rightTs: String,
                 windowSec: Long): DataFrame = {
    // a zero window would put `div 0` in the bucket expression — a
    // mid-plan DIVIDE_BY_ZERO (or silent empty output with ANSI off)
    // instead of an actionable error; negative windows bucket nonsense
    require(windowSec > 0, s"windowSec must be positive, got $windowSec")
    val w = windowSec * 1000000L
    // FLOOR division (div truncates toward zero): pre-1970 timestamps
    // produce negative epoch micros, and the two-bucket containment
    // proof requires buckets aligned on floor boundaries on both sides
    def fdiv(c: String) =
      expr(s"($c div ${w}L) - (case when $c % ${w}L < 0 then 1 else 0 end)")
    // NTZ columns cast through the session zone (pinned UTC by the
    // driver mains) — epoch micros then agree with DuckDB's epoch_us
    val l = left.select(col(key), col(leftId),
        unix_micros(col(leftTs).cast("timestamp")).as("_lus"))
      .withColumn("_b", explode(array(fdiv("_lus"), fdiv("_lus") - 1)))
    val r = right.select(col(key), col(rightId),
        unix_micros(col(rightTs).cast("timestamp")).as("_rus"))
      .withColumn("_b", fdiv("_rus"))
    l.join(r, Seq(key, "_b"))
      .where(col("_rus") >= col("_lus") - w && col("_rus") <= col("_lus"))
      .select(col(key), col(leftId), col(rightId),
        (col("_lus") - col("_rus")).as("lag_us"))
  }
}
