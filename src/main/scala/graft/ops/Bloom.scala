package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Deterministic Bloom-filter membership pruning for semi-joins.
  *
  * At 100 TB the expensive part of `large SEMI JOIN small` is shuffling
  * (or even scanning + hashing) the large side; when the small side fits
  * in a few KB of bits, a broadcast Bloom filter drops most non-matching
  * rows at the scan, before any join machinery — the same idea as
  * Spark's runtime `InjectRuntimeFilter`, but with a *deterministic*
  * md5-derived hash family so the pruned superset is bit-identical
  * across engines and partitionings (Spark's built-in bloom uses
  * implementation-defined hashing and is not replayable). The k
  * positions per key come from DOUBLE HASHING (Kirsch & Mitzenmacher,
  * "Less hashing, same performance", ESA'06 — public result):
  * p_j(key) = (h1 + j·h2) mod m with h1/h2 = h60(key ++ "_h1"/"_h2")
  * mod m (TextOps.hexInt — the engine-wide cross-engine hash
  * primitive). Two md5 evaluations per probed row regardless of k —
  * at 100 TB the per-row hash count IS the prune's cost.
  *
  * The filter itself is an associative [[Aggregator]] over the small
  * side's keys (per-partition partial bitsets OR-merged — one reduce,
  * no shuffle of the keys beyond the final combine), and the membership
  * test on the large side is pure native column expressions
  * (element_at + shiftright + bitwise AND — whole-stage codegen, no
  * UDF). The m-bit array travels as a plan literal; keep m ≤ ~2^20 so
  * the serialized plan stays small (the Bloom regime — if the small
  * side needs more bits than that, it deserves a real shuffled join).
  */
object Bloom {

  /** OR-merging bitset aggregator: each key sets its k md5 positions. */
  private class BitsetAgg(m: Int, k: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {
    // checked at CONSTRUCTION on every build path (incl. bitsAggUdaf):
    // a non-multiple-of-64 m would allocate a truncated m/64-long buffer
    // and setBits positions in [64*(m/64), m) would then fault mid-job
    // inside an executor aggregate instead of failing fast here
    require(m % 64 == 0, s"m must be a multiple of 64, got $m")
    @transient private lazy val md =
      java.security.MessageDigest.getInstance("MD5")
    def zero: Array[Long] = new Array[Long](m / 64)
    def reduce(b: Array[Long], key: String): Array[Long] = {
      setBits(b, md, key, m, k)
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoderCompat.longArray
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoderCompat.longArray
  }

  private object ExpressionEncoderCompat {
    val longArray: Encoder[Array[Long]] = {
      val s = SparkSession.active
      s.implicits.newLongArrayEncoder
    }
  }

  private def setBits(b: Array[Long], md: java.security.MessageDigest,
                      key: String, m: Int, k: Int): Unit = {
    val h1 = (TextOps.h60(md, key + "_h1") % m).toInt
    val h2 = (TextOps.h60(md, key + "_h2") % m).toInt
    var j = 0
    while (j < k) {
      val pos = (h1 + j * h2) % m
      b(pos >>> 6) |= (1L << (pos & 63))
      j += 1
    }
  }

  /** The bitset build as an aggregate FUNCTION (UserDefinedFunction over
    * one string column) — the form [[graft.plans.Rules.InjectDeterministicBloom]]
    * plants inside the scalar subquery it injects at optimization time.
    */
  def bitsAggUdaf(m: Int = 1 << 16, k: Int = 4)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new BitsetAgg(m, k), Encoders.STRING)

  /** Build the m-bit Bloom bitset from the small side's distinct keys
    * (string column `key`). m must be a multiple of 64.
    */
  def buildBits(keys: Dataset[String], m: Int, k: Int): Array[Long] = {
    require(m % 64 == 0, s"m must be a multiple of 64, got $m")
    keys.select(new BitsetAgg(m, k).toColumn).head()
  }

  /** Driver-side twin of [[buildBits]] for key sets already on the
    * driver (e.g. a broadcast dictionary's key set) — same bits, zero
    * Spark jobs.
    */
  def buildBitsLocal(keys: IterableOnce[String],
                     m: Int = 1 << 16, k: Int = 4): Array[Long] = {
    require(m % 64 == 0, s"m must be a multiple of 64, got $m")
    val md = java.security.MessageDigest.getInstance("MD5")
    val b = new Array[Long](m / 64)
    keys.iterator.foreach(setBits(b, md, _, m, k))
    b
  }

  /** Prune `large` to the rows whose `keyCol` (string) passes the Bloom
    * filter built from `smallKeys` — a deterministic SUPERSET of the
    * semi-join result (false-positive rate ≈ (1-e^{-kn/m})^k, zero
    * false negatives). Chain with an exact join for exactness; the
    * bloom stage is what cuts the scan-to-shuffle volume.
    */
  def prune(large: DataFrame, keyCol: String, smallKeys: Dataset[String],
            m: Int = 1 << 16, k: Int = 4): DataFrame =
    pruneWithBits(large, keyCol, buildBits(smallKeys, m, k), m, k)

  /** [[prune]] with a pre-built bitset (e.g. [[buildBitsLocal]] over a
    * driver-resident dictionary) — no job to build the filter.
    */
  def pruneWithBits(large: DataFrame, keyCol: String, bits: Array[Long],
                    m: Int = 1 << 16, k: Int = 4): DataFrame = {
    // two md5 evaluations per row via the native codegen'd [[H60Expr]]
    // (hexInt-identical bits, ~4× cheaper than the md5/conv expression
    // chain); the k bit probes are arithmetic
    def h60c(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.GraftColumnBridge.column(
        H60Expr(org.apache.spark.sql.GraftColumnBridge.expression(c)))
    val staged = large
      .withColumn("__bloom_bits", typedLit(bits.toSeq))
      .withColumn("__bloom_h1",
        h60c(concat(col(keyCol), lit("_h1"))) % m)
      .withColumn("__bloom_h2",
        h60c(concat(col(keyCol), lit("_h2"))) % m)
    val pass = (0 until k).map { j =>
      expr(
        s"""(shiftright(element_at(__bloom_bits,
           |  CAST(((__bloom_h1 + $j * __bloom_h2) % $m) div 64 AS INT) + 1),
           |  CAST(((__bloom_h1 + $j * __bloom_h2) % $m) % 64 AS INT))
           |  & 1) = 1""".stripMargin)
    }
    staged
      .where(pass.reduce(_ && _))
      .drop("__bloom_bits", "__bloom_h1", "__bloom_h2")
  }

  /** Exact semi-join with Bloom pre-pruning: the production composition
    * (prune at the scan, then a broadcast semi-join over the survivors
    * for exactness).
    */
  def semiJoin(large: DataFrame, keyCol: String, smallKeys: Dataset[String],
               m: Int = 1 << 16, k: Int = 4): DataFrame = {
    val pruned = prune(large, keyCol, smallKeys, m, k)
    pruned.join(broadcast(smallKeys.toDF("__sj_key")),
      col(keyCol) === col("__sj_key"), "left_semi")
  }
}
