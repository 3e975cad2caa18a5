package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Map-side-pruned grouped top-k — the scale form of
  * `row_number().over(Window.partitionBy(g).orderBy(...)) <= k`.
  *
  * The window form shuffles EVERY row of the corpus to its group's
  * reducer before discarding all but k; at 10^12 rows that shuffle is
  * the job. Here each input partition first keeps only its own top-k
  * per group (bounded heaps, O(groups·k) task state), so the exchange
  * that follows moves at most partitions·k rows per group — the final
  * window then ranks that pruned set exactly. Output is identical to
  * the window form for any input because per-partition top-k is a
  * superset of the global top-k (proof: any global top-k row is top-k
  * within its own partition), and the tie order (v desc, id asc) is a
  * total order.
  */
object TopK {

  /** Top-k rows per group by (v desc, id asc). Input columns:
    * (grp string, id long, v double); output adds rn ∈ [1, k].
    */
  def groupedTopK(df: DataFrame, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pruned = df
      .select(col("grp").cast("string"), col("id").cast("long"),
        col("v").cast("double"))
      .as[(String, Long, Double)]
      .mapPartitions { it =>
        // min-heap whose head is the WORST kept row (smallest v, then
        // largest id) — evicted when a better row arrives at capacity
        val worstFirst = new java.util.Comparator[(Long, Double)] {
          def compare(a: (Long, Double), b: (Long, Double)): Int = {
            val c = java.lang.Double.compare(a._2, b._2)
            if (c != 0) c else java.lang.Long.compare(b._1, a._1)
          }
        }
        val heaps = new java.util.HashMap[String,
          java.util.PriorityQueue[(Long, Double)]]()
        it.foreach { case (g, id, v) =>
          val pq = heaps.computeIfAbsent(g, _ =>
            new java.util.PriorityQueue[(Long, Double)](k + 1, worstFirst))
          if (pq.size < k) pq.add((id, v))
          else if (worstFirst.compare((id, v), pq.peek()) > 0) {
            pq.poll(); pq.add((id, v))
          }
        }
        import scala.jdk.CollectionConverters._
        heaps.entrySet().iterator().asScala.flatMap(e =>
          e.getValue.iterator().asScala.map(t => (e.getKey, t._1, t._2)))
      }
      .toDF("grp", "id", "v")
    val w = Window.partitionBy("grp").orderBy(desc("v"), asc("id"))
    pruned.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
  }

  /** Deterministic uniform k-sample per group: rank each row by the
    * md5 hash of its id (a fixed uniform permutation of the group) and
    * keep the k smallest — a reproducible, engine-replayable sample
    * with the same map-side heap pruning as [[groupedTopK]] (shuffle
    * volume partitions·k per group, never the corpus). The hash rank is
    * reduced mod 2^50 so it is exactly representable as a double on
    * both sides of the oracle compare. Rank ties — near-certain at the
    * 10^12-row scale (birthday bound ~2^25 rows per group in a 2^50
    * space) — break by the STRING form of the id, and any oracle must
    * tie-break identically (CAST the id to VARCHAR in SQL: a numeric
    * tie-break orders 9 before 10 where "10" < "9").
    * Output: (grp, id, rn ∈ [1, k]).
    */
  def sampleKPerGroup(df: DataFrame, groupCol: String, idCol: String,
                      k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pruned = df
      .select(col(groupCol).cast("string").as("grp"),
        col(idCol).cast("string").as("id"),
        (TextOps.hexInt(col(idCol).cast("string")) % (1L << 50))
          .cast("double").as("v"))
      .as[(String, String, Double)]
      .mapPartitions { it =>
        // max-heap: head = LARGEST kept (v asc, id asc priority) —
        // evicted when a smaller-ranked row arrives at capacity
        val largestFirst = new java.util.Comparator[(String, Double)] {
          def compare(a: (String, Double), b: (String, Double)): Int = {
            val c = java.lang.Double.compare(b._2, a._2)
            if (c != 0) c else b._1.compareTo(a._1)
          }
        }
        val heaps = new java.util.HashMap[String,
          java.util.PriorityQueue[(String, Double)]]()
        it.foreach { case (g, id, v) =>
          val pq = heaps.computeIfAbsent(g, _ =>
            new java.util.PriorityQueue[(String, Double)](k + 1, largestFirst))
          if (pq.size < k) pq.add((id, v))
          else if (largestFirst.compare((id, v), pq.peek()) > 0) {
            pq.poll(); pq.add((id, v))
          }
        }
        import scala.jdk.CollectionConverters._
        heaps.entrySet().iterator().asScala.flatMap(e =>
          e.getValue.iterator().asScala.map(t => (e.getKey, t._1, t._2)))
      }
      .toDF("grp", "id", "v")
    val w = Window.partitionBy("grp").orderBy(asc("v"), asc("id"))
    pruned.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .drop("v")
  }
}
