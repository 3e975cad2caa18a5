package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spherical k-means for the IVF coarse quantizer (Dhillon & Modha
  * 2001, "Concept decompositions for large sparse text data using
  * clustering" — public algorithm): Lloyd iterations under the COSINE
  * objective (assign to argmax-cosine centroid; update = normalized
  * mean of the cell's unit vectors), which is exactly the similarity
  * the ANN search ranks by, and whose objective is provably
  * non-decreasing per round (asserted in KmeansSpec).
  *
  * Scale shape: each round is ONE mapPartitions over the corpus
  * producing ≤ k partial (sum-vector, count, objective) rows per
  * partition, merged on the driver — O(partitions·k·d) collected per
  * round, never a per-dimension shuffle fan-out and never a corpus
  * collect. Centroids travel as a broadcast (k·d doubles).
  */
object Kmeans {

  private def normalize(v: Array[Double]): Array[Double] = {
    var n = 0.0
    var i = 0
    while (i < v.length) { n += v(i) * v(i); i += 1 }
    val inv = if (n == 0.0) 0.0 else 1.0 / math.sqrt(n)
    v.map(_ * inv)
  }

  /** Train k spherical centroids; init = the k vectors with the smallest
    * vec_id (deterministic under any partitioning). Returns (centroids,
    * per-iteration cosine objective — monotone non-decreasing).
    */
  def train(emb: DataFrame, k: Int = 10, iters: Int = 5)
      : (Array[Array[Double]], Array[Double]) = {
    val spark = emb.sparkSession
    import spark.implicits._
    val e = emb.select(col("vec_id").cast("long"),
        transform(col("embedding"), x => x.cast("double")))
      .as[(Long, Array[Double])]
      .map { case (id, v) => (id, normalize(v)) }
      .persist()
    var cents = e.orderBy("_1").limit(k).collect().map(_._2)
    val objs = new Array[Double](iters)
    for (it <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(cents)
      val partials = e.mapPartitions { rows =>
        val cs = bc.value
        val kk = cs.length
        val d = cs(0).length
        val sums = Array.fill(kk)(new Array[Double](d))
        val counts = new Array[Long](kk)
        var obj = 0.0
        rows.foreach { case (_, v) =>
          var best = 0
          var bestDot = Double.NegativeInfinity
          var c = 0
          while (c < kk) {
            var s = 0.0
            var i = 0
            while (i < d) { s += cs(c)(i) * v(i); i += 1 }
            if (s > bestDot) { bestDot = s; best = c }
            c += 1
          }
          obj += bestDot
          counts(best) += 1
          val acc = sums(best)
          var i = 0
          while (i < d) { acc(i) += v(i); i += 1 }
        }
        // the partition's objective share rides on its FIRST non-empty
        // cell row (cell 0 may be empty in this partition)
        val nonEmpty = (0 until kk).filter(c => counts(c) > 0)
          .map(c => (c, sums(c), counts(c), 0.0))
        if (nonEmpty.isEmpty) Iterator.empty
        else {
          val h = nonEmpty.head
          Iterator.single((h._1, h._2, h._3, obj)) ++ nonEmpty.tail.iterator
        }
      }.collect()
      val d = cents(0).length
      val merged = Array.fill(k)(new Array[Double](d))
      val counts = new Array[Long](k)
      var obj = 0.0
      partials.foreach { case (c, s, n, o) =>
        var i = 0
        while (i < d) { merged(c)(i) += s(i); i += 1 }
        counts(c) += n
        obj += o
      }
      objs(it) = obj
      // empty cells keep their previous centroid (standard Lloyd rule)
      cents = Array.tabulate(k)(c =>
        if (counts(c) > 0) normalize(merged(c)) else cents(c))
    }
    e.unpersist()
    (cents, objs)
  }
}
