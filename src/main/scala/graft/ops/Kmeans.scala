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
    // empty corpus → no centroids, zero objectives (not an NPE in the
    // partial-aggregation kernel below, which indexes cents(0))
    if (cents.isEmpty) { e.unpersist(); return (cents, new Array[Double](iters)) }
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

  /** Argmin-distance cell for a quantized vector: exact long Σ(v−c)²,
    * ties to the smallest cell id (`cs` must be cell-ascending).
    */
  private[ops] def nearest(cs: Seq[(Int, Array[Long])],
                           v: Array[Long]): (Int, Long) = {
    var best = -1; var bestD = Long.MaxValue
    cs.foreach { case (c, cv) =>
      var s = 0L; var i = 0
      while (i < v.length) { val t = v(i) - cv(i); s += t * t; i += 1 }
      if (s < bestD) { bestD = s; best = c }
    }
    (best, bestD)
  }

  /** FP-free Lloyd k-means over INTEGER-QUANTIZED embeddings — the
    * oracle-able twin of [[train]]. Vectors are quantized once
    * (round(x·scale) per dimension, half-away-from-zero in both Spark
    * and DuckDB), then every distance (Σ(v−c)², long), every centroid
    * update (Σv div n, truncating division — Spark `div`, DuckDB `//`,
    * Scala `/` all truncate toward zero) and every tie-break (smallest
    * cell id) is exact integer arithmetic: the result is bit-identical
    * under ANY partitioning and ANY engine, unlike floating-point means
    * whose summation order is nondeterministic. This closes the gap
    * that kept the trained quantizer out of the DuckDB oracle set.
    *
    * Scale shape identical to [[train]]: one mapPartitions per round
    * emitting ≤ k (cell, sum-vector, count) partials per partition,
    * O(partitions·k·d) merged on the driver, centroids broadcast back.
    * Empty cells are DROPPED (not held at their old position) so the
    * SQL replay — where a missing group simply yields no row — agrees.
    *
    * Returns the final assignment (vec_id, cell, dist) after `updates`
    * centroid-update rounds from the deterministic init (the k vectors
    * with smallest vec_id, cell = rank order).
    */
  def assignQuantized(emb: DataFrame, k: Int = 4, updates: Int = 2,
                      scale: Int = 1000): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val q = quantized(emb, scale).persist()
    val cents = trainQuantizedCentroids(q, k, updates)
    val bc = spark.sparkContext.broadcast(cents)
    q.map { case (id, v) =>
      val (cell, dist) = nearest(bc.value, v)
      (id, cell, dist)
    }.toDF("vec_id", "cell", "dist")
  }

  /** Quantize (vec_id, embedding) to integer vectors (round(x·scale),
    * half-away-from-zero on every engine). Columns aliased _1/_2 so the
    * tuple encoder AND `orderBy("_1")` both resolve.
    */
  def quantized(emb: DataFrame, scale: Int = 1000)
      : org.apache.spark.sql.Dataset[(Long, Array[Long])] = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb.select(col("vec_id").cast("long").as("_1"),
        transform(col("embedding"), x =>
          round(x.cast("double") * scale).cast("long")).as("_2"))
      .as[(Long, Array[Long])]
  }

  /** The Lloyd loop of [[assignQuantized]], reusable by the IVF search:
    * init = k smallest vec_ids' vectors, `updates` integer-exact
    * centroid updates, empty cells dropped.
    */
  def trainQuantizedCentroids(
      q: org.apache.spark.sql.Dataset[(Long, Array[Long])],
      k: Int, updates: Int): Seq[(Int, Array[Long])] = {
    val spark = q.sparkSession
    import spark.implicits._
    // init: cell c = the (c+1)-th smallest vec_id's vector
    var cents: Seq[(Int, Array[Long])] =
      q.orderBy("_1").limit(k).collect().map(_._2).zipWithIndex
        .map { case (v, c) => (c, v) }
    for (_ <- 1 to updates) {
      val bc = spark.sparkContext.broadcast(cents)
      val partials = q.mapPartitions { rows =>
        val cs = bc.value
        val sums = scala.collection.mutable.Map.empty[Int, Array[Long]]
        val counts = scala.collection.mutable.Map.empty[Int, Long]
        rows.foreach { case (_, v) =>
          val (cell, _) = nearest(cs, v)
          val acc = sums.getOrElseUpdate(cell, new Array[Long](v.length))
          var i = 0
          while (i < v.length) { acc(i) += v(i); i += 1 }
          counts(cell) = counts.getOrElse(cell, 0L) + 1
        }
        sums.iterator.map { case (c, s) => (c, s, counts(c)) }
      }.collect()
      val merged = scala.collection.mutable.Map.empty[Int, (Array[Long], Long)]
      partials.foreach { case (c, s, n) =>
        val (acc, cnt) = merged.getOrElseUpdate(c,
          (new Array[Long](s.length), 0L))
        var i = 0
        while (i < s.length) { acc(i) += s(i); i += 1 }
        merged(c) = (acc, cnt + n)
      }
      cents = merged.toSeq.sortBy(_._1).map { case (c, (s, n)) =>
        // TRUNCATING integer division (Scala '/'), deliberately: DuckDB's
        // INTEGER `//` also truncates toward zero ((-7)::BIGINT // 2 = -3,
        // verified — only FLOAT `//` floors), so this is the exact
        // operation the q62/q67/q97 oracles replay. Math.floorDiv here
        // breaks all three on any negative coordinate sum.
        (c, s.map(_ / n))
      }
    }
    cents
  }

  /** Train all `m` per-subspace PQ codebooks in ONE pass per update
    * round — the partial aggregation is keyed by (subspace, cell)
    * inside a single mapPartitions — instead of m sequential
    * [[trainQuantizedCentroids]] calls over slice datasets (m × updates
    * corpus scans; at production m = 16-64 that is dozens of scans of
    * the persisted residual set). Bit-identical per subspace to the
    * sequential form: the init is the k smallest vec_ids' subvector
    * slices (one collect serves every subspace), assignment is the same
    * [[nearest]] (ties to the smaller cell), the update is the same
    * truncating division over long sums (order-independent), and empty
    * cells are dropped — asserted against the sequential trainer in
    * KmeansSpec.
    */
  def trainQuantizedBooks(q: org.apache.spark.sql.Dataset[(Long, Array[Long])],
                          m: Int, k: Int, updates: Int)
      : IndexedSeq[Seq[(Int, Array[Long])]] = {
    val spark = q.sparkSession
    import spark.implicits._
    val headRows = q.orderBy("_1").limit(k).collect()
    if (headRows.isEmpty) return IndexedSeq.fill(m)(Seq.empty)
    val d = headRows(0)._2.length
    require(d % m == 0,
      s"vector dim $d is not divisible by m=$m subspaces")
    val sd = d / m
    var books: IndexedSeq[Seq[(Int, Array[Long])]] = (0 until m).map { s =>
      headRows.map(_._2.slice(s * sd, s * sd + sd)).zipWithIndex
        .map { case (v, c) => (c, v) }.toSeq
    }
    for (_ <- 1 to updates) {
      val bc = spark.sparkContext.broadcast(books)
      val partials = q.mapPartitions { rows =>
        val bs = bc.value
        val nSub = bs.length
        val sums = scala.collection.mutable.Map.empty[(Int, Int), Array[Long]]
        val counts = scala.collection.mutable.Map.empty[(Int, Int), Long]
        rows.foreach { case (_, v) =>
          var s = 0
          while (s < nSub) {
            val sl = v.slice(s * sd, s * sd + sd)
            val (cell, _) = nearest(bs(s), sl)
            val acc = sums.getOrElseUpdate((s, cell), new Array[Long](sd))
            var i = 0
            while (i < sd) { acc(i) += sl(i); i += 1 }
            counts((s, cell)) = counts.getOrElse((s, cell), 0L) + 1
            s += 1
          }
        }
        sums.iterator.map { case (key, sm) =>
          (key._1, key._2, sm, counts(key)) }
      }.collect()
      val merged = scala.collection.mutable
        .Map.empty[(Int, Int), (Array[Long], Long)]
      partials.foreach { case (s, c, sm, n) =>
        val (acc, cnt) = merged.getOrElseUpdate((s, c),
          (new Array[Long](sd), 0L))
        var i = 0
        while (i < sd) { acc(i) += sm(i); i += 1 }
        merged((s, c)) = (acc, cnt + n)
      }
      books = (0 until m).map { s =>
        merged.iterator.filter(_._1._1 == s).toSeq.sortBy(_._1._2)
          .map { case ((_, c), (sm, n)) => (c, sm.map(_ / n)) }
      }
    }
    books
  }

  /** End-to-end integer IVF ANN: train the quantized coarse quantizer
    * ([[trainQuantizedCentroids]]), assign every vector to its cell,
    * then for each of the `nQueries` smallest-vec_id query vectors rank
    * its CELL-MATES by exact integer squared L2 distance (ties → the
    * smaller vec_id) and keep the top `topK` non-self neighbours. All
    * arithmetic is long-integer, so index build AND search replay
    * bit-identically in SQL — the oracle-verified composition of the
    * trained-quantizer pieces (cell restriction is the IVF scale story:
    * each query scans one cell, not the corpus).
    */
  def ivfSearchQuantized(emb: DataFrame, k: Int = 4, updates: Int = 2,
                         nQueries: Int = 10, topK: Int = 3,
                         scale: Int = 1000): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val q = quantized(emb, scale).persist()
    val cents = trainQuantizedCentroids(q, k, updates)
    val bc = spark.sparkContext.broadcast(cents)
    val assigned = q.map { case (id, v) => (id, nearest(bc.value, v)._1, v) }
      .toDF("vec_id", "cell", "qv")
      .localCheckpoint(eager = false, graft.ops.Par.cutLevel) // reused as both query and candidate side
    val queries = assigned.orderBy("vec_id").limit(nQueries)
      .select(col("vec_id").as("q_id"), col("cell"), col("qv").as("q_qv"))
    val joined = queries.join(assigned, "cell")
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("nn_id"),
        expr("""aggregate(zip_with(q_qv, qv, (a, b) -> (a - b) * (a - b)),
               |0L, (acc, x) -> acc + x)""".stripMargin).as("dist"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(asc("dist"), asc("nn_id"))
    joined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("nn_id"), col("dist"))
  }
}
