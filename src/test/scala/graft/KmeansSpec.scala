package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spherical k-means trainer + trained-IVF search: Lloyd monotonicity,
  * determinism, and recall against the exact baseline.
  */
class KmeansSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("cosine objective is non-decreasing across Lloyd iterations; deterministic") {
    val (c1, obj1) = graft.ops.Kmeans.train(emb, k = 10, iters = 5)
    obj1.sliding(2).foreach { case Array(a, b) =>
      assert(b >= a - 1e-9, s"objective decreased: ${obj1.mkString(",")}")
    }
    assert(obj1.last > obj1.head, "training made no progress")
    val (c2, obj2) = graft.ops.Kmeans.train(emb, k = 10, iters = 5)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    assert(obj1.toSeq == obj2.toSeq)
  }

  test("trained quantizer recovers PLANTED cluster structure; modulo seeding cannot") {
    // the driver's synthetic embeddings are structureless (intra-label
    // cosine ≈ inter ≈ 0), so recall differences on them are partition
    // luck — the honest evaluation plants real clusters and requires the
    // trained quantizer to find them (the q44/q45 honesty rule applied
    // to ANN): 10 well-separated cluster centers, 300 points.
    import spark.implicits._
    import graft.gen.CorpusGen.mix64
    val dim = 16
    val nClusters = 10
    def unit(seed: Long): Array[Double] = {
      val v = Array.tabulate(dim)(d =>
        (mix64(seed * 31 + d).toDouble / Long.MaxValue))
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val centers = Array.tabulate(nClusters)(c => unit(1000L + c))
    val rows = (0 until 300).map { i =>
      val c = i % nClusters
      val noise = unit(777L + i)
      val v = centers(c).zip(noise).map { case (a, b) => (a + 0.15 * b).toFloat }
      (i.toLong, v, c)
    }
    val planted = rows.toDF("vec_id", "embedding", "label")
    def recallOf(approx: org.apache.spark.sql.DataFrame): Double = {
      val exact = graft.ops.Ann.bruteTopK(planted, k = 5).select("q_id", "nn_id")
      val nQ = exact.select("q_id").distinct().count()
      val hits = exact.join(approx.select("q_id", "nn_id"),
        Seq("q_id", "nn_id"), "left_semi").count()
      hits.toDouble / (nQ * 5)
    }
    val trained = graft.ops.Ann.ivfTopKTrained(planted, k = 5,
      nCentroids = nClusters, trainIters = 5, probes = 2)
    // shape: ranks are 1..k per query, no self-matches
    val ranks = trained.groupBy("q_id").agg(max("rank").as("m"), count(lit(1)).as("n"))
    assert(ranks.where(col("m") =!= col("n")).count() == 0)
    assert(trained.where(col("q_id") === col("nn_id")).count() == 0)
    // exact structure recovery: every trained cell holds exactly one
    // planted cluster AND every cluster lives in exactly one cell (no
    // merges, no splits — the property that bounds per-query candidate
    // cost to one cluster's size at full recall)
    def recovery(cells: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val j = cells.join(planted.select(col("vec_id"), col("label")), "vec_id")
      val mixes = j.groupBy("cell").agg(countDistinct("label").as("n"))
        .where(col("n") > 1).count()
      val splits = j.groupBy("label").agg(countDistinct("cell").as("n"))
        .where(col("n") > 1).count()
      (mixes, splits)
    }
    val (mT, sT) = recovery(graft.ops.Ann.ivfCellsTrained(planted, nClusters, 5))
    val (mM, sM) = recovery(graft.ops.Ann.ivfCells(planted, centroidMod = 30))
    val rTrained = recallOf(trained)
    info(f"planted clusters: trained mixes=$mT splits=$sT recall=$rTrained%.3f; " +
      s"modulo-seeded mixes=$mM splits=$sM")
    assert(mT == 0 && sT == 0,
      s"trained quantizer failed to recover the planted partition (mixes=$mT splits=$sT)")
    assert(rTrained > 0.9, f"trained recall $rTrained%.3f on separable clusters")
    // the modulo stand-in (all 10 seeds land in cluster 0 by construction
    // here) cannot recover the partition
    assert(mM + sM > 0, "modulo seeding unexpectedly recovered the partition")
  }

  test("integer-quantized k-means: planted recovery, partitioning-invariant") {
    import spark.implicits._
    // two tight planted clusters around (+1…) and (−1…), dim 4
    def vec(base: Float, wiggle: Float) = Array(base + wiggle, base, base, base)
    val rows = (0 until 20).map { i =>
      val c = i % 2
      (i.toLong, vec(if (c == 0) 1f else -1f, (i / 2) * 0.01f), c)
    }
    val df = rows.toDF("vec_id", "embedding", "truth")
    val got = graft.ops.Kmeans.assignQuantized(df, k = 2, updates = 2)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    // exact recovery: each truth class maps to exactly one cell
    val byTruth = rows.groupBy(_._3).map { case (tr, rs) =>
      tr -> rs.map(r => got(r._1)._1).toSet
    }
    assert(byTruth.values.forall(_.size == 1), byTruth)
    assert(byTruth(0) != byTruth(1), byTruth)
    // identical output (cells AND integer distances) under a different
    // partitioning — the partitioning-invariance the oracle relies on
    val got2 = graft.ops.Kmeans
      .assignQuantized(df.repartition(7), k = 2, updates = 2)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(got == got2)
  }

  test("PQ ADC: planted recovery, partitioning-invariant, empty-safe") {
    import spark.implicits._
    // dim 8 = two subspaces of 4; each half carries its own two planted
    // clusters, so the per-subspace codebooks must separate them
    def half(base: Float, wiggle: Float) = Array(base + wiggle, base, base, base)
    // (cB differs between ids 0 and 1 — the codebook init takes the two
    // smallest vec_ids per subspace, which must not share a cluster or
    // the duplicate-centroid init collapses cell 1)
    val rows = (0 until 24).map { i =>
      val cA = i % 2            // cluster in subspace 0
      val cB = ((i + 1) / 2) % 2 // cluster in subspace 1
      val w = (i / 4) * 0.01f
      (i.toLong,
        half(if (cA == 0) 1f else -1f, w) ++ half(if (cB == 0) 1f else -1f, w))
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = graft.ops.Ann.pqSearchAdc(df, m = 2, k = 2, updates = 2,
        nQueries = 4, topK = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 4 * 3)
    // a query's nearest ADC neighbours share BOTH its planted clusters:
    // identical codes → adc distance == the query's own code distance,
    // strictly below any candidate differing in either subspace
    got.filter(_._2 == 1L).foreach { case (qid, _, nn, _) =>
      assert(qid % 2 == nn % 2 &&
        ((qid + 1) / 2) % 2 == ((nn + 1) / 2) % 2, (qid, nn))
    }
    // no self matches, ranks dense per query
    assert(got.forall { case (q, _, nn, _) => q != nn })
    assert(got.groupBy(_._1).values.forall(_.map(_._2).sorted.sameElements(Seq(1L, 2L, 3L))))
    // identical output under a different partitioning (the invariance
    // the bit-exact DuckDB replay of q97 relies on)
    val got2 = graft.ops.Ann.pqSearchAdc(df.repartition(7), m = 2, k = 2,
        updates = 2, nQueries = 4, topK = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.sorted.sameElements(got2.sorted))
    // empty input → empty result with the contract schema, no throw
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      df.schema)
    val e = graft.ops.Ann.pqSearchAdc(empty, m = 2, k = 2)
    assert(e.columns.toSeq == Seq("q_id", "rank", "nn_id", "adc_dist"))
    assert(e.count() == 0)
  }

  test("IVF-PQ: cell restriction + residual codes recover planted structure") {
    import spark.implicits._
    // coarse structure G = i % 2 (bases +10 / -10, far apart) and a
    // RESIDUAL variant V inside each coarse cluster (±1 in subspace 0).
    // V(0) != V(1) so neither the coarse init (ids 0,1 — different G)
    // nor the residual-book init (ids 0,1 — different V) collapses.
    def v(i: Int): Int = (i + i / 2) % 2
    val rows = (0 until 24).map { i =>
      val g = i % 2
      val base = if (g == 0) 10f else -10f
      val vs = if (v(i) == 0) 1f else -1f
      val w = (i / 4) * 0.01f
      (i.toLong, Array(base + vs + w, base, base, base,
        base + w, base, base, base))
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = graft.ops.Ann.ivfPqSearch(df, kc = 2, m = 2, k = 2,
        updates = 2, nQueries = 4, topK = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.length == 4 * 3)
    for ((q, rank, nn, cell, _) <- got) {
      assert(q != nn) // self excluded
      // CELL RESTRICTION: every candidate lives in the query's probed
      // coarse cell, i.e. shares the planted coarse cluster
      assert(q % 2 == nn % 2, s"q=$q nn=$nn crossed coarse cells")
      assert(cell >= 0)
      // residual codes separate the in-cell variants: the top neighbour
      // shares the query's variant too
      if (rank == 1L) assert(v(q.toInt) == v(nn.toInt), s"q=$q nn=$nn")
    }
    // partitioning-invariant (the bit-exact q103 DuckDB replay's premise)
    val got2 = graft.ops.Ann.ivfPqSearch(df.repartition(7), kc = 2, m = 2,
        k = 2, updates = 2, nQueries = 4, topK = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.sorted.sameElements(got2.sorted))
    // empty input → empty result with the contract schema, no throw
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], df.schema)
    val e = graft.ops.Ann.ivfPqSearch(empty)
    assert(e.columns.toSeq == Seq("q_id", "rank", "nn_id", "cell", "adc_dist"))
    assert(e.count() == 0)
  }

  test("IVF-PQ recall row: sweep-style query set, recall vs brute on planted clusters") {
    import spark.implicits._
    // planted unit-ish clusters (the recall sweep's generator shape):
    // 8 well-separated centers, 240 points, 16 dims
    import graft.gen.CorpusGen.mix64
    val dim = 16; val nClusters = 8
    def unit(seed: Long): Array[Double] = {
      val v = Array.tabulate(dim)(d => mix64(seed * 31 + d).toDouble / Long.MaxValue)
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val centers = Array.tabulate(nClusters)(c => unit(1000L + c))
    val emb = spark.range(240).map { i =>
      val c = centers((i % nClusters).toInt)
      val noise = unit(777L + i)
      (i, c.zip(noise).map { case (a, b) => (a + 0.15 * b).toFloat })
    }.toDF("vec_id", "embedding")
    val queryMod = 10
    val exact = graft.ops.Ann.bruteTopK(emb, 5, queryMod)
      .select("q_id", "nn_id")
    val approx = graft.ops.Ann.ivfPqSearch(emb, kc = nClusters, m = 4,
      k = 8, topK = 5, probes = 2, queryMod = Some(queryMod))
    // the sweep contract: SAME query set as the exact baseline
    val qsA = approx.select("q_id").distinct().collect()
      .map(_.getLong(0)).toSet
    assert(qsA == (0L until 240L by queryMod.toLong).toSet)
    val nExact = exact.count()
    val hits = exact.join(approx.select("q_id", "nn_id"),
      Seq("q_id", "nn_id"), "left_semi").count()
    val recall = hits.toDouble / nExact
    assert(recall >= 0.6, f"IVF-PQ recall@5 $recall%.3f on planted clusters")
    // the refine rung: exact re-rank of the ADC shortlist (50 >> topK 5
    // within the probed cells) must dominate raw ADC. Not asserted at
    // 1.0: the brute baseline ranks by cosine over raw floats while
    // refine ranks by integer L2 over [[Kmeans.quantized]] vectors —
    // near-ties between the 5th/6th neighbor of a tight cluster can
    // flip across the two metrics (measured 0.85 here vs raw ADC's
    // quantization-bound recall)
    val refined = graft.ops.Ann.ivfPqRefine(emb, kc = nClusters, m = 4,
      k = 8, topK = 5, shortlist = 50, probes = 2,
      queryMod = Some(queryMod))
    val hitsR = exact.join(refined.select("q_id", "nn_id"),
      Seq("q_id", "nn_id"), "left_semi").count()
    val recallR = hitsR.toDouble / nExact
    assert(recallR >= recall,
      f"refine recall $recallR%.3f fell below raw ADC $recall%.3f")
    assert(recallR >= 0.8, f"refine recall@5 $recallR%.3f on planted clusters")
  }

  test("one-pass multi-book PQ trainer is bit-identical to m sequential slice trainings") {
    val q = graft.ops.Kmeans.quantized(emb).persist()
    try {
      for ((m, k, updates) <- Seq((2, 4, 2), (4, 3, 3))) {
        val onePass = graft.ops.Kmeans.trainQuantizedBooks(q, m, k, updates)
        val d = q.head()._2.length
        val sd = d / m
        val sequential = (0 until m).map { s =>
          graft.ops.Kmeans.trainQuantizedCentroids(
            q.map { case (id, v) => (id, v.slice(s * sd, s * sd + sd)) }(
              org.apache.spark.sql.Encoders.product[(Long, Array[Long])]),
            k, updates)
        }
        assert(onePass.map(_.map { case (c, v) => (c, v.toSeq) }) ==
          sequential.map(_.map { case (c, v) => (c, v.toSeq) }),
          s"m=$m k=$k updates=$updates diverged")
      }
      // empty input: m empty books, no crash
      val empty = graft.ops.Kmeans.trainQuantizedBooks(
        q.filter(_ => false), 2, 4, 2)
      assert(empty == IndexedSeq(Seq.empty, Seq.empty))
    } finally q.unpersist()
  }

  test("SQ8: planted recovery, repartition-invariant, degenerate-safe") {
    import spark.implicits._
    // two planted clusters around +1 and -1 with per-vector wiggle well
    // inside the int8 quantization step (127/max ≈ 120 levels per unit)
    val rows = (0 until 20).map { i =>
      val base = if (i % 2 == 0) 1f else -1f
      (i.toLong, Array.fill(8)(base + (i / 2) * 0.001f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = graft.ops.Ann.sq8TopK(df, nQueries = 4, topK = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 12)
    // every neighbour shares its query's planted side
    got.foreach { case (q, _, nn, _) => assert(q % 2 == nn % 2, (q, nn)) }
    // identical under a different partitioning (global max + per-element
    // quantize are order-independent — the bit-exact replay contract)
    val got2 = graft.ops.Ann.sq8TopK(df.repartition(7), nQueries = 4, topK = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.sorted.sameElements(got2.sorted))
    // all-zero corpus: scale guard yields zero codes, zero distances,
    // id-ordered ties — never a divide-by-zero NaN
    val zeros = (0 until 5).map(i => (i.toLong, Array.fill(8)(0f)))
      .toDF("vec_id", "embedding")
    val z = graft.ops.Ann.sq8TopK(zeros, nQueries = 2, topK = 2).collect()
    assert(z.length == 4 && z.forall(_.getLong(3) == 0L))
  }
}

/** Deterministic Bloom membership pruning: exactness + replayability. */
class BloomSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark

  test("bloom prune: no false negatives; matches a driver-side bit replay") {
    import spark.implicits._
    val smallKeys = (1 to 8).map(i => s"k$i")
    val small = smallKeys.toDS()
    val keys = (1 to 500).map(i => s"k$i")
    val large = keys.zipWithIndex.map { case (k, i) => (i.toLong, k) }
      .toDF("row_id", "key")
    val m = 64; val k = 4 // deliberately overloaded (see FP check below)
    val got = graft.ops.Bloom.prune(large, "key", small, m, k)
      .collect().map(_.getString(1)).toSet
    // zero false negatives
    assert(smallKeys.toSet.subsetOf(got), got)
    // driver-side replay of the same double-hashing bit rule
    val md = java.security.MessageDigest.getInstance("MD5")
    def positions(key: String) = {
      val h1 = (graft.ops.TextOps.h60(md, key + "_h1") % m).toInt
      val h2 = (graft.ops.TextOps.h60(md, key + "_h2") % m).toInt
      (0 until k).map(j => (h1 + j * h2) % m)
    }
    val bits = smallKeys.flatMap(positions).toSet
    val want = keys.filter(kk => positions(kk).forall(bits.contains)).toSet
    assert(got == want)
    // the demo m is deliberately overloaded, so false positives exist —
    // proves the compare exercises bloom semantics, not the exact join
    assert(got.size > smallKeys.size, got.size)
    // exact composition: bloom + broadcast semi == plain semi-join
    val exact = graft.ops.Bloom.semiJoin(large, "key", small, m, k)
      .collect().map(_.getString(1)).toSet
    assert(exact == smallKeys.toSet)
  }

  test("bloom bitset rejects non-multiple-of-64 m at construction") {
    // a truncated m/64 buffer would otherwise fault mid-job in an
    // executor aggregate on any key hashing into [64*(m/64), m)
    intercept[IllegalArgumentException] {
      graft.ops.Bloom.bitsAggUdaf(m = 1000, k = 4)
    }
  }
}
