package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative connected components over an edge DataFrame — the
  * canonicalization engine (north rule). Hand-rolled alternating
  * large-star/small-star (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC'14 — public algorithm) since no
  * GraphFrames jar ships in /opt/spark/jars.
  *
  * The two phases are applied SEQUENTIALLY each round (large-star then
  * small-star — interleaving them on the same input does not contract
  * chains and stalls on diameter ≥ 4 components; caught by CcScaleSpec).
  *
  * Scale notes: each phase is one shuffle on the node id; lineage is
  * truncated with localCheckpoint every round so the plan does not grow
  * unboundedly. Converges in O(log n) rounds; node ids compare as
  * strings, so the component representative — the minimum id — is
  * deterministic under any parallelism.
  */
object ConnectedComponents {

  /** large-star: ∀u, m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u), v > u. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("src"), col("dst"))
      .union(e.select(col("dst").as("src"), col("src").as("dst")))
    sym.groupBy("src")
      .agg(collect_set(col("dst")).as("nbrs"))
      .select(col("src"),
        least(col("src"), array_min(col("nbrs"))).as("m"),
        explode(col("nbrs")).as("v"))
      .where(col("v") > col("src"))
      .select(col("v").as("src"), col("m").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
  }

  /** small-star: orient edges large→small; ∀u, m = min(Γ≤(u) ∪ {u});
    * emit (v, m) for v ∈ Γ≤(u) ∪ {u}, v ≠ m.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val oriented = e.select(
      greatest(col("src"), col("dst")).as("src"),
      least(col("src"), col("dst")).as("dst"))
    oriented.groupBy("src")
      .agg(collect_set(col("dst")).as("nbrs"))
      .select(col("src"), array_min(col("nbrs")).as("m"),
        explode(concat(col("nbrs"), array(col("src")))).as("v"))
      .where(col("v") =!= col("m"))
      .select(col("v").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** edges: DataFrame with string columns (src, dst).
    * Returns (node, component) with component = min node id reachable.
    */
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int = 25,
          smallInputEdges: Long = 500000L): DataFrame = {
    // materialize the edge pipeline ONCE — nodes and the iteration both
    // read the checkpoint instead of recomputing the (possibly expensive,
    // e.g. LSH-candidate) upstream plan twice
    val base = edges.select(col("src"), col("dst")).localCheckpoint()
    // adaptive physical choice (AQE-style): an edge set below the
    // threshold provably fits one executor partition, so ONE task runs
    // union-find to the fixpoint in O(E·α) instead of O(log n) shuffle
    // rounds whose tiny jobs are pure scheduling overhead at this size —
    // the dictionary-sized canonicalMap inside every salted pipeline run
    // is the hot caller. Executor-side, never the driver; output
    // identical to the iterative path (min-id components, string order —
    // parity-asserted in CcScaleSpec). Pass smallInputEdges = 0 to force
    // the iterative path.
    if (base.count() <= smallInputEdges && smallInputEdges > 0)
      return runSingleTask(spark, base)
    val nodes = base.select(col("src").as("node"))
      .union(base.select(col("dst").as("node"))).distinct()
    var e = base.where(col("src") =!= col("dst")).distinct()
      .localCheckpoint()
    // convergence = edge-set fixpoint, detected by an order-independent
    // set signature (count + bit_xor of per-edge xxhash64 — xor cannot
    // overflow under ANSI mode): ONE small aggregation per round instead
    // of two exceptAll shuffles. Both edge sets are distinct, so
    // count+xor equality identifies set equality up to a ~2^-64-per-round
    // collision. A collision between two DIFFERENT same-size edge sets
    // would declare convergence on a non-converged graph and return wrong
    // components — negligible odds, accepted as the price of the single
    // aggregation (to square the bound, xor a second independent hash).
    def sig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)).as("n"),
        coalesce(expr("bit_xor(xxhash64(src, dst))"), lit(0L)).as("h")).head()
      (r.getLong(0), r.getLong(1))
    }
    var eSig = sig(e)
    var converged = eSig._1 == 0L
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      val nextSig = sig(next)
      converged = nextSig == eSig
      e = next
      eSig = nextSig
      iter += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")
    // after convergence every edge points node → component root
    val mapped = e.select(col("src").as("node"), col("dst").as("component"))
    nodes.join(mapped, Seq("node"), "left")
      .select(col("node"), coalesce(col("component"), col("node")).as("component"))
  }

  /** Single-task union-find (path compression + union by min-root
    * bookkeeping deferred to a final per-component min pass) — the
    * small-input physical plan of [[run]].
    */
  private def runSingleTask(spark: SparkSession, base: DataFrame): DataFrame = {
    import spark.implicits._
    base.as[(String, String)].coalesce(1).mapPartitions { it =>
      val parent = new java.util.HashMap[String, String]()
      def find(x: String): String = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x
        while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      it.foreach { case (a, b) =>
        if (parent.putIfAbsent(a, a) == null) ()
        if (parent.putIfAbsent(b, b) == null) ()
        val ra = find(a); val rb = find(b)
        if (ra != rb) parent.put(ra, rb)
      }
      // min node id per component = the deterministic representative
      val minOf = new java.util.HashMap[String, String]()
      parent.keySet().forEach { n =>
        val r = find(n)
        val cur = minOf.get(r)
        if (cur == null || n < cur) minOf.put(r, n)
      }
      import scala.jdk.CollectionConverters._
      parent.keySet().iterator().asScala.map(n => (n, minOf.get(find(n))))
    }.toDF("node", "component")
  }

  /** Incremental update: fold NEW edges into an EXISTING
    * (node, component) assignment without recomputing over the old edge
    * set. The existing assignment is re-encoded as its star edges
    * (node → component) — already the converged fixpoint shape, and
    * |nodes| rows instead of however many raw edges produced it — so
    * the iteration over (stars ∪ new edges) contracts untouched
    * components immediately; only components actually bridged by new
    * edges do more than one round of work. Connectivity-equivalent to a
    * full recompute because a star preserves exactly its component's
    * reachability (asserted against the from-scratch run in
    * CcIncrementalSpec). This is the streaming-ingest shape: each
    * micro-batch folds its new co-occurrence/alias edges into the
    * canonical map at O(affected-cluster) cost, not O(corpus).
    *
    * Isolated nodes of the old assignment (component = self, no edges)
    * are carried through unchanged.
    */
  def incremental(spark: SparkSession, existing: DataFrame,
                  newEdges: DataFrame, maxIter: Int = 25): DataFrame = {
    val star = existing.where(col("node") =!= col("component"))
      .select(col("node").as("src"), col("component").as("dst"))
    val cc = run(spark,
      star.unionByName(newEdges.select(col("src"), col("dst"))), maxIter)
    val allNodes = existing.select(col("node"))
      .union(newEdges.select(col("src").as("node")))
      .union(newEdges.select(col("dst").as("node")))
      .distinct()
    allNodes.join(cc, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("component"), col("node")).as("component"))
  }

  /** Canonical entity map from the alias dictionary: bipartite graph of
    * surface nodes ("s:<surface>") and entity-record nodes ("e:<id>");
    * canonical id of a record = min record id in its component.
    */
  def canonicalMap(spark: SparkSession, aliases: DataFrame): DataFrame = {
    val edges = aliases.select(
      concat(lit("s:"), col("surface_norm")).as("src"),
      concat(lit("e:"), col("entity_id")).as("dst"))
    val cc = run(spark, edges)
    // component representative among RECORD nodes only
    val reps = cc.where(col("node").startsWith("e:"))
      .groupBy("component").agg(min(col("node")).as("canon_node"))
    cc.where(col("node").startsWith("e:"))
      .join(reps, "component")
      .select(
        expr("substring(node, 3)").as("entity_id"),
        expr("substring(canon_node, 3)").as("canonical_id"))
  }
}
