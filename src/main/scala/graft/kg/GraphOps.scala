package graft.kg

import graft.model.Triple
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Analytics over the MATERIALIZED knowledge graph — the consumption
  * side of the north rule's triple store: entity degree distribution and
  * PageRank over the co-occurrence subgraph.
  *
  * PageRank is computed in exact INTEGER micro-rank units (10^6 = rank
  * 1.0): r' = 150000 + (850 · Σ_in (r_u div deg_u)) div 1000. Integer
  * `div` everywhere means every engine — and every partitioning —
  * produces bit-identical ranks (a floating-point formulation would
  * depend on summation order), at the cost of ≤ deg·1 µrank of
  * quantization per step. Fixed iteration count, no driver-side data.
  */
object GraphOps {

  /** Symmetric distinct co-occurrence edge list from the triple store. */
  def coEdges(triples: Dataset[Triple]): DataFrame = {
    // canonicalize BEFORE distinct: a store carrying both directions of
    // a pair — possible for externally produced or merged data, even
    // though this engine's own coTriples always emits subj < obj —
    // would otherwise survive distinct() and double-weight that
    // neighbour in EVERY downstream consumer (degrees, PageRank, label
    // propagation), while the operators that defensively dedup
    // (triangles, k-hop, jaccard) disagreed. Self-loops dropped for the
    // same reason.
    val co = triples.toDF().where(col("pred") === "co_occurs_with")
      .where(col("subj") =!= col("obj"))
      .select(least(col("subj"), col("obj")).as("src"),
        greatest(col("subj"), col("obj")).as("dst"))
      .distinct()
    co.unionByName(co.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** Entity degree distribution: one row per degree value with the
    * number of entities at that degree (the shape a KG health check
    * reads first).
    */
  def degreeDistribution(triples: Dataset[Triple]): DataFrame =
    coEdges(triples)
      .groupBy("src").agg(count(lit(1)).as("degree"))
      .groupBy("degree").agg(count(lit(1)).as("n_entities"))

  /** Integer-quantized PageRank over the co-occurrence graph, fixed
    * `iters` rounds, damping 0.85. Each round is ONE join edges⋈ranks on
    * the entity id + one aggregation — the standard Pregel-free Spark
    * formulation; the edge list is dictionary-scale (entities, not
    * corpus), so rounds are cheap and the loop is bounded.
    */
  def pageRank(triples: Dataset[Triple], iters: Int = 3): DataFrame =
    // with EVERY node a seed (seedMod = 1), the teleport term is the
    // uniform 150000 and the recursion is exactly global PageRank —
    // certified bit-for-bit by the all-seeds parity test in OpsSpec, so
    // one integer-iteration kernel serves both operators
    personalizedPageRank(triples, iters, seedMod = 1)

  /** Per-entity triangle counts over the co-occurrence graph, via the
    * degree-ordered orientation (Suri & Vassilvitskii, WWW'11): each
    * undirected edge is directed from its lower endpoint in the total
    * order (degree asc, id asc), so every node's out-degree is
    * O(sqrt(m)) even on a power-law graph. The wedge self-join then
    * fans out by out-degree² — bounded — where the naive adjacency
    * self-join explodes on hub entities (a hub with d neighbours would
    * contribute d² wedge rows; oriented it contributes ≤ m). Three
    * distributed joins total, all on entity ids; the oriented edge list
    * is materialized once and reused on every side.
    *
    * Returns one row per entity (including triangle-free ones) with its
    * triangle membership count. Each triangle contributes 1 to each of
    * its three corners; counts are orientation-independent, so the
    * DuckDB oracle can use the naive a<b<c triple-join formulation.
    */
  def triangleCounts(triples: Dataset[Triple]): DataFrame = {
    val sym = coEdges(triples)
    // one row per undirected edge: coEdges canonicalizes + dedups
    // BEFORE mirroring, so src < dst alone recovers the distinct
    // canonical half — no extra distinct shuffle needed
    val und = sym.where(col("src") < col("dst"))
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
    // total order (deg asc, id asc) as one sortable key; any consistent
    // total order is correct — degree-ascending is the skew bound
    val keyed = deg.select(col("src").as("node"),
      concat(lpad(col("deg").cast("string"), 10, "0"), lit("|"),
        col("src")).as("okey"))
    val oriented = und
      .join(keyed.select(col("node").as("src"), col("okey").as("k_src")), "src")
      .join(keyed.select(col("node").as("dst"), col("okey").as("k_dst")), "dst")
      .select(
        when(col("k_src") < col("k_dst"), col("src")).otherwise(col("dst"))
          .as("lo"),
        when(col("k_src") < col("k_dst"), col("dst")).otherwise(col("src"))
          .as("hi"),
        when(col("k_src") < col("k_dst"), col("k_dst")).otherwise(col("k_src"))
          .as("k_hi"))
      .localCheckpoint() // reused on all three sides of the wedge closure
    val e1 = oriented.select(col("lo"), col("hi").as("b"), col("k_hi").as("kb"))
    val e2 = oriented.select(col("lo"), col("hi").as("c"), col("k_hi").as("kc"))
    val wedges = e1.join(e2, "lo").where(col("kb") < col("kc"))
    val closing = oriented.select(col("lo").as("b"), col("hi").as("c"))
    val tris = wedges.join(closing, Seq("b", "c"))
      .select(col("lo").as("a"), col("b"), col("c"))
    val perEntity = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("entity"))
      .groupBy("entity").agg(count(lit(1)).as("n_triangles"))
    deg.select(col("src").as("entity"))
      .join(perEntity, Seq("entity"), "left")
      .select(col("entity"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }

  /** Community detection by synchronous label propagation (Raghavan et
    * al. 2007, public algorithm) with DETERMINISTIC tie rules: every
    * node starts as its own label; each round it adopts the most
    * frequent label among its neighbours, ties broken by the smallest
    * label string. Fixed `iters` rounds, synchronous updates — no
    * randomized visit order, so the result is identical under any
    * partitioning and replayable in SQL (the usual async/random-order
    * LPA is not). Each round is one join on the entity id + one
    * count aggregation + one per-node (not global) window — the same
    * bounded shape as [[pageRank]], dictionary-scale.
    *
    * Note: after round 1 every node holds its minimum neighbour id
    * (all neighbour labels are distinct singletons); real community
    * structure emerges from round 2 onward.
    */
  def labelPropagation(triples: Dataset[Triple], iters: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val edges = coEdges(triples).localCheckpoint()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to iters) {
      val nb = edges
        .join(labels.select(col("node").as("dst"), col("label")), "dst")
        .select(col("src").as("node"), col("label"))
        .groupBy("node", "label").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("node").orderBy(desc("n"), asc("label"))
      labels = nb.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1).select(col("node"), col("label"))
    }
    labels.select(col("node").as("entity"), col("label").as("community"))
  }

  /** Personalized (seed-teleport) PageRank in the same exact-integer
    * micro-rank units as [[pageRank]]: the teleport mass returns ONLY to
    * the md5-derived seed set (the [[kHopDistances]] rule), so ranks
    * measure relevance TO those entities rather than global centrality —
    * the "expand and rank context around these entities" scorer, the
    * ranking twin of the k-hop expansion. r0 = 10^6·[seed];
    * r' = 150000·[seed] + (850 · Σ_in (r div deg)) div 1000. Same
    * bounded per-round shape (one join + one aggregation on the
    * dictionary-scale entity graph), bit-identical on any engine.
    */
  def personalizedPageRank(triples: Dataset[Triple], iters: Int = 3,
                           seedMod: Int = 16): DataFrame = {
    val edges = coEdges(triples).localCheckpoint()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val withDeg = edges.join(deg, "src").localCheckpoint()
    val nodes = deg.select(col("src").as("entity"),
        (graft.ops.TextOps.hexInt(col("src")) % seedMod === 0).as("is_seed"))
      .localCheckpoint() // reused every round for the teleport term
    var ranks = nodes.select(col("entity"),
      when(col("is_seed"), lit(1000000L)).otherwise(lit(0L)).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = withDeg
        .join(ranks, withDeg("src") === ranks("entity"))
        .select(col("dst"), expr("rank div deg").as("c"))
        .groupBy("dst").agg(sum("c").as("in_sum"))
      ranks = nodes
        .join(contrib, nodes("entity") === contrib("dst"), "left")
        .select(col("entity"),
          (when(col("is_seed"), lit(150000L)).otherwise(lit(0L)) +
            expr("850 * coalesce(in_sum, 0L) div 1000")).as("rank"))
    }
    ranks.select(col("entity"), col("rank").cast("long").as("rank"))
  }

  /** Breadth-first k-hop reachability from a deterministic seed set over
    * the co-occurrence graph: (entity, hops) with hops = MINIMUM number
    * of edges from any seed, seeds at hops 0, entities beyond `maxHops`
    * omitted. Seeds are the entities whose md5-derived hash is ≡ 0 mod
    * `seedMod` — an engine-replayable uniform sample of the node set
    * (the "expand context around these entities" query a KG consumer
    * runs constantly).
    *
    * Frontier BFS, not a recursive join: each hop is ONE equi-join of
    * the current frontier against the (checkpointed, reused) edge list
    * plus a left-anti against the visited set, so per-hop cost is
    * O(frontier boundary), never O(reachable set)² — the shape that
    * holds when the graph is 10^9 entities and maxHops stays small.
    * Plan lineage is truncated per hop with localCheckpoint; the loop
    * short-circuits when a frontier empties (O(maxHops) tiny counts).
    */
  def kHopDistances(triples: Dataset[Triple], maxHops: Int = 3,
                    seedMod: Int = 16): DataFrame = {
    // coEdges output is already distinct (canonicalize + dedup before
    // the mirror) — a distinct() here would be a full extra shuffle
    val edges = coEdges(triples).localCheckpoint()
    val nodes = edges.select(col("src").as("entity")).distinct()
    val seeds = nodes.where(
      graft.ops.TextOps.hexInt(col("entity")) % seedMod === 0)
    var visited = seeds.select(col("entity"), lit(0L).as("hops"))
      .localCheckpoint()
    var frontier = visited.select("entity")
    var h = 1
    var exhausted = frontier.isEmpty
    while (h <= maxHops && !exhausted) {
      val next = edges
        .join(frontier.select(col("entity").as("src")), "src")
        .select(col("dst").as("entity")).distinct()
        .join(visited.select("entity"), Seq("entity"), "left_anti")
        .localCheckpoint()
      exhausted = next.isEmpty
      visited = visited
        .unionByName(next.select(col("entity"), lit(h.toLong).as("hops")))
        .localCheckpoint()
      frontier = next
      h += 1
    }
    visited
  }

  /** Entity-neighbourhood Jaccard similarity in INTEGER ppm
    * (10^6 = identical neighbourhoods): for every entity pair sharing at
    * least one co-occurrence neighbour,
    * jaccard_ppm = (10^6 · |Γa ∩ Γb|) div (|Γa| + |Γb| − |Γa ∩ Γb|).
    * The "these two entities keep the same company" signal alias
    * suggestion and merge candidates are ranked by — a structural
    * complement to the surface-string linker.
    *
    * Shape: one wedge self-join through the shared neighbour (the only
    * way |∩| can be computed without materializing per-entity sets),
    * then two broadcast-size degree joins. Wedge fan-out is Σ deg(n)² —
    * `maxCenterDegree` caps the center (a hub's co-neighbour pairs say
    * nothing about similarity anyway; the cap is part of the operator's
    * contract and the oracle replays it). Integer division keeps the
    * score bit-identical across engines and partitionings.
    */
  def neighborhoodJaccard(triples: Dataset[Triple],
                          maxCenterDegree: Long = 1L << 20): DataFrame = {
    val sym = coEdges(triples).localCheckpoint() // already distinct
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint() // reused: center cap + both marginal joins
    val capped = sym.join(
      deg.where(col("deg") <= maxCenterDegree).select(col("src")), "src")
    val e1 = capped.select(col("src").as("n"), col("dst").as("a"))
    val e2 = capped.select(col("src").as("n"), col("dst").as("b"))
    val common = e1.join(e2, "n").where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("common"))
    common
      .join(deg.select(col("src").as("a"), col("deg").as("deg_a")), "a")
      .join(deg.select(col("src").as("b"), col("deg").as("deg_b")), "b")
      .select(col("a"), col("b"), col("common"),
        expr("(1000000L * common) div (deg_a + deg_b - common)")
          .as("jaccard_ppm"))
  }

  /** Local clustering coefficient per entity in INTEGER ppm
    * (10^6 = fully-interconnected neighbourhood):
    * cc_ppm = (2·10^6 · triangles(v)) div (deg(v)·(deg(v)−1)), 0 for
    * deg < 2 — "how clique-like is this entity's neighbourhood", the
    * standard community-tightness signal next to [[labelPropagation]].
    * Composes [[triangleCounts]] (degree-ordered orientation) with the
    * DISTINCT-neighbour degree; integer division keeps it
    * engine/partitioning-invariant like [[pageRank]].
    */
  def clusteringCoefficient(triples: Dataset[Triple]): DataFrame = {
    val tri = triangleCounts(triples)
    val deg = coEdges(triples) // already distinct
      .groupBy("src").agg(count(lit(1)).as("deg"))
    tri.join(deg.select(col("src").as("entity"), col("deg")), "entity")
      .select(col("entity"), col("n_triangles"), col("deg"),
        when(col("deg") < 2, lit(0L))
          .otherwise(expr("(2000000L * n_triangles) div (deg * (deg - 1))"))
          .as("cc_ppm"))
  }

  /** Co-occurrence lift per entity pair in INTEGER micro-units
    * (10^6 = lift 1.0): lift = (10^6 · pair_n · total) div (n_a · n_b),
    * where pair_n counts co-occurrence triples for the pair, n_x the
    * entity's total co-occurrence participations, total the global
    * triple count. The integer formulation (like [[pageRank]]) makes
    * the score bit-identical across engines and partitionings — a
    * log-space PMI would be summation-order-dependent. Lift > 10^6
    * means the pair co-occurs more than independence predicts — the
    * relation-strength signal a KG builder ranks candidate edges by.
    *
    * Overflow bound: 10^6 · pair_n · total must fit in a signed 64-bit
    * long — safe while pair_n · total < 9.2·10^12 (e.g. 10^6 pairs of
    * max multiplicity 10^6·…); at larger scales drop the 10^6 scale
    * factor or pre-divide total.
    */
  def cooccurrenceLift(triples: Dataset[Triple]): DataFrame = {
    // canonicalize direction like coEdges: a merged/external store
    // carrying both (a,b) and (b,a) would otherwise split the pair's
    // count across two rows, roughly halving each direction's lift
    // (this engine's own coTriples always emits subj < obj, so the
    // least/greatest is a no-op on native data and the oracle)
    val pairs = triples.toDF().where(col("pred") === "co_occurs_with")
      .select(least(col("subj"), col("obj")).as("subj"),
        greatest(col("subj"), col("obj")).as("obj"))
      .groupBy("subj", "obj").agg(count(lit(1)).as("pair_n"))
      .localCheckpoint() // reused for both marginals and the output join
    val occ = pairs.select(col("subj").as("entity"), col("pair_n"))
      .unionByName(pairs.select(col("obj").as("entity"), col("pair_n")))
      .groupBy("entity").agg(sum("pair_n").as("ent_n"))
    // O(1) driver scalar, like ntileFolds' count — not a data collect;
    // NULL sum (no co-occurrence triples) → empty lift table
    val totalRow = pairs.agg(sum("pair_n").cast("long")).head()
    if (totalRow.isNullAt(0)) return pairs.limit(0)
      .select(col("subj"), col("obj"), col("pair_n"),
        lit(0L).as("lift_micro"))
    val total = totalRow.getLong(0)
    pairs
      .join(occ.select(col("entity").as("subj"), col("ent_n").as("subj_n")),
        "subj")
      .join(occ.select(col("entity").as("obj"), col("ent_n").as("obj_n")),
        "obj")
      .select(col("subj"), col("obj"), col("pair_n"),
        expr(s"(1000000L * pair_n * ${total}L) div (subj_n * obj_n)")
          .as("lift_micro"))
  }
}
