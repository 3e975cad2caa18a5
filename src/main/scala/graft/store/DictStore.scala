package graft.store

import graft.model.Alias
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-keyed store for the SCORED LINK DICTIONARY — the expensive
  * O(dictionary) slice of the no-broadcast linking regime (connected-
  * components canon map folded into the alias table + two per-surface
  * scoring aggregations, [[graft.kg.Linker.scoredDict]]).
  *
  * That slice depends ONLY on the dictionary snapshot, never on the
  * corpus, so it is materialized ONCE per snapshot under
  * `<root>/_dict/snap=<id>/` and every subsequent run / streaming
  * micro-batch over the same dictionary READS the table instead of
  * rebuilding — the amortization the 100 TB contract assumes (the
  * reference's warm-singleton-model pattern, webapp/app.py:126-149,
  * applied to the dictionary side of the join). Without it the fixed
  * ~10 s dictionary prep dominates small jobs and every micro-batch
  * (the round-4 0.62/0.76/0.914 size-sweep Amdahl curve).
  *
  * Layout per snapshot (all immutable once `_SUCCESS` exists):
  *   snap=<id>/scored/   one row per surface: (surface_norm, by_type,
  *                       any_best) — the dictionary side of the salted
  *                       link join, pre-canonicalized
  *   snap=<id>/canon/    (entity_id, canonical_id) — the CC canon map
  *   snap=<id>/aliases/  the raw alias rows (CDC base for
  *                       [[applyDiff]]-style incremental refresh)
  *
  * The snapshot id is a CONTENT fingerprint (order-independent
  * count + xor of per-row md5-h60 over all alias fields) so "is the
  * store fresh?" is a pure equality check — no timestamps, no manual
  * versioning, identical whether computed distributed
  * ([[fingerprint]]) or driver-side over already-collected rows
  * ([[fingerprintLocal]], used by the broadcast regime's LinkContext
  * which holds the rows anyway).
  *
  * Writes are idempotent and crash-safe the same way the triple store
  * is: parquet Overwrite into the final path, gated on the `_SUCCESS`
  * marker — a torn write leaves no marker and the next caller rebuilds
  * over the partial output (deterministic content, so replay converges).
  */
object DictStore {

  def dictRoot(root: String) = s"$root/_dict"
  def snapPath(root: String, snapId: String) = s"${dictRoot(root)}/snap=$snapId"
  def scoredPath(root: String, snapId: String) = s"${snapPath(root, snapId)}/scored"
  def canonPath(root: String, snapId: String) = s"${snapPath(root, snapId)}/canon"
  def aliasPath(root: String, snapId: String) = s"${snapPath(root, snapId)}/aliases"

  // \u0001-joined: a control char cannot survive surface normalization, so
  // field boundaries are unambiguous (surface 'a'+entity 'b1' must not hash
  // like surface 'ab'+entity '1') -- same convention as applyDiff's keyCol;
  // fingerprint and fingerprintLocal share this one definition so the
  // distributed and driver-side fingerprints stay bit-identical
  private def rowKey(a: Alias): String =
    s"${a.surface_norm}${a.entity_id}${a.entity_type}${a.prior}"

  /** Content fingerprint of a dictionary snapshot: count + xor + wrapped
    * SUM of per-row h60 — order-independent, so any partitioning/
    * ordering of the same alias set produces the same id. The sum term
    * makes the combine multiplicity-sensitive: xor alone self-cancels on
    * even duplicate counts ({R,Q,Q} vs {R,R,R} xor-collide), and a
    * duplicated alias row from a bad upstream feed must still move the
    * snapshot id or refresh() would skip a real change. One narrow
    * O(dictionary) scan; at 100 TB corpus scale this is
    * dictionary-sized, i.e. free relative to a single micro-batch.
    */
  def fingerprint(spark: SparkSession, aliases: Dataset[Alias]): String = {
    import spark.implicits._
    val parts = aliases.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      var n = 0L; var x = 0L; var s = 0L
      it.foreach { a =>
        val h = graft.ops.TextOps.h60(md, rowKey(a))
        n += 1L; x ^= h; s += h // wrapping add: order-independent
      }
      Iterator.single((n, x, s))
    }.collect()
    render(parts.map(_._1).sum, parts.map(_._2).foldLeft(0L)(_ ^ _),
      parts.map(_._3).sum)
  }

  /** Driver-side twin of [[fingerprint]] for rows already in memory
    * (the broadcast regime's LinkContext collects the dictionary by
    * premise — fingerprinting it locally costs zero Spark jobs).
    * Bit-identical to the distributed form.
    */
  def fingerprintLocal(aliases: IterableOnce[Alias]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    var n = 0L; var x = 0L; var s = 0L
    aliases.iterator.foreach { a =>
      val h = graft.ops.TextOps.h60(md, rowKey(a))
      n += 1L; x ^= h; s += h
    }
    render(n, x, s)
  }

  private def render(n: Long, x: Long, s: Long): String =
    f"$n%d-$x%015x-$s%016x"

  private def isCommitted(spark: SparkSession, path: String): Boolean =
    Fs.exists(spark, s"$path/_SUCCESS")

  /** The scored dictionary for snapshot `snapId`: read when
    * materialized, else build (canon map included — `canon` is by-name
    * so the CC job only runs on a build miss, and is forced EXACTLY once
    * there: canonicalMap is eager, so a second evaluation would re-run
    * the whole CC fixpoint), persist, and read back. The alias/canon
    * sidecars are written BEFORE the scored table: scored/_SUCCESS is
    * the snapshot's commit gate, so a crash mid-build can never leave a
    * committed snapshot whose CDC sidecars are missing (which would
    * silently force full rebuilds on every later [[refresh]]).
    * Returns the PARQUET-BACKED frame in both cases so every consumer
    * downstream shares one physical source.
    */
  def ensureScored(spark: SparkSession, root: String, snapId: String,
                   aliases: Dataset[Alias],
                   canon: => Option[DataFrame]): DataFrame = {
    val path = scoredPath(root, snapId)
    if (!isCommitted(spark, path)) {
      val c = canon // force the by-name thunk once
      aliases.toDF().write.mode(SaveMode.Overwrite)
        .parquet(aliasPath(root, snapId))
      c.foreach(_.write.mode(SaveMode.Overwrite)
        .parquet(canonPath(root, snapId)))
      graft.kg.Linker.scoredDict(spark, aliases, c)
        .write.mode(SaveMode.Overwrite).parquet(path)
    }
    spark.read.parquet(path)
  }

  /** The canon map persisted with snapshot `snapId` (present iff the
    * snapshot was built with canonicalization — the salted pipeline
    * always does).
    */
  def readCanon(spark: SparkSession, root: String, snapId: String): Option[DataFrame] = {
    val p = canonPath(root, snapId)
    if (isCommitted(spark, p)) Some(spark.read.parquet(p)) else None
  }

  /** The raw alias rows persisted with snapshot `snapId`. */
  def readAliases(spark: SparkSession, root: String, snapId: String): Option[Dataset[Alias]] = {
    val p = aliasPath(root, snapId)
    if (!isCommitted(spark, p)) None
    else {
      import spark.implicits._
      Some(spark.read.parquet(p).as[Alias])
    }
  }

  def currentPath(root: String) = s"${dictRoot(root)}/CURRENT"

  /** The operational head pointer: which snapshot consumers should use.
    * Written AFTER a snapshot is fully committed (the swap is a single
    * small-file overwrite — a crash before it leaves the old pointer
    * valid; after it, the new snapshot is already durable).
    */
  def readCurrent(spark: SparkSession, root: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(currentPath(root))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim)
      finally in.close()
    }
  }

  def writeCurrent(spark: SparkSession, root: String, snapId: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(currentPath(root))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(snapId.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Operational entry (the `Main dict` verb): bring the store's head up
    * to the state of `aliases` — CDC from the current snapshot when its
    * sidecars exist, full build otherwise, no-op when already current —
    * then advance the CURRENT pointer. Returns the head snapshot id.
    */
  def refresh(spark: SparkSession, root: String,
              aliases: Dataset[Alias]): String = {
    val newId = fingerprint(spark, aliases)
    val head = readCurrent(spark, root) match {
      case Some(old) if old != newId &&
          readAliases(spark, root, old).isDefined &&
          readCanon(spark, root, old).isDefined =>
        applyDiff(spark, root, old, aliases, Some(newId))
      case _ =>
        ensureScored(spark, root, newId, aliases,
          Some(graft.kg.ConnectedComponents.canonicalMap(spark, aliases.toDF())))
        newId
    }
    writeCurrent(spark, root, head)
    head
  }

  /** DICTIONARY CDC: refresh the store from snapshot `oldSnapId` to the
    * state of `newAliases` by applying the DELTA — only the connected
    * components actually touched by added/removed/re-prioritized aliases
    * are re-canonicalized and re-scored; every other surface's scored
    * row and every other entity's canon entry is CARRIED from the old
    * snapshot untouched. At 100 TB-corpus scale a dictionary push
    * changes a few thousand aliases out of millions: the delta path is
    * O(diff + affected components), not O(dictionary).
    *
    * Correctness of the affected-set closure: alias edges only connect
    * a surface to an entity WITHIN one component, and components can
    * only merge through ADDED edges (whose endpoints are in the diff) or
    * split through REMOVED edges (likewise) — so the old components of
    * all diffed endpoints, recomputed together over the NEW alias rows
    * restricted to their entities (plus entities new to the dictionary),
    * reproduce exactly the full rebuild's assignment (parity-asserted in
    * DictStoreSpec across add/remove/re-alias/bridge/split cases).
    *
    * Returns the new snapshot id (= content fingerprint of
    * `newAliases`). An EMPTY diff returns `oldSnapId` without writing
    * anything — downstream consumers keep reading the same snapshot and
    * emitted triples are bit-identical.
    */
  def applyDiff(spark: SparkSession, root: String, oldSnapId: String,
                newAliases: Dataset[Alias],
                knownNewId: Option[String] = None): String = {
    import spark.implicits._
    // `knownNewId` lets refresh() pass the fingerprint it already
    // computed instead of paying a second O(dictionary) scan per CDC
    val newSnapId = knownNewId.getOrElse(fingerprint(spark, newAliases))
    if (newSnapId == oldSnapId) return oldSnapId // empty diff: no-op
    val path = scoredPath(root, newSnapId)
    if (isCommitted(spark, path)) return newSnapId // already materialized
    val oldAliases = readAliases(spark, root, oldSnapId).getOrElse(
      throw new IllegalStateException(s"no alias sidecar for $oldSnapId"))
    val oldCanon = readCanon(spark, root, oldSnapId).getOrElse(
      throw new IllegalStateException(s"no canon sidecar for $oldSnapId"))
    val oldScored = spark.read.parquet(scoredPath(root, oldSnapId))

    // the alias-row delta: key = (surface, entity, type), value = prior
    val keyCol = concat_ws("",
      col("surface_norm"), col("entity_id"), col("entity_type"))
    val d = graft.ops.SnapshotDiff.diff(
      oldAliases.toDF().withColumn("k0", keyCol),
      newAliases.toDF().withColumn("k0", keyCol), "k0", "prior")
    val touched = d.select(split(col("k0"), "").as("p"))
      .select(col("p").getItem(0).as("surface_norm"),
        col("p").getItem(1).as("entity_id"))
      .localCheckpoint() // tiny (the diff); read twice below
    val touchedE = touched.select("entity_id").distinct()
    val touchedS = touched.select("surface_norm").distinct()

    // affected OLD components: those containing any diffed entity, or
    // any entity sharing a diffed surface
    val affected = oldCanon.join(touchedE, "entity_id")
      .select("canonical_id")
      .union(oldAliases.toDF().join(touchedS, "surface_norm")
        .select("entity_id").join(oldCanon, "entity_id")
        .select("canonical_id"))
      .distinct()
    // entities to recompute: members of affected components + entities
    // NEW to the dictionary
    val affEnt = oldCanon.join(affected, "canonical_id").select("entity_id")
      .union(newAliases.select(col("entity_id")).distinct()
        .join(oldCanon.select("entity_id"), Seq("entity_id"), "left_anti"))
      .distinct()

    // re-canonicalize + re-score ONLY the affected subgraph (all alias
    // rows of an affected surface live inside it — see closure note)
    val subAliases = newAliases.join(affEnt, "entity_id").as[Alias]
    val subCanon = graft.kg.ConnectedComponents
      .canonicalMap(spark, subAliases.toDF())
    val canonAll = oldCanon.join(affEnt, Seq("entity_id"), "left_anti")
      .unionByName(subCanon)
    val subScored = graft.kg.Linker.scoredDict(spark, subAliases, Some(subCanon))
    // stale scored rows: every surface of an affected old component (plus
    // diffed surfaces, covering brand-new ones) — replaced by subScored
    val staleSurf = oldAliases.toDF().join(oldCanon, "entity_id")
      .join(affected, "canonical_id").select("surface_norm")
      .union(touchedS).distinct()
    val merged = oldScored.join(staleSurf, Seq("surface_norm"), "left_anti")
      .unionByName(subScored)

    // sidecars first, scored last — scored/_SUCCESS is the commit gate
    // (same crash-safety ordering as ensureScored)
    newAliases.toDF().write.mode(SaveMode.Overwrite)
      .parquet(aliasPath(root, newSnapId))
    canonAll.write.mode(SaveMode.Overwrite).parquet(canonPath(root, newSnapId))
    merged.write.mode(SaveMode.Overwrite).parquet(path)
    newSnapId
  }
}
