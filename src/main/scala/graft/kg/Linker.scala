package graft.kg

import graft.model._
import graft.gen.CorpusGen.normSurface
import org.apache.spark.sql.{Dataset, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity linking: mention surface → entity record.
  *
  * Two physical strategies for the same logical join (SURVEY.md §2.4):
  *
  *  - [[linkBroadcast]]: the alias dictionary fits in memory → broadcast
  *    map lookup inside a typed map (a dictionary join, like the
  *    reference's label/vocab lookups, data_processor.py:428). Zero
  *    shuffle; the 100 TB default when the dictionary is ≤ a few GB.
  *
  *  - [[linkSaltedJoin]]: dictionary too big to broadcast → shuffle hash
  *    join with SALTING to defuse head-entity skew (Zipfian surfaces mean
  *    a handful of keys carry most mentions): the dictionary side is
  *    replicated S× with a salt column, the mention side draws
  *    `pmod(hash(doc_id), S)`, and the join key becomes
  *    (surface_norm, salt). AQE skew-join stays on as a second line of
  *    defense. Candidate scoring picks max prior, tie-broken by min
  *    entity_id, via max_by on a struct — one aggregation, no window.
  */
object Linker {

  /** Best (entity_id, type, prior) per surface, type-compatible. */
  def bestCandidate(cands: Seq[Alias], typ: String): Option[Alias] = {
    val matching = cands.filter(_.entity_type == typ)
    val pool = if (matching.nonEmpty) matching else cands
    if (pool.isEmpty) None
    else Some(pool.minBy(a => (-a.prior, a.entity_id)))
  }

  def linkBroadcast(spark: SparkSession, mentions: Dataset[Mention],
                    dict: Map[String, Seq[Alias]]): Dataset[LinkedMention] = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(dict)
    mentions.flatMap { m =>
      val cands = bc.value.getOrElse(normSurface(m.surface), Seq.empty)
      bestCandidate(cands, m.entity_type).map { a =>
        LinkedMention(m.doc_id, m.span_offset, m.sentence_idx,
          m.surface, m.entity_type, a.entity_id, a.prior)
      }
    }
  }

  /** DataFrame salted-join path for dictionaries beyond broadcast size. */
  def linkSaltedJoin(spark: SparkSession, mentions: Dataset[Mention],
                     aliases: Dataset[Alias], saltBuckets: Int = 8): Dataset[LinkedMention] = {
    import spark.implicits._
    // surface normalization in a typed map (shares normSurface with the
    // broadcast path — exactness over a lossy lower() builtin)
    val m = mentions
      .map(mn => (mn.doc_id, mn.span_offset, mn.sentence_idx, mn.surface,
        mn.entity_type, normSurface(mn.surface)))
      .toDF("doc_id", "span_offset", "sentence_idx", "surface",
        "entity_type", "surface_norm")
      .withColumn("salt", pmod(hash(col("doc_id")), lit(saltBuckets)))
    val a = aliases
      .withColumnRenamed("entity_type", "alias_type")
      .withColumn("salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    val joined = m.join(a, Seq("surface_norm", "salt"), "inner")
    // candidate scoring: prefer type match, then max prior, then min id —
    // one min_by aggregation over a lexicographic key struct (no window).
    joined
      .groupBy("doc_id", "span_offset", "sentence_idx", "surface", "entity_type")
      .agg(min_by(
        struct(col("entity_id"), col("prior")),
        struct(
          when(col("alias_type") === col("entity_type"), lit(0)).otherwise(lit(1)),
          negate(col("prior")),
          col("entity_id"))).as("best"))
      .select(col("doc_id"), col("span_offset"), col("sentence_idx"),
        col("surface"), col("entity_type"),
        col("best.entity_id").as("entity_id"), col("best.prior").as("conf"))
      .as[LinkedMention]
  }
}
