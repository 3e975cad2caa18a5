package graft.eval

import graft.model._
import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Span-level P/R/F1 with conlleval semantics (the reference feeds the
  * external conlleval package at models/bert.py:276-278 and reshapes its
  * per-class output into frames at :282-301): a predicted span counts as
  * TP iff (doc, span, start, end, type) all match a gold span.
  */
object SpanMetrics {

  /** (tp, fp, fn) triple with merge — buffer of the typed Aggregator. */
  case class Counts(tp: Long, fp: Long, fn: Long) {
    def +(o: Counts): Counts = Counts(tp + o.tp, fp + o.fp, fn + o.fn)
    def precision: Double = if (tp + fp == 0) 0.0 else tp.toDouble / (tp + fp)
    def recall: Double = if (tp + fn == 0) 0.0 else tp.toDouble / (tp + fn)
    def f1: Double = {
      val p = precision; val r = recall
      if (p + r == 0) 0.0 else 2 * p * r / (p + r)
    }
  }

  /** Typed Aggregator over per-span match flags → Counts (SURVEY §2.11 M3:
    * custom Aggregator[IN,BUF,OUT], no Catalyst Expression needed).
    * Input: (goldPresent, predPresent) per outer-joined span key.
    */
  class CountsAgg extends Aggregator[(Boolean, Boolean), Counts, Counts] {
    def zero: Counts = Counts(0, 0, 0)
    def reduce(b: Counts, a: (Boolean, Boolean)): Counts = a match {
      case (true, true) => b + Counts(1, 0, 0)
      case (false, true) => b + Counts(0, 1, 0)
      case (true, false) => b + Counts(0, 0, 1)
      case _ => b
    }
    def merge(x: Counts, y: Counts): Counts = x + y
    def finish(r: Counts): Counts = r
    def bufferEncoder: Encoder[Counts] = Encoders.product[Counts]
    def outputEncoder: Encoder[Counts] = Encoders.product[Counts]
  }

  /** Per-class + ALL rows, like the reference's metric frames
    * (bert.py:282-301).
    */
  def evaluateMentions(spark: SparkSession, pred: Dataset[Mention],
                       gold: Dataset[GoldMention]): Dataset[EvalRow] = {
    import spark.implicits._
    // sentence_idx IS part of the span identity: start/end_word are
    // sentence-relative, and on the raw-ingestion path span_offset is a
    // constant 0 — without it a pred span in sentence 3 would "match" a
    // gold span at the same word range of sentence 0. distinct() guards
    // against key-duplicate fan-out (a dup on either side would
    // otherwise multiply tp), mirroring tripleCounts.
    val keys = Seq("doc_id", "span_offset", "sentence_idx", "start_word",
      "end_word", "entity_type")
    val p = pred.select(keys.map(col): _*).distinct().withColumn("p", lit(true))
    val g = gold.select(keys.map(col): _*).distinct().withColumn("g", lit(true))
    val joined = g.join(p, keys, "full_outer")
      .select(col("entity_type"),
        coalesce(col("g"), lit(false)).as("g"),
        coalesce(col("p"), lit(false)).as("p"))
    val perType = joined.as[(String, Boolean, Boolean)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(new CountsAgg().toColumn)
      .map { case (typ: String, c: Counts) =>
        EvalRow(typ, c.precision, c.recall, c.f1, c.tp, c.fp, c.fn) }
      // tiny after aggregation — materialized so the ALL row is derived
      // from these counts instead of re-running the full-outer join
      .localCheckpoint()
    // every joined row carries exactly one entity_type, so ALL is the
    // column-sum of the per-type counts (one join execution, not two)
    val t = perType.agg(
      org.apache.spark.sql.functions.sum("tp"),
      org.apache.spark.sql.functions.sum("fp"),
      org.apache.spark.sql.functions.sum("fn")).head()
    val c = Counts(
      Option(t.get(0)).fold(0L)(_ => t.getLong(0)),
      Option(t.get(1)).fold(0L)(_ => t.getLong(1)),
      Option(t.get(2)).fold(0L)(_ => t.getLong(2)))
    val all = spark.createDataset(Seq(
      EvalRow("ALL", c.precision, c.recall, c.f1, c.tp, c.fp, c.fn)))
    perType.unionByName(all)
  }

  /** Triple-set P/R vs the golden fixture (BASELINE.md target ≥ 0.95).
    * ONE job: full-outer join on the triple key, flags aggregated in a
    * single pass (three separate counts would recompute both pipelines).
    */
  def tripleCounts(spark: SparkSession, produced: Dataset[Triple],
                   golden: Dataset[GoldTriple]): Counts = {
    val keys = Seq("subj", "pred", "obj", "doc_id")
    val p = produced.select(keys.map(col): _*).distinct().withColumn("p", lit(1L))
    val g = golden.select(keys.map(col): _*).distinct().withColumn("g", lit(1L))
    val r = g.join(p, keys, "full_outer")
      .agg(
        sum(when(col("g").isNotNull && col("p").isNotNull, 1L).otherwise(0L)).as("tp"),
        sum(when(col("g").isNull, 1L).otherwise(0L)).as("fp"),
        sum(when(col("p").isNull, 1L).otherwise(0L)).as("fn"))
      .collect()(0)
    Counts(r.getAs[Long]("tp"), r.getAs[Long]("fp"), r.getAs[Long]("fn"))
  }
}
