package graft

/** Contrastive negative sampling: k per anchor, never self, replayable. */
class NegSamplingSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  test("k draws per anchor, self-collisions shifted away, deterministic") {
    val d = (0L until 7L).map(i => (i, s"text $i", "s"))
      .toDF("doc_id", "text", "source")
    val r = graft.ops.MlmGen.negativeSamples(d, k = 3).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.length == 21)
    assert(r.forall { case (a, _, neg) => a != neg }) // shift rule: never self
    assert(r.groupBy(_._1).forall(_._2.map(_._2).sorted.toSeq == Seq(0L, 1L, 2L)))
    val r2 = graft.ops.MlmGen.negativeSamples(d, k = 3).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.sorted.toSeq == r2.sorted.toSeq)
  }
}

import graft.ops.MlmGen
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** M5 — masked-LM pregeneration plumbing
  * (pregenerate_training_data.py:42-58,102-131,278-298).
  */
class MlmSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("NSP sampling: deterministic under repartitioning, never samples self") {
    val a = MlmGen.nspPairs(docs).orderBy("doc_id").collect()
    val b = MlmGen.nspPairs(docs.repartition(7)).orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty)
    // the reference asserts sampled_doc_index != current_idx (:59); the
    // cumsum-offset construction guarantees it — verify on every negative
    val negs = a.filter(_.getAs[Boolean]("is_random_next"))
    assert(negs.nonEmpty)
    assert(negs.forall(r => r.getAs[Long]("b_doc_id") != r.getAs[Long]("doc_id")))
    // positives keep their own doc as the B side
    val pos = a.filter(!_.getAs[Boolean]("is_random_next"))
    assert(pos.forall(r => r.getAs[Long]("b_doc_id") == r.getAs[Long]("doc_id")))
    // roughly half negatives (keyed-hash coin)
    assert(negs.length > a.length / 4 && negs.length < 3 * a.length / 4)
  }

  test("single-doc corpus yields no NSP instances (reference exits on <=1 doc, :270-275)") {
    val one = docs.limit(1)
    assert(MlmGen.nspPairs(one).count() == 0)
  }

  test("masking: num_to_mask = min(20, max(1, round(0.15·len))) per doc; 80/10/10 shape") {
    val masks = MlmGen.maskedLm(docs)
    val perDoc = masks.groupBy("doc_id").agg(count(lit(1)).as("n_masked"))
    // bround = banker's rounding = Python round (the reference's :113-131)
    val expected = docs.select(col("doc_id"),
      least(lit(20), greatest(lit(1),
        bround(least(size(split(col("text"), " ")), lit(128)) * 0.15))).as("want"))
    val bad = perDoc.join(expected, "doc_id")
      .where(col("n_masked") =!= col("want")).count()
    assert(bad == 0)
    // deterministic under repartitioning
    assert(MlmGen.maskedLm(docs.repartition(5)).orderBy("doc_id", "pos")
      .collect().toSeq ==
      masks.orderBy("doc_id", "pos").collect().toSeq)
    // ~80% [MASK], ~10% keep (replacement == label), ~10% random
    val rows = masks.collect()
    val mask = rows.count(_.getAs[String]("replacement") == "[MASK]")
    assert(mask > rows.length * 6 / 10 && mask < rows.length * 95 / 100)
  }

  test("epoch JSON sink: JSONL rows + sidecar metrics per epoch") {
    val out = Files.createTempDirectory("graft_mlm").toString
    val inst = MlmGen.nspPairs(docs)
    val n0 = MlmGen.writeEpochJson(spark, inst, out, epoch = 0)
    val n1 = MlmGen.writeEpochJson(spark, inst, out, epoch = 1)
    assert(n0 == inst.count() && n0 == n1)
    val back = spark.read.json(s"$out/epoch_0.json")
    assert(back.count() == n0)
    assert(back.columns.toSet ==
      Set("doc_id", "is_random_next", "b_doc_id", "n_a", "n_b"))
    val side = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/epoch_1_metrics.json")), "UTF-8")
    assert(side == s"""{"num_training_examples":$n1,"max_seq_len":128}""")
  }
}
