package graft.eval

import graft.model.GtToken
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Grouped k-fold cross-validation over the GT relation — the reference's
  * `GroupKFold(n_splits=5)` grouped by nsentence
  * (models/bert.py:440-500, :452, :460): contiguous sentence-id blocks
  * form folds; each fold re-tags `dataset` to TRAIN/TEST (J7,
  * bert.py:462-468) and the per-fold metric frames are concatenated with
  * a `split` key (A7, bert.py:489-500).
  */
object CrossVal {

  /** fold assignment: contiguous equal blocks over ordered distinct group
    * ids, exactly ntile(k) semantics (first N%k folds get one extra id)
    * but computed via the range-partitioned rank scan instead of a
    * single-partition global window — GroupKFold at any scale.
    */
  def foldAssignment(spark: SparkSession, gt: Dataset[GtToken], k: Int): DataFrame =
    graft.ops.Scans.ntileFolds(gt.select("nsentence").distinct(), "nsentence", k)

  /** Re-tag one fold: sentences of `fold` become TEST, the rest TRAIN
    * (bert.py:462-468 via broadcast fold map, no shuffle of the GT side
    * beyond the join).
    */
  def foldSplit(spark: SparkSession, gt: Dataset[GtToken],
                folds: DataFrame, fold: Int): Dataset[GtToken] = {
    import spark.implicits._
    gt.toDF().join(broadcast(folds), Seq("nsentence"))
      .withColumn("dataset",
        when(col("fold") === fold, "CV-TEST").otherwise("CV-TRAIN"))
      .select("nsentence", "nword", "word", "tag", "dataset")
      .as[GtToken]
  }

  /** Per-fold eval metrics concatenated with (split, slot) keys (A7). */
  def run(spark: SparkSession, gt: Dataset[GtToken], k: Int)
         (evalFold: (Dataset[GtToken], Int) => DataFrame): DataFrame = {
    val folds = foldAssignment(spark, gt, k)
    (0 until k).map { f =>
      evalFold(foldSplit(spark, gt, folds, f), f).withColumn("split", lit(f))
    }.reduce(_ unionByName _)
  }
}
