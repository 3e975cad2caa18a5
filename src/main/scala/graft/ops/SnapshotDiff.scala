package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data capture between two snapshots of a keyed table — the KG
  * maintenance primitive behind dictionary/dimension refreshes (the
  * reference re-reads its ground-truth pickles wholesale per run;
  * a 10^12-row store can only afford to apply the DELTA, and every
  * incremental consumer — [[graft.kg.ConnectedComponents.incremental]],
  * the streaming canon map — wants exactly this operator in front of it).
  *
  * One full-outer equi-join on the key, then row classification:
  * `added` (absent in A), `removed` (absent in B), `changed` (value
  * differs); unchanged rows — the overwhelming majority of a real
  * snapshot pair — are dropped immediately after the join. Shape: a
  * single key-partitioned shuffle, no window, no collect; both sides
  * prune to (key, value) columns at the scan.
  */
object SnapshotDiff {

  /** Diff snapshots `a` → `b` on `key`, comparing `value`.
    * Returns (key, change, val_a, val_b) for changed keys only.
    */
  def diff(a: DataFrame, b: DataFrame, key: String, value: String): DataFrame = {
    // explicit presence markers + null-safe value compare: a key present
    // in both snapshots with a NULL value on one side is 'changed', not
    // misclassified as added/removed, and NULL <=> NULL is unchanged
    val l = a.select(col(key).cast("string").as("k"),
      col(value).cast("string").as("val_a"), lit(true).as("_in_a"))
    val r = b.select(col(key).cast("string").as("k"),
      col(value).cast("string").as("val_b"), lit(true).as("_in_b"))
    l.join(r, Seq("k"), "full_outer")
      .withColumn("change",
        when(col("_in_a").isNull, lit("added"))
          .when(col("_in_b").isNull, lit("removed"))
          .when(!(col("val_a") <=> col("val_b")), lit("changed")))
      .where(col("change").isNotNull)
      .select(col("k").as(key), col("change"), col("val_a"), col("val_b"))
  }
}
