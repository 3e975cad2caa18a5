package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed AS-OF join — an operator Spark has no native form of
  * (DuckDB/kdb-style: for every left row, the latest right row of the
  * same key with right.time ≤ left.time).
  *
  * Composition instead of a custom physical operator: tag both sides,
  * union, and carry the right side's values forward with a windowed
  * `last(..., ignoreNulls)` — ONE shuffle on the key, fully
  * whole-stage-codegen'd window functions, no per-row range probe and no
  * broadcast requirement on either side. At 100 TB both sides stream
  * through the same hash partitioning; per-task state is the window
  * frame's single carried row.
  */
object AsofJoin {

  /** left.* + asof_<right carry cols> + asof_<time> (the matched right
    * row's own timestamp), null when no right row precedes. `right` must
    * be unique per (key, time) — pre-reduce it otherwise (the match
    * would be ambiguous). Ties (equal time) match: right-at-equal-time
    * wins (≤ semantics, like DuckDB's `ASOF ... ON l.t >= r.t`).
    */
  def lastPrior(left: DataFrame, right: DataFrame,
                key: String, time: String): DataFrame = {
    // the union/window plumbing reserves these names; an input column
    // with the same name would silently shadow the internal field and
    // corrupt the carry — fail loudly instead
    val reserved = Set("_t", "_rs", "_m", "_k")
    val clash = (left.columns ++ right.columns).filter(reserved)
    require(clash.isEmpty,
      s"asof join: input columns ${clash.mkString(", ")} collide with " +
        "internal carry names (_t/_rs/_m/_k) — rename them first")
    val carryCols = right.columns.filterNot(c => c == key || c == time).toSeq
    val leftRest = left.columns.filterNot(c => c == key || c == time).toSeq
    // the whole right row rides in ONE struct and is carried with a
    // single last(ignoreNulls) — so the matched row's fields arrive
    // atomically even when some of them are NULL (a per-column carry
    // would back-fill NULL fields from OLDER right rows and mix fields
    // of different rows, diverging from DuckDB ASOF semantics)
    val rTagged = right.select(
      Seq(col(key), col(time), lit(0).as("_k"),
        struct(carryCols.map(col) :+ col(time).as("_t"): _*).as("_rs")) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val rsType = rTagged.schema("_rs").dataType
    val lTagged = left.select(
      Seq(col(key), col(time), lit(1).as("_k"),
        lit(null).cast(rsType).as("_rs")) ++
        leftRest.map(col): _*)
    val w = Window.partitionBy(key).orderBy(col(time), col("_k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rTagged.unionByName(lTagged)
      .withColumn("_m", last(col("_rs"), ignoreNulls = true).over(w))
    carried.where(col("_k") === 1)
      .select(left.columns.map(col).toSeq ++
        carryCols.map(c => col("_m").getField(c).as(s"asof_$c")) :+
        col("_m").getField("_t").as(s"asof_$time"): _*)
  }
}
