package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-shape diagnostics a 100 TB job runs BEFORE committing to a plan:
  * key-skew reporting — the input to the salting decision the KG
  * pipeline's skew-aware link join makes (kg/Linker.scala infers heavy
  * keys from a sample; this is the exact, auditable report form).
  */
object Diagnostics {

  /** Top-N heaviest keys with exact counts and integer ppm share
    * (10^6 · cnt div total — engine-replayable, like the PageRank
    * micro-units). One aggregation plus a bounded TakeOrdered (count
    * desc, key asc — deterministic ties); never a global sort of the
    * key space. A key with share ≫ 10^6/n_keys is the shuffle
    * straggler salting exists for.
    */
  def skewReport(df: DataFrame, keyCol: String, topN: Int = 10): DataFrame = {
    val counts = df.select(col(keyCol).cast("string").as("key"))
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false, graft.ops.Par.cutLevel) // reused: total + top-N read the same counts
    // sum over zero rows is NULL — empty input yields an empty report
    val totalRow = counts.agg(sum("cnt").cast("long")).head()
    if (totalRow.isNullAt(0)) return counts.limit(0)
      .select(col("key"), col("cnt"), lit(0L).as("share_ppm"))
    val total = totalRow.getLong(0)
    counts
      .select(col("key"), col("cnt"),
        expr(s"(1000000L * cnt) div ${total}L").as("share_ppm"))
      .orderBy(desc("cnt"), asc("key"))
      .limit(topN)
  }
}
