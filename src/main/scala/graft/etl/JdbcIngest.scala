package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S7 — JDBC corpus ingest (the reference reads its OCR corpus from
  * SQLite in chunks: corpus.py:74-86 `select * from text` with
  * `chunksize`). The Spark re-expression is a partitioned `spark.read
  * .jdbc` scan: `numPartitions` range predicates over a numeric column
  * are PUSHED into the source as WHERE clauses — each executor reads its
  * own chunk in parallel, the distributed analog of the reference's
  * sequential chunk generator.
  *
  * No SQLite driver ships in /opt/spark/jars, so the path is guarded by
  * [[driverAvailable]]; the scan itself is exercised in tests against the
  * embedded Derby driver that Spark bundles.
  */
object JdbcIngest {

  /** Probe: is a JDBC driver class loadable? */
  def driverAvailable(driverClass: String): Boolean =
    try { Class.forName(driverClass); true }
    catch { case _: Throwable => false }

  /** Partitioned JDBC table scan. Filters composed on the result are
    * pushed down to the source (JDBCRelation handles predicate pushdown),
    * so `read(...).where(...)` ships the WHERE clause to the database.
    */
  def read(spark: SparkSession, url: String, table: String,
           partitionColumn: String, lowerBound: Long, upperBound: Long,
           numPartitions: Int, driver: Option[String] = None): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
    driver.foreach(d => r.option("driver", d))
    r.load()
  }

  /** The reference's `select * from text` chunked scan (corpus.py:74-86),
    * iff the named driver is present; None otherwise (callers fall back
    * to the CSV chunk path, corpus.py:68-71).
    */
  def readTextTable(spark: SparkSession, url: String, driverClass: String,
                    partitionColumn: String = "id",
                    bounds: (Long, Long) = (0L, 1L << 20),
                    numPartitions: Int = 32): Option[DataFrame] =
    if (!driverAvailable(driverClass)) None
    else Some(read(spark, url, "text", partitionColumn,
      bounds._1, bounds._2, numPartitions, Some(driverClass)))
}
