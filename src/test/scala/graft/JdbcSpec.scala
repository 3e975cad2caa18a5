package graft

import graft.etl.JdbcIngest
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** S7 — JDBC ingest against the embedded Derby driver that ships with
  * Spark (no SQLite jar is available; the probe covers that case).
  */
class JdbcSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark

  test("driver probe: Derby present, SQLite absent") {
    assert(JdbcIngest.driverAvailable("org.apache.derby.jdbc.EmbeddedDriver"))
    assert(!JdbcIngest.driverAvailable("org.sqlite.JDBC"))
    // probe-guarded reader returns None without the driver (fallback to
    // the CSV chunk path, corpus.py:68-71)
    assert(JdbcIngest.readTextTable(spark, "jdbc:sqlite:/nope", "org.sqlite.JDBC").isEmpty)
  }

  test("partitioned JDBC scan reads the text table in parallel chunks") {
    val dir = Files.createTempDirectory("graft_derby").toString
    System.setProperty("derby.stream.error.file", s"$dir/derby.log")
    val url = s"jdbc:derby:$dir/db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE text (id INT PRIMARY KEY, ppn VARCHAR(20), content VARCHAR(200))")
    val ins = conn.prepareStatement("INSERT INTO text VALUES (?, ?, ?)")
    (0 until 100).foreach { i =>
      ins.setInt(1, i); ins.setString(2, f"PPN$i%04d")
      ins.setString(3, s"Zeile $i der historischen Zeitung.")
      ins.addBatch()
    }
    ins.executeBatch(); conn.commit(); conn.close()

    val df = JdbcIngest.read(spark, url, "text",
      partitionColumn = "ID", lowerBound = 0, upperBound = 100,
      numPartitions = 4, driver = Some("org.apache.derby.jdbc.EmbeddedDriver"))
    // chunked parallelism: one range predicate per partition
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100)
    // predicate pushdown: the WHERE clause ships to the database
    val filtered = JdbcIngest.read(spark, url, "text", "ID", 0, 100, 4,
      Some("org.apache.derby.jdbc.EmbeddedDriver"))
      .where("ID >= 90").select("PPN")
    assert(filtered.collect().map(_.getString(0)).sorted.toSeq ==
      (90 until 100).map(i => f"PPN$i%04d"))
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("ID"))
  }
}
