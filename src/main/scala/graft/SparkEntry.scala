package graft

import graft.gen.CorpusGen
import graft.pipeline.KgPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry is one operator family from SURVEY.md §2; keys
  * with an `oracleSql` twin are verified value-for-value against DuckDB
  * on the same parquet; KG-pipeline keys (no SQL equivalent) get the
  * rows-only check and are verified exactly in `sbt -batch test`
  * (golden-fixture P/R — see PipelineSpec).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship: the end-to-end KG construction pipeline on a generated
    * interleaved corpus (BASELINE.json north rule). Driver smoke-checks
    * rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val docs = CorpusGen.docs(spark, 200, parts = 8)
    KgPipeline.run(spark, docs, CorpusGen.aliases(spark)).toDF()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational core (SURVEY §2.3/2.6): agg with map-side combine ----
    "q01_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          sum("l_extendedprice").as("sum_price"),
          avg("l_discount").as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    // ---- filter + projection pushdown (SURVEY §2.3 P2/P6) ----
    "q02_filter" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_discount") >= 0.05 && col("l_quantity") < 25)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy("l_orderkey", "l_linenumber")
    }),
    // ---- broadcast equi-join + agg (SURVEY §2.4) ----
    "q03_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), sum("o_totalprice").as("revenue"))
        .orderBy("c_mktsegment")
    }),
    // ---- semi-join (selection filter, SURVEY §2.4 J3) ----
    "q04_semi" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").where(col("o_totalprice") > 100000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),
    // ---- anti-join (resume semantics, SURVEY §2.9 ST3) ----
    "q05_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),
    // ---- running-sum window (sentence segmentation analog, W1) ----
    "q06_window" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .withColumn("running_total", sum("o_totalprice").over(w))
        .select("o_custkey", "o_orderkey", "running_total")
        .orderBy("o_custkey", "o_orderkey")
    }),
    // ---- lag window (I-without-B repair analog, W3) ----
    "q07_lag" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      t(s, dir, "events")
        .withColumn("prev_type", lag("event_type", 1, "NONE").over(w))
        .select("event_id", "user_id", "event_type", "prev_type")
        .orderBy("event_id")
    }),
    // ---- distinct + sort (label-map inference, A2) ----
    "q08_distinct" -> ((s, dir) => {
      t(s, dir, "events").select("event_type").distinct().orderBy("event_type")
    }),
    // ---- union (GT union, U1) ----
    "q09_union" -> ((s, dir) => {
      val e = t(s, dir, "events")
      e.where(col("event_type") === "click").select("event_id", "user_id")
        .unionByName(
          e.where(col("event_type") === "view").select("event_id", "user_id"))
        .orderBy("event_id")
    }),
    // ---- top-k (O-ops) ----
    "q10_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice").limit(10)
    }),
    // ---- grouped top-k via row_number ----
    "q11_grouped_topk" -> ((s, dir) => {
      val w = Window.partitionBy("event_type").orderBy(desc("value"), asc("event_id"))
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("event_type"), col("event_id"), col("value"),
          col("rn").cast("long").as("rn"))
        .orderBy("event_type", "rn")
    }),
    // ---- exact dedup by content hash (training-data op) ----
    "q12_dedup_exact" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("dup_count"))
        .orderBy("keep_doc_id")
    }),
    // ---- token count (whitespace tokens, text-analysis op) ----
    "q13_token_count" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          length(col("text")).cast("long").as("n_chars_obs"))
        .orderBy("doc_id")
    }),
    // ---- document fingerprint (md5, shared with DuckDB) ----
    "q14_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("fingerprint"))
        .orderBy("doc_id")
    }),

    // ---- KG pipeline stages (exact-verified in PipelineSpec) ----
    "kg_triples" -> ((s, dir) => {
      val docs = CorpusGen.docs(s, 500, parts = 8)
      KgPipeline.run(s, docs, CorpusGen.aliases(s)).toDF()
        .select("subj", "pred", "obj", "doc_id", "bucket", "conf")
        .orderBy("doc_id", "pred", "subj", "obj")
    }),
    "kg_mentions" -> ((s, dir) => {
      val docs = CorpusGen.docs(s, 500, parts = 8)
      val sents = KgPipeline.sentences(s, docs)
      KgPipeline.detectMentions(s, sents,
          new graft.tag.GazetteerTagger(KgPipeline.defaultGazetteer)).toDF()
        .orderBy("doc_id", "span_offset", "start_word")
    }),
    "kg_eval_metrics" -> ((s, dir) => {
      val docs = CorpusGen.docs(s, 500, parts = 8)
      val sents = KgPipeline.sentences(s, docs)
      val mentions = KgPipeline.detectMentions(s, sents,
        new graft.tag.GazetteerTagger(KgPipeline.defaultGazetteer))
      graft.eval.SpanMetrics.evaluateMentions(s, mentions,
        CorpusGen.goldMentions(s, 500, parts = 8)).toDF().orderBy("slot")
    }),
  )

  /** DuckDB-runnable oracles. Column names/aliases match the Spark side
    * exactly (driver compare sorts columns by name then hashes values).
    */
  def oracleSql: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |sum(l_extendedprice) AS sum_price, avg(l_discount) AS avg_disc,
        |count(*) AS n FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |WHERE l_discount >= 0.05 AND l_quantity < 25
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |sum(o_totalprice) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q04_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin,
    "q05_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q06_window" ->
      """SELECT o_custkey, o_orderkey,
        |sum(o_totalprice) OVER (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q07_lag" ->
      """SELECT event_id, user_id, event_type,
        |lag(event_type, 1, 'NONE') OVER (PARTITION BY user_id
        |  ORDER BY ts, event_id) AS prev_type
        |FROM events ORDER BY event_id""".stripMargin,
    "q08_distinct" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",
    "q09_union" ->
      """SELECT event_id, user_id FROM events WHERE event_type = 'click'
        |UNION ALL
        |SELECT event_id, user_id FROM events WHERE event_type = 'view'
        |ORDER BY event_id""".stripMargin,
    "q10_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q11_grouped_topk" ->
      """SELECT event_type, event_id, value, rn FROM (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value DESC, event_id ASC) AS rn
        |  FROM events) WHERE rn <= 3 ORDER BY event_type, rn""".stripMargin,
    "q12_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_doc_id,
        |count(*) AS dup_count FROM documents
        |GROUP BY md5(text) ORDER BY keep_doc_id""".stripMargin,
    "q13_token_count" ->
      """SELECT doc_id, len(str_split(text, ' ')) AS n_tokens,
        |length(text) AS n_chars_obs FROM documents ORDER BY doc_id""".stripMargin,
    "q14_fingerprint" ->
      "SELECT doc_id, md5(text) AS fingerprint FROM documents ORDER BY doc_id",
  )
}
