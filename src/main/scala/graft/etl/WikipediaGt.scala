package graft.etl

import graft.model.GtToken
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S8 — Wikipedia GT CSV: rows (page_id, text, tags) where text/tags are
  * JSON-encoded arrays of equal length (reference:
  * ground_truth/data_processor.py:154-174). The reference's endless
  * chunked-generator becomes a bounded lazy plan: `from_json` (F11) +
  * `arrays_zip` (F12) + posexplode; the page-subset filter (P5) is a
  * broadcast semi-join; length predicates are P6
  * (data_processor.py:56, 101, 169).
  */
object WikipediaGt {

  private val arr = ArrayType(StringType)

  def parse(spark: SparkSession, csvPath: String,
            minSenLen: Int = 10, minArticleLen: Int = 20): DataFrame = {
    spark.read.option("header", "true").option("escape", "\"").csv(csvPath)
      .select(col("page_id").cast("long").as("page_id"),
        from_json(col("text"), arr).as("sentences"),
        from_json(col("tags"), arr).as("tagseqs"))
      .where(size(col("sentences")) >= minArticleLen) // P6 article length
      .select(col("page_id"),
        posexplode(arrays_zip(col("sentences"), col("tagseqs"))))
      .select(col("page_id"), col("pos").as("sent_idx"),
        split(col("col.sentences"), " ").as("words"),
        split(col("col.tagseqs"), " ").as("tags"))
      .where(size(col("words")) >= minSenLen) // P6 sentence length
      // malformed rows (tags JSON shorter than text → null-padded by
      // arrays_zip, or per-sentence word/tag length mismatch) are
      // DROPPED here rather than surfacing null tags that crash the
      // encoder's label lookup downstream
      .where(col("tags").isNotNull && size(col("words")) === size(col("tags")))
  }

  /** P5 — page-subset semi-join (data_processor.py:164-165). */
  def filterPages(parsed: DataFrame, subset: DataFrame): DataFrame =
    parsed.join(broadcast(subset.select("page_id")), Seq("page_id"), "left_semi")

  /** P7 — entity/no-entity stratified filter (data_processor.py:84-113):
    * keep all sentences WITH entities plus a deterministic
    * `noEntityFraction` share of entity-free ones (modulo on a content
    * hash — never a task-order counter, so the sample is stable under any
    * parallelism; the reference's alternating counter is
    * partition-order-dependent and we deliberately fix that).
    */
  def stratify(parsed: DataFrame, noEntityFraction: Double): DataFrame = {
    val hasEntity = exists(col("tags"), t => t =!= "O")
    val keepNoEnt = pmod(xxhash64(col("page_id"), col("sent_idx")), lit(1000L)) <
      lit((noEntityFraction * 1000).toLong)
    parsed.where(hasEntity || keepNoEnt)
  }

  /** To the GT token relation. nsentence lives in the WIKIPEDIA range of
    * the global namespace (Parsers.WIKIPEDIA_BASE — the previous form
    * reused WIKINER_BASE, so Wikipedia sentence ids collided with the
    * WikiNER corpus and Assembly merged unrelated sentences); page
    * stride 100000 keeps (page, sent) pairs disjoint for any realistic
    * article. Tags are normalized like every other parser (uppercase,
    * whitelist, else O).
    */
  def toGt(spark: SparkSession, parsed: DataFrame, dataset: String): Dataset[GtToken] = {
    import spark.implicits._
    parsed
      .select(col("page_id"), col("sent_idx"),
        posexplode(arrays_zip(col("words"), col("tags"))))
      .select(
        (lit(Parsers.WIKIPEDIA_BASE) + col("page_id") * 100000 + col("sent_idx"))
          .as("nsentence"),
        col("pos").as("nword"),
        col("col.words").as("word"),
        col("col.tags").as("tag"),
        lit(dataset).as("dataset"))
      .as[GtToken]
      .map(t => t.copy(tag = graft.text.Tags.normalize(t.tag, truncate5 = false)))
  }
}
