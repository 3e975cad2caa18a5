package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import TextOps.hexInt

/** Deduplication operators for training-data pipelines, each expressible
  * at 100 TB: exact (hash groupBy), MinHash+LSH (shingle → minhash →
  * band → bucket join), SimHash, n-gram Jaccard, embedding-cosine
  * near-dup. All hashes derive from md5 so the DuckDB oracles compute
  * bit-identical values.
  */
object Dedup {

  /** Exact dedup: content hash → keeper (min doc_id) + multiplicity. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("content_hash"))
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("dup_count"))

  /** MinHash signatures: one row per (doc, hash function); the signature
    * value is the min hash over word-3-gram shingles, seeded per function.
    * bands×rows functions; band bucketing = md5 over the band's row mins.
    */
  def minhashSignatures(docs: DataFrame, bands: Int = 4, rows: Int = 2): DataFrame = {
    val sh = docs.select(col("doc_id"),
      explode(TextOps.shingles3(col("text"))).as("shingle"))
    val seeded = sh.select(col("doc_id"), col("shingle"),
      explode(sequence(lit(0), lit(bands * rows - 1))).as("h"))
    seeded.groupBy("doc_id", "h")
      .agg(min(hexInt(concat(col("h"), lit("_"), col("shingle")))).as("minhash"))
  }

  /** LSH band keys: concat the row-mins of each band, hash → bucket. */
  def minhashBands(docs: DataFrame, bands: Int = 4, rows: Int = 2): DataFrame = {
    val sig = minhashSignatures(docs, bands, rows)
      .withColumn("band", floor(col("h") / rows))
    sig.groupBy("doc_id", "band")
      .agg(md5(concat_ws(",", sort_array(collect_list(
        concat(col("h"), lit(":"), col("minhash")))))).as("band_key"))
  }

  /** Candidate near-dup pairs: docs sharing any LSH band bucket. */
  def minhashPairs(docs: DataFrame, bands: Int = 4, rows: Int = 2): DataFrame = {
    val b = minhashBands(docs, bands, rows)
    val l = b.select(col("band").as("b1"), col("band_key").as("k1"),
      col("doc_id").as("doc_a"))
    val r = b.select(col("band").as("b2"), col("band_key").as("k2"),
      col("doc_id").as("doc_b"))
    l.join(r, col("b1") === col("b2") && col("k1") === col("k2") &&
        col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** The scale-path dedup pipeline: exact Jaccard computed ONLY for LSH
    * candidate pairs — O(candidates) instead of the O(n²)-per-source
    * self-join of [[ngramJaccardPairs]]. This is the composition a 100 TB
    * corpus requires: shingle → minhash → band-bucket join → verify.
    */
  def lshJaccardPairs(docs: DataFrame, bands: Int = 4, rows: Int = 2,
                      minJaccard: Double = 0.0): DataFrame = {
    val cand = minhashPairs(docs, bands, rows)
    val sh = docs.select(col("doc_id"),
      explode(TextOps.shingles3(col("text"))).as("shingle")).distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(sh.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("shingle", "sh_a"), "doc_a")
      .join(sh.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("shingle", "sh_b"), "doc_b")
      .where(col("sh_a") === col("sh_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("sz", "sz_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(col("inter") / (col("sz_a") + col("sz_b") - col("inter")), 6)
          .as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }

  /** SimHash (nBits-wide) over word occurrences: per-bit majority vote of
    * md5-derived word hashes.
    */
  def simhash(docs: DataFrame, nBits: Int = 16): DataFrame = {
    val words = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("word"))
    val bits = words
      .select(col("doc_id"), hexInt(col("word")).as("h"),
        explode(sequence(lit(0), lit(nBits - 1))).as("j"))
      .groupBy("doc_id", "j")
      .agg(sum(
        when(expr("shiftright(h, cast(j as int)) & 1") === 1, 1)
          .otherwise(-1)).as("s"))
    bits.groupBy("doc_id")
      .agg(sum(when(col("s") > 0, expr("shiftleft(1L, cast(j as int))"))
        .otherwise(0L)).as("simhash"))
  }

  /** n-gram Jaccard similarity of doc pairs within the same source
    * (bounded candidate set): |A∩B| / |A∪B| over DISTINCT word-3-grams.
    */
  def ngramJaccardPairs(docs: DataFrame, minJaccard: Double = 0.0): DataFrame = {
    val sh = docs.select(col("doc_id"), col("source"),
      explode(TextOps.shingles3(col("text"))).as("shingle")).distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.source") === col("b.source") &&
        col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("sz", "sz_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(col("inter") / (col("sz_a") + col("sz_b") - col("inter")), 6)
          .as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }

  /** Embedding-cosine near-duplicates among a bounded candidate window
    * (same label — the pre-clustered analog of an LSH bucket).
    */
  def embeddingNearDup(emb: DataFrame, minCos: Double = 0.9): DataFrame = {
    val e = emb.select(col("vec_id"), col("label"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val dot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val pairs = e.as("a").join(e.as("b"),
      col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
    pairs.select(
        col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(dot(col("a.v"), col("b.v")) /
          (sqrt(dot(col("a.v"), col("a.v"))) * sqrt(dot(col("b.v"), col("b.v")))), 6)
          .as("cosine"))
      .where(col("cosine") >= minCos)
  }
}
