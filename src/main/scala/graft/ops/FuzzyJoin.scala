package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity join with deterministic blocking — the fuzzy
  * face of entity linking. The reference's linker matches mention
  * surfaces to dictionary aliases by exact normalized string
  * (ner.bert:NerBert semantics re-expressed in kg/Linker.scala); OCR'd
  * historical corpora (the reference's own domain, sbb = Berlin State
  * Library digitized newspapers) also need the NEAR-match: surface
  * variants one character off an alias ("Schiler" ↔ "Schiller").
  *
  * A naive similarity join is all-pairs O(V²). This one blocks each
  * token under (first char, length) keys — an edit-distance-1 pair
  * differs by at most one in length, so probing under (c1, len) and
  * (c1, len+1) against a build side keyed (c1, len) meets every
  * candidate pair exactly where it can exist — then verifies with the
  * codegen'd `levenshtein` only inside blocks. Same-first-char blocking
  * is a deliberate recall trade (misses pairs whose FIRST char edited);
  * the oracle replays the identical blocking predicate, so the contract
  * is exact.
  *
  * Scale shape: one distinct over tokens (map-side combined), one
  * equi-shuffle on the block key, per-block verify cost |block|² with
  * blocks bounded by (alphabet × length) fan-in — no global sort, no
  * cross join. The token table is checkpointed once and reused on both
  * sides of the self-join.
  */
object FuzzyJoin {

  /** Unordered near-match pairs (a < b) with levenshtein(a, b) <= maxDist
    * over a one-column `word` table (filtered to lowercase-ASCII tokens of
    * length >= minLen, deduplicated), blocked on (first char, length
    * band). maxDist must be 1 for the (len, len+1) band to be complete;
    * larger distances need a wider band.
    */
  def nearTokenPairs(tokens: DataFrame, maxDist: Int = 1,
                     minLen: Int = 4): DataFrame = {
    require(maxDist == 1, "length band (len, len+1) is complete only for maxDist=1")
    val toks = tokens
      .where(col("word").rlike(s"^[a-z]{$minLen,}$$"))
      .distinct()
      .select(col("word"), length(col("word")).as("len"),
        substring(col("word"), 1, 1).as("c1"))
      .localCheckpoint(eager = false, graft.ops.Par.cutLevel) // one token scan, reused by probe and build
    def blk(lenCol: org.apache.spark.sql.Column) =
      concat(col("c1"), lit("_"), lenCol.cast("string"))
    val probe = toks.select(col("word").as("w1"), blk(col("len")).as("blk"))
      .unionByName(
        toks.select(col("word").as("w1"), blk(col("len") + 1).as("blk")))
    val build = toks.select(col("word").as("w2"), blk(col("len")).as("blk"))
    probe.join(build, "blk")
      .where(col("w1") =!= col("w2"))
      .where(levenshtein(col("w1"), col("w2")) <= maxDist)
      .select(least(col("w1"), col("w2")).as("a"),
        greatest(col("w1"), col("w2")).as("b"))
      .distinct()
  }

  /** [[nearTokenPairs]] over the whitespace tokens of `docs.text`. */
  def nearTokens(docs: DataFrame, maxDist: Int = 1, minLen: Int = 4): DataFrame =
    nearTokenPairs(
      docs.select(explode(split(col("text"), " ")).as("word")),
      maxDist, minLen)

  /** Deterministic OCR-style single-character corruption of a token
    * table: for every word selected by an md5 rule (≈ one in `selMod`),
    * emit a variant with ONE md5-chosen character substituted at an
    * md5-chosen position — the engine-replayable stand-in for the OCR
    * noise the reference's historical-newspaper corpus carries, used to
    * exercise [[nearTokenPairs]] against a clean vocabulary.
    */
  def ocrVariants(tokens: DataFrame, selMod: Int = 3): DataFrame =
    tokens
      .where(length(col("word")) >= 1) // empty word → % 0 → null row
      .where(TextOps.hexInt(concat(col("word"), lit("_sel"))) % selMod === 0)
      .withColumn("p0",
        (TextOps.hexInt(col("word")) % length(col("word")).cast("long"))
          .cast("int"))
      // substitute char = original OFFSET-AND-WRAPPED by 1..25 within
      // a-z: an independent draw over all 26 letters equals the original
      // 1-in-26 per pick, silently emitting an identical "variant"
      .withColumn("oc", expr("ascii(substring(word, p0 + 1, 1))"))
      .withColumn("nc",
        (pmod(col("oc") - 97 +
          (TextOps.hexInt(concat(col("word"), lit("_c"))) % 25 + 1),
          lit(26)) + 97).cast("int"))
      .select(concat(
        expr("substring(word, 1, p0)"),
        expr("char(nc)"),
        expr("substring(word, p0 + 2)")).as("word"))
}
