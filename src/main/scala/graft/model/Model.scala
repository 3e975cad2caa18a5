package graft.model

/** Engine data model. Schemas derive from the reference's data contracts
  * and BASELINE.json's input_hint — see /root/repo/FIXTURES.md.
  */

/** One span of an interleaved document (input_hint shape).
  * kind ∈ {text, media}; media_ref is null for text spans.
  */
case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** Input document row: the engine's primary relation. */
case class Doc(doc_id: String, spans: Array[Span])

/** Ground-truth token row — the reference's central relation
  * (models/bert.py:548-554; parsers ground_truth/conll.py:48 etc.).
  */
case class GtToken(nsentence: Long, nword: Int, word: String, tag: String, dataset: String)

/** Assembled sentence: unit of inference (data_processor.py:362-374). */
case class Sentence(guid: String, words: Array[String], tags: Array[String])

/** Fixed-length encoded window — the reference's InputFeatures
  * (data_processor.py:37-46): ids/mask/segments/labels exactly
  * maxSeqLen long; tokens bracketed [CLS]..[SEP].
  */
case class EncodedWindow(
    guid: String, winIdx: Int,
    inputIds: Array[Int], inputMask: Array[Int], segmentIds: Array[Int],
    labelIds: Array[Int], tokens: Array[String])

/** Window + per-token predicted tags (post-tagger). */
case class TaggedWindow(guid: String, winIdx: Int, tokens: Array[String], preds: Array[String])

/** A detected entity mention within a document. */
case class Mention(
    doc_id: String, span_offset: Int, sentence_idx: Int,
    start_word: Int, end_word: Int,
    surface: String, entity_type: String)

/** A mention resolved against the alias dictionary. */
case class LinkedMention(
    doc_id: String, span_offset: Int, sentence_idx: Int,
    surface: String, entity_type: String, entity_id: String, conf: Double)

/** Output triple with provenance (FIXTURES.md §6). */
case class Triple(
    subj: String, pred: String, obj: String,
    doc_id: String, bucket: Int, conf: Double,
    span_offset: Int, sentence_idx: Int)

/** Per-partition lineage row for checkpoint/resume (FIXTURES.md §6;
  * resume contract per SURVEY.md §2.9 ST3).
  */
case class LineageRow(
    stage: String, partition_id: Int,
    offset_min: Long, offset_max: Long,
    triple_count: Long, rows_in: Long,
    snapshot_id: String, committed_at: Long)

/** Span-level evaluation metrics row (models/bert.py:282-301). */
case class EvalRow(
    slot: String, precision: Double, recall: Double, f1: Double,
    tp: Long, fp: Long, fn: Long)

/** Alias-dictionary entry: surface form → canonical entity. */
case class Alias(surface_norm: String, entity_id: String, entity_type: String, prior: Double)

/** A typed relation candidate between two mentions of one sentence
  * (verb-pattern extraction; surfaces unresolved until linking).
  */
case class RelationCandidate(
    doc_id: String, span_offset: Int, sentence_idx: Int,
    subj_surface: String, subj_type: String,
    rel: String,
    obj_surface: String, obj_type: String)

/** A media span carried THROUGH the detect pass (r8): media rows ride
  * the same single doc scan as sentences so triple assembly never pays
  * a second pass over the doc table.
  */
case class MediaSpanRow(doc_id: String, offset: Int, media_ref: String)

/** One output row of the fused detect stage: exactly one of mention /
  * relation / media is non-null (sum-type encoding for a single-pass
  * stage; `media` rows bypass the tagger untouched).
  */
case class DetectRow(mention: Mention, relation: RelationCandidate,
                     media: MediaSpanRow = null)

/** Generator-side gold mention (plant-time knowledge, FIXTURES.md §1). */
case class GoldMention(
    doc_id: String, span_offset: Int, sentence_idx: Int,
    start_word: Int, end_word: Int,
    surface: String, entity_type: String, entity_id: String)

/** Expected output triple (golden fixture, FIXTURES.md §6). */
case class GoldTriple(subj: String, pred: String, obj: String, doc_id: String)
