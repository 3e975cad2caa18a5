package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, decoded/feature-extracted in
  * BATCHED `mapPartitions` (the Scala analog of a Pandas-UDF
  * `mapInPandas` stage — same batch shape, same schema contract).
  *
  * STUB NOTE: no image/audio codecs ship in this container, so
  * [[fakeDecode]] is a clearly-marked deterministic stand-in — it derives
  * "pixels" from the payload bytes. The Spark-side plumbing (binary
  * schema, partitioning, batched UDF signature, output schema) is real
  * and tested; swapping in a real decoder changes one function.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_ref: String, payload: Array[Byte])
  case class MediaFeatures(
      doc_id: Long, media_ref: String,
      width: Int, height: Int, n_bytes: Int,
      features: Array[Float])

  /** Synthesize an opaque media table from the documents table: payload =
    * md5 bytes of the text (deterministic, binary-typed).
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      concat(lit("img://"), col("doc_id")).as("media_ref"),
      unhex(md5(col("text"))).as("payload"))

  /** ??? real decoder goes here — deterministic fake: dimensions and a
    * 4-dim feature vector derived from payload bytes.
    */
  def fakeDecode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val w = 16 + (payload(0) & 0x3f)
    val h = 16 + (payload(1) & 0x3f)
    val feats = new Array[Float](4)
    var i = 0
    while (i < payload.length) {
      feats(i % 4) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    (w, h, feats)
  }

  /** Batched decode stage: one mapPartitions, grouped micro-batches (the
    * mapInPandas batch shape), never row-at-a-time.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame,
                     batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media_ref", "payload").as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val (w, h, f) = fakeDecode(r.payload)
            MediaFeatures(r.doc_id, r.media_ref, w, h, r.payload.length, f)
          }
        }
      }
  }

  /** Resize plan: fit each decoded image into a target box preserving
    * aspect ratio — the METADATA math is real (and oracle-checked); the
    * pixel resample itself is the stubbed codec step. Pure column
    * expressions over the decode output; floor() so both engines agree
    * without .5-rounding hazards.
    */
  def resizePlan(features: DataFrame, box: Int = 64): DataFrame = {
    val s = least(lit(box.toDouble) / col("width"),
      lit(box.toDouble) / col("height"))
    features.select(col("doc_id"), col("media_ref"),
      col("width").cast("long").as("width"),
      col("height").cast("long").as("height"),
      floor(col("width") * s).cast("long").as("out_w"),
      floor(col("height") * s).cast("long").as("out_h"),
      round(s, 6).as("scale"))
  }

  /** Frame sampling for video-typed payloads: the payload is treated as
    * frames of 4 bytes (stub codec), every `step`-th frame is emitted
    * with its 25fps timestamp — the row fan-out shape of a real
    * frame-sampler (explode of a bounded sequence; no shuffle).
    */
  def frameSample(media: DataFrame, step: Int = 2, fps: Int = 25): DataFrame = {
    val frames = (length(col("payload")) / 4).cast("int")
    // payloads shorter than one frame yield frames = 0, and
    // sequence(0, -1, step) throws at runtime — guard, don't crash
    media.where(frames > 0)
      .select(col("doc_id"), col("media_ref"),
        explode(sequence(lit(0), frames - 1, lit(step))).as("frame_idx"))
      .select(col("doc_id"), col("media_ref"),
        col("frame_idx").cast("long").as("frame_idx"),
        (col("frame_idx") * (1000 / fps)).cast("long").as("ts_ms"))
  }
}
