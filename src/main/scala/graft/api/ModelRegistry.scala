package graft.api

import graft.tag.MentionTagger
import org.apache.spark.sql.SparkSession

/** Multi-model registry with per-model epoch/default selection and
  * warm-swap — the reference's model-selection contract
  * (webapp/config.json:3-39 MODELS array; webapp/app.py:126-149
  * PredictorStore; app.py:166-168 GET /models).
  *
  * Semantics carried over exactly:
  *  - a request names a model id, or omits it → the `default: true` entry;
  *  - the store keeps ONE warm predictor; a request for the already-loaded
  *    id reuses it (no rebuild), a different id swaps it out;
  *  - `/models` returns the full registry listing.
  *
  * The tagger factory is injected so the registry is model-agnostic (the
  * engine's taggers are broadcast into the fused detect stage; at scale
  * the swap happens driver-side once and re-broadcasts).
  */
case class ModelSpec(name: String, id: Int, model_dir: String,
                     epoch: Int, default: Boolean)

class ModelRegistry(val models: Seq[ModelSpec],
                    build: ModelSpec => MentionTagger) {
  require(models.nonEmpty, "empty model registry")
  require(models.count(_.default) >= 1, "registry needs a default model")

  private var current: Option[(Int, MentionTagger)] = None
  private var builds: Long = 0L

  /** GET /models (app.py:166-168). */
  def list: Seq[ModelSpec] = models

  /** id → spec; None → the default entry (app.py:134-137). */
  def resolve(modelId: Option[Int]): ModelSpec = modelId match {
    case Some(id) => models.find(_.id == id)
      .getOrElse(throw new NoSuchElementException(s"no model with id $id"))
    case None => models.find(_.default).get
  }

  /** Warm-swap get (app.py:139-147): rebuild only on id change. */
  def get(modelId: Option[Int]): MentionTagger = synchronized {
    val spec = resolve(modelId)
    current match {
      case Some((id, t)) if id == spec.id => t
      case _ =>
        val t = build(spec); builds += 1
        current = Some((spec.id, t)); t
    }
  }

  def loadedModelId: Option[Int] = synchronized(current.map(_._1))
  def buildCount: Long = synchronized(builds)
}

object ModelRegistry {

  /** S12 — model-config scan: parse a webapp/config.json-shaped file
    * (BATCH_SIZE + MODELS array) through the engine's own JSON reader.
    * Returns (batchSize, specs).
    */
  def loadConfig(spark: SparkSession, path: String): (Int, Seq[ModelSpec]) = {
    import org.apache.spark.sql.functions._
    val cfg = spark.read.option("multiLine", true).json(path)
    val batch = cfg.select(col("BATCH_SIZE").cast("int")).head().getInt(0)
    val specs = cfg.select(explode(col("MODELS")).as("m"))
      .select(col("m.name"), col("m.id").cast("int").as("id"),
        col("m.model_dir"), col("m.epoch").cast("int").as("epoch"),
        // the reference's config simply OMITS the flag on non-default
        // entries — absent parses as null, and getBoolean would NPE
        coalesce(col("m.default"), lit(false)).as("default"))
      .orderBy("id")
      .collect()
      .map(r => ModelSpec(r.getString(0), r.getInt(1), r.getString(2),
        r.getInt(3), r.getBoolean(4)))
      .toSeq
    (batch, specs)
  }
}
