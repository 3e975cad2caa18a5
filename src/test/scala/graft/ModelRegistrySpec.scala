package graft

import graft.api.{ModelRegistry, ModelSpec}
import graft.tag.GazetteerTagger
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Model registry contract (webapp/config.json:3-39, app.py:126-168). */
class ModelRegistrySpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark

  private def specs = Seq(
    ModelSpec("DC-SBB + CONLL + GERMEVAL", 1, "m1", 7, default = true),
    ModelSpec("CONLL + GERMEVAL", 4, "m4", 7, default = false),
    ModelSpec("MULTILANG", 5, "m5", 20, default = false))

  test("default selection, id selection, and /models listing") {
    val reg = new ModelRegistry(specs, s => new GazetteerTagger(Map.empty))
    assert(reg.list == specs)
    assert(reg.resolve(None).id == 1)          // default: true entry
    assert(reg.resolve(Some(5)).epoch == 20)   // per-model epoch
    intercept[NoSuchElementException](reg.resolve(Some(99)))
  }

  test("warm-swap: same id reuses the loaded predictor, new id rebuilds") {
    val reg = new ModelRegistry(specs, s => new GazetteerTagger(Map.empty))
    val a = reg.get(None)
    assert(reg.buildCount == 1 && reg.loadedModelId.contains(1))
    assert(reg.get(Some(1)) eq a)              // no rebuild (app.py:139)
    assert(reg.buildCount == 1)
    val b = reg.get(Some(4))                   // swap
    assert(reg.buildCount == 2 && reg.loadedModelId.contains(4))
    assert(!(b eq a))
    reg.get(None)                              // back to default → rebuild
    assert(reg.buildCount == 3 && reg.loadedModelId.contains(1))
  }

  test("S12: webapp/config.json-shaped file parses via the JSON reader") {
    val dir = Files.createTempDirectory("graft_cfg")
    val p = dir.resolve("config.json")
    Files.writeString(p,
      """{
        |  "BATCH_SIZE": 256,
        |  "MODELS": [
        |    {"name": "A", "id": 1, "model_dir": "data/a", "epoch": 7, "default": true},
        |    {"name": "B", "id": 2, "model_dir": "data/b", "epoch": 20, "default": false}
        |  ]
        |}""".stripMargin)
    val (batch, models) = ModelRegistry.loadConfig(spark, p.toString)
    assert(batch == 256)
    assert(models == Seq(
      ModelSpec("A", 1, "data/a", 7, default = true),
      ModelSpec("B", 2, "data/b", 20, default = false)))
  }
}
