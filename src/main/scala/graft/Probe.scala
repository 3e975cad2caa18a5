package graft

import graft.gen.CorpusGen
import graft.pipeline.KgPipeline
import graft.tag.GazetteerTagger

/** Stage-time probe for scaling analysis: runMain graft.Probe <nDocs> <cpus> */
object Probe {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val cpus = args(1)
    val spark = Bench.session(cpus)
    import spark.implicits._
    val ctx = Some(KgPipeline.prepareLinkContext(spark, CorpusGen.aliases(spark)))

    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def time(name: String)(f: => Long): Unit = {
      f // warm
      (1 to 3).foreach { i =>
        val g0 = gcMs
        val t0 = System.nanoTime()
        val r = f
        println(f"PROBE $name%-12s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s  gc=${gcMs - g0}ms rows=$r")
      }
    }

    val parts = 256
    time("gen") {
      CorpusGen.docs(spark, n, parts).map(_.spans.length.toLong).reduce(_ + _)
    }
    time("sentences") {
      KgPipeline.sentences(spark, CorpusGen.docs(spark, n, parts)).count()
    }
    time("mentions") {
      KgPipeline.detectMentions(spark,
        KgPipeline.sentences(spark, CorpusGen.docs(spark, n, parts)),
        new GazetteerTagger(KgPipeline.defaultGazetteer)).count()
    }
    time("full") {
      KgPipeline.run(spark, CorpusGen.docs(spark, n, parts),
        CorpusGen.aliases(spark), ctx = ctx).count()
    }
    spark.stop()
  }
}
