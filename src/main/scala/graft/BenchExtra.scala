package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Guide-§1 profiling harness (SEPARATE from the frozen graft.Bench):
  * per-query stage attribution — construction time (eager
  * localCheckpoints run at plan-build time) vs action time, per-stage
  * wall/tasks/shuffle bytes, and a noop-sink run that forces every
  * column (count() lets the optimizer prune — guide §1.4).
  *
  * Usage: runMain graft.BenchExtra [query ...]   (default: headline set)
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in Bench.
  */
object BenchExtra {

  private class StageLog extends SparkListener {
    case class Row(stage: Int, name: String, ms: Long, tasks: Int,
                   shufRead: Long, shufWrite: Long, input: Long)
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[Row]()
    @volatile var jobs = 0
    override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      val ms = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(-1L)
      rows.add(Row(si.stageId, si.name.takeWhile(_ != '\n').take(60), ms,
        si.numTasks, si.taskMetrics.shuffleReadMetrics.totalBytesRead,
        si.taskMetrics.shuffleWriteMetrics.bytesWritten,
        si.taskMetrics.inputMetrics.bytesRead))
    }
    def reset(): Unit = { rows.clear(); jobs = 0 }
    def dump(tag: String): Unit = {
      import scala.jdk.CollectionConverters._
      val rs = rows.asScala.toSeq.sortBy(_.stage)
      println(f"  [$tag] jobs=$jobs stages=${rs.size} stageWallSum=${rs.map(_.ms).sum}ms")
      rs.foreach { r =>
        println(f"    stage ${r.stage}%4d ${r.ms}%6dms tasks=${r.tasks}%3d in=${r.input}%9d sr=${r.shufRead}%9d sw=${r.shufWrite}%9d  ${r.name}")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = Bench.session(cpus)
    val log = new StageLog
    spark.sparkContext.addSparkListener(log)
    val qs = if (args.nonEmpty) args.toSeq else Seq(
      "q18_minhash_sig", "q20_simhash", "q23_ann_top1", "q27_lsh_jaccard",
      "q73_setsim_prefix", "q104_setsim_dedup_first", "q92_novelty",
      "q98_dup_spans", "q34_mlm_pairs", "q105_spo_lookup",
      "q101_subj_lookup", "q106_obj_lookup", "q103_ivf_pq", "q87_bm25",
      "q11_grouped_topk", "q36_ann_recall", "q61_bloom_prune",
      "q111_semantic_clusters", "q12_dedup_exact")
    qs.foreach {
      case kg @ ("kg_pipeline" | "kg_pipeline_salted" | "kg_detect_dense") =>
        // mirror Bench's kg protocol (docs scaled by sf dir name)
        import graft.gen.CorpusGen
        import graft.pipeline.KgPipeline
        val nDocs: Long =
          if (sfDir.contains("0.01")) 6000L
          else if (sfDir.contains("0.1")) 60000L else 600L
        val parts = 256
        // context / dict-store prep ONCE, outside the measured runs —
        // Bench's protocol
        lazy val bctx = Some(KgPipeline.prepareLinkContext(spark, CorpusGen.aliases(spark)))
        lazy val dictRoot = java.nio.file.Files
          .createTempDirectory("graft_extra_dict").toString
        lazy val saltedCfg = KgPipeline.Config(broadcastLink = false,
          dictStore = Some(dictRoot))
        lazy val saltedCtx = Some(KgPipeline.prepareSaltedContext(spark,
          CorpusGen.aliases(spark), dictRoot))
        def run(): Long = kg match {
          case "kg_pipeline" =>
            Bench.kgRun(spark, nDocs, parts, bctx)._2
          case "kg_pipeline_salted" =>
            spark.catalog.clearCache()
            KgPipeline.run(spark, CorpusGen.docs(spark, nDocs, parts),
              CorpusGen.aliases(spark), cfg = saltedCfg, ctx = saltedCtx).count()
          case _ =>
            KgPipeline.detectMentions(spark,
              KgPipeline.sentences(spark, CorpusGen.docs(spark, nDocs, parts)),
              new graft.tag.DenseStubTagger(graft.text.Vocab.tokenToId.size)).count()
        }
        run() // warm
        spark.sparkContext.setJobDescription(s"$kg profiled")
        log.reset()
        val t0 = System.nanoTime()
        val n = run()
        val t1 = System.nanoTime()
        println(f"$kg%-24s total=${(t1 - t0) / 1e9}%6.3f rows=$n")
        log.dump("count")
        spark.sparkContext.setJobDescription(null)
      case "kgprobe" =>
        // phase decomposition of the broadcast KG pipeline's one big map
        // stage: generation vs sentence split vs detect (±relations) vs
        // the full linked run — each phase warmed once, best-of-2
        import graft.gen.CorpusGen
        import graft.pipeline.KgPipeline
        import graft.tag.GazetteerTagger
        val nDocs: Long =
          if (sfDir.contains("0.01")) 6000L
          else if (sfDir.contains("0.1")) 60000L else 600L
        val parts = 256
        val gaz = KgPipeline.defaultGazetteer
        def ph(name: String)(f: => Any): Unit = {
          f // warm
          val best = (1 to 2).map { _ =>
            val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
          }.min
          println(f"  kgprobe $name%-22s $best%6.3f s")
        }
        def docs() = CorpusGen.docs(spark, nDocs, parts)
        ph("gen_noop")(docs().toDF()
          .write.format("noop").mode("overwrite").save())
        ph("sentences_noop")(KgPipeline.sentences(spark, docs()).toDF()
          .write.format("noop").mode("overwrite").save())
        ph("detect_gaz_count")(KgPipeline.detectMentions(spark,
          KgPipeline.sentences(spark, docs()),
          new GazetteerTagger(gaz)).count())
        ph("detect_rels_count")(KgPipeline.detectRows(spark,
          KgPipeline.sentences(spark, docs()),
          new GazetteerTagger(gaz)).count())
        ph("full_run_count") {
          spark.catalog.clearCache()
          KgPipeline.run(spark, docs(), CorpusGen.aliases(spark)).count()
        }
      case s if s.startsWith("sample:") =>
        // generic in-JVM sampling profile of one query: run it in a
        // loop under the 100 ms stack sampler, print the hot-frame
        // histogram of executor task threads AND the driver main thread
        val q = s.stripPrefix("sample:")
        SparkEntry.queries(q)(spark, sfDir).count() // warm
        val hist = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
        val fullStacks = new java.util.concurrent.ConcurrentHashMap[String, String]()
        @volatile var sampling = true
        val mainTh = Thread.currentThread()
        val sampler = new Thread(() => {
          while (sampling) {
            val all = Thread.getAllStackTraces
            all.forEach { (th, st) =>
              val isTask = th.getName.startsWith("Executor task launch")
              if ((isTask || (th eq mainTh)) &&
                  th.getState == Thread.State.RUNNABLE && st.nonEmpty) {
                val interesting = st.find { f =>
                  val c = f.getClassName
                  c.startsWith("graft.") || c.contains("GeneratedClass") ||
                    c.startsWith("org.apache.spark.sql.catalyst") ||
                    c.startsWith("scala.collection")
                }.getOrElse(st.head)
                val tag = if (isTask) "task" else "driver"
                val key = tag + " " + st.head.getClassName + "." +
                  st.head.getMethodName + " | " +
                  interesting.getClassName + "." + interesting.getMethodName
                hist.computeIfAbsent(key,
                  _ => new java.util.concurrent.atomic.AtomicLong()).incrementAndGet()
                // one FULL exemplar stack per distinct top frame
                fullStacks.computeIfAbsent(
                  st.head.getClassName + "." + st.head.getMethodName,
                  _ => st.take(18).map("      " + _).mkString("\n"))
              }
            }
            Thread.sleep(100)
          }
        })
        sampler.setDaemon(true); sampler.start()
        val t0 = System.nanoTime()
        var runs = 0
        while ((System.nanoTime() - t0) / 1e9 < 20) {
          SparkEntry.queries(q)(spark, sfDir).count(); runs += 1
        }
        sampling = false; sampler.join(1000)
        println(f"  sampled $q over $runs runs, ${(System.nanoTime() - t0) / 1e9}%.1f s")
        import scala.jdk.CollectionConverters._
        hist.asScala.toSeq.sortBy(-_._2.get).take(28).foreach { case (k, v) =>
          println(f"  sample ${v.get}%5d  $k")
        }
        hist.asScala.toSeq.sortBy(-_._2.get).take(5).foreach { case (k, _) =>
          val top = k.split(" \\| ")(0).split(" ")(1)
          Option(fullStacks.get(top)).foreach { st =>
            println(s"  exemplar stack for $top:\n$st")
          }
        }
      case "kgsample" =>
        // in-JVM sampling profiler over the broadcast kg pipeline: a
        // daemon thread snapshots all stacks every 200 ms during the
        // measured runs and prints the hot-frame histogram of executor
        // task threads (getting jstack onto the short-lived forked JVM
        // from outside proved flaky)
        import graft.gen.CorpusGen
        import graft.pipeline.KgPipeline
        val nDocs: Long =
          if (sfDir.contains("0.01")) 6000L
          else if (sfDir.contains("0.1")) 60000L else 600L
        val ctx = Some(KgPipeline.prepareLinkContext(spark, CorpusGen.aliases(spark)))
        Bench.kgRun(spark, nDocs, 256, ctx) // warm
        val hist = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
        @volatile var sampling = true
        val sampler = new Thread(() => {
          while (sampling) {
            val all = Thread.getAllStackTraces
            all.forEach { (th, st) =>
              if (th.getName.startsWith("Executor task launch") &&
                  th.getState == Thread.State.RUNNABLE && st.nonEmpty) {
                // first frame inside graft/spark user code, else the top
                val interesting = st.find { f =>
                  val c = f.getClassName
                  c.startsWith("graft.") || c.contains("GeneratedClass") ||
                    c.startsWith("org.apache.spark.sql.catalyst") ||
                    c.startsWith("scala.collection")
                }.getOrElse(st.head)
                val key = st.head.getClassName + "." + st.head.getMethodName +
                  " | " + interesting.getClassName + "." + interesting.getMethodName
                hist.computeIfAbsent(key,
                  _ => new java.util.concurrent.atomic.AtomicLong()).incrementAndGet()
              }
            }
            Thread.sleep(200)
          }
        })
        sampler.setDaemon(true); sampler.start()
        (1 to 4).foreach(_ => Bench.kgRun(spark, nDocs, 256, ctx))
        sampling = false; sampler.join(1000)
        import scala.jdk.CollectionConverters._
        hist.asScala.toSeq.sortBy(-_._2.get).take(30).foreach { case (k, v) =>
          println(f"  kgsample ${v.get}%5d  $k")
        }
      case "kgab" =>
        // same-JVM A/B of the broadcast-link unit assembly: the r8
        // third-pass columnar/udf form (KgPipeline.run) vs the previous
        // typed-flatMap form, alternating runs in one window
        import graft.gen.CorpusGen
        import graft.pipeline.KgPipeline
        import graft.kg.{Linker, Triples}
        import graft.kg.Triples.{DocUnit, SlimMention, SlimRelation}
        import graft.tag.GazetteerTagger
        import spark.implicits._
        val nDocs: Long =
          if (sfDir.contains("0.01")) 6000L
          else if (sfDir.contains("0.1")) 60000L else 600L
        val parts = 256
        val ctx = KgPipeline.prepareLinkContext(spark, CorpusGen.aliases(spark))
        val bcDict = spark.sparkContext.broadcast(ctx.dict)
        val bcCanon = spark.sparkContext.broadcast(ctx.canon)
        def linkCanon(surface: String, typ: String): Option[(String, Double)] = {
          val cands = bcDict.value.getOrElse(CorpusGen.normSurface(surface), Seq.empty)
          Linker.bestCandidate(cands, typ).map { a =>
            (bcCanon.value.getOrElse(a.entity_id, a.entity_id), a.prior)
          }
        }
        def oldFlat(): Long = {
          val sents = KgPipeline.sentences(spark,
            CorpusGen.docs(spark, nDocs, parts))
          val units = KgPipeline.detectRows(spark, sents,
            new GazetteerTagger(KgPipeline.defaultGazetteer)).flatMap { row =>
            if (row.media != null)
              Some(DocUnit(row.media.doc_id, null, null,
                Triples.SlimMedia(row.media.offset, row.media.media_ref)))
            else if (row.mention != null) {
              val m = row.mention
              linkCanon(m.surface, m.entity_type).map { case (eid, conf) =>
                DocUnit(m.doc_id,
                  SlimMention(m.span_offset, m.sentence_idx, eid, conf), null)
              }
            } else {
              val r = row.relation
              for {
                (s, _) <- linkCanon(r.subj_surface, r.subj_type)
                (o, _) <- linkCanon(r.obj_surface, r.obj_type)
              } yield DocUnit(r.doc_id, null,
                SlimRelation(r.span_offset, r.sentence_idx, s, r.rel, o))
            }
          }
          Triples.buildUnits(spark, units, 64).count()
        }
        def newRun(): Long =
          KgPipeline.run(spark, CorpusGen.docs(spark, nDocs, parts),
            CorpusGen.aliases(spark), ctx = Some(ctx)).count()
        oldFlat(); newRun() // warm both
        (1 to 3).foreach { i =>
          val t0 = System.nanoTime(); val a = oldFlat()
          val t1 = System.nanoTime(); val b = newRun()
          val t2 = System.nanoTime()
          println(f"  kgab pass $i old_flatmap=${(t1 - t0) / 1e9}%6.3f " +
            f"(rows=$a) new_columnar=${(t2 - t1) / 1e9}%6.3f (rows=$b)")
        }
      case "storeprobe" =>
        // phase-level driver-time attribution for the lookup queries
        SparkEntry.queries("q101_subj_lookup")(spark, sfDir).count() // warm + build
        val root = {
          val f = SparkEntry.getClass.getDeclaredField("q101Root")
          f.setAccessible(true); f.get(SparkEntry).asInstanceOf[String]
        }
        def ph[T](name: String)(f: => T): T = {
          val t0 = System.nanoTime()
          val r = f
          println(f"  storeprobe $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
          r
        }
        (1 to 2).foreach { i =>
          println(s"  --- pass $i ---")
          val subj = ph("minSubject")(
            graft.store.LineageStore.minSubject(spark, root).get)
          val lookupDf = ph("lookup construct")(
            graft.store.LineageStore.lookupBySubject(spark, root, subj))
          ph("lookup agg(min pred) head")(
            lookupDf.toDF().agg(org.apache.spark.sql.functions.min("pred")).head)
          val df2 = ph("lookupBySubjectPred construct")(
            graft.store.LineageStore.lookupBySubjectPred(spark, root, subj, "mentions"))
          ph("count")(df2.count())
        }

      case q =>
        // warm (JIT + store builds) exactly like Bench's warm pass
        SparkEntry.queries(q)(spark, sfDir).count()
        spark.sparkContext.setJobDescription(s"$q profiled")
        log.reset()
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(q)(spark, sfDir)
        val t1 = System.nanoTime()
        val n = df.count()
        val t2 = System.nanoTime()
        println(f"$q%-24s construct=${(t1 - t0) / 1e9}%6.3f action=${(t2 - t1) / 1e9}%6.3f total=${(t2 - t0) / 1e9}%6.3f rows=$n")
        log.dump("count")
        spark.sparkContext.setJobDescription(null)
    }
    spark.stop()
  }
}
