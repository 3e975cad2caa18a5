package graft

import java.nio.file.{Files, Paths}

/** Per-query benchmark in an ISOLATED JVM — the adjudication tool for
  * bench anomalies (VERDICT r3: q61/q27 were out-of-family in a shared
  * 38-query session). One JVM = one query: no cross-query cache
  * pollution, no accumulated catalog/codegen state, no job-scheduler
  * backlog; one JIT warm-up run then best-of-3 steady state, matching
  * the ScalingBench protocol.
  *
  * Usage:
  *   runMain graft.PerQueryBench single <sfDir> <query> <outJson>
  *   runMain graft.PerQueryBench merge <outJson> <inJson...>
  *
  * The driving loop (scripts/perquery.sh) launches `single` once per
  * headline query via a bare `java -cp` (no sbt between measurements)
  * and merges the per-query files into BENCH/perquery_rN.json.
  */
object PerQueryBench {

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    args(0) match {
      case "single" =>
        val sfDir = args(1); val q = args(2); val out = args(3)
        val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
        def one(): Double = {
          val t0 = System.nanoTime()
          SparkEntry.queries(q)(spark, sfDir).count()
          val sec = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache() // queries that persist must not carry over
          sec
        }
        one() // JIT warm-up (C2 needs a full pass)
        val runs = (1 to 3).map(_ => one())
        // host-regime control AFTER the measured runs, same JVM/window
        // (CpuProbe): merge reports best/control alongside raw seconds
        val ctl = CpuProbe.control(spark)
        spark.stop()
        val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
        val json = f"""{"query":"$q","best":${runs.min}%.3f,"runs":[${runs.map(r => f"$r%.3f").mkString(",")}],"control_sec":$ctl%.3f,"cpus":"$cpus","sf":"$sfDir"}"""
        Files.writeString(Paths.get(out), json)
        println(json)

      case "merge" =>
        val out = args(1)
        val entries = args.drop(2).toSeq.map(p => Files.readString(Paths.get(p)))
        val qs = entries.map { e =>
          val q = "\"query\":\"([^\"]+)\"".r.findFirstMatchIn(e).get.group(1)
          val best = "\"best\":([0-9.]+)".r.findFirstMatchIn(e).get.group(1)
          f""""$q":$best"""
        }
        val total = entries
          .map(e => "\"best\":([0-9.]+)".r.findFirstMatchIn(e).get.group(1).toDouble)
          .sum
        val detail = entries.mkString("[", ",", "]")
        // provenance from the per-query files themselves, not
        // hardcoded; a heterogeneous merge (e.g. one query re-measured
        // at different cpus) is labeled "mixed", never silently stamped
        // with the first file's settings
        def meta(k: String, dflt: String): String = {
          val vs = entries.flatMap(e => ("\"" + k + "\":\"([^\"]+)\"").r
            .findFirstMatchIn(e).map(_.group(1))).distinct
          vs match {
            case Seq(one) => one
            case Seq() => dflt
            case _ => "mixed:" + vs.mkString("|")
          }
        }
        // per-query regime normalization: best / that JVM's own control
        val qsNorm = entries.flatMap { e =>
          for {
            q <- "\"query\":\"([^\"]+)\"".r.findFirstMatchIn(e).map(_.group(1))
            best <- "\"best\":([0-9.]+)".r.findFirstMatchIn(e).map(_.group(1).toDouble)
            ctl <- "\"control_sec\":([0-9.]+)".r.findFirstMatchIn(e).map(_.group(1).toDouble)
          } yield f""""$q":${best / ctl}%.3f"""
        }
        val ctls = entries.flatMap(e => "\"control_sec\":([0-9.]+)".r
          .findFirstMatchIn(e).map(_.group(1).toDouble)).sorted
        val ctlMedian =
          if (ctls.isEmpty) "null" else f"${ctls(ctls.size / 2)}%.3f"
        val json =
          f"""{"protocol":"fresh JVM per query, 1 warm-up + best-of-3, local[${meta("cpus", "?")}], ${meta("sf", "?")}","total_best":$total%.3f,"control_sec_median":$ctlMedian,"queries":{${qs.mkString(",")}},"queries_norm":{${qsNorm.mkString(",")}},"detail":$detail}"""
        val outP = Paths.get(out)
        if (outP.getParent != null) Files.createDirectories(outP.getParent)
        Files.writeString(outP, json)
        println(json)
    }
  }
}
