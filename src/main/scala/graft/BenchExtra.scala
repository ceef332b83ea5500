package graft

/** Optimization-round iteration harness (guide §1): times a SELECTED
  * subset of the headline queries with the exact Bench methodology (same
  * session config, same sf0.001 warmup, same `.count()` action) without
  * paying the full headline + scaling run per iteration, and can dump
  * each query's `.explain("formatted")` to a file for the plan evidence
  * in plans/r06/.
  *
  * Usage:
  *   sbt "runMain graft.BenchExtra [reps=N] [explain=DIR] [tag=SUFFIX] q1 q2 ..."
  * with no query args, runs every headline query once.
  * Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench.
  *
  * Emits one line per (query, rep): EXTRA <name> <rep> <sec> <rows>,
  * plus a host-speed probe (Mops) before and after so a hypervisor slow
  * window is visible in the numbers. Never writes BENCH_*.json.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.find(_.startsWith("reps=")).map(_.stripPrefix("reps=").toInt).getOrElse(2)
    val explainDir = args.find(_.startsWith("explain=")).map(_.stripPrefix("explain="))
    val tag = args.find(_.startsWith("tag=")).map(_.stripPrefix("tag=")).getOrElse("")
    val qs0 = args.filterNot(a => a.contains("=")).toSeq
    val qs = if (qs0.nonEmpty) qs0 else Bench.headline
    Bench.cleanStaleScratch()
    val spark = Bench.makeSession(cpus)
    val warmDir = "/root/testdata/sf0.001"
    qs.foreach { name =>
      try SparkEntry.queries(name)(spark, warmDir).count()
      catch { case e: Throwable => System.err.println(s"[extra] warmup $name: $e") }
    }
    // pipeline warmup (mirrors Bench.measureHeadline) only when a pipeline
    // query is selected — it costs ~20 s
    if (qs.exists(_.startsWith("q_pipeline")))
      try graft.pipeline.Dedup.run(spark,
        graft.gen.ClipGen.generate(spark, 500, seed = 7L)._1.toDF(),
        graft.pipeline.DedupConfig()).count()
      catch { case e: Throwable => System.err.println(s"[extra] warmup pipeline: $e") }
    if (sys.env.getOrElse("GRAFT_STAGE_LOG", "0") == "1")
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
          if (wall >= 0.15)
            println(f"XSTAGE ${si.submissionTime.getOrElse(0L)}%d id=${si.stageId}%-4d ${wall}%6.2f s tasks=${si.numTasks}%-3d ${si.name.take(60)}")
        }
      })
    val p0 = ScalingBench.hostProbe()
    qs.foreach { name =>
      explainDir.foreach { d =>
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val f = java.nio.file.Paths.get(d, s"$name$tag.txt")
        java.nio.file.Files.createDirectories(f.getParent)
        java.nio.file.Files.writeString(f, txt)
      }
      (1 to reps).foreach { rep =>
        val t0 = System.nanoTime()
        val n = try SparkEntry.queries(name)(spark, sfDir).count()
        catch { case e: Throwable => System.err.println(s"[extra] $name: $e"); -1L }
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"EXTRA $name%-32s rep$rep ${sec}%8.3f s  rows=$n")
      }
    }
    val p1 = ScalingBench.hostProbe()
    println(f"EXTRA_PROBES ${p0}%.0f ${p1}%.0f Mops")
    spark.stop()
  }
}
