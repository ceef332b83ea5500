package graft

import org.apache.spark.sql.functions._

/** Ad-hoc stage decomposition probes for the optimization round (guide
  * §1.1): times isolated sub-stages of the expensive queries with the
  * noop sink so the compute is measured, not the sink. Not part of the
  * driver contract; numbers are cited in OPTIMIZATION_r06.md only. */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.makeSession(cpus)
    import spark.implicits._
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); -1L
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sel = if (args.isEmpty) Set("wj", "span", "emb", "lsh") else args.toSet

    if (sel("wj")) {
      val words = docs
        .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))
        .where(col("w") =!= "")
      // warm
      SparkEntry.wordPrefixCandidates(words, 0.5).count()
      timed("wj_words")(words.count())
      timed("wj_dfreq")(words.groupBy(col("w")).agg(count(lit(1))).count())
      timed("wj_candidates")(SparkEntry.wordPrefixCandidates(words, 0.5).count())
      val vocab = words.select(col("w")).distinct()
        .repartition(col("w")).sortWithinPartitions(col("w"))
        .rdd.map(_.getString(0)).zipWithIndex().toDF("w", "wid")
      timed("wj_vocab")(vocab.count())
      val sets = words.join(vocab, "w")
        .groupBy(col("doc_id")).agg(sort_array(collect_set(col("wid"))).as("ws"))
      timed("wj_sets")(sets.count())
      timed("wj_full_noop")(noop(SparkEntry.wordJaccardPairs(docs, 0.5)))
      timed("wj_full_sorted")(SparkEntry.queries("q_word_jaccard_pairs")(spark, sfDir).count())
    }

    if (sel("span")) {
      import graft.pipeline.{Dedup, DedupConfig}
      val cfg = DedupConfig()
      val d = docs.select(lpad(col("doc_id").cast("string"), 12, "0").as("id"), col("text"))
      Dedup.sharedSpanPairs(d, "id", "text", cfg, minSpan = 47).count() // warm
      val dd = d.select(col("id").cast("string").as("clip_id"), coalesce(col("text"), lit("")).as("text"))
      val sigs = dd.select(col("clip_id"),
        graft.functions.winnow_hashes(col("text"), lit(cfg.winnowK), lit(cfg.winnowWindow)).as("winnow"))
      timed("span_sigs")(sigs.select(sum(size(col("winnow")))).head().getLong(0))
      val cands = Dedup.pairsFromBuckets(Dedup.substringBuckets(sigs, cfg), Int.MaxValue,
        math.max(cfg.saltMaxBucket, Int.MaxValue))
        .select(col("a"), col("b")).distinct()
      timed("span_cands")(cands.count())
      val candsM = cands.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      candsM.count()
      val dict2 = dd.select(xxhash64(col("clip_id")).as("sid"), col("clip_id"), col("text"))
      val withA = candsM.join(dict2.select(col("sid").as("a"), col("clip_id").as("id_a"), col("text").as("text_a")), "a")
      val withB = withA.join(dict2.select(col("sid").as("b"), col("clip_id").as("id_b"), col("text").as("text_b")), "b")
      timed("span_joins")(withB.count())
      import spark.implicits._
      timed("span_sa") {
        withB.select(col("id_a"), col("id_b"), col("text_a"), col("text_b"))
          .repartition(32)
          .as[(String, String, String, String)]
          .flatMap { case (ia, ib, ta, tb) =>
            val s = graft.text.SuffixArray.longestSharedSpan(ta, tb)
            if (s < 47) None else Some((ia, ib, s))
          }.count()
      }
      timed("span_full")(Dedup.sharedSpanPairs(d, "id", "text", cfg, minSpan = 47).count())
      candsM.unpersist()
    }

    if (sel("pipe")) {
      import graft.pipeline.{Dedup, DedupConfig}
      val clips = graft.gen.ClipGen.generate(spark, 10000, seed = 42L)._1.toDF()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      clips.count()
      Dedup.run(spark,
        graft.gen.ClipGen.generate(spark, 500, seed = 7L)._1.toDF(),
        DedupConfig()).count() // warm
      val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
          val sub = si.submissionTime.getOrElse(0L)
          stageLog.add(f"PSTAGE $sub%d id=${si.stageId}%-4d ${wall}%6.2f s tasks=${si.numTasks}%-3d ${si.name.take(70)}")
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val (rows1, st1) = Dedup.runTimedCount(spark, clips, DedupConfig())
      spark.sparkContext.removeSparkListener(listener)
      stageLog.forEach(s => println(s))
      println(s"PROBE pipe_full rows=$rows1 stages=" +
        st1.map { case (n, sec) => f"$n=$sec%.2f" }.mkString(","))
      val (rows2, st2) = Dedup.runTimedCount(spark, clips,
        DedupConfig(sources = Set("minhash"), verifyContainment = false))
      println(s"PROBE pipe_text rows=$rows2 stages=" +
        st2.map { case (n, sec) => f"$n=$sec%.2f" }.mkString(","))
      val t0 = System.nanoTime()
      val pairs = Dedup.sharedSpanFlagPairs(clips.select(col("clip_id"), col("transcript")),
        "clip_id", "transcript", DedupConfig(), minSpan = 47).select(col("a"), col("b"))
      val cc = graft.pipeline.ConnectedComponents.runOnStrings(spark, pairs, "a", "b")
      val n3 = clips.select(col("clip_id")).join(cc, Seq("clip_id"), "left").count()
      println(f"PROBE pipe_substr ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n3")
    }

    if (sel("emb")) {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      graft.sim.Ann.cosineNearDupPairs(spark, emb, tau = 0.45, planes = 4).count() // warm
      timed("emb_cands")(graft.sim.Ann.cosineNearDupCandidates(emb, 4, 16).count())
      timed("emb_full")(graft.sim.Ann.cosineNearDupPairs(spark, emb, tau = 0.45, planes = 4).count())
      timed("emb_n")(emb.count())
    }

    if (sel("lsh")) {
      SparkEntry.queries("q_minhash_lsh_docs")(spark, sfDir).count() // warm
      val d2 = docs.select(col("doc_id").cast("string").as("clip_id"), col("text").as("transcript"))
      val cfg = graft.pipeline.DedupConfig(tau = 0.5, bands = 25, rowsPerBand = 5)
      val sigs = d2.select(col("clip_id"),
        graft.functions.minhash_text(col("transcript"), cfg.shingleK, cfg.numPerms).as("minhash"))
      timed("lsh_sigs")(sigs.select(sum(size(col("minhash")))).head().getLong(0))
      val cands = graft.pipeline.Dedup.textCandidates(sigs, cfg).select(col("a"), col("b"))
      timed("lsh_cands")(cands.count())
      timed("lsh_full")(SparkEntry.queries("q_minhash_lsh_docs")(spark, sfDir).count())
      timed("hot_shingles")(SparkEntry.queries("q_hot_shingles")(spark, sfDir).count())
    }

    println(f"PROBE host ${ScalingBench.hostProbe()}%.0f Mops")
    spark.stop()
  }
}
