package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val absOut = new java.io.File(outDir).getAbsolutePath
    // Side tables for the DuckDB oracles are written as single parquet
    // FILES, not directories: the driver's compare walks every DIRECTORY
    // in outDir as a query result, so a directory-shaped dump shows up as
    // a spurious no_oracle row (plain files are skipped — the raw text/csv
    // fixtures never appear in CORRECTNESS_rN).
    def writeSingleParquet(df: org.apache.spark.sql.DataFrame, target: String): Unit = {
      val tmp = target + "_tmpdir"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file under $tmp"))
      Files.move(part.toPath, Paths.get(target),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      Bench.deleteRecursively(new java.io.File(tmp))
    }
    // persist the deterministic synthetic clips table so DuckDB oracles
    // (q_multimodal_meta) can read the same input the queries consume
    try writeSingleParquet(SparkEntry.clipsInput(spark, sfDir), s"$absOut/clips_input.parquet")
    catch { case e: Throwable =>
      System.err.println(s"[verify] clips_input persist failed: ${e.getMessage}")
    }
    // signature + bucket dumps for the FULL-pipeline oracle: the DuckDB
    // replay needs each clip's shingle/audio-fingerprint hash sets (the
    // verify inputs; pinned separately against the in-repo reference
    // decoder by TextAudioSpec) and its bucket memberships (the candidate
    // stage replay — deterministic given the signatures)
    try {
      val cfg = graft.pipeline.DedupConfig()
      val sigs = graft.pipeline.Dedup
        .signatures(SparkEntry.clipsInput(spark, sfDir), cfg)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      writeSingleParquet(sigs.select(
          org.apache.spark.sql.functions.col("clip_id"),
          org.apache.spark.sql.functions.col("sh"),
          org.apache.spark.sql.functions.col("afp")),
        s"$absOut/clips_sigs.parquet")
      writeSingleParquet(graft.pipeline.Dedup.bucketDump(sigs, cfg),
        s"$absOut/clips_buckets.parquet")
      sigs.unpersist(blocking = false): Unit
    } catch { case e: Throwable =>
      System.err.println(s"[verify] sig/bucket dump failed: ${e.getMessage}")
    }
    // raw-fixture copies for the DuckDB oracles (q_lines_scan /
    // q_csv_extract read the tmpdir originals; content is identical by
    // construction — both are pure functions of RawFixtures)
    try {
      Files.writeString(Paths.get(s"$absOut/lines_input.txt"), graft.gen.RawFixtures.linesText)
      Files.writeString(Paths.get(s"$absOut/csv_input.csv"), graft.gen.RawFixtures.csvText)
    } catch { case e: Throwable =>
      System.err.println(s"[verify] raw fixture persist failed: ${e.getMessage}")
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // {OUT} is the only templated piece of oracle SQL: it points DuckDB at
    // side tables Verify wrote (e.g. clips_input) under this run's outDir
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("{OUT}", absOut))}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
