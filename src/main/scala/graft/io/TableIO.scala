package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Iceberg-style checkpoint tables: atomic snapshot commit, per-stage
  * lineage rows, resume.
  *
  * No Iceberg runtime jar ships in this container (SURVEY §7.1), so the
  * table layer provides the three Iceberg properties the north rule uses,
  * behind an interface a real catalog could replace:
  *
  *  - ATOMIC COMMIT: data lands in `<root>/<stage>/data-<token>/`, then a
  *    single snapshot file rename under `_snapshots/` publishes it —
  *    readers either see the whole snapshot or none of it;
  *  - LINEAGE: every commit appends per-partition rows (stage,
  *    partition_id, rows_out, wall_ms, config_hash) to `<root>/_lineage/`;
  *  - RESUME: `readOrCompute` keys snapshots by (stage, config hash); a
  *    restarted run reuses any published snapshot with a matching config
  *    and recomputes only downstream stages — the table-checkpoint
  *    promotion of the reference's --raw/--merge restartability
  *    (/root/reference/src/main.rs:63-76, SURVEY §1.2).
  */
final class TableIO(spark: SparkSession, root: String) {

  private def snapDir = s"$root/_snapshots"
  private def lineageDir = s"$root/_lineage"

  private def snapPath(stage: String, configHash: String) =
    Paths.get(snapDir, s"$stage-$configHash.json")

  def snapshotExists(stage: String, configHash: String): Boolean =
    Files.exists(snapPath(stage, configHash))

  def read(stage: String, configHash: String): DataFrame = {
    val json = Files.readString(snapPath(stage, configHash))
    val loc = """"location"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(json)
      .getOrElse(sys.error(s"corrupt snapshot for $stage")).group(1)
    spark.read.parquet(loc)
  }

  /** Write df as a new snapshot of `stage` and publish it atomically. */
  def commit(stage: String, configHash: String, df: DataFrame): DataFrame = {
    val t0 = System.nanoTime()
    val token = java.util.UUID.randomUUID().toString.take(8)
    val loc = s"$root/$stage/data-$token"
    df.write.mode("overwrite").parquet(loc)
    val wallMs = (System.nanoTime() - t0) / 1000000
    // per-partition lineage (counters in the output table itself, not the
    // driver: scales to any partition count)
    val out = spark.read.parquet(loc)
    val lineage = out.groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("rows_out"))
      .withColumn("stage", lit(stage))
      .withColumn("config_hash", lit(configHash))
      .withColumn("snapshot", lit(token))
      .withColumn("wall_ms", lit(wallMs))
    lineage.write.mode("append").parquet(lineageDir)
    // atomic publish: write tmp json, move into place
    Files.createDirectories(Paths.get(snapDir))
    val tmp = Files.createTempFile(Paths.get(snapDir), s".$stage", ".tmp")
    Files.writeString(tmp,
      s"""{"stage":"$stage","config_hash":"$configHash","location":"$loc","rows":${out.count()},"wall_ms":$wallMs}""")
    Files.move(tmp, snapPath(stage, configHash), StandardCopyOption.ATOMIC_MOVE)
    out
  }

  /** Resume seam: reuse a published snapshot or compute + commit one. */
  def readOrCompute(stage: String, configHash: String)(compute: => DataFrame): DataFrame =
    if (snapshotExists(stage, configHash)) read(stage, configHash)
    else commit(stage, configHash, compute)

  def lineage(): DataFrame = spark.read.parquet(lineageDir)
}

object TableIO {
  /** Stable config hash: pins results to the exact shingle/signature
    * config, like the reference pins lg_k/seed at compile time. */
  def configHash(cfg: Product): String = {
    val s = cfg.productIterator.mkString("|")
    f"${graft.sketch.Murmur3x64.hash64(s.getBytes("UTF-8"), 9001L)}%016x"
  }
}
