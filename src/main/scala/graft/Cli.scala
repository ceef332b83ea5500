package graft

import graft.pipeline.{Dedup, DedupConfig}
import org.apache.spark.sql.SparkSession

/** spark-submit entrypoint: run the dedup pipeline over any parquet table
  * with the north-star input schema (clip_id, bytes, sr_hz, dur_ms, codec,
  * transcript) without writing Scala.
  *
  * Usage (spark-submit --class graft.Cli <jar|classes> ...):
  *   ingest --out DIR [--n N] [--seed S]      write a synthetic clips table
  *   dedup  --input DIR --output DIR          cluster; add --checkpoint DIR
  *          [--checkpoint DIR] [--tau T]      for a resumable run
  *          [--bands B] [--rows R] [--shingle-k K]
  *   resume --input DIR --output DIR --checkpoint DIR
  *                                            alias of dedup (resume is
  *                                            automatic: published stage
  *                                            snapshots keyed by config +
  *                                            input fingerprint are reused)
  *
  * Under spark-submit the cluster manager supplies the master; running
  * from sbt falls back to local[*].
  */
object Cli {

  private def parseFlags(args: Seq[String]): Map[String, String] =
    args.grouped(2).collect {
      case Seq(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { usage(); sys.exit(2) }
    val cmd = args.head
    val flags = parseFlags(args.toSeq.tail)
    val spark = SparkSession.builder()
      .appName(s"graft-$cmd")
      .config("spark.sql.session.timeZone", "UTC")
      .master(sys.props.getOrElse("spark.master",
        sys.env.getOrElse("MASTER", "local[*]")))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try cmd match {
      case "ingest" =>
        val out = flags.getOrElse("out", sys.error("ingest needs --out DIR"))
        val n = flags.getOrElse("n", "10000").toInt
        val seed = flags.getOrElse("seed", "42").toLong
        val (clips, truth) = graft.gen.ClipGen.generate(spark, n, seed)
        clips.toDF().write.mode("overwrite").parquet(s"$out/clips")
        truth.write.mode("overwrite").parquet(s"$out/truth")
        System.err.println(s"[cli] wrote ${spark.read.parquet(s"$out/clips").count()} clips to $out/clips")

      case "dedup" | "resume" =>
        val in = flags.getOrElse("input", sys.error(s"$cmd needs --input DIR"))
        val out = flags.getOrElse("output", sys.error(s"$cmd needs --output DIR"))
        val cfg = DedupConfig(
          shingleK = flags.getOrElse("shingle-k", "5").toInt,
          bands = flags.getOrElse("bands", "32").toInt,
          rowsPerBand = flags.getOrElse("rows", "4").toInt,
          tau = flags.getOrElse("tau", "0.8").toDouble)
        val clips = spark.read.parquet(in)
        val required = Seq("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript")
        val missing = required.filterNot(clips.columns.contains)
        require(missing.isEmpty, s"input table missing columns: ${missing.mkString(", ")}")
        val clusters = flags.get("checkpoint") match {
          case Some(ckpt) => Dedup.runCheckpointed(spark, clips, cfg, ckpt)
          case None =>
            if (cmd == "resume") sys.error("resume needs --checkpoint DIR")
            Dedup.run(spark, clips, cfg)
        }
        clusters.write.mode("overwrite").parquet(out)
        val n = spark.read.parquet(out).count()
        System.err.println(s"[cli] wrote $n cluster rows to $out")

      case other =>
        System.err.println(s"unknown command: $other"); usage(); sys.exit(2)
    } finally spark.stop()
  }

  private def usage(): Unit = System.err.println(
    """usage: graft.Cli <ingest|dedup|resume> [flags]
      |  ingest --out DIR [--n N] [--seed S]
      |  dedup  --input DIR --output DIR [--checkpoint DIR] [--tau T] [--bands B] [--rows R] [--shingle-k K]
      |  resume --input DIR --output DIR --checkpoint DIR""".stripMargin)
}
