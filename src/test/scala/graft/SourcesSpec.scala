package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Source/sink coverage (SURVEY §2.1) + the SQL registration surface. */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  test("S1 text-line source: spark.read.text strips newlines like the reference reader") {
    val dir = Files.createTempDirectory("graft-lines").toString
    Files.writeString(java.nio.file.Paths.get(dir, "in.txt"),
      "alpha\r\nbeta\nalpha\nbeta\n\n") // \r\n == \n (stream_reducer.rs:61-64)
    val lines = spark.read.textFile(s"$dir/in.txt")
    assert(lines.collect().toSeq == Seq("alpha", "beta", "alpha", "beta", ""))
    // distinct over lines == the dsrs count-distinct CLI on this stream
    val est = lines.toDF("line").agg(graft.functions.kmv_est($"line", 1024)).head.getDouble(0)
    assert(est == 3.0) // alpha, beta, ""
  }

  test("S5 csv source: csv round trip preserves the aggregate answer") {
    val dir = Files.createTempDirectory("graft-csv").toString
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select($"event_type", $"user_id")
    ev.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema("event_type STRING, user_id BIGINT").csv(dir)
    val a = ev.groupBy($"event_type").agg(countDistinct($"user_id").as("du"))
      .as[(String, Long)].collect().toMap
    val b = back.groupBy($"event_type").agg(countDistinct($"user_id").as("du"))
      .as[(String, Long)].collect().toMap
    assert(a == b)
  }

  test("S3/S4 sketch sink + source: serialized sketches survive a parquet round trip") {
    val dir = Files.createTempDirectory("graft-sk").toString
    val ev = spark.read.parquet(s"$sf/events.parquet")
    // --raw: write per-shard partial sketches to a checkpoint table
    ev.groupBy($"event_type", pmod($"user_id", lit(4)).as("shard"))
      .agg(graft.functions.kmv_sketch($"user_id".cast("string"), 4096).as("sk"))
      .write.mode("overwrite").parquet(dir)
    // --merge: read them back and merge to finals
    val merged = spark.read.parquet(dir)
      .groupBy($"event_type")
      .agg(graft.functions.kmv_merge_est($"sk").as("du"))
      .as[(String, Double)].collect().toMap
    val exact = ev.groupBy($"event_type").agg(countDistinct($"user_id"))
      .as[(String, Long)].collect().toMap.view.mapValues(_.toDouble).toMap
    assert(merged == exact)
  }

  test("SQL surface: registered functions work from spark.sql") {
    GraftFunctions.registerAll(spark)
    spark.read.parquet(s"$sf/events.parquet").createOrReplaceTempView("ev")
    val viaSql = spark.sql(
      """SELECT event_type, kmv_est(CAST(user_id AS STRING)) AS du
        |FROM ev GROUP BY event_type ORDER BY event_type""".stripMargin)
      .as[(String, Double)].collect().toMap
    val exact = spark.sql(
      "SELECT event_type, CAST(COUNT(DISTINCT user_id) AS DOUBLE) FROM ev GROUP BY event_type")
      .as[(String, Double)].collect().toMap
    assert(viaSql == exact)
    val sim = spark.sql("SELECT simhash_text('hello world again') AS s").head.getLong(0)
    assert(sim != 0L)
    assert(spark.sql("SELECT is_substring('bc', 'abcd')").head.getBoolean(0))
  }
}
