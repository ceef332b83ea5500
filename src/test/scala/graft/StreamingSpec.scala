package graft

import graft.functions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming semantics (SURVEY §2.8): the reference is a
  * one-pass streaming reducer with commutative mergeable state, which is
  * exactly groupBy().agg(sketch) in update mode — no watermark needed
  * (order-free monoid). Verifies the same Aggregators drop into a stream
  * unchanged and converge to the batch answer. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("keyed kmv distinct over a stream converges to the batch result across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val agg = mem.toDF().toDF("key", "value")
      .groupBy($"key")
      .agg(kmv_est($"value", 1024).as("du"))
    val q = agg.writeStream
      .format("memory").queryName("stream_out")
      .outputMode(OutputMode.Update())
      .start()
    try {
      // three micro-batches with overlapping values — the merge across
      // batches is the --merge protocol under streaming state
      mem.addData((1 to 100).map(i => ("a", s"v$i")) ++ (1 to 50).map(i => ("b", s"v$i")): _*)
      q.processAllAvailable()
      mem.addData((51 to 120).map(i => ("a", s"v$i")): _*) // 20 new for a
      q.processAllAvailable()
      mem.addData((1 to 100).map(i => ("a", s"v$i")): _*) // all dups
      q.processAllAvailable()
      val last = spark.sql(
        "SELECT key, du FROM stream_out ORDER BY key, du")
        .as[(String, Double)].collect().groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      assert(last("a") == 120.0, s"got $last")
      assert(last("b") == 50.0, s"got $last")
    } finally q.stop()
  }

  test("streaming heavy hitters: exact top-k under capacity, updated per batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val agg = mem.toDF().toDF("item")
      .agg(freq_items($"item", 3).as("hh"))
    val q = agg.writeStream
      .format("memory").queryName("hh_out")
      .outputMode(OutputMode.Update())
      .start()
    try {
      mem.addData(Seq.fill(30)("x") ++ Seq.fill(20)("y") ++ Seq.fill(5)("z"): _*)
      q.processAllAvailable()
      mem.addData(Seq.fill(25)("y"): _*) // y overtakes x
      q.processAllAvailable()
      val rows = spark.sql("SELECT hh FROM hh_out").collect()
      val lastTop = rows.last.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getString(0), r.getLong(1)))
      assert(lastTop.take(2) == Seq(("y", 45L), ("x", 30L)), s"got $lastTop")
    } finally q.stop()
  }
}
