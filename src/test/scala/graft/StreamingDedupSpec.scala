package graft

import graft.pipeline.{Dedup, DedupConfig}
import graft.streaming.StreamingDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** The flagship pipeline's candidate stage under Structured Streaming:
  * incremental LSH pairing via flatMapGroupsWithState must converge to
  * the batch candidate set, regardless of how the stream is chopped
  * into micro-batches, and must bound state via the star regime. */
class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame): Set[(String, String)] =
    df.select($"a", $"b").as[(String, String)].collect().toSet

  test("streamed candidates across 3 micro-batches equal batch textCandidates") {
    implicit val sqlCtx = spark.sqlContext
    val cfg = DedupConfig()
    val clips = gen.ClipGen.generate(spark, 200, seed = 42L)._1
      .select($"clip_id", $"transcript").as[(String, String)].collect().toSeq
    val mem = MemoryStream[(String, String)]
    val out = StreamingDedup.textCandidatePairs(
      mem.toDF().toDF("clip_id", "transcript"), cfg)
    val q = out.writeStream.format("memory").queryName("sdedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      clips.grouped((clips.size + 2) / 3).foreach { batch =>
        mem.addData(batch: _*)
        q.processAllAvailable()
      }
      val streamed = canon(spark.sql("SELECT a, b FROM sdedup_out"))
      val sigs = spark.createDataset(clips).toDF("clip_id", "transcript")
        .select($"clip_id",
          graft.functions.minhash_text($"transcript", cfg.shingleK, cfg.numPerms).as("minhash"))
      val batchPairs = canon(Dedup.textCandidates(sigs, cfg))
      assert(streamed == batchPairs,
        s"stream-only=${(streamed -- batchPairs).take(5)} batch-only=${(batchPairs -- streamed).take(5)}")
      assert(batchPairs.nonEmpty) // planted dups exist
    } finally q.stop()
  }

  test("streamed verified pairs equal batch-verified J>=tau pairs (stream-static join)") {
    implicit val sqlCtx = spark.sqlContext
    val cfg = DedupConfig()
    val clips = gen.ClipGen.generate(spark, 200, seed = 42L)._1
      .select($"clip_id", $"transcript").as[(String, String)].collect().toSeq
    val payload = spark.createDataset(clips).toDF("clip_id", "transcript")
      .select($"clip_id", graft.functions.shingle_hashes($"transcript", lit(cfg.shingleK)).as("sh"))
    val mem = MemoryStream[(String, String)]
    val out = StreamingDedup.verifiedTextPairs(
      mem.toDF().toDF("clip_id", "transcript"), payload, cfg)
    val q = out.writeStream.format("memory").queryName("sverify_out")
      .outputMode(OutputMode.Append()).start()
    try {
      clips.grouped(80).foreach { batch => mem.addData(batch: _*); q.processAllAvailable() }
      val streamed = canon(spark.sql("SELECT a, b FROM sverify_out"))
      // batch truth: candidates -> exact jaccard >= tau
      val sigs = spark.createDataset(clips).toDF("clip_id", "transcript")
        .select($"clip_id",
          graft.functions.minhash_text($"transcript", cfg.shingleK, cfg.numPerms).as("minhash"))
      val cands = Dedup.textCandidates(sigs, cfg)
      val withA = cands.join(payload.select($"clip_id".as("a"), $"sh".as("sh_a")), "a")
      val withB = withA.join(payload.select($"clip_id".as("b"), $"sh".as("sh_b")), "b")
      val inter = size(array_intersect($"sh_a", $"sh_b")).cast("double")
      val want = canon(withB
        .withColumn("j", inter / (size($"sh_a") + size($"sh_b") - inter))
        .where($"j" >= cfg.tau).select($"a", $"b"))
      assert(streamed == want,
        s"stream-only=${(streamed -- want).take(5)} batch-only=${(want -- streamed).take(5)}")
      assert(want.nonEmpty)
    } finally q.stop()
  }

  test("hot bucket overflows into star regime: bounded state, connected output") {
    implicit val sqlCtx = spark.sqlContext
    val cfg = DedupConfig(hotBucketLimit = 8)
    val ids = (1 to 40).map(i => f"c$i%03d")
    val mem = MemoryStream[(String, String)]
    val out = StreamingDedup.textCandidatePairs(
      mem.toDF().toDF("clip_id", "transcript"), cfg)
    val q = out.writeStream.format("memory").queryName("sdedup_hot")
      .outputMode(OutputMode.Append()).start()
    try {
      // identical transcripts: every band bucket holds all 40 ids
      ids.grouped(10).foreach { batch =>
        mem.addData(batch.map(id => (id, "the very same transcript for everyone here")): _*)
        q.processAllAvailable()
      }
      val pairs = canon(spark.sql("SELECT a, b FROM sdedup_hot"))
      // star regime caps emissions far below all-pairs (40*39/2 = 780)
      assert(pairs.size < 200, s"expected bounded star output, got ${pairs.size}")
      // and the pairs connect all 40 ids into ONE component
      val parent = scala.collection.mutable.Map.empty[String, String]
      def find(x: String): String = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(ra) = rb
      }
      assert(ids.map(find).toSet.size == 1, "star pairs must connect the whole bucket")
    } finally q.stop()
  }

  test("state TTL bounds bucket-key count under key churn") {
    // round-3 verdict #5: with NoTimeout the state-store KEY count grows
    // with every distinct bucket ever seen — unbounded on an unbounded
    // stream. With streamStateTtlMs set, idle buckets are evicted, so
    // the store holds only recently-active keys regardless of churn.
    //
    // NOTE: processAllAvailable() is unusable with ProcessingTimeTimeout —
    // FlatMapGroupsWithStateExec.shouldRunAnotherBatch keeps scheduling
    // timeout batches, so the engine never signals "no new data" and the
    // call blocks forever. The test polls StreamingQueryProgress instead,
    // and runs a real trigger interval (the busy default would spin).
    implicit val sqlCtx = spark.sqlContext
    val cfg = DedupConfig(numPerms = 16, bands = 4, rowsPerBand = 4,
      streamStateTtlMs = 2000L)
    val mem = MemoryStream[(String, String)]
    val out = StreamingDedup.textCandidatePairs(
      mem.toDF().toDF("clip_id", "transcript"), cfg)
    val q = out.writeStream.format("memory").queryName("sdedup_ttl")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100L))
      .outputMode(OutputMode.Append()).start()
    try {
      def stateKeys: Long = {
        val p = q.lastProgress
        if (p == null || p.stateOperators.isEmpty) 0L
        else p.stateOperators.head.numRowsTotal
      }
      def inputRows: Long = q.recentProgress.map(_.numInputRows).sum
      def waitUntil(what: String)(cond: => Boolean): Unit = {
        val deadline = System.currentTimeMillis + 60000
        while (!cond && System.currentTimeMillis < deadline) Thread.sleep(100)
        assert(cond, s"timed out waiting for $what")
      }
      // each round: 30 fresh distinct transcripts (plus one planted dup
      // pair so the stage still emits) -> a fresh set of bucket keys
      var perRound = List.empty[Long]
      (0 until 3).foreach { r =>
        val sofar = inputRows
        val rows = (0 until 30).map { i =>
          (f"r${r}c$i%03d", s"round $r transcript number $i with enough words to shingle")
        } :+ ((f"r${r}dup", s"round $r transcript number 0 with enough words to shingle"))
        mem.addData(rows: _*)
        waitUntil(s"round $r ingested")(inputRows >= sofar + rows.size)
        perRound ::= stateKeys
        // idle past the TTL and wait for the timeout batch to evict this
        // round's buckets before the next round arrives
        waitUntil(s"round $r evicted")(stateKeys == 0)
      }
      // every round's key count is in the same band: the store never
      // accumulates across churn rounds (3 rounds of ~30 fresh bucket-key
      // sets would otherwise triple it)
      val firstRound = perRound.last
      val lastRound = perRound.head
      assert(firstRound > 0, "state operator reported no keys at all")
      assert(lastRound <= firstRound * 3 / 2,
        s"state keys accumulated across churn rounds: first=$firstRound last=$lastRound " +
          s"(all rounds newest-first: $perRound)")
      // and the stage still pairs the planted dup within its round
      waitUntil("planted dup pair emitted")(
        spark.sql("SELECT a, b FROM sdedup_ttl").count() > 0)
    } finally q.stop()
  }

  test("single-batch hot bucket (10k identical arrivals): bounded star output, connected") {
    // round-2 verdict #6: intake must cap DURING a batch, not after a
    // full-batch sort — an exact-dup mass arriving in ONE micro-batch
    // streams through the state machine holding at most limit+1 ids.
    // Observable contract: output is O(n) star edges (never the 50M
    // all-pairs), and those edges connect all ids into one component.
    implicit val sqlCtx = spark.sqlContext
    val n = 10000
    val cfg = DedupConfig(hotBucketLimit = 8, bands = 2, rowsPerBand = 4, numPerms = 8)
    val ids = (1 to n).map(i => f"h$i%06d")
    val mem = MemoryStream[(String, String)]
    val out = StreamingDedup.textCandidatePairs(
      mem.toDF().toDF("clip_id", "transcript"), cfg)
    val q = out.writeStream.format("memory").queryName("sdedup_hot1b")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(ids.map(id => (id, "one identical transcript shared by every arrival")): _*)
      q.processAllAvailable()
      val pairs = canon(spark.sql("SELECT a, b FROM sdedup_hot1b"))
      assert(pairs.size < 3 * n, s"expected O(n) star output, got ${pairs.size}")
      val parent = scala.collection.mutable.Map.empty[String, String]
      def find(x: String): String = {
        var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
      }
      pairs.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(ra) = rb
      }
      assert(ids.map(find).toSet.size == 1, "hot-bucket stars must connect all arrivals")
    } finally q.stop()
  }
}
