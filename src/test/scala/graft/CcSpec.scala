package graft

import graft.pipeline.ConnectedComponents
import org.scalatest.funsuite.AnyFunSuite

class CcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Driver-side exact union-find oracle. */
  private def exactCc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def check(edges: Seq[(Long, Long)]): Unit = {
    val want = exactCc(edges)
    // both paths must agree with the exact oracle: default threshold
    // (small frame -> driver union-find) and 0 (forced distributed rounds)
    for (thr <- Seq(ConnectedComponents.DefaultLocalEdgeThreshold, 0L)) {
      val got = ConnectedComponents.run(spark, edges.toDF("u", "v"),
          localEdgeThreshold = thr)
        .as[(Long, Long)].collect().toMap
      assert(got == want,
        s"thr=$thr got=${got.toSeq.sorted.take(20)} want=${want.toSeq.sorted.take(20)}")
    }
  }

  test("cc: chains, cliques, singleton-free, star, disjoint") {
    check(Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)))
    check(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L)))
    check((1L to 100L).map(i => (i, i + 1))) // long chain: stresses iteration count
    check(Seq((5L, 1L), (5L, 2L), (5L, 3L)))
    check(Seq.tabulate(50)(i => (i * 2L, i * 2L + 1L))) // 50 disjoint pairs
  }

  test("cc: random graph matches exact union-find at multiple partition counts") {
    val rnd = new scala.util.Random(13)
    val edges = Seq.fill(2000)((rnd.nextInt(500).toLong, rnd.nextInt(500).toLong))
      .filter { case (a, b) => a != b }
    val want = exactCc(edges)
    for (p <- Seq(1, 8); thr <- Seq(ConnectedComponents.DefaultLocalEdgeThreshold, 0L)) {
      val got = ConnectedComponents.run(spark, edges.toDF("u", "v").repartition(p),
          localEdgeThreshold = thr)
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"partitions=$p thr=$thr mismatch")
    }
  }

  test("cc: mid-loop local finish (shrinking frame crosses the threshold) is exact") {
    // ~1900 distinct canonical edges over 500 nodes: above threshold 600 at
    // round 0, far below it after one star round-pair — exercises the
    // in-loop handoff where the collected frame is a round OUTPUT, not the
    // input graph (connectivity + vertex set must be round-invariant)
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(2500)((rnd.nextInt(500).toLong, rnd.nextInt(500).toLong))
      .filter { case (a, b) => a != b }
    val buf = new java.io.ByteArrayOutputStream()
    val prev = System.err
    val got =
      try {
        System.setErr(new java.io.PrintStream(buf, true, "UTF-8"))
        ConnectedComponents.run(spark, edges.toDF("u", "v"), localEdgeThreshold = 600L)
          .as[(Long, Long)].collect().toMap
      } finally System.setErr(prev)
    assert(got == exactCc(edges))
    val log = buf.toString("UTF-8")
    assert(log.contains("local finish after"),
      s"expected the mid-loop local handoff to fire, log:\n$log")
  }

  test("cc: already-star-shaped input converges in one round pair") {
    // the upfront input signature lets a converged frame (e.g. checkpoint
    // resume re-running CC over its own output edges) stop after a single
    // materialized round pair instead of two
    val stars = Seq((1L, 2L), (1L, 3L), (1L, 4L), (10L, 11L), (10L, 12L))
    // the [cc] loop logs go through System.err (not scala.Console), so
    // capture by swapping the JVM stream
    val buf = new java.io.ByteArrayOutputStream()
    val prev = System.err
    val got =
      try {
        System.setErr(new java.io.PrintStream(buf, true, "UTF-8"))
        // threshold 0: the single-round-pair convergence claim is about
        // the DISTRIBUTED loop's upfront input signature
        ConnectedComponents.run(spark, stars.toDF("u", "v"), localEdgeThreshold = 0L)
          .as[(Long, Long)].collect().toMap
      } finally System.setErr(prev)
    assert(got == exactCc(stars))
    val log = buf.toString("UTF-8")
    assert(log.contains("converged after 1 round-pairs"),
      s"expected single-round-pair convergence, log:\n$log")
  }

  test("cc intermediates are RELIABLY checkpointed when a checkpoint dir is set") {
    // the round-2 scale-killer: CC used executor-local checkpoints even
    // when the session had a reliable checkpoint dir — one lost executor
    // mid-CC would kill a 100TB run. Every round must now go through the
    // dir-aware materialize: with a dir configured, checkpoint files land
    // under it DURING the run.
    val sc = spark.sparkContext
    val bridge = org.apache.spark.graft.CheckpointDirBridge
    val before = bridge.get(sc)
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toFile
    sc.setCheckpointDir(dir.toString)
    try {
      val edges = ((1L to 40L).map(i => (i, i + 1)) ++ Seq((100L, 101L))).toDF("u", "v")
      // threshold 0: round-state checkpointing is a distributed-loop property
      val got = ConnectedComponents.run(spark, edges, localEdgeThreshold = 0L)
        .as[(Long, Long)].collect().toMap
      val want = exactCc((1L to 40L).map(i => (i, i + 1)) ++ Seq((100L, 101L)))
      assert(got == want)
      def countFiles(f: java.io.File): Int =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).map(countFiles).sum
        else 1
      assert(countFiles(dir) > 0, "no reliable checkpoint files written during CC")
    } finally {
      bridge.set(sc, before)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(dir)
    }
  }

  test("cc on string ids: canonical cluster id is min original id") {
    val edges = Seq(("x9", "x2"), ("x2", "x5"), ("a1", "a2")).toDF("a", "b")
    val want = Map("x9" -> "x2", "x2" -> "x2", "x5" -> "x2", "a1" -> "a1", "a2" -> "a1")
    // both paths on the struct<long,long> hash-id plane
    for (thr <- Seq(ConnectedComponents.DefaultLocalEdgeThreshold, 0L)) {
      val got = ConnectedComponents.runOnStrings(spark, edges, "a", "b",
          localEdgeThreshold = thr)
        .as[(String, String)].collect().toMap
      assert(got == want, s"thr=$thr")
    }
  }
}
