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
    val got = ConnectedComponents.run(spark, edges.toDF("u", "v"))
      .as[(Long, Long)].collect().toMap
    val want = exactCc(edges)
    assert(got == want, s"got=${got.toSeq.sorted.take(20)} want=${want.toSeq.sorted.take(20)}")
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
    for (p <- Seq(1, 8)) {
      val got = ConnectedComponents.run(spark, edges.toDF("u", "v").repartition(p))
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"partitions=$p mismatch")
    }
  }

  test("cc on string ids: canonical cluster id is min original id") {
    val edges = Seq(("x9", "x2"), ("x2", "x5"), ("a1", "a2")).toDF("a", "b")
    val got = ConnectedComponents.runOnStrings(spark, edges, "a", "b")
      .as[(String, String)].collect().toMap
    assert(got == Map("x9" -> "x2", "x2" -> "x2", "x5" -> "x2", "a1" -> "a1", "a2" -> "a1"))
  }
}
