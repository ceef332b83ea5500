package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit contract of the single-pass pair stage (chunk + chain + star):
  * output volume bounds, connectivity, and boundary run lengths. */
class PairRunSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def bucketsOf(n: Int, bucket: Long = 7L): org.apache.spark.sql.DataFrame =
    (0 until n).map(i => (i.toLong, bucket, 0.toByte)).toDF("sid", "bucket", "source")

  private def pairs(df: org.apache.spark.sql.DataFrame,
      hot: Int = 64, saltMax: Int = 1024): Seq[(Long, Long)] =
    Dedup.pairsFromBuckets(df, hot, saltMax).select($"a", $"b").as[(Long, Long)].collect().toSeq

  private def components(n: Int, ps: Seq[(Long, Long)]): Int = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r }
    ps.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
    }
    (0L until n.toLong).map(find).distinct.length
  }

  test("singleton and empty runs emit nothing") {
    assert(pairs(bucketsOf(1)).isEmpty)
    assert(pairs(bucketsOf(0)).isEmpty)
  }

  test("run at the chunk boundary emits the exact clique") {
    for (n <- Seq(2, 63, 64)) {
      val ps = pairs(bucketsOf(n))
      assert(ps.distinct.length == n * (n - 1) / 2, s"n=$n")
      assert(ps.forall { case (a, b) => a < b }, "pairs must be ordered")
      assert(components(n, ps) == 1)
    }
  }

  test("runs above the chunk size stay connected with bounded output") {
    for (n <- Seq(65, 128, 200, 1024)) {
      val ps = pairs(bucketsOf(n)).distinct
      // <= ceil(n/64) cliques of 64 + chain edges; never the full clique
      val chunks = math.ceil(n / 64.0).toLong
      val bound = chunks * (64L * 63 / 2) + chunks
      assert(ps.length <= bound, s"n=$n emitted ${ps.length} > $bound")
      if (n > 64) assert(ps.length < n.toLong * (n - 1) / 2, s"n=$n emitted the full clique")
      assert(components(n, ps) == 1, s"n=$n shattered")
    }
  }

  test("runs above saltMax flip to star mode: O(n) output, still one component") {
    val n = 3000
    val ps = pairs(bucketsOf(n)).distinct
    // 16 chunks of 64 before the flip + one star edge per remaining member
    val bound = 16L * (64 * 63 / 2) + 16 + (n - 1024)
    assert(ps.length <= bound, s"emitted ${ps.length} > $bound")
    assert(components(n, ps) == 1)
  }

  test("duplicate (sid, bucket) rows are ignored") {
    val dup = bucketsOf(10).union(bucketsOf(10))
    val ps = pairs(dup).distinct
    assert(ps.length == 45)
    assert(ps.forall { case (a, b) => a != b }, "self-pairs emitted for duplicate rows")
  }

  test("identical membership in many buckets is chunked differently per bucket") {
    // 200 ids in 5 buckets with hot=16: per-bucket salted order must
    // differ across buckets (same regression as the round-2 advice on
    // id-only salts) — with identical chunking the only cross-chunk
    // evidence would be the chains; different chunking also recovers
    // co-chunk pairs across buckets
    val ids = (0 until 200).map(_.toLong)
    val buckets = ids.flatMap(id => (0 until 5).map(b => (id, b.toLong, 0.toByte)))
      .toDF("sid", "bucket", "source")
    val byBucket = (0 until 5).map { b =>
      pairs(buckets.where($"bucket" === b.toLong), hot = 16).toSet
    }
    assert(byBucket.distinct.length > 1, "all buckets chunked identically")
    val all = pairs(buckets, hot = 16)
    assert(components(200, all) == 1)
  }
}
