package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components via alternating large-star/small-star
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14) — converges in O(log^2 n) rounds, each round two
  * shuffle-friendly groupBy+join passes. Engine-new (SURVEY §2.6): the
  * north rule's union-find as an iterative DataFrame self-join.
  *
  * Scale notes (the part that must survive 10^12 edges):
  *  - each iteration is groupBy(min) + join — both hash-partitioned on the
  *    node id, so AQE can coalesce/skew-split; no driver-side state;
  *  - every round goes through `Dedup.materialize`: lineage is truncated
  *    (without that the plan doubles per iteration and Catalyst analysis
  *    time explodes, SURVEY §4 custom-work item 3), and with a checkpoint
  *    directory configured the round state is a RELIABLE checkpoint on
  *    the shared filesystem — a lost executor mid-CC cannot kill a 100TB
  *    run (the reference's whole merge protocol exists to make every
  *    stage restartable, /root/reference/src/main.rs:63-76); without a
  *    dir it falls back to executor-local blocks (test/sandbox mode);
  *  - convergence test is a cheap aggregate (sum of hashes), not collect.
  */
object ConnectedComponents {

  /** edges: two columns (src, dst) of any orderable type — long in tests,
    * struct<long,long> for the 128-bit string-id path — undirected,
    * self-loops ignored. Returns (node, component) where component = min
    * node id reachable — canonical cluster id (SURVEY §5). */
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int = 50): DataFrame = {
    import spark.implicits._

    // canonical undirected edge list, deduped, self-loops dropped
    var e = Dedup.materialize(edges.toDF("u", "v")
      .where($"u" =!= $"v")
      .select(least($"u", $"v").as("u"), greatest($"u", $"v").as("v"))
      .distinct(), StorageLevel.MEMORY_AND_DISK_SER)

    // one large-star + small-star round as a pure plan transform.
    // Each round is latency-bound at sandbox scale (every exchange is an
    // AQE query stage with a driver replan), so both stars emit their
    // pairs PRE-ORDERED instead of canonicalizing, and only small-star
    // ends with a distinct: large-star's output is at most one row per
    // input edge (duplicates only when two neighbors of v share a min),
    // so an intermediate distinct bought nothing but two stages per round.
    def round(in: DataFrame): DataFrame = {
      // large-star: for each node u, link every LARGER neighbor v to
      // m = min(N(u) ∪ {u}). m <= u < v, so (m, v) is already ordered
      // and can never be a self-loop. Keeps the graph connected,
      // strictly reduces large-id edges.
      val nbrs = in.select($"u", $"v").union(in.select($"v".as("u"), $"u".as("v")))
      val mins = nbrs.groupBy($"u").agg(least(min($"v"), first($"u")).as("m"))
      val large = nbrs.join(mins, "u")
        .where($"v" > $"u")
        .select($"m".as("u"), $"v")

      // small-star: orient to (larger, smaller) — large-star emitted
      // (m, v) with m < v, so the orientation is a column swap — and
      // link all smaller neighbors and self to the neighborhood min m2.
      // m2 <= v < u makes (m2, u) ordered; (m2, v) needs the v != m2
      // guard only.
      val oriented = large.select($"v".as("u"), $"u".as("v"))
      val mins2 = oriented.groupBy($"u").agg(min($"v").as("m"))
      oriented.join(mins2, "u")
        .select(explode(array($"u", $"v")).as("n"), $"m")
        .where($"n" =!= $"m")
        .select($"m".as("u"), $"n".as("v"))
        .distinct()
    }

    var converged = false
    var iter = 0
    val tLoop = System.nanoTime()
    // TWO rounds per materialization + probe: the driver-serial loop's
    // fixed latency (checkpoint barrier + probe job per pass) halves,
    // at worst one extra (cheap, already-converged) round pair. The
    // checkpoint still truncates lineage every pass, so the plan stays
    // bounded (CcPlanSpec). Signing the INITIAL frame (one cheap agg over
    // the just-materialized edges) lets the loop converge one full
    // materialized iteration earlier than a prev-vs-prev comparison —
    // measured 3 -> 2 round-pairs on the sf0.1 cluster graphs, and an
    // already-star-shaped input (checkpoint resume) converges in ONE.
    // (Tried and rejected: disabling AQE inside the loop — without
    // runtime stats the payload-less frames plan as sort-merge joins and
    // a 244-row confirmation pass got SLOWER, 4.1 s vs 1.6 s; AQE's
    // runtime broadcast conversion is worth its replan latency here.)
    var prevSig = signature(e)
    while (!converged && iter < maxIter) {
      val tIter = System.nanoTime()
      val next = Dedup.materialize(round(round(e)), StorageLevel.MEMORY_AND_DISK_SER)
      val tMat = System.nanoTime()
      val sig = signature(next)
      converged = sig == prevSig
      prevSig = sig
      System.err.println(f"[cc] iter $iter: materialize ${(tMat - tIter) / 1e9}%.1f s, probe ${(System.nanoTime() - tMat) / 1e9}%.1f s, rows ${sig.n}")
      e.unpersist()
      e = next
      iter += 1
    }
    require(converged, s"connected components did not converge in $maxIter iterations")
    // driver-serial loop latency is the scaling-efficiency suspect #1:
    // always log how much wall time the iterations cost
    System.err.println(
      f"[cc] converged after $iter round-pairs in ${(System.nanoTime() - tLoop) / 1e9}%.1f s")

    // after convergence every edge is (root, member); emit members + roots
    val out = e.select($"v".as("node"), $"u".as("component"))
      .union(e.select($"u".as("node"), $"u".as("component")))
      .groupBy($"node").agg(min($"component").as("component"))
    out
  }

  private case class Row2(n: Long, h: Long)

  private def signature(e: DataFrame): Row2 = {
    // bit_xor: order-independent and overflow-free under ANSI mode; the
    // edge list is distinct so xor cancellation cannot hide a change
    val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).head()
    Row2(r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Map arbitrary (string) vertex ids to 128-bit hash ids, run CC, map
    * back. 64-bit ids hit birthday collisions at the 10^12-clip target
    * (expected collisions ~ n^2/2^65 ~ 10^4 — a guaranteed abort); the
    * (h1, h2) Murmur3_x64_128 pair pushes that to ~n^2/2^129 ~ 1e-15,
    * negligible at any feasible scale, with no collision-guard pass and
    * no abort path. The generic `run` works unchanged because struct
    * columns are orderable (least/greatest/min) and hashable in Spark. */
  def runOnStrings(spark: SparkSession, edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    import spark.implicits._
    val hash128 = udf { (s: String) =>
      graft.sketch.Murmur3x64.hash128(
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        graft.sketch.Murmur3x64.DefaultSeed)
    }
    // materialized once: reused for both edge joins and the final id
    // mapping — and it cuts the upstream (possibly very expensive)
    // edge-producing plan out of the returned lineage
    val verts = Dedup.materialize(edges.select(col(aCol).as("id"))
      .union(edges.select(col(bCol).as("id")))
      .distinct()
      .withColumn("nid", hash128($"id")), StorageLevel.MEMORY_AND_DISK_SER)
    val eN = edges
      .join(verts.select($"id".as(aCol), $"nid".as("u")), aCol)
      .join(verts.select($"id".as(bCol), $"nid".as("v")), bCol)
      .select($"u", $"v")
    val cc = run(spark, eN)
    // component representative = min ORIGINAL id in the component (stable,
    // partition-invariant cluster ids; SURVEY §5)
    val withIds = cc.join(verts.select($"nid".as("node"), $"id"), "node")
    val reps = withIds.groupBy($"component").agg(min($"id").as("cluster_id"))
    withIds.join(reps, "component").select($"id".as("clip_id"), $"cluster_id")
  }
}
