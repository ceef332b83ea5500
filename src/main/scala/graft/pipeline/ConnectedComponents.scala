package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
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
  *  - convergence test is a cheap aggregate (sum of hashes), not collect;
  *  - HYBRID finisher: a frame at or below `localEdgeThreshold` distinct
  *    edges (initially, or after any round-pair as the stars collapse) is
  *    closed by one collect + driver union-find instead of more rounds.
  *    Each distributed round-pair costs seconds of driver-serial latency
  *    regardless of rows; at the threshold the collect is ~64 MB. The
  *    distributed rounds remain the path for big frames and are pinned by
  *    CcSpec/CcPlanSpec at threshold 0.
  */
object ConnectedComponents {

  /** Below this many distinct canonical edges the remaining closure is
    * latency-bound, not throughput-bound: each distributed round-pair costs
    * a fixed several seconds of driver-serial scheduling (checkpoint
    * barrier + AQE replans per exchange) regardless of row count, while a
    * driver union-find over 2M (long,long) edges is ~64 MB collected and
    * milliseconds of compute. Verified-duplicate edge frames are SPARSE —
    * only actual duplicates produce edges — so even very large corpora
    * often finish here; frames above the threshold run the log-round star
    * algorithm, and a shrinking frame drops into the local finisher the
    * moment it crosses the line. */
  val DefaultLocalEdgeThreshold = 2000000L

  /** edges: two columns (src, dst) of any orderable type — long in tests,
    * struct<long,long> for the 128-bit string-id path — undirected,
    * self-loops ignored. Returns (node, component) where component = min
    * node id reachable — canonical cluster id (SURVEY §5).
    *
    * localEdgeThreshold: frames at or below this edge count are closed by
    * a single-collect driver union-find instead of distributed rounds
    * (0 forces the distributed path — used by the plan/checkpoint specs). */
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int = 50,
      localEdgeThreshold: Long = DefaultLocalEdgeThreshold): DataFrame = {
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
    if (localFinishable(e, prevSig.n, localEdgeThreshold)) {
      System.err.println(s"[cc] local finish: ${prevSig.n} edges <= $localEdgeThreshold")
      return localFinish(spark, e)
    }
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
      // star rounds collapse the frame toward (root, member) stars —
      // once the survivor set fits, one collect beats more latency-bound
      // round-pairs (connectivity and the vertex set are round-invariant)
      if (!converged && localFinishable(e, sig.n, localEdgeThreshold)) {
        System.err.println(s"[cc] local finish after $iter round-pairs: ${sig.n} edges <= $localEdgeThreshold")
        return localFinish(spark, e)
      }
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

  /** The local finisher handles the two vertex types the engine produces
    * (long test ids, struct<long,long> 128-bit hash ids); anything else
    * stays on the distributed path. */
  private def localFinishable(e: DataFrame, n: Long, threshold: Long): Boolean =
    n <= threshold && (e.schema("u").dataType match {
      case LongType => true
      case st: StructType =>
        st.fields.length == 2 && st.fields.forall(_.dataType == LongType)
      case _ => false
    })

  /** Single-collect driver union-find over a small (already canonical,
    * distinct, persisted) edge frame. Output contract and component
    * labels (min reachable node, Spark's struct ordering = lexicographic
    * on the two longs) are identical to the distributed path — CcSpec
    * asserts both paths against the same exact oracle. */
  private def localFinish(spark: SparkSession, e: DataFrame): DataFrame = {
    import spark.implicits._
    val dt = e.schema("u").dataType
    dt match {
      case LongType =>
        val edges = e.collect().map(r => (r.getLong(0), r.getLong(1)))
        e.unpersist()
        unionFind(edges).toSeq.toDF("node", "component")
      case _ =>
        val edges = e.collect().map { r =>
          val a = r.getStruct(0); val b = r.getStruct(1)
          ((a.getLong(0), a.getLong(1)), (b.getLong(0), b.getLong(1)))
        }
        e.unpersist()
        val rows = unionFind(edges).map { case ((n1, n2), (c1, c2)) =>
          Row(Row(n1, n2), Row(c1, c2))
        }
        val schema = StructType(Seq(
          StructField("node", dt, nullable = false),
          StructField("component", dt, nullable = false)))
        // ~50k struct rows (~1 MB serialized) per task: parallelize ships
        // each partition inside the task closure, and the earlier 500k
        // chunking drew "task of very large size" warnings at the 2M-edge
        // threshold (11.8 MiB tasks in the 600k-clip bench)
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toIndexedSeq,
            math.max(1, rows.length / 50000)),
          schema)
    }
  }

  /** (node, min node in its component) for every distinct endpoint —
    * path-halving union-find with union-by-min-index, O(E α(V)). */
  private def unionFind[T](edges: Array[(T, T)])(
      implicit ord: Ordering[T]): Array[(T, T)] = {
    val idx = new java.util.HashMap[T, Integer](edges.length * 2)
    val keys = new scala.collection.mutable.ArrayBuffer[T]
    def id(k: T): Int = {
      val got = idx.get(k)
      if (got != null) got.intValue
      else { val i = keys.length; idx.put(k, i); keys += k; i }
    }
    val ids = edges.map { case (a, b) => (id(a), id(b)) }
    val parent = Array.tabulate(keys.length)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    ids.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val minOf = new java.util.HashMap[Integer, T]
    var i = 0
    while (i < keys.length) {
      val r = find(i)
      val cur = minOf.get(r)
      if (cur == null || ord.lt(keys(i), cur)) minOf.put(r, keys(i))
      i += 1
    }
    Array.tabulate(keys.length) { k => (keys(k), minOf.get(find(k))) }
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
  def runOnStrings(spark: SparkSession, edges: DataFrame, aCol: String, bCol: String,
      localEdgeThreshold: Long = DefaultLocalEdgeThreshold): DataFrame = {
    import spark.implicits._
    // persist + count once: the cache makes the count pass free for the
    // big path too (verts + edge relabeling consumed this frame twice
    // already), and a small frame short-circuits the ENTIRE hash-id plane —
    // no verts checkpoint, no 4 relabeling/representative joins, and the
    // component representative (min ORIGINAL string id) falls directly out
    // of the union-find. Cluster labels are identical to the distributed
    // path by construction (CcSpec pins both).
    val cached = edges.select(col(aCol), col(bCol))
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    val nEdges = cached.count()
    if (nEdges <= localEdgeThreshold) {
      val pairs = cached.collect()
        .map(r => (r.getString(0), r.getString(1)))
        .filter { case (a, b) => a != b } // self-loops: same drop as run()
      cached.unpersist(blocking = false)
      System.err.println(s"[cc] local finish (string ids): $nEdges edges <= $localEdgeThreshold")
      return unionFind(pairs).toSeq.toDF("clip_id", "cluster_id")
    }
    val hash128 = udf { (s: String) =>
      graft.sketch.Murmur3x64.hash128(
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        graft.sketch.Murmur3x64.DefaultSeed)
    }
    // materialized once: reused for both edge joins and the final id
    // mapping — and it cuts the upstream (possibly very expensive)
    // edge-producing plan out of the returned lineage
    val verts = Dedup.materialize(cached.select(col(aCol).as("id"))
      .union(cached.select(col(bCol).as("id")))
      .distinct()
      .withColumn("nid", hash128($"id")), StorageLevel.MEMORY_AND_DISK_SER)
    val eN = cached
      .join(verts.select($"id".as(aCol), $"nid".as("u")), aCol)
      .join(verts.select($"id".as(bCol), $"nid".as("v")), bCol)
      .select($"u", $"v")
    val cc = run(spark, eN, localEdgeThreshold = localEdgeThreshold)
    // run() eagerly materialized eN's canonical frame, so the edge cache
    // is out of every remaining lineage (cc is built on converged state,
    // the joins below on verts)
    cached.unpersist(blocking = false)
    // component representative = min ORIGINAL id in the component (stable,
    // partition-invariant cluster ids; SURVEY §5)
    val withIds = cc.join(verts.select($"nid".as("node"), $"id"), "node")
    val reps = withIds.groupBy($"component").agg(min($"id").as("cluster_id"))
    withIds.join(reps, "component").select($"id".as("clip_id"), $"cluster_id")
  }
}
