package graft.pipeline

import graft.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection + clustering pipeline configuration.
  *
  * Mirrors how the reference pins lg_k/seed as compile-time defaults
  * (/root/reference/datasketches-cpp/cpc/include/cpc_common.hpp:31,
  * common_defs.hpp:30): one immutable config drives every stage, so
  * results are reproducible at identical shingle/signature config
  * (north_rule requirement).
  *
  * At b=32 bands x r=4 rows (128 perms), a pair at Jaccard 0.8 collides
  * with p = 1-(1-0.8^4)^32 = 0.99999994 -> recall >= 0.99 holds with big
  * margin at the tau=0.8 decision boundary.
  */
final case class DedupConfig(
    shingleK: Int = 5,          // char k-grams over transcripts
    numPerms: Int = 128,
    bands: Int = 32,
    rowsPerBand: Int = 4,
    tau: Double = 0.8,          // exact-Jaccard verify threshold
    containmentTau: Double = 0.9, // substring-containment verify threshold
    simhashChunks: Int = 4,     // 16-bit blocks -> catches Hamming <= 3
    simhashMaxHamming: Int = 3,
    audioBands: Int = 64,
    audioRowsPerBand: Int = 2,  // loose bands: p>=0.9998 at the audioTau boundary
    audioTau: Double = 0.35,    // frame-set Jaccard threshold (robust fp)
    hotBucketLimit: Int = 64    // band buckets larger than this use star pairing
)

/** The pipeline. Every stage is a pure DataFrame -> DataFrame map or a
  * keyed aggregation; candidate generation never compares all pairs.
  *
  * Scale design (the 100TB story, SURVEY §3.4/§4):
  *  - signatures: ONE map pass over clips, no shuffle — minhash, simhash
  *    and the audio fingerprint are computed per row;
  *  - candidates: explode to (band_id, band_hash) and self-pair within
  *    buckets. Buckets above `hotBucketLimit` (exact-dup masses, hot
  *    shingles) switch from O(n^2) all-pairs to O(n) star pairing, which
  *    preserves connectivity (CC recovers the clique) while bounding
  *    output — the "skew-aware band-bucket splitting" of the north rule;
  *  - verify: joins candidates back to payloads by id — sort-merge on the
  *    id, the only big join, and it's start-shaped not quadratic;
  *  - CC: see ConnectedComponents (log-round star algorithm).
  */
object Dedup {

  /** Stage 1: per-row signatures. clips(clip_id, bytes, sr_hz, dur_ms,
    * codec, transcript) -> (clip_id, minhash, simhash, audio_minhash). */
  def signatures(clips: DataFrame, cfg: DedupConfig): DataFrame =
    clips.select(
      col("clip_id"),
      minhash_text(col("transcript"), lit(cfg.shingleK), lit(cfg.numPerms)).as("minhash"),
      simhash_text(col("transcript")).as("simhash"),
      minhash_of_hashes(
        audio_fp_hashes(col("bytes"), col("codec"), col("sr_hz")), lit(cfg.numPerms)
      ).as("audio_minhash"),
      length(col("transcript")).as("t_len"))

  /** Generic LSH bucket -> candidate pair stage with skew-aware splitting.
    * input: (clip_id, bucket LONG); output: (a, b) with a < b. */
  def pairsFromBuckets(buckets: DataFrame, hotBucketLimit: Int, source: String): DataFrame = {
    // bucket sizes via partial-agg groupBy (map-side combine), NOT a window:
    // a window would buffer whole hot buckets in one task
    val sizes = buckets.groupBy(col("bucket")).agg(count(lit(1)).as("bsize"))
    val sized = buckets.join(sizes, "bucket")
    // small buckets: all pairs via self-join (bucket sizes are tiny for
    // honest near-dups, so the join fan-out is bounded)
    val small = sized.where(col("bsize") <= hotBucketLimit).select(col("bucket"), col("clip_id"))
    val sl = small.select(col("bucket"), col("clip_id").as("a"))
    val sr = small.select(col("bucket"), col("clip_id").as("b"))
    val smallPairs = sl.join(sr, "bucket").where(col("a") < col("b")).select(col("a"), col("b"))
    // hot buckets: star pairing around the bucket-min member — O(n) edges,
    // same connected components
    val hot = sized.where(col("bsize") > hotBucketLimit).select(col("bucket"), col("clip_id"))
    val hubs = hot.groupBy(col("bucket")).agg(min(col("clip_id")).as("a"))
    val hotPairs = hot.join(hubs, "bucket")
      .where(col("clip_id") =!= col("a"))
      .select(col("a"), col("clip_id").as("b"))
    smallPairs.union(hotPairs).withColumn("source", lit(source))
  }

  /** Stage 2a: text-LSH candidates from minhash band collisions. */
  def textCandidates(sigs: DataFrame, cfg: DedupConfig): DataFrame = {
    val bands = sigs.select(
      col("clip_id"),
      posexplode(band_hashes(col("minhash"), lit(cfg.bands), lit(cfg.rowsPerBand)))
        .as(Seq("band_id", "band_hash")))
      // band id folded into the hash -> one shuffle key column
      .select(col("clip_id"),
        xxhash64(col("band_id"), col("band_hash")).as("bucket"))
    pairsFromBuckets(bands, cfg.hotBucketLimit, "minhash")
  }

  /** Stage 2b: SimHash Hamming-bucket candidates. */
  def simhashCandidates(sigs: DataFrame, cfg: DedupConfig): DataFrame = {
    val buckets = sigs.select(
      col("clip_id"), col("simhash"),
      explode(simhash_buckets(col("simhash"), lit(cfg.simhashChunks))).as("bucket"))
    // carry simhash through so verify can Hamming-filter cheaply
    val sized = buckets.select(col("bucket"), col("clip_id"), col("simhash"))
    val l = sized.select(col("bucket"), col("clip_id").as("a"), col("simhash").as("sim_a"))
    val r = sized.select(col("bucket"), col("clip_id").as("b"), col("simhash").as("sim_b"))
    l.join(r, "bucket")
      .where(col("a") < col("b"))
      .where(hamming(col("sim_a"), col("sim_b")) <= cfg.simhashMaxHamming)
      .select(col("a"), col("b"))
      .withColumn("source", lit("simhash"))
  }

  /** Stage 2c: audio fingerprint candidates from audio-minhash bands. */
  def audioCandidates(sigs: DataFrame, cfg: DedupConfig): DataFrame = {
    val bands = sigs.select(
      col("clip_id"),
      posexplode(band_hashes(col("audio_minhash"), lit(cfg.audioBands), lit(cfg.audioRowsPerBand)))
        .as(Seq("band_id", "band_hash")))
      .select(col("clip_id"),
        xxhash64(lit("audio"), col("band_id"), col("band_hash")).as("bucket"))
    pairsFromBuckets(bands, cfg.hotBucketLimit, "audio")
  }

  /** Stage 2d: containment candidates — transcripts whose shingles are
    * contained in longer ones (substring/prefix duplicates; the suffix-
    * array pass of the north star, SURVEY §7.6 risk 1). Containment >= 0.9
    * dilutes Jaccard to ~len_short/len_long, so the tau-tuned main bands
    * under-fire; loose r=2 bands over the same signature recover recall
    * down to J ~ 0.5 (p = 1-(1-J^2)^8 = 0.97 at J=0.5, multiplied with the
    * main-band probability). Verification is exact shingle containment. */
  def containmentCandidates(sigs: DataFrame, cfg: DedupConfig): DataFrame = {
    val bands = sigs.select(
      col("clip_id"),
      posexplode(band_hashes(col("minhash"), lit(8), lit(2)))
        .as(Seq("band_id", "band_hash")))
      .select(col("clip_id"),
        xxhash64(lit("cont"), col("band_id"), col("band_hash")).as("bucket"))
    pairsFromBuckets(bands, cfg.hotBucketLimit, "containment")
  }

  def candidates(sigs: DataFrame, cfg: DedupConfig): DataFrame =
    textCandidates(sigs, cfg)
      .unionByName(simhashCandidates(sigs, cfg))
      .unionByName(audioCandidates(sigs, cfg))
      .unionByName(containmentCandidates(sigs, cfg))
      .groupBy(col("a"), col("b"))
      .agg(collect_set(col("source")).as("sources"))

  /** Stage 3: exact verification. Joins payloads back by id (sort-merge on
    * clip_id — the only wide join) and keeps pairs passing any criterion:
    * exact shingle-Jaccard >= tau, shingle containment >= containmentTau,
    * or audio frame-set Jaccard >= audioTau. */
  def verify(clips: DataFrame, cands: DataFrame, cfg: DedupConfig): DataFrame = {
    val payload = clips.select(
      col("clip_id"), col("transcript"),
      audio_fp_hashes(col("bytes"), col("codec"), col("sr_hz")).as("afp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val withA = cands.join(payload.select(col("clip_id").as("a"),
      col("transcript").as("text_a"), col("afp").as("afp_a")), "a")
    val withB = withA.join(payload.select(col("clip_id").as("b"),
      col("transcript").as("text_b"), col("afp").as("afp_b")), "b")
    val jac = exact_jaccard(col("text_a"), col("text_b"), lit(cfg.shingleK))
    val cont = exact_containment(col("text_a"), col("text_b"), lit(cfg.shingleK))
    val audioJac = array_jaccard(col("afp_a"), col("afp_b"))
    withB
      .withColumn("jaccard", jac)
      .withColumn("containment", cont)
      .withColumn("audio_jaccard", audioJac)
      .where(col("jaccard") >= cfg.tau ||
        col("containment") >= cfg.containmentTau ||
        col("audio_jaccard") >= cfg.audioTau)
      .select(col("a"), col("b"), col("sources"), col("jaccard"), col("containment"), col("audio_jaccard"))
  }

  /** Stage 4: clusters from verified edges via large-star/small-star CC.
    * cluster_id = min clip_id in the cluster (canonical; SURVEY §5).
    * Unmatched clips keep themselves as singleton clusters. */
  def clusters(spark: SparkSession, clips: DataFrame, edges: DataFrame): DataFrame = {
    // verified edges are consumed twice inside CC (vertex dictionary +
    // edge relabeling): persist so verification runs once
    val e = edges.select(col("a"), col("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cc = ConnectedComponents.runOnStrings(spark, e, "a", "b")
    clips.select(col("clip_id"))
      .join(cc, Seq("clip_id"), "left")
      .select(col("clip_id"), coalesce(col("cluster_id"), col("clip_id")).as("cluster_id"))
  }

  /** Whole pipeline, batch mode, no checkpointing (see Checkpointed for
    * the resumable variant). */
  def run(spark: SparkSession, clips: DataFrame, cfg: DedupConfig = DedupConfig()): DataFrame = {
    // four candidate stages each consume sigs: persist so the signature
    // map pass (incl. audio decode + fingerprint) runs once. In the
    // checkpointed variant this is a table write instead (SURVEY §3.4:
    // explicit materialization barrier = the --raw/--merge seam).
    val sigs = signatures(clips, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cands = candidates(sigs, cfg)
      val edges = verify(clips, cands, cfg)
      clusters(spark, clips, edges)
    } finally {
      // lazily unpersisted: the returned plan may still reference sigs;
      // blocking=false defers actual eviction to job end
      sigs.unpersist(false)
    }
  }

  /** Resumable variant: every stage is committed to a checkpoint table
    * keyed by the config hash; a restarted run reuses published snapshots
    * and recomputes only what is missing (north rule: "resumable from
    * checkpoint with per-partition lineage + metrics"). The table write
    * is the explicit materialization barrier — the promoted form of the
    * reference's --raw/--merge seam (SURVEY §1.2). */
  def runCheckpointed(spark: SparkSession, clips: DataFrame, cfg: DedupConfig,
      checkpointRoot: String): DataFrame = {
    val io = new graft.io.TableIO(spark, checkpointRoot)
    val h = graft.io.TableIO.configHash(cfg)
    val sigs = io.readOrCompute("signatures", h)(signatures(clips, cfg))
    val cands = io.readOrCompute("candidates", h)(candidates(sigs, cfg))
    val edges = io.readOrCompute("edges", h)(verify(clips, cands, cfg))
    io.readOrCompute("clusters", h)(clusters(spark, clips, edges))
  }

  /** Exact Jaccard over two pre-computed hash arrays (audio frame sets) —
    * built-in expression combo, stays in codegen. */
  private def array_jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val uni = size(a) + size(b) - inter
    when(uni === 0, lit(1.0)).otherwise(inter.cast("double") / uni.cast("double"))
  }
}
