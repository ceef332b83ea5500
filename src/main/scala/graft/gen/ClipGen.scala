package graft.gen

import graft.audio.Pcm
import graft.sketch.Murmur3x64
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** One row of the north-star input table (BASELINE.json input_hint). */
final case class Clip(
    clip_id: String,
    bytes: Array[Byte],
    sr_hz: Int,
    dur_ms: Int,
    codec: String,
    transcript: String)

/** Deterministic synthetic clips generator with planted duplicate groups
  * (FIXTURES.md §1). Everything derives from (seed, index) through
  * SplitMix64 streams, so the table is identical at any parallelism and
  * across runs — generated distributed (one task per id range), never on
  * the driver.
  *
  * Group layout per base index: group size s in {1,1,1,1,2,2,3,4,8 cycle};
  * member 0 is the original; members 1..s-1 are perturbations:
  *   1 -> exact copy (audio + transcript)
  *   2 -> transcript ~2% word edits (MinHash path), same audio
  *   3 -> audio gain 0.8x + noise at SNR 35dB (fingerprint path), same text
  *   4 -> transcript 60% prefix (containment path), same audio
  *   5+ -> exact copies
  * ~10% of rows additionally share one "hot" sentence to exercise
  * skew-aware band handling (FIXTURES knob "skew").
  */
object ClipGen {

  private val Vocab: Array[String] = {
    // seeded synthetic vocabulary. Size matters: at 512 words, random
    // 40-word transcripts across 50k clips shared so many 2-3 word
    // phrases that winnow/containment buckets filled with cross-doc
    // junk and the verify join became shuffle-bound. 8192 words gives
    // phrase-collision rates closer to real speech transcripts.
    (0 until 8192).map { i =>
      val len = 3 + (Murmur3x64.mix64(i.toLong + 7) & 5).toInt
      val s = new StringBuilder
      var st = Murmur3x64.mix64(0xC0FFEEL + i)
      (0 until len).foreach { _ =>
        st = Murmur3x64.mix64(st)
        s.append(('a' + ((st & 0x7fffffff) % 26)).toChar)
      }
      s.toString
    }.toArray
  }

  private val HotSentence =
    "the quick brown fox jumps over the lazy dog again and again"

  private final class Rng(var state: Long) {
    def nextLong(): Long = { state = Murmur3x64.mix64(state); state }
    def nextInt(bound: Int): Int = ((nextLong() >>> 1) % bound).toInt
    def nextDouble(): Double = (nextLong() >>> 11).toDouble / (1L << 53).toDouble
  }

  private def groupSize(g: Long): Int =
    Array(1, 1, 1, 1, 2, 2, 3, 4, 8)((g % 9).toInt)

  private def baseTranscript(rng: Rng, hot: Boolean): String = {
    val n = 20 + rng.nextInt(41) // 20..60 words
    val sb = new StringBuilder
    (0 until n).foreach { i =>
      if (i > 0) sb.append(' ')
      sb.append(Vocab(rng.nextInt(Vocab.length)))
    }
    if (hot) sb.append(' ').append(HotSentence)
    sb.toString
  }

  private def baseAudio(rng: Rng, srHz: Int, durMs: Int): Array[Double] = {
    val n = srHz * durMs / 1000
    val out = new Array[Double](n)
    // speech-like time-VARYING signal: three tones whose frequencies and
    // amplitudes re-draw every ~120 ms (seeded), plus low noise. Stationary
    // sinusoids made every frame fingerprint identical, which destroyed
    // fingerprint discrimination across clips (two clips agreeing on one
    // spectral mask agreed everywhere); varying content gives each clip a
    // distinctive fingerprint sequence like real audio has.
    val seg = math.max(1, srHz * 120 / 1000)
    var f1 = 0.0; var f2 = 0.0; var f3 = 0.0
    var a1 = 0.0; var a2 = 0.0; var a3 = 0.0
    var p1 = 0.0; var p2 = 0.0; var p3 = 0.0
    var i = 0
    while (i < n) {
      if (i % seg == 0) {
        f1 = 150 + rng.nextInt(900); a1 = 0.30 + rng.nextDouble() * 0.25
        f2 = 900 + rng.nextInt(2200); a2 = 0.10 + rng.nextDouble() * 0.20
        f3 = 250 + rng.nextInt(700); a3 = 0.05 + rng.nextDouble() * 0.15
      }
      p1 += 2 * math.Pi * f1 / srHz
      p2 += 2 * math.Pi * f2 / srHz
      p3 += 2 * math.Pi * f3 / srHz
      out(i) = a1 * math.sin(p1) + a2 * math.sin(p2) + a3 * math.sin(p3) +
        0.004 * ((rng.nextLong() >> 12).toDouble / (1L << 51).toDouble)
      i += 1
    }
    out
  }

  private def perturbTranscript(rng: Rng, text: String): String = {
    val words = text.split(' ')
    val out = words.clone()
    val edits = math.max(1, words.length / 50) // ~2%
    (0 until edits).foreach { _ =>
      out(rng.nextInt(words.length)) = Vocab(rng.nextInt(Vocab.length))
    }
    out.mkString(" ")
  }

  private def addNoiseAtSnr(rng: Rng, samples: Array[Double], snrDb: Double, gain: Double): Array[Double] = {
    var sig = 0.0
    samples.foreach(s => sig += s * s)
    val noisePow = (sig / samples.length) * math.pow(10.0, -snrDb / 10.0)
    val amp = math.sqrt(3.0 * noisePow) // uniform [-amp, amp] has power amp^2/3
    samples.map { s =>
      gain * s + amp * ((rng.nextLong() >> 12).toDouble / (1L << 51).toDouble)
    }
  }

  /** All members of planted group `g`, deterministically. */
  def group(seed: Long, g: Long): Seq[(Clip, Long)] = {
    val s = groupSize(g)
    val rng = new Rng(Murmur3x64.mix64(seed ^ (g * 0x9E3779B97F4A7C15L)))
    val hot = rng.nextDouble() < 0.10
    val srHz = if (rng.nextDouble() < 0.5) 8000 else 16000
    val durMs = 300 + rng.nextInt(1200)
    val text0 = baseTranscript(rng, hot)
    val audio0 = baseAudio(rng, srHz, durMs)
    (0 until s).map { m =>
      val id = f"c${g}%09d_$m"
      val (text, audio) = m match {
        case 0 => (text0, audio0)
        case 2 => (perturbTranscript(new Rng(rng.nextLong()), text0), audio0)
        // audio-only duplicate: unrelated transcript, same (perturbed)
        // audio -> only the fingerprint path can link it
        case 3 => (baseTranscript(new Rng(rng.nextLong()), hot = false),
          addNoiseAtSnr(new Rng(rng.nextLong()), audio0, 35.0, 0.8))
        case 4 => (text0.split(' ').take(math.max(5, (text0.split(' ').length * 6) / 10)).mkString(" "), audio0)
        // mid-slice substring (non-prefix containment: the winnowing /
        // suffix-array path is the only candidate source for it when the
        // slice is short)
        case 5 =>
          val ws = text0.split(' ')
          val from = ws.length / 4
          (ws.slice(from, from + math.max(6, (ws.length * 4) / 10)).mkString(" "),
            baseAudio(new Rng(rng.nextLong()), srHz, durMs)) // unrelated audio
        case _ => (text0, audio0)
      }
      (Clip(id, Pcm.encodePcmS16le(audio), srHz, durMs, Pcm.CodecPcmS16le, text), g)
    }
  }

  /** Transcript-only members of planted group `g` (no audio synthesis —
    * its own seeded stream, so contents differ from group() at the same
    * seed, but the group structure and perturbation modes are identical).
    * `hotFrac` controls the planted skew knob: the fraction of groups that
    * append the shared hot sentence (a genuine >=47-char shared span, so
    * under EXACT substring semantics hot docs form a quadratic qualifying
    * pair set by construction — pass 0.0 to measure engine cost scaling
    * without an output-bound term). */
  private def textGroup(seed: Long, g: Long, hotFrac: Double): Seq[(String, String)] = {
    val s = groupSize(g)
    val rng = new Rng(Murmur3x64.mix64(seed ^ (g * 0x9E3779B97F4A7C15L) ^ 0x7E57AB1EL))
    val hot = rng.nextDouble() < hotFrac
    val text0 = baseTranscript(rng, hot)
    (0 until s).map { m =>
      val id = f"t${g}%09d_$m"
      val text = m match {
        case 0 => text0
        case 2 => perturbTranscript(new Rng(rng.nextLong()), text0)
        case 3 => baseTranscript(new Rng(rng.nextLong()), hot = false)
        case 4 => text0.split(' ').take(math.max(5, (text0.split(' ').length * 6) / 10)).mkString(" ")
        case 5 =>
          val ws = text0.split(' ')
          val from = ws.length / 4
          ws.slice(from, from + math.max(6, (ws.length * 4) / 10)).mkString(" ")
        case _ => text0
      }
      (id, text)
    }
  }

  /** Distributed transcript-only corpus (clip_id, transcript) with the
    * same planted duplicate/substring structure as generate() but no audio
    * — the input for text-path scale benches (SpanScalingBench). */
  def generateTexts(spark: SparkSession, nDocs: Int, seed: Long = 42L,
      numPartitions: Int = 32, hotFrac: Double = 0.10): DataFrame = {
    import spark.implicits._
    val nGroups = math.max(1, (nDocs * 9) / 23)
    spark.range(0, nGroups, 1, numPartitions)
      .flatMap(g => textGroup(seed, g, hotFrac))
      .toDF("clip_id", "transcript")
  }

  /** Distributed synthetic embedding corpus (vec_id, embedding float[dim])
    * with planted near-duplicates: every vec_id with id % 4 == 1 is a
    * noisy copy of id-1 (cosine >= ~0.97 by construction — noise amplitude
    * 0.12 of a unit-scale uniform vector), everything else is an
    * independent uniform[-1,1] vector (pairwise cosine ~ N(0, 1/sqrt(dim))).
    * Deterministic per (seed, id, dim); the input for embedding-path scale
    * benches (AnnScalingBench). */
  def generateEmbeddings(spark: SparkSession, n: Int, dim: Int, seed: Long = 42L,
      numPartitions: Int = 32): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, numPartitions).map { idBoxed =>
      val id: Long = idBoxed
      def u(s: Long, j: Int): Float = {
        val h = graft.sketch.Murmur3x64.mix64(s ^ (j.toLong * 0x9E3779B97F4A7C15L))
        ((h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0).toFloat
      }
      val base: Long = if (id % 4 == 1) id - 1 else id
      val v = Array.tabulate(dim)(j => u(seed ^ (base * 0x100000001B3L), j))
      if (id % 4 == 1) {
        var j = 0
        while (j < dim) { v(j) += 0.12f * u(seed ^ ~id, j); j += 1 }
      }
      (id, v)
    }.toDF("vec_id", "embedding")
  }

  /** Distributed generation of ~nClips rows (complete groups). Returns the
    * clips dataset and the planted truth (clip_id, group_id) — group ids
    * with >1 member are true duplicate clusters by construction. */
  def generate(spark: SparkSession, nClips: Int, seed: Long = 42L, numPartitions: Int = 32): (Dataset[Clip], DataFrame) = {
    import spark.implicits._
    // average group size = (1*4+2*2+3+4+8)/9 = 23/9 ≈ 2.56
    val nGroups = math.max(1, (nClips * 9) / 23)
    val groups = spark.range(0, nGroups, 1, numPartitions)
    val rows = groups.flatMap(g => group(seed, g))
    val clips = rows.map(_._1)
    val truth = rows.map { case (c, g) => (c.clip_id, g) }.toDF("clip_id", "group_id")
    (clips, truth)
  }
}
