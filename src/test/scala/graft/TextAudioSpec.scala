package graft

import graft.audio.Pcm
import graft.text.Text
import org.scalatest.funsuite.AnyFunSuite

class TextAudioSpec extends AnyFunSuite {

  test("shingles: deterministic, distinct, short-text fallback") {
    val a = Text.shingleHashes("hello world", 5)
    assert(a.toSeq == Text.shingleHashes("hello world", 5).toSeq)
    assert(a.length == a.distinct.length)
    assert(Text.shingleHashes("hi", 5).length == 1) // whole-text shingle
    // repeated content collapses (distinct set semantics)
    assert(Text.shingleHashes("ababababab", 2).length <= 2)
  }

  test("exact jaccard/containment: identity, disjoint, prefix") {
    assert(Text.exactJaccard("same text here", "same text here", 5) == 1.0)
    assert(Text.exactJaccard("aaaaaaaaaa", "bbbbbbbbbb", 5) == 0.0)
    val long = "the quick brown fox jumps over the lazy dog and runs away fast"
    val prefix = long.take(40)
    assert(Text.exactContainment(long, prefix, 5) > 0.9) // prefix contained
    assert(Text.exactJaccard(long, prefix, 5) < 0.7)     // but jaccard diluted
  }

  test("langid: fixtures across scripts and languages") {
    assert(Text.langId("the cat sat on the mat and it was happy with that")._1 == "en")
    assert(Text.langId("der Hund ist nicht mit der Katze und das ist gut")._1 == "de")
    assert(Text.langId("le chat est dans la maison et les oiseaux sont pour dans le jardin")._1 == "fr")
    assert(Text.langId("el perro es una mascota que vive con los humanos para siempre")._1 == "es")
    assert(Text.langId("今天天气很好我们去公园散步吧")._1 == "zh")
    // script split: kana -> ja (kanji+kana mix like real Japanese prose),
    // Hangul -> ko; pure Han stays zh
    assert(Text.langId("今日はとても良い天気なので公園へ散歩に行きましょう")._1 == "ja")
    assert(Text.langId("오늘은 날씨가 좋아서 공원에 산책하러 갑니다")._1 == "ko")
    assert(Text.langId("")._1 == "en") // default
  }

  test("quality: sane ranges and degenerate inputs") {
    val good = Text.quality("the quick brown fox jumps over the lazy dog near the river bank today")
    assert(good.score > 0.5 && good.alphaRatio > 0.7 && good.stopwordRatio > 0.1)
    val junk = Text.quality("!!! ??? *** $$$ %%% ^^^ &&& !!! ??? ***")
    assert(junk.score < 0.2, s"junk score ${junk.score}")
    assert(Text.quality("").score == 0.0)
  }

  test("token counting: whitespace and bpe-ish") {
    assert(Text.tokens("a  b   c").toSeq == Seq("a", "b", "c"))
    assert(Text.bpeIshTokenCount("hello, world! x2") == 6) // hello , world ! x 2
    assert(Text.bpeIshTokenCount("") == 0)
  }

  test("rolling fingerprint: deterministic, order-sensitive, spread") {
    val a = Text.rollingFingerprint("abc def")
    assert(a == Text.rollingFingerprint("abc def"))
    assert(a != Text.rollingFingerprint("def abc"))
    assert(a >= 0 && a < (1L << 61) - 1)
  }

  test("winnowing: substring guarantee, determinism, density") {
    val rnd = new scala.util.Random(99)
    def randText(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    for (_ <- 1 to 20) {
      val host = randText(300)
      val from = rnd.nextInt(150)
      val sub = host.substring(from, from + 47 + rnd.nextInt(100)) // >= w+k-1 = 47
      val other = randText(80) + sub + randText(90)
      val fa = Text.winnowHashes(sub, 16, 32).toSet
      val fb = Text.winnowHashes(other, 16, 32).toSet
      assert(fa.subsetOf(fb), "winnow guarantee violated: contained text's fingerprints must all appear")
    }
    val t = randText(500)
    val w = Text.winnowHashes(t, 16, 32)
    assert(w.toSeq == Text.winnowHashes(t, 16, 32).toSeq)
    // density ~ 2/(window+1) of positions
    assert(w.length > 500 / 40 && w.length < 500 / 8, s"density off: ${w.length}")
    assert(Text.isSubstring("bc", "abcd") && !Text.isSubstring("xy", "abcd"))
  }

  test("pcm s16le: encode/decode round trip within quantization error") {
    val samples = Array.tabulate(1000)(i => math.sin(i * 0.05) * 0.9)
    val decoded = Pcm.decodePcmS16le(Pcm.encodePcmS16le(samples))
    assert(decoded.length == 1000)
    val maxErr = samples.zip(decoded).map { case (a, b) => math.abs(a - b) }.max
    assert(maxErr < 1.0 / 32768, s"maxErr=$maxErr")
    assert(Pcm.snrDb(samples, decoded) > 80) // 16-bit quantization ~96dB
  }

  test("snr: exact, scaled, and noisy") {
    val s = Array.tabulate(500)(i => math.sin(i * 0.1))
    assert(Pcm.snrDb(s, s).isPosInfinity)
    val noisy = s.map(_ + 0.01)
    assert(Pcm.snrDb(s, noisy) > 30 && Pcm.snrDb(s, noisy) < 45)
  }

  test("audio fingerprint: gain-invariant, content-sensitive, stub decoder deterministic") {
    val sr = 8000
    val s = Array.tabulate(4000)(i => 0.5 * math.sin(2 * math.Pi * 440 * i / sr) +
      0.3 * math.sin(2 * math.Pi * 1200 * i / sr))
    val f1 = Pcm.fingerprintHashes(s, sr).toSet
    val f2 = Pcm.fingerprintHashes(s.map(_ * 0.5), sr).toSet
    assert(f1 == f2, "gain must not change the fingerprint")
    val other = Array.tabulate(4000)(i => 0.5 * math.sin(2 * math.Pi * 700 * i / sr))
    val f3 = Pcm.fingerprintHashes(other, sr).toSet
    assert(f1.intersect(f3).size.toDouble / f1.union(f3).size < 0.3)
    // stub path: deterministic and shape-correct for unknown codecs
    val stub1 = Pcm.decode(Array[Byte](1, 2, 3, 4), "opus")
    val stub2 = Pcm.decode(Array[Byte](1, 2, 3, 4), "opus")
    assert(stub1.toSeq == stub2.toSeq && stub1.forall(v => v >= -1.0 && v < 1.0))
  }

  test("hash-set emitters are sorted; merge-walk count == set intersection") {
    // the verify stage's merge-walk intersection (SortedIntersectCountExpr)
    // requires sorted distinct inputs — pin the contract at the emitters
    val sh = Text.shingleHashes("the quick brown fox jumps over the lazy dog", 5)
    assert(sh.toSeq == sh.sorted.toSeq, "shingleHashes must emit sorted")
    val sr = 8000
    val s = Array.tabulate(4000)(i => 0.5 * math.sin(2 * math.Pi * 440 * i / sr))
    val fp = Pcm.fingerprintHashes(s, sr)
    assert(fp.toSeq == fp.sorted.toSeq, "fingerprintHashes must emit sorted")
    // merge-walk equals set-intersection size on random sorted distinct arrays
    val rng = new scala.util.Random(42)
    (0 until 50).foreach { _ =>
      val a = Array.fill(rng.nextInt(200))(rng.nextInt(100).toLong).distinct.sorted
      val b = Array.fill(rng.nextInt(200))(rng.nextInt(100).toLong).distinct.sorted
      val got = graft.catalyst.SortedIntersectCountExpr.compute(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(a),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(b))
      assert(got == a.toSet.intersect(b.toSet).size)
    }
  }

  test("string merge-walk count == set intersection (UTF8String binary order)") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rng = new scala.util.Random(7)
    def randWords(n: Int) =
      Array.fill(n)(rng.alphanumeric.take(1 + rng.nextInt(6)).mkString)
        .distinct.sortWith((x, y) => // binary order, like sort_array
          UTF8String.fromString(x).compareTo(UTF8String.fromString(y)) < 0)
    (0 until 50).foreach { _ =>
      val a = randWords(rng.nextInt(60))
      val b = randWords(rng.nextInt(60))
      val got = graft.catalyst.SortedIntersectCountExpr.computeString(
        new GenericArrayData(a.map(UTF8String.fromString): Array[Any]),
        new GenericArrayData(b.map(UTF8String.fromString): Array[Any]))
      assert(got == a.toSet.intersect(b.toSet).size)
    }
  }
}
