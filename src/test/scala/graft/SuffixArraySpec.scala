package graft

import graft.text.SuffixArray
import org.scalatest.funsuite.AnyFunSuite

/** The exact substring pass's kernel: generalized suffix array + Kasai
  * LCP. Property-tested against brute force (sorted-suffix order, O(nm)
  * DP longest-common-substring) on seeded random strings. */
class SuffixArraySpec extends AnyFunSuite {

  private def cps(s: String): Array[Int] = s.codePoints().toArray

  private def bruteSa(s: Array[Int]): Array[Int] = {
    def less(i: Int, j: Int): Boolean = {
      var a = i; var b = j
      while (a < s.length && b < s.length) {
        if (s(a) != s(b)) return s(a) < s(b)
        a += 1; b += 1
      }
      a == s.length && b < s.length
    }
    s.indices.sortWith(less).toArray
  }

  private def bruteLcs(a: String, b: String): Int = {
    val ca = cps(a); val cb = cps(b)
    val dp = Array.ofDim[Int](ca.length + 1, cb.length + 1)
    var best = 0
    for (i <- 1 to ca.length; j <- 1 to cb.length) {
      if (ca(i - 1) == cb(j - 1)) {
        dp(i)(j) = dp(i - 1)(j - 1) + 1
        if (dp(i)(j) > best) best = dp(i)(j)
      }
    }
    best
  }

  test("suffix array matches brute-force suffix sort on random strings") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 50) {
      val n = 1 + rnd.nextInt(60)
      val alpha = 2 + rnd.nextInt(4)
      val s = Array.fill(n)(rnd.nextInt(alpha))
      val sa = SuffixArray.build(s)
      assert(sa.toSeq == bruteSa(s).toSeq, s"trial $trial: ${s.mkString(",")}")
    }
  }

  test("lcp array is correct (Kasai) on random strings") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 30) {
      val n = 2 + rnd.nextInt(50)
      val s = Array.fill(n)(rnd.nextInt(3))
      val sa = SuffixArray.build(s)
      val lcp = SuffixArray.lcp(s, sa)
      for (i <- 1 until n) {
        val (x, y) = (sa(i - 1), sa(i))
        var l = 0
        while (x + l < n && y + l < n && s(x + l) == s(y + l)) l += 1
        assert(lcp(i) == l)
      }
      assert(lcp(0) == 0)
    }
  }

  test("longestSharedSpan equals DP longest common substring (random)") {
    val rnd = new scala.util.Random(2026)
    val alphabet = "abcde "
    for (_ <- 1 to 200) {
      val a = Array.fill(1 + rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val b = Array.fill(1 + rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(SuffixArray.longestSharedSpan(a, b) == bruteLcs(a, b), s"a=$a b=$b")
    }
  }

  test("containment: span equals the contained text's length, both orders") {
    val inner = "the quick brown fox jumps over the lazy dog repeatedly"
    val outer = s"PREFIX $inner SUFFIX MATERIAL"
    assert(SuffixArray.longestSharedSpan(inner, outer) == inner.length)
    assert(SuffixArray.longestSharedSpan(outer, inner) == inner.length)
    assert(SuffixArray.longestSharedSpan(outer, outer) == outer.length)
  }

  test("disjoint alphabets share nothing; empty/null-safe") {
    assert(SuffixArray.longestSharedSpan("aaaa", "bbbb") == 0)
    assert(SuffixArray.longestSharedSpan("", "abc") == 0)
    assert(SuffixArray.longestSharedSpan("abc", "") == 0)
    assert(SuffixArray.longestSharedSpan(null, "abc") == 0)
  }

  test("sharedSpanAtLeast equals the suffix-array predicate (random, all thresholds)") {
    // the r6 optimization replaced the per-pair SA with this O(n+m) gate
    // wherever only the >= minSpan decision is consumed — exactness in
    // BOTH directions is the contract (no false positives from hash
    // collisions, no false negatives from banding)
    val rnd = new scala.util.Random(1717)
    val alphabet = "abc " // small alphabet -> plenty of shared substrings
    for (_ <- 1 to 300) {
      val a = Array.fill(1 + rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val b = Array.fill(1 + rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val span = SuffixArray.longestSharedSpan(a, b)
      for (m <- Seq(1, 2, 3, span - 1, span, span + 1, 47).filter(_ >= 1).distinct)
        assert(SuffixArray.sharedSpanAtLeast(a, b, m) == (span >= m),
          s"a=$a b=$b m=$m span=$span")
    }
    // null/empty edges match longestSharedSpan's zeros
    assert(!SuffixArray.sharedSpanAtLeast(null, "abc", 1))
    assert(!SuffixArray.sharedSpanAtLeast("", "abc", 1))
    assert(SuffixArray.sharedSpanAtLeast("abc", "xbcz", 2))
    assert(!SuffixArray.sharedSpanAtLeast("abc", "xbcz", 3))
    // supplementary-plane code points count as one symbol
    val emoji = new String(Character.toChars(0x1F600))
    assert(SuffixArray.sharedSpanAtLeast(s"xx$emoji$emoji", s"zz$emoji${emoji}w", 2))
  }

  test("span length is counted in code points (supplementary-plane safe)") {
    // U+1F600 is one code point but two UTF-16 chars
    val emoji = new String(Character.toChars(0x1F600))
    val a = s"xx${emoji}${emoji}yy"
    val b = s"zz${emoji}${emoji}ww"
    assert(SuffixArray.longestSharedSpan(a, b) == 2)
    // and mixed-width spans: "fü" (2 cps) inside both
    assert(SuffixArray.longestSharedSpan("für alle", "dafür gilt") == 4) // "für "... shared "für " = 4 cps? verified below
  }
}
