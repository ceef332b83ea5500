package graft.text

/** Generalized suffix arrays for the north-rule's exact substring pass.
  *
  * The reference ecosystem does exact substring dedup with corpus-level
  * suffix arrays (the published training-data-dedup recipe); a single
  * global suffix array does not distribute, so the Spark-first form is:
  * winnowed fingerprints bucket the corpus (recall GUARANTEE: any shared
  * span of at least window+k-1 bytes shares a fingerprint — Text
  * .winnowHashes), then candidate pairs are verified EXACTLY with a
  * per-pair generalized suffix array built here. Each verification is
  * O((|a|+|b|) log(|a|+|b|)) and runs inside a map stage — no driver
  * state, no all-pairs, nothing grows with corpus size.
  *
  * Span semantics are in UNICODE CODE POINTS (matching Spark's `length`
  * and DuckDB's `substr`/`length`) so results are oracle-comparable.
  */
object SuffixArray {

  /** Suffix array of `s` by prefix doubling, O(n log^2 n). Input symbols
    * are arbitrary Ints (code points plus negative sentinels). */
  def build(s: Array[Int]): Array[Int] = {
    val n = s.length
    if (n == 0) return Array.emptyIntArray
    var rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(i) = s(i); i += 1 }
    val sa = new Array[Integer](n)
    i = 0
    while (i < n) { sa(i) = Integer.valueOf(i); i += 1 }
    val next = new Array[Int](n)
    var k = 1
    var done = false
    while (!done) {
      val r = rank // stable capture for the comparator
      val kk = k
      def rk(idx: Int): Int = if (idx < n) r(idx) else Int.MinValue
      java.util.Arrays.sort(sa, (a: Integer, b: Integer) => {
        val c = Integer.compare(r(a), r(b))
        if (c != 0) c else Integer.compare(rk(a + kk), rk(b + kk))
      })
      next(sa(0)) = 0
      i = 1
      while (i < n) {
        val prev = sa(i - 1); val cur = sa(i)
        val same = r(prev) == r(cur) && rk(prev + kk) == rk(cur + kk)
        next(cur) = next(prev) + (if (same) 0 else 1)
        i += 1
      }
      i = 0
      while (i < n) { rank(i) = next(i); i += 1 }
      done = rank(sa(n - 1)) == n - 1 || k >= n
      k <<= 1
    }
    val out = new Array[Int](n)
    i = 0
    while (i < n) { out(i) = sa(i).intValue; i += 1 }
    out
  }

  /** LCP array via Kasai: lcp(i) = longest common prefix of suffixes
    * sa(i-1) and sa(i); lcp(0) = 0. */
  def lcp(s: Array[Int], sa: Array[Int]): Array[Int] = {
    val n = s.length
    val out = new Array[Int](n)
    if (n == 0) return out
    val inv = new Array[Int](n)
    var i = 0
    while (i < n) { inv(sa(i)) = i; i += 1 }
    var h = 0
    i = 0
    while (i < n) {
      if (inv(i) > 0) {
        val j = sa(inv(i) - 1)
        while (i + h < n && j + h < n && s(i + h) == s(j + h)) h += 1
        out(inv(i)) = h
        if (h > 0) h -= 1
      } else h = 0
      i += 1
    }
    out
  }

  private def codePoints(s: String): Array[Int] = {
    val out = new Array[Int](s.codePointCount(0, s.length))
    var i = 0; var j = 0
    while (i < s.length) {
      val c = s.codePointAt(i)
      out(j) = c; j += 1
      i += Character.charCount(c)
    }
    out
  }

  /** EXACT decision form of `longestSharedSpan(a, b) >= m`, O(|a| + |b|)
    * expected: rolling-hash every m-code-point window of the SHORTER
    * string into a sorted table, probe the longer string's windows, and
    * verify every hash hit by direct code-point comparison. Equal windows
    * always produce equal hashes (no false negatives) and a verified hit
    * is a genuine shared span (no false positives), so the return value
    * is bit-identical to the suffix-array predicate. This is the verify
    * hot loop wherever only the >= minSpan decision (not the exact span
    * length) is consumed: the full generalized SA costs O(n log^2 n) with
    * a boxed comparator sort per pair. */
  def sharedSpanAtLeast(a: String, b: String, m: Int): Boolean = {
    if (m <= 0) return true
    if (a == null || b == null || a.isEmpty || b.isEmpty) return false
    val ca = codePoints(a)
    val cb = codePoints(b)
    val (s, l) = if (ca.length <= cb.length) (ca, cb) else (cb, ca)
    if (s.length < m) return false
    val B = 0x9E3779B97F4A7C15L // odd -> multiplication is a bijection mod 2^64
    var powm1 = 1L
    var i = 0
    while (i < m - 1) { powm1 *= B; i += 1 }
    val ns = s.length - m + 1
    val hs = new Array[Long](ns)
    var h = 0L
    i = 0
    while (i < m) { h = h * B + s(i); i += 1 }
    hs(0) = h
    var w = 1
    while (w < ns) {
      h = (h - s(w - 1) * powm1) * B + s(w + m - 1)
      hs(w) = h
      w += 1
    }
    java.util.Arrays.sort(hs)
    val nl = l.length - m + 1
    var hl = 0L
    i = 0
    while (i < m) { hl = hl * B + l(i); i += 1 }
    w = 0
    while (w < nl) {
      if (w > 0) hl = (hl - l(w - 1) * powm1) * B + l(w + m - 1)
      if (java.util.Arrays.binarySearch(hs, hl) >= 0 && containsWindow(s, l, w, m))
        return true
      w += 1
    }
    false
  }

  /** Does `s` contain the window l[w, w+m) anywhere? Direct comparison —
    * only reached on a 64-bit hash hit, i.e. at most once per genuinely
    * qualifying pair (plus ~2^-64 collision noise). */
  private def containsWindow(s: Array[Int], l: Array[Int], w: Int, m: Int): Boolean = {
    var p = 0
    val np = s.length - m + 1
    while (p < np) {
      var t = 0
      while (t < m && s(p + t) == l(w + t)) t += 1
      if (t == m) return true
      p += 1
    }
    false
  }

  /** Length (in code points) of the longest substring shared by `a` and
    * `b`: generalized suffix array over a ++ SEP ++ b, answer = max LCP
    * between adjacent suffixes owned by different documents (the sentinel
    * never matches a code point, so no span crosses it). */
  def longestSharedSpan(a: String, b: String): Int = {
    if (a == null || b == null || a.isEmpty || b.isEmpty) return 0
    val ca = codePoints(a)
    val cb = codePoints(b)
    val n = ca.length + 1 + cb.length
    val s = new Array[Int](n)
    System.arraycopy(ca, 0, s, 0, ca.length)
    s(ca.length) = -1 // sentinel: below every valid code point
    System.arraycopy(cb, 0, s, ca.length + 1, cb.length)
    val sa = build(s)
    val l = lcp(s, sa)
    var best = 0
    var i = 1
    while (i < n) {
      val ownA = sa(i) < ca.length
      val ownPrevA = sa(i - 1) < ca.length
      if (ownA != ownPrevA && l(i) > best) best = l(i)
      i += 1
    }
    best
  }
}
