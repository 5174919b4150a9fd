package graft.functions

/** String-similarity kernels used by the pair-feature stage.
  *
  * Same measures the reference gets from `rapidfuzz` / `jellyfish`
  * (/root/reference/emm/features/pandas_feature_extractor.py:91-115):
  * jaro, indel ratio, token_sort/token_set/partial ratios. Fresh Scala
  * implementations of the published algorithms (Jaro 1989; Indel = LCS-based
  * normalized distance; fuzzywuzzy-style token heuristics).
  *
  * All return similarity in [0,1] as Double (callers scale/cast as needed).
  */
object FuzzyMatch {

  /** Jaro similarity, standard definition. */
  def jaro(s1: String, s2: String): Double = {
    if (s1 == null || s2 == null) return 0.0
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    val window  = math.max(math.max(l1, l2) / 2 - 1, 0)
    val match1  = new Array[Boolean](l1)
    val match2  = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!match2(j) && s1.charAt(i) == s2.charAt(j)) {
          match1(i) = true; match2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0; var k = 0
    i = 0
    while (i < l1) {
      if (match1(i)) {
        while (!match2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / l1 + m / l2 + (m - t / 2) / m) / 3.0
  }

  def jaroWinkler(s1: String, s2: String, p: Double = 0.1): Double = {
    val j = jaro(s1, s2)
    if (j <= 0.7) return j
    var prefix = 0
    val lim = math.min(4, math.min(s1.length, s2.length))
    while (prefix < lim && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    j + prefix * p * (1 - j)
  }

  /** Length of the longest common subsequence (O(len1*len2), byte rows). */
  private def lcs(s1: String, s2: String): Int = {
    val n = s2.length
    val prev = new Array[Int](n + 1)
    val cur  = new Array[Int](n + 1)
    var i = 0
    while (i < s1.length) {
      var j = 0
      val c = s1.charAt(i)
      while (j < n) {
        cur(j + 1) =
          if (c == s2.charAt(j)) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, n + 1)
      i += 1
    }
    prev(n)
  }

  /** Indel similarity = rapidfuzz `ratio`/100: 1 - indelDist/(l1+l2). */
  def ratio(s1: String, s2: String): Double = {
    if (s1 == null || s2 == null) return 0.0
    val tot = s1.length + s2.length
    if (tot == 0) return 1.0
    2.0 * lcs(s1, s2) / tot
  }

  private def sortTokens(s: String): String =
    s.split("\\s+").filter(_.nonEmpty).sorted.mkString(" ")

  /** ratio over alphabetically sorted tokens. */
  def tokenSortRatio(s1: String, s2: String): Double = {
    if (s1 == null || s2 == null) return 0.0
    ratio(sortTokens(s1), sortTokens(s2))
  }

  /** fuzzywuzzy-style token_set_ratio: compare the common-token core against
    * each full sorted-token string and take the best.
    */
  def tokenSetRatio(s1: String, s2: String): Double = {
    if (s1 == null || s2 == null) return 0.0
    val t1 = s1.split("\\s+").filter(_.nonEmpty).toSet
    val t2 = s2.split("\\s+").filter(_.nonEmpty).toSet
    val inter = (t1 intersect t2).toSeq.sorted.mkString(" ")
    val d1 = (t1 diff t2).toSeq.sorted.mkString(" ")
    val d2 = (t2 diff t1).toSeq.sorted.mkString(" ")
    val c1 = if (inter.isEmpty) d1 else if (d1.isEmpty) inter else s"$inter $d1"
    val c2 = if (inter.isEmpty) d2 else if (d2.isEmpty) inter else s"$inter $d2"
    Seq(ratio(inter, c1), ratio(inter, c2), ratio(c1, c2)).max
  }

  /** Best ratio of the shorter string against any equal-length window of the
    * longer (rapidfuzz `partial_ratio` semantics, exhaustive windows).
    */
  def partialRatio(s1: String, s2: String): Double = {
    if (s1 == null || s2 == null) return 0.0
    val (short, long) = if (s1.length <= s2.length) (s1, s2) else (s2, s1)
    if (short.isEmpty) return if (long.isEmpty) 1.0 else 0.0
    if (short.length == long.length) return ratio(short, long)
    var best = 0.0
    var i = 0
    while (i + short.length <= long.length && best < 1.0) {
      val r = ratio(short, long.substring(i, i + short.length))
      if (r > best) best = r
      i += 1
    }
    best
  }

  /** fuzzywuzzy WRatio: weighted best-of heuristic. */
  def wRatio(s1: String, s2: String): Double = {
    if (s1 == null || s2 == null) return 0.0
    val base = ratio(s1, s2)
    val l1 = math.max(s1.length, 1); val l2 = math.max(s2.length, 1)
    val lenRatio = math.max(l1, l2).toDouble / math.min(l1, l2)
    if (lenRatio < 1.5) {
      math.max(base, 0.95 * math.max(tokenSortRatio(s1, s2), tokenSetRatio(s1, s2)))
    } else {
      val scale = if (lenRatio < 8) 0.9 else 0.6
      Seq(base,
          scale * partialRatio(s1, s2),
          0.95 * scale * tokenSortRatio(s1, s2),
          0.95 * scale * tokenSetRatio(s1, s2)).max
    }
  }

  /** Normalized Levenshtein similarity: 1 - dist/maxLen. */
  def normLevenshtein(s1: String, s2: String): Double = {
    if (s1 == null || s2 == null) return 0.0
    val maxLen = math.max(s1.length, s2.length)
    if (maxLen == 0) return 1.0
    1.0 - levenshtein(s1, s2).toDouble / maxLen
  }

  def levenshtein(s1: String, s2: String): Int = {
    val n = s2.length
    var prev = Array.tabulate(n + 1)(identity)
    var cur  = new Array[Int](n + 1)
    var i = 0
    while (i < s1.length) {
      cur(0) = i + 1
      var j = 0
      while (j < n) {
        val cost = if (s1.charAt(i) == s2.charAt(j)) 0 else 1
        cur(j + 1) = math.min(math.min(cur(j) + 1, prev(j + 1) + 1), prev(j) + cost)
        j += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    prev(n)
  }
}
