package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Row-level text kernels called from the generated code of the native
  * tokenize/shingle expressions (graft.plans.TokensExpr/ShinglesExpr).
  *
  * Semantics are EXACTLY the reference tokenization (cooler-MapReduce
  * `shared/samples/word_count.py:19-25`: lowercase, whitespace split,
  * strip `.,!?;:"'-` from token edges, drop empties) and bit-identical
  * to the composed `split/lower/trim` SQL-function form they replace —
  * every step runs the same UTF8String primitive Spark's own
  * expressions call (`toLowerCase`, `split`, `trim(trimString)`,
  * `concatWs`), just fused into one flat loop per row with no
  * per-element lambda dispatch and no risk of CollapseProject inlining
  * an upstream projection into an O(n²) lambda re-evaluation.
  */
object GraftText {
  private val Whitespace = UTF8String.fromString("\\s+")
  private val Punct = UTF8String.fromString(TextFunctions.PunctChars)
  private val Space = UTF8String.fromString(" ")
  private val Empty: ArrayData = new GenericArrayData(Array.empty[Any])

  /** Lowercased, punctuation-trimmed, non-empty token array. */
  def tokens(text: UTF8String): ArrayData = {
    val parts = text.toLowerCase.split(Whitespace, -1)
    val out = new Array[Any](parts.length)
    var n = 0
    var i = 0
    while (i < parts.length) {
      val t = parts(i).trim(Punct)
      if (t.numBytes() > 0) { out(n) = t; n += 1 }
      i += 1
    }
    if (n == parts.length) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], n))
  }

  private val CdcPrefix = "cdc|".getBytes("UTF-8")
  private val HexDigits = "0123456789abcdef".toCharArray

  /** Content-defined chunks of a token array: one pass, one md5 per
    * token (the anchor test) plus one per chunk (the fingerprint).
    * Returns array<struct<fp: string, n: int>> — chunk md5 hex and its
    * token count, in document order.
    *
    * Anchor semantics are IDENTICAL to the SQL form they replace
    * (`conv(substring(md5('cdc|'||tok), 1, 15), 16, 10) % anchorMod
    * == 0`, the anchor starting a new chunk): the 15-hex-digit prefix
    * is the digest's first 7 bytes plus the high nibble of the 8th.
    * Chunk fingerprints are md5 of the chunk's tokens joined with
    * single spaces — byte-identical to `md5(concat_ws(' ', ...))` and
    * DuckDB's `md5(string_agg(tok, ' ' ORDER BY pos))`.
    */
  def cdcChunks(toks: ArrayData, anchorMod: Int): ArrayData = {
    val m = toks.numElements()
    if (m == 0) return Empty
    val md = java.security.MessageDigest.getInstance("MD5")
    def anchor60(t: UTF8String): Long = {
      md.reset()
      md.update(CdcPrefix)
      md.update(t.getBytes)
      val d = md.digest()
      var v = 0L
      var i = 0
      while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      (v << 4) | ((d(7) & 0xf0L) >>> 4)
    }
    def hex(d: Array[Byte]): UTF8String = {
      val out = new Array[Char](32)
      var i = 0
      while (i < 16) {
        out(2 * i) = HexDigits((d(i) & 0xf0) >>> 4)
        out(2 * i + 1) = HexDigits(d(i) & 0x0f)
        i += 1
      }
      UTF8String.fromString(new String(out))
    }
    val chunks = new scala.collection.mutable.ArrayBuffer[Any]()
    val window = new Array[UTF8String](m)
    def emit(start: Int, end: Int): Unit = if (end > start) {
      var j = start
      while (j < end) { window(j - start) = toks.getUTF8String(j); j += 1 }
      val text = UTF8String.concatWs(Space,
        java.util.Arrays.copyOfRange(window, 0, end - start).toSeq: _*)
      md.reset()
      md.update(text.getBytes)
      chunks += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](hex(md.digest()), end - start))
    }
    var start = 0
    var i = 0
    while (i < m) {
      if (anchor60(toks.getUTF8String(i)) % anchorMod == 0) {
        emit(start, i)
        start = i
      }
      i += 1
    }
    emit(start, m)
    new GenericArrayData(chunks.toArray)
  }

  private val StopwordSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    TextFunctions.Stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  /** One-pass quality stats over raw text — the native form of
    * TextAnalysis.quality's per-row compute. Returns a struct row
    * (n_chars, n_tokens, avg_token_len, punct_ratio, stopword_ratio,
    * quality_score) with every field BIT-IDENTICAL to the composed
    * HOF form it replaces: token semantics are [[tokens]] (lowercase,
    * whitespace split, punct-trim, drop empties); lengths are
    * codepoint counts (what Spark's `length` returns); each ratio is
    * the same int-cast-to-double division; the composite score is the
    * same 4/3/3 vote over the same double comparisons. The HOF form
    * evaluated its `aggregate`/`filter` lambdas interpreted, per
    * element, on a full-corpus scan path — this is one flat loop per
    * row inside whole-stage codegen.
    */
  def qualityStats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val nChars = text.numChars()
    // punct chars are single-byte ASCII; UTF-8 continuation bytes have
    // the high bit set, so a byte scan counts exactly the matching
    // codepoints that regexp_replace("[.,!?;:]") would delete
    var punct = 0
    val nBytes = text.numBytes()
    var b = 0
    while (b < nBytes) {
      val ch = text.getByte(b)
      if (ch == '.' || ch == ',' || ch == '!' || ch == '?' || ch == ';' || ch == ':')
        punct += 1
      b += 1
    }
    val parts = text.toLowerCase.split(Whitespace, -1)
    var nTokens = 0
    var sumLen = 0
    var stop = 0
    var i = 0
    while (i < parts.length) {
      val t = parts(i).trim(Punct)
      if (t.numBytes() > 0) {
        nTokens += 1
        sumLen += t.numChars()
        if (StopwordSet.contains(t)) stop += 1
      }
      i += 1
    }
    val avgTokenLen = sumLen.toDouble / math.max(nTokens, 1)
    val punctRatio = punct.toDouble / math.max(nChars, 1)
    val stopwordRatio = stop.toDouble / math.max(nTokens, 1)
    val score = ((if (nTokens >= 5) 4 else 0) +
      (if (stopwordRatio > 0.05) 3 else 0) +
      (if (avgTokenLen >= 3.0 && avgTokenLen <= 10.0) 3 else 0)).toDouble / 10.0
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nChars, nTokens, avgTokenLen, punctRatio, stopwordRatio, score))
  }

  /** One-pass token-diversity stats over raw text: tokenize (same
    * semantics as [[tokens]]), sort a scratch copy, walk equal-token
    * runs — (n_tokens, distinct_tokens, top_share, simpson_diversity)
    * without ever shuffling a (doc, token) pair. Counts are exact
    * longs; the two ratios are single IEEE divisions of those longs,
    * so the DuckDB group-by twin is bit-identical. Only run EQUALITY
    * matters, so the binary UTF8String order is fine.
    */
  def tokenDiversityStats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val parts = text.toLowerCase.split(Whitespace, -1)
    val toks = new Array[UTF8String](parts.length)
    var n = 0
    var i = 0
    while (i < parts.length) {
      val t = parts(i).trim(Punct)
      if (t.numBytes() > 0) { toks(n) = t; n += 1 }
      i += 1
    }
    var distinct = 0L
    var maxc = 0L
    var sumc2 = 0L
    if (n > 0) {
      java.util.Arrays.sort(toks.asInstanceOf[Array[Object]], 0, n)
      var run = 1L
      var j = 1
      while (j <= n) {
        if (j < n && toks(j).equals(toks(j - 1))) run += 1
        else {
          distinct += 1
          if (run > maxc) maxc = run
          sumc2 += run * run
          run = 1
        }
        j += 1
      }
    }
    val topShare = if (n == 0) 0.0 else maxc.toDouble / n.toDouble
    val simpson = if (n == 0) 0.0 else 1.0 - sumc2.toDouble / (n.toLong * n).toDouble
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, distinct, topShare, simpson))
  }

  /** Word n-gram shingles (tokens joined with single spaces). */
  /** Winnowing fingerprint selection (Schleimer et al. 2003) over a
    * token array, ONE flat pass per row: n-gram 48-bit hashes (first
    * 12 hex chars of md5(gram) as a long — byte-identical to
    * `conv(substring(md5(s), 1, 12), 16, 10)`; grams joined with
    * single spaces like [[shingles]]), then each w-window's minimum
    * with RIGHTMOST tiebreak (≡ the (h, −pos) struct-min of the
    * window-function formulation), deduplicated. Returns array<long>
    * — the document's distinct selected fingerprints, with no
    * explode, no sort, no window exchange.
    */
  def winnowFps(toks: ArrayData, n: Int, w: Int): ArrayData = {
    val m = toks.numElements()
    val g = m - n + 1
    if (g < w) return Empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val window = new Array[UTF8String](n)
    val hs = new Array[Long](g)
    var i = 0
    while (i < g) {
      var j = 0
      while (j < n) { window(j) = toks.getUTF8String(i + j); j += 1 }
      md.reset()
      md.update(UTF8String.concatWs(Space, window.toSeq: _*).getBytes)
      val d = md.digest()
      var v = 0L
      var k = 0
      while (k < 6) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
      hs(i) = v
      i += 1
    }
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var start = 0
    while (start <= g - w) {
      var best = start
      var j = start + 1
      while (j < start + w) {
        if (hs(j) <= hs(best)) best = j // <= keeps the rightmost minimum
        j += 1
      }
      if (seen.add(hs(best))) out += hs(best)
      start += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Positionwise agreement count of two equal-length long-array
    * minhash signatures — the candidate-pair filter kernel. One flat
    * primitive loop per pair; the `aggregate(zip_with(...))` HOF form
    * it replaces allocates a zipped struct array and dispatches two
    * interpreted lambdas per element, on EVERY candidate pair the LSH
    * bucket join emits.
    */
  /** RFC 9309 robots path-pattern match (§2.2.3 special characters):
    * `*` matches any run of octets, a TRAILING `$` anchors the match
    * to the end of the path, any other octet (including a mid-pattern
    * `$`) is literal; without the anchor the pattern matches any
    * PREFIX of the path. Greedy two-pointer walk over the raw UTF-8
    * bytes — a star only ever needs the classic single-backtrack
    * (O(n·m) worst case on star-heavy patterns, linear in practice) —
    * so the frontier scan pays NO regex compile per rule per URL.
    */
  def robotsMatch(path: UTF8String, pattern: UTF8String): Boolean = {
    val s = path.getBytes
    val p = pattern.getBytes
    var pe = p.length
    var anchored = false
    if (pe > 0 && p(pe - 1) == '$') { anchored = true; pe -= 1 }
    var si = 0
    var pi = 0
    var star = -1
    var mark = 0
    while (si < s.length) {
      if (pi < pe && p(pi) == '*') { star = pi; pi += 1; mark = si }
      else if (pi < pe && p(pi) == s(si)) { pi += 1; si += 1 }
      else if (pi >= pe && !anchored) return true // prefix consumed
      else if (star >= 0) { pi = star + 1; mark += 1; si = mark }
      else return false
    }
    while (pi < pe && p(pi) == '*') pi += 1
    pi == pe // path exhausted: anchored needs full-pattern consumption
  }

  private val Allow = UTF8String.fromString("allow")

  /** Winning robots rule for one path over a host's (rtype, rpath)
    * rule array — the whole
    * `array_max(transform(filter(rules, robotsMatch), struct(...)))`
    * winner selection as ONE flat loop per URL (the HOF form runs
    * interpreted: per-rule lambda dispatch, a filtered array and a
    * struct allocation per matching rule, then an interpreted
    * struct-ordering max — per-frontier-row costs that a byte walk
    * plus one running four-field compare replaces).
    *
    * Bit-compatibility with the composed form (pinned by HtmlSpec):
    * specificity = CHARACTER length of the raw pattern (Spark
    * `length()` = numChars), `allow` wins length ties (pref 1 > 0),
    * further ties resolve by the composed struct ordering's remaining
    * fields — rpath then rtype, each in UTF8String binary order with
    * null smallest. Entries whose rpath is null are skipped exactly as
    * the HOF filter drops a null lambda result. Returns the winning
    * (l, pref, rpath, rtype) row, or null when nothing matches —
    * callers read rpath/rtype/isNull exactly as before.
    */
  def robotsWinner(path: UTF8String,
                   rules: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = rules.numElements()
    var bestL = 0
    var bestPref = 0
    var bestRpath: UTF8String = null
    var bestRtype: UTF8String = null
    var found = false
    var i = 0
    while (i < n) {
      if (!rules.isNullAt(i)) {
        val row = rules.getStruct(i, 2)
        val rtype = if (row.isNullAt(0)) null else row.getUTF8String(0)
        val rpath = if (row.isNullAt(1)) null else row.getUTF8String(1)
        if (rpath != null && robotsMatch(path, rpath)) {
          val l = rpath.numChars()
          val pref = if (rtype != null && Allow.equals(rtype)) 1 else 0
          val better = !found || {
            if (l != bestL) l > bestL
            else if (pref != bestPref) pref > bestPref
            else {
              // rpath: both non-null here (matched); binary order
              val c = rpath.compareTo(bestRpath)
              if (c != 0) c > 0
              else { // rtype: null smallest, else binary order
                if (rtype == null) false
                else if (bestRtype == null) true
                else rtype.compareTo(bestRtype) > 0
              }
            }
          }
          if (better) {
            bestL = l; bestPref = pref; bestRpath = rpath; bestRtype = rtype
            found = true
          }
        }
      }
      i += 1
    }
    if (!found) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestL, bestPref, bestRpath, bestRtype))
  }

  def sigAgree(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var c = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  def shingles(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return Empty
    val out = new Array[Any](m - n + 1)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) { window(j) = toks.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Space, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-document n-gram repetition stats in ONE map-side pass (the
    * graft.plans.GramStatsExpr kernel): the most frequent 2- and
    * 3-gram with counts (ties → lexicographically smaller gram) and
    * the duplicated-5-gram character mass (Σ count × gram chars over
    * grams occurring ≥ 2×). Per-document stats need no cross-document
    * state, so the (doc, n, gram) count shuffle the window/groupBy
    * formulation pays is pure waste — this sorts each doc's gram array
    * and walks the runs, like tokenDiversityStats. Gram comparison is
    * binary UTF-8 (UTF8String.compareTo ≡ Spark string order ≡
    * DuckDB's binary collation), so tie-breaks match the oracle.
    */
  def gramStats(toks: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val EmptyStr = UTF8String.fromString("")
    def grams(n: Int): Array[UTF8String] = {
      val m = toks.numElements()
      if (m < n) return Array.empty
      val out = new Array[UTF8String](m - n + 1)
      val window = new Array[UTF8String](n)
      var i = 0
      while (i <= m - n) {
        var j = 0
        while (j < n) { window(j) = toks.getUTF8String(i + j); j += 1 }
        out(i) = UTF8String.concatWs(Space, window: _*)
        i += 1
      }
      out
    }
    // top gram by (count desc, gram asc): sorted ascending, a strict >
    // keeps the first (smallest) gram among equal-count runs
    def top(n: Int): (UTF8String, Long) = {
      val g = grams(n)
      if (g.isEmpty) return (EmptyStr, 0L)
      java.util.Arrays.sort(g.asInstanceOf[Array[AnyRef]])
      var bestG = g(0); var bestC = 0L
      var runG = g(0); var runC = 0L
      var i = 0
      while (i < g.length) {
        if (g(i).equals(runG)) runC += 1
        else { if (runC > bestC) { bestC = runC; bestG = runG }; runG = g(i); runC = 1L }
        i += 1
      }
      if (runC > bestC) { bestC = runC; bestG = runG }
      (bestG, bestC)
    }
    def dupChars(n: Int): Long = {
      val g = grams(n)
      if (g.isEmpty) return 0L
      java.util.Arrays.sort(g.asInstanceOf[Array[AnyRef]])
      var total = 0L
      var runG = g(0); var runC = 0L
      var i = 0
      while (i < g.length) {
        if (g(i).equals(runG)) runC += 1
        else { if (runC >= 2) total += runC * runG.numChars(); runG = g(i); runC = 1L }
        i += 1
      }
      if (runC >= 2) total += runC * runG.numChars()
      total
    }
    val (g2, c2) = top(2)
    val (g3, c3) = top(3)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](g2, c2, g3, c3, dupChars(5)))
  }

  /** Unicode NFC normalization (java.text.Normalizer — the JDK's
    * conformant implementation; DuckDB's `nfc_normalize` implements
    * the same Unicode algorithm, so the twins agree byte-for-byte).
    * Already-normalized text (the common case — `isNormalized` is a
    * cheap quick-check scan) returns the input UTF8String unchanged,
    * no allocation.
    */
  def nfc(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** The canonical Windows-1252 mojibake table (C104): what the UTF-8
    * bytes of the RIGHT value look like after a decoder mistakes them
    * for Latin-1/cp1252 — each key spec-PROVEN equal to the JDK
    * double-decode of its value (EncodingRepairSpec). Keys are
    * mutually substring-safe, and the SEQUENCE ORDER is load-bearing
    * for the chained/oracle twins: on dirty text a dangling '\u00e2\u20ac'
    * (truncated artifact) followed by a replacement char can re-form a
    * key, so an earlier entry's replacement must never complete a
    * later entry's key \u2014 concretely, the en-dash key ends in U+201C,
    * which is the left-dquote entry's REPLACEMENT, so en dash must be
    * applied first (EncodingRepairSpec pins the no-reform invariant
    * pairwise and chained==kernel on dangling-prefix inputs). The
    * single-pass kernel is immune by construction; the order makes the
    * 16 chained replaces match it exactly. Lives here (not in the
    * operator layer) because the kernel below consumes it.
    */
  val MojibakeRepairs: Seq[(String, String)] = Seq(
    "\u00e2\u20ac\u2122" -> "\u2019", // mangled U+2019 right quote
    "\u00e2\u20ac\u201c" -> "\u2013", // mangled U+2013 en dash
    "\u00e2\u20ac\u0153" -> "\u201c", // mangled U+201C left dquote
    "\u00e2\u20ac\u201d" -> "\u2014", // mangled U+2014 em dash
    "\u00e2\u20ac\u00a6" -> "\u2026", // mangled U+2026 ellipsis
    "\u00c3\u00a9" -> "\u00e9", // mangled e-acute
    "\u00c3\u00a8" -> "\u00e8", // mangled e-grave
    "\u00c3\u00a1" -> "\u00e1", // mangled a-acute
    "\u00c3\u00b3" -> "\u00f3", // mangled o-acute
    "\u00c3\u00b1" -> "\u00f1", // mangled n-tilde
    "\u00c3\u00bc" -> "\u00fc", // mangled u-umlaut
    "\u00c3\u00b6" -> "\u00f6", // mangled o-umlaut
    "\u00c3\u00a4" -> "\u00e4", // mangled a-umlaut
    "\u00c3\u00a7" -> "\u00e7", // mangled c-cedilla
    "\u00c2\u00b7" -> "\u00b7", // mangled middle dot
    "\u00c2\u00b0" -> "\u00b0") // mangled degree sign

  // first-char dispatch table, longest key first per bucket — built
  // once from MojibakeRepairs so kernel and table can never diverge
  private val mojiByFirst: java.util.HashMap[Character, Array[(String, String)]] = {
    val m = new java.util.HashMap[Character, Array[(String, String)]]()
    MojibakeRepairs.groupBy(_._1.charAt(0)).foreach { case (c, entries) =>
      m.put(Character.valueOf(c), entries.sortBy(-_._1.length).toArray)
    }
    m
  }

  /** Single-pass mojibake repair (the fused form of C104's 16 chained
    * replaces + 16 length-census scans — one walk instead of 32):
    * returns (repaired, n_artifacts). ASCII-only text short-circuits on
    * the UTF8String byte length (no chars above 0x7F ⇒ no artifact
    * can match) and returns the input buffer unchanged, no allocation.
    */
  def mojibakeFix(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    // all-ASCII fast path: numBytes == numChars ⇔ no multi-byte char
    if (text.numBytes == text.numChars)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](text, 0L))
    val s = text.toString
    val len = s.length
    val sb = new java.lang.StringBuilder(len)
    var i = 0
    var n = 0L
    while (i < len) {
      val c = s.charAt(i)
      var advanced = false
      if (c >= '\u00c2') { // cheapest pre-screen: all keys start ≥ U+00C2
        val entries = mojiByFirst.get(Character.valueOf(c))
        if (entries != null) {
          var e = 0
          while (!advanced && e < entries.length) {
            val key = entries(e)._1
            if (i + key.length <= len && s.startsWith(key, i)) {
              sb.append(entries(e)._2)
              i += key.length
              n += 1L
              advanced = true
            }
            e += 1
          }
        }
      }
      if (!advanced) { sb.append(c); i += 1 }
    }
    val repaired = if (n == 0L) text else UTF8String.fromString(sb.toString)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](repaired, n))
  }
}
