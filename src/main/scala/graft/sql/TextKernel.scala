package graft.sql

import scala.collection.mutable

/** Deterministic text-analysis kernels for the LLM-data-pipeline operators
  * (dedup, language ID, quality scoring, fingerprinting). Pure functions —
  * every algorithm here is replicated exactly by the DuckDB oracle SQL where
  * a query declares one, so implementations must stay bit-deterministic.
  */
object TextKernel {

  /** Whitespace tokens, empties dropped. Matches the oracle definition
    * `list_filter(regexp_split_to_array(text,'\s+'), x -> x <> '')`.
    */
  def tokens(text: String): Array[String] =
    text.split("\\s+").filter(_.nonEmpty)

  /** BPE-style pre-tokenization: maximal runs of letters, digits, or other
    * non-space symbols — the coarse split BPE vocabularies are trained over.
    * The pattern avoids lookarounds so RE2-based engines (the DuckDB oracle)
    * match Java exactly.
    */
  private val BpePattern =
    java.util.regex.Pattern.compile("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+")

  def bpeTokenCount(text: String): Int = {
    val m = BpePattern.matcher(text)
    var n = 0
    while (m.find()) n += 1
    n
  }

  /** Within-document repetition signals (the Gopher/RefinedWeb-style
    * quality heuristics): token counts, distinct tokens, the most frequent
    * token's occurrence count, and bigram totals/distincts. One pass, no
    * shuffle — ratios (dup-word fraction, top-token share, dup-bigram
    * fraction) derive from the integers so the oracle comparison stays
    * float-free.
    */
  def repetition(text: String): (Long, Long, Long, Long, Long) = {
    val tk = tokens(text)
    val n = tk.length
    val counts = new java.util.HashMap[String, Int]()
    var top = 0
    var i = 0
    while (i < n) {
      val c = counts.merge(tk(i), 1, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    val bigrams = new java.util.HashSet[String]()
    i = 0
    while (i < n - 1) {
      bigrams.add(tk(i) + " " + tk(i + 1))
      i += 1
    }
    (n.toLong, counts.size.toLong, top.toLong,
      math.max(0, n - 1).toLong, bigrams.size.toLong)
  }

  /** Distinct character n-grams, in first-occurrence order. */
  def charShingles(text: String, n: Int): Array[String] = {
    if (text.length < n) return Array.empty
    val seen = mutable.LinkedHashSet[String]()
    var i = 0
    while (i + n <= text.length) {
      seen += text.substring(i, i + n)
      i += 1
    }
    seen.toArray
  }

  /** FNV-1a 64-bit. */
  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Splitmix64 finalizer — cheap independent hash families for minhash. */
  @inline def mix64(zIn: Long): Long = {
    var z = zIn
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Per-thread MD5 instance — `getInstance` per row costs more than the
    * digest itself on short inputs; `digest()` resets the instance, so
    * reuse is safe.
    */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  @inline def md5(bytes: Array[Byte]): Array[Byte] = md5Local.get().digest(bytes)

  /** MinHash signature over character shingles. Hash family k for a shingle
    * is the classic two-lane affine form h1 + (seed+k)*h2 (mod 2^64), with
    * the lanes taken from the MD5 digest of the shingle (bytes 0-7 and 8-15,
    * big-endian) and the result masked to 63 bits so signed and unsigned
    * minima agree. MD5 + affine lanes keep the whole signature expressible
    * in the DuckDB oracle (`('0x' || substr(md5(sh), 1, 16))::UBIGINT` etc.),
    * unlike a custom mixer. Documents with high Jaccard similarity of
    * shingle sets share many signature slots (standard MinHash; the LSH
    * banding happens in the Dedup operator).
    */
  def minhash(text: String, numHashes: Int, shingleSize: Int, seed: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val sh = charShingles(text, shingleSize)
    var s = 0
    while (s < sh.length) {
      val d = md5(sh(s).getBytes("UTF-8"))
      var h1 = 0L; var h2 = 0L
      var i = 0
      while (i < 8) {
        h1 = (h1 << 8) | (d(i) & 0xffL)
        h2 = (h2 << 8) | (d(i + 8) & 0xffL)
        i += 1
      }
      var k = 0
      while (k < numHashes) {
        // Long arithmetic wraps mod 2^64; masking to 63 bits afterwards
        // equals (h1 + (seed+k)*h2) mod 2^63 — what the oracle computes in
        // HUGEINT
        val h = (h1 + (seed.toLong + k) * h2) & 0x7fffffffffffffffL
        if (h < sig(k)) sig(k) = h
        k += 1
      }
      s += 1
    }
    sig
  }

  /** Estimated Jaccard from two signatures. */
  def minhashJaccard(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }

  /** LSH band keys: one 64-bit key per band, hashing the band's signature
    * slice (FNV-style fold + splitmix finalizer). Two documents collide in
    * band b iff their signature slices for b are identical.
    */
  def bandKeys(sig: Array[Long], bands: Int): Array[Long] = {
    val rpb = sig.length / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0xcbf29ce484222325L ^ b.toLong
      var i = b * rpb
      val end = i + rpb
      while (i < end) {
        h = (h ^ sig(i)) * 0x100000001b3L
        i += 1
      }
      out(b) = mix64(h)
      b += 1
    }
    out
  }

  /** Verified near-dup pairs of one row against its bucket's REPRESENTATIVES
    * (the k lowest-id members of the bucket prefix up to this row). A pair
    * is emitted only from the FIRST band in which its signatures collide —
    * at most one band satisfies `mb == band`, so each unordered pair is
    * emitted at most once across the whole job and the caller needs no
    * global distinct/dedup shuffle. Only representatives with id strictly
    * below this row's id are checked, so a pair is generated by its
    * higher-id member only; when every bucket fits inside the cap this
    * enumerates exactly the all-pairs set. Oversized buckets degrade to
    * representative-chained emission — every member still pairs with the
    * bucket's lowest-id matches at O(cap) work per row (the batch analog of
    * `minhashLshStreaming`'s bounded representative scheme); the documented
    * recall loss is a pair whose first shared band capped out the lower-id
    * member while a later band kept it (cannot happen for identical
    * signatures, whose rep sets agree across bands).
    */
  def chainPairs(id: Long, myPacked: Array[Long],
      repIds: Array[Long], repPacked: Array[Array[Long]], band: Int, bands: Int,
      threshold: Double): Array[(Long, Long, Double)] = {
    // packed rows are signature ++ bandKeys (keys precomputed once
    // upstream and carried through the bounded agg — re-hashing 16 band
    // keys over a 64-long signature per (row, rep) would dominate the
    // kernel at the cap-sized-bucket worst case, and carrying keys as a
    // separate column would widen every shuffled row)
    val n = myPacked.length - bands
    val out = mutable.ArrayBuffer[(Long, Long, Double)]()
    var i = 0
    while (i < repIds.length) {
      if (repIds(i) < id) {
        val packed = repPacked(i)
        var mb = 0
        while (mb < bands && packed(n + mb) != myPacked(n + mb)) mb += 1
        if (mb == band) {
          var same = 0
          var k = 0
          while (k < n) { if (packed(k) == myPacked(k)) same += 1; k += 1 }
          val est = same.toDouble / n
          if (est >= threshold) {
            // reps come from the ascending-id bucket prefix, so the
            // representative id is the smaller one
            out += ((repIds(i), id, est))
          }
        }
      }
      i += 1
    }
    out.toArray
  }

  /** SimHash-64 over whitespace tokens; per-token 64 bits = first 8 bytes of
    * MD5 (big-endian). MD5 keeps the oracle expressible in DuckDB
    * (`md5(token)`), unlike a custom hash.
    */
  def simhash64(text: String): Long = {
    val counts = new Array[Int](64)
    tokens(text).foreach { t =>
      val d = md5(t.getBytes("UTF-8"))
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** n-gram heuristic language ID over a small built-in stopword table.
    * Counts whole-token stopword hits per language; argmax with a fixed
    * tie-break order. Deliberately simple so the oracle can replicate it.
    */
  val langStopwords: Seq[(String, Set[String])] = Seq(
    "en" -> Set("the", "and", "of", "to", "is", "in", "that", "it"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Set("le", "la", "les", "et", "est", "un", "une", "dans"),
    "es" -> Set("el", "los", "las", "es", "un", "una", "que", "por"),
    "zh" -> Set("的", "是", "在", "了", "和", "有", "我", "不"))

  def langId(text: String): String = {
    val toks = tokens(text.toLowerCase)
    var best = "und"
    var bestN = 0
    langStopwords.foreach { case (lang, words) =>
      val n = toks.count(words.contains)
      if (n > bestN) { best = lang; bestN = n }
    }
    best
  }

  /** Quality score in [0,1]: blend of token-length sanity, punctuation
    * ratio and uppercase ratio. Deterministic double arithmetic; the oracle
    * replicates term by term.
    */
  def qualityScore(text: String): Double = {
    val n = text.length
    if (n == 0) return 0.0
    val toks = tokens(text)
    val nTok = toks.length
    if (nTok == 0) return 0.0
    val meanLen = toks.map(_.length).sum.toDouble / nTok
    val lenScore = if (meanLen >= 3 && meanLen <= 10) 1.0
      else if (meanLen < 3) meanLen / 3.0 else 10.0 / meanLen
    var punct = 0
    var upper = 0
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (c == '.' || c == ',' || c == '!' || c == '?' || c == ';' || c == ':') punct += 1
      if (c >= 'A' && c <= 'Z') upper += 1
      i += 1
    }
    val punctScore = 1.0 - math.min(1.0, 5.0 * punct / n)
    val upperScore = 1.0 - math.min(1.0, 5.0 * upper / n)
    0.5 * lenScore + 0.25 * punctScore + 0.25 * upperScore
  }

  /** Like [[fingerprint]] but hashing k-grams with MD5 (first 8 bytes,
    * big-endian, compared unsigned) so the DuckDB oracle can replicate it:
    * `min(('0x' || substr(md5(gram), 1, 16))::UBIGINT)`.
    */
  def fingerprintMd5(text: String, k: Int): Long = {
    def h8(s: String): Long = {
      val d = md5(s.getBytes("UTF-8"))
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      h
    }
    if (text.length < k) return h8(text)
    var min = 0L
    var first = true
    var i = 0
    while (i + k <= text.length) {
      val h = h8(text.substring(i, i + k))
      if (first || java.lang.Long.compareUnsigned(h, min) < 0) { min = h; first = false }
      i += 1
    }
    min
  }

  /** Deterministic content-hash bucket in [0, n): unsigned residue of the
    * first 8 MD5 digest bytes. The standard leakage-free train/val split —
    * the same document always lands in the same bucket, independent of row
    * order, partitioning, or re-runs, and the oracle replicates it
    * (`('0x' || substr(md5(text), 1, 16))::UBIGINT % n`).
    */
  def md5Bucket(text: String, n: Int): Long = {
    require(n > 0, s"md5Bucket needs a positive bucket count (got $n)")
    val d = md5(text.getBytes("UTF-8"))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    java.lang.Long.remainderUnsigned(h, n.toLong)
  }

  /** Canonicalize an http(s) URL for URL-level dedup (the first dedup
    * pass of a web-crawl pipeline: CCNet / RefinedWeb dedup by URL before
    * any content hash). Rules — each chosen to be mirrorable by a SQL
    * oracle with string/list functions, so the whole operator is
    * differential-testable:
    *   1. trim; lowercase the scheme and host (path/query keep case);
    *   2. strip a leading `www.` host label;
    *   3. drop the default port (`:80` for http, `:443` for https);
    *   4. drop the fragment;
    *   5. empty path -> `/`; strip one trailing `/` from non-root paths;
    *   6. drop tracking params (`utm_*`, `gclid`, `fbclid`, `ref`,
    *      `mc_cid`, `mc_eid`), drop empties, sort the survivors
    *      lexicographically (whole `k=v` token, code-unit order), rejoin.
    * Non-hierarchical inputs (no `://`) pass through trimmed — garbage
    * stays distinct rather than colliding.
    */
  def canonicalUrl(url: String): String = {
    val trimmed = url.trim
    val schemeEnd = trimmed.indexOf("://")
    if (schemeEnd < 0) return trimmed
    val scheme = trimmed.substring(0, schemeEnd).toLowerCase
    val afterScheme = trimmed.substring(schemeEnd + 3)
    val hashIdx = afterScheme.indexOf('#')
    val rest = if (hashIdx >= 0) afterScheme.substring(0, hashIdx) else afterScheme
    val pathStart = {
      val i = rest.indexWhere(c => c == '/' || c == '?')
      if (i < 0) rest.length else i
    }
    var host = rest.substring(0, pathStart).toLowerCase
    if (host.startsWith("www.")) host = host.substring(4)
    val defPort =
      if (scheme == "http") ":80" else if (scheme == "https") ":443" else ""
    if (defPort.nonEmpty && host.endsWith(defPort))
      host = host.substring(0, host.length - defPort.length)
    val pq = rest.substring(pathStart)
    val qIdx = pq.indexOf('?')
    var path = if (qIdx >= 0) pq.substring(0, qIdx) else pq
    if (path.isEmpty) path = "/"
    if (path.length > 1 && path.endsWith("/")) path = path.substring(0, path.length - 1)
    val query = if (qIdx >= 0) pq.substring(qIdx + 1) else ""
    def isTracking(p: String): Boolean = {
      val eq = p.indexOf('=')
      val name = if (eq >= 0) p.substring(0, eq) else p
      name.startsWith("utm_") || name == "gclid" || name == "fbclid" ||
        name == "ref" || name == "mc_cid" || name == "mc_eid"
    }
    val kept = query.split("&").filter(p => p.nonEmpty && !isTracking(p)).sorted
    val q = if (kept.isEmpty) "" else "?" + kept.mkString("&")
    scheme + "://" + host + path + q
  }

  /** Rolling-hash document fingerprint: min FNV-1a hash over character
    * k-grams (a 1-hash winnowing sketch — stable under small edits at the
    * end of the document).
    */
  def fingerprint(text: String, k: Int): Long = {
    if (text.length < k) return fnv1a64(text.getBytes("UTF-8"))
    var min = Long.MaxValue
    var i = 0
    while (i + k <= text.length) {
      val h = fnv1a64(text.substring(i, i + k).getBytes("UTF-8"))
      // unsigned compare for stability
      if (java.lang.Long.compareUnsigned(h, min) < 0) min = h
      i += 1
    }
    min
  }

  /** A wordpiece vocabulary prepared for greedy longest-match encoding:
    * the piece set plus the maximum piece lengths (start pieces plain,
    * continuation pieces carry the `##` prefix), so the per-position
    * longest-match scan is bounded by the longest real piece instead of
    * the word length.
    */
  final class WpVocab(pieces: Iterable[String]) {
    val set = new java.util.HashSet[String]()
    var maxStart = 0
    var maxCont = 0
    var srcLen = 0 // element count of the source list (memo shape guard)
    pieces.foreach { p =>
      set.add(p)
      srcLen += 1
      if (p.startsWith("##")) maxCont = math.max(maxCont, p.length - 2)
      else maxStart = math.max(maxStart, p.length)
    }
  }

  val Unk = "[UNK]"

  /** Greedy longest-match subword encoding (the WordPiece tokenization
    * rule, Devlin et al. 2019 / Wu et al. 2016): each whitespace word
    * encodes left-to-right, always taking the LONGEST vocab piece that
    * matches at the current position (continuation pieces are matched in
    * their `##`-prefixed form); a position with no matching piece — or a
    * word longer than `maxWordChars` — renders the WHOLE word as `[UNK]`.
    * Deterministic: the longest match at a position is unique (a prefix
    * of a given length is one string). Mirrored by the t67 DuckDB
    * recursive-CTE oracle, so changes must land in lockstep.
    */
  def wordpiece(text: String, vocab: WpVocab, maxWordChars: Int): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    tokens(text).foreach { w =>
      if (w.length > maxWordChars) out += Unk
      else {
        var pos = 0
        var bad = false
        val pieces = mutable.ArrayBuffer.empty[String]
        while (pos < w.length && !bad) {
          val cap = if (pos == 0) vocab.maxStart else vocab.maxCont
          var len = math.min(w.length - pos, cap)
          var found: String = null
          while (len >= 1 && found == null) {
            val cand =
              if (pos == 0) w.substring(0, len)
              else "##" + w.substring(pos, pos + len)
            if (vocab.set.contains(cand)) found = cand
            len -= 1
          }
          if (found == null) bad = true
          else {
            pieces += found
            pos += (if (pos == 0) found.length else found.length - 2)
          }
        }
        if (bad) out += Unk else out ++= pieces
      }
    }
    out.toArray
  }
}

/** Embedding-vector kernels (similarity search). Inputs are float vectors
  * (the testdata `embeddings.embedding` column); math in double.
  */
object VecKernel {
  def dot(a: Array[Float], b: Array[Float]): Double = {
    // fail loud on mixed-dimension embeddings: a truncated dot against
    // full-vector norms would silently depress every cosine and corrupt
    // all ANN results instead of surfacing the ingest bug
    require(a.length == b.length,
      s"embedding dimension mismatch: ${a.length} vs ${b.length}")
    var s = 0.0
    var i = 0
    val n = a.length
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  def norm(a: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * a(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    val na = norm(a); val nb = norm(b)
    if (na == 0 || nb == 0) 0.0 else dot(a, b) / (na * nb)
  }

  /** Index of the centroid with highest cosine similarity (ties -> lowest
    * index). Used by the IVF similarity-search path: the centroid matrix is
    * tiny and rides into the expression as a literal, so list assignment is
    * a narrow map over the corpus — no shuffle.
    */
  def argmaxCosine(v: Array[Float], cents: Array[Array[Float]]): Int = {
    var best = -1
    var bestScore = Double.NegativeInfinity
    var i = 0
    while (i < cents.length) {
      val s = cosine(v, cents(i))
      if (s > bestScore) { bestScore = s; best = i }
      i += 1
    }
    best
  }

  /** Indices of the n centroids with highest cosine similarity, best first
    * (ties -> lowest index).
    */
  def topnCosine(v: Array[Float], cents: Array[Array[Float]], n: Int): Array[Int] = {
    val scored = cents.indices.map(i => (cosine(v, cents(i)), i))
    scored.sortBy { case (s, i) => (-s, i) }.take(n).map(_._2).toArray
  }

  /** Product-quantization encode (Jégou, Douze & Schmid 2011, "Product
    * Quantization for Nearest Neighbor Search"): split `v` into `m` equal
    * subvectors and pick, per subspace j, the L2-nearest codeword from the
    * flattened codebook (`cb(j * ksub + c)` = codeword c of subspace j;
    * ksub = cb.length / m; ties -> lowest code). Returns m codes — the
    * whole vector compresses to m small ints.
    */
  def pqEncode(v: Array[Float], cb: Array[Array[Float]], m: Int): Array[Int] = {
    require(m > 0 && cb.length % m == 0,
      s"pqEncode: codebook rows ${cb.length} not divisible by m=$m")
    require(v.length % m == 0,
      s"pqEncode: dim ${v.length} not divisible by m=$m")
    val ksub = cb.length / m
    val dsub = v.length / m
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val cw = cb(j * ksub + c)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val diff = v(j * dsub + i).toDouble - cw(i).toDouble
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    codes
  }

  /** Asymmetric distance computation: approximate inner product of the
    * full query `q` against a PQ-encoded vector — sum over subspaces of
    * dot(q_j, codeword(codes(j))). On L2-normalized inputs this
    * approximates the cosine. One O(dim) pass per (query, code) pair; the
    * codes are m ints where the original vector was dim floats — the
    * corpus side carries the 8-32x smaller representation through scan
    * and shuffle.
    */
  def pqAdcDot(q: Array[Float], codes: Array[Int], cb: Array[Array[Float]]): Double = {
    val m = codes.length
    require(m > 0 && cb.length % m == 0 && q.length % m == 0,
      s"pqAdcDot: inconsistent shapes (q=${q.length}, m=$m, cb=${cb.length})")
    val ksub = cb.length / m
    val dsub = q.length / m
    var s = 0.0
    var j = 0
    while (j < m) {
      val cw = cb(j * ksub + codes(j))
      var i = 0
      while (i < dsub) { s += q(j * dsub + i).toDouble * cw(i).toDouble; i += 1 }
      j += 1
    }
    s
  }

  /** L2-normalize (zero vectors pass through). */
  def l2normalize(v: Array[Float]): Array[Float] = {
    val n = norm(v)
    if (n == 0) v else v.map(x => (x / n).toFloat)
  }

  /** Random-hyperplane LSH: `bits` sign bits from seeded Rademacher (+-1)
    * planes. Plane component (b, j) is the low bit of the MD5 of
    * "lsh:seed:b:j" — deterministic, no stored model, and exactly
    * replicable by the DuckDB oracle (`md5(...)` + bit test). Sign-LSH with
    * +-1 components has the same cosine-collision guarantee as gaussian
    * planes (Charikar's SimHash construction).
    */
  def lshBucket(v: Array[Float], bits: Int, seed: Int): Long = {
    val planes = planeMatrix(bits, v.length, seed)
    var bucket = 0L
    var b = 0
    while (b < bits) {
      val row = planes(b)
      var s = 0.0
      var i = 0
      while (i < v.length) { s += row(i) * v(i); i += 1 }
      if (s >= 0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }


  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  /** +-1 plane matrix for (bits, dim, seed), derived from MD5 and cached —
    * planes are row-independent, so this is computed once per executor.
    */
  private def planeMatrix(bits: Int, dim: Int, seed: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((bits, dim, seed), { _ =>
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(bits, dim) { (b, j) =>
        val d = md.digest(s"lsh:$seed:$b:$j".getBytes("UTF-8"))
        var h = 0L
        var i = 0
        while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
        if ((h & 1L) == 1L) 1.0 else -1.0
      }
    })
}
