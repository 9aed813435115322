package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the sketching hot paths.
  *
  * The composable formulations (aggregate/zip_with/transform) are
  * interpreted per lambda call with boxing — fine for one-off columns,
  * dominant cost when executed 64× per token per row. These expressions
  * run one tight primitive loop per row instead (10–50× on the LSH
  * stages), and participate in whole-stage codegen: doGenCode emits a
  * direct static call on the already-generated child value (no
  * InternalRow materialization, no span break — the CodegenFallback
  * versions were the dominant cost of the n-gram pair stage). */

/** Shared primitive kernels. Top-level object ⇒ Java static forwarders, so
  * generated code can call `GraftHashOps.method(...)` directly. */
object GraftHashOps {

  def shingleHashes(input: UTF8String, k: Int): ArrayData = {
    val text = input.toString.toLowerCase(java.util.Locale.ROOT)
    val toks = text.trim.split("\\s+")
    val tokHashes = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      tokHashes(i) = XxHash64Function.hash(UTF8String.fromString(toks(i)), StringType, 42L)
      i += 1
    }
    val set = new java.util.LinkedHashSet[java.lang.Long]()
    if (toks.length < k) {
      var h = 17L
      var j = 0
      while (j < tokHashes.length) { h = XxHash64Function.hash(tokHashes(j), LongType, h); j += 1 }
      set.add(h)
    } else {
      var s = 0
      while (s <= toks.length - k) {
        var h = 17L
        var j = 0
        while (j < k) { h = XxHash64Function.hash(tokHashes(s + j), LongType, h); j += 1 }
        set.add(h)
        s += 1
      }
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** Hashed distinct CHARACTER k-grams (lowercased), first-seen order —
    * the shingle primitive for SHORT keys (names, titles, address
    * lines) where word shingles degenerate to one token. Strings
    * shorter than k yield their single whole-string hash, so every
    * non-empty key produces at least one gram. Windows hash by code
    * unit over one pass — no substring allocation per gram. */
  def charShingleHashes(input: UTF8String, k: Int): ArrayData = {
    val text = input.toString.toLowerCase(java.util.Locale.ROOT)
    val n = text.length
    val set = new java.util.LinkedHashSet[java.lang.Long]()
    if (n == 0) return new GenericArrayData(new Array[Long](0))
    if (n < k) {
      var h = 17L
      var i = 0
      while (i < n) {
        h = XxHash64Function.hash(text.charAt(i).toLong, LongType, h)
        i += 1
      }
      set.add(h)
    } else {
      var s = 0
      while (s <= n - k) {
        var h = 17L
        var j = 0
        while (j < k) {
          h = XxHash64Function.hash(text.charAt(s + j).toLong, LongType, h)
          j += 1
        }
        set.add(h)
        s += 1
      }
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** Positional rolling window hashes: hash of tokens [i, i+w) at index i
    * (0-based), ordered, NOT deduplicated — the span-level dedup primitive
    * (shingleHashes loses positions and repeats). Fewer than w tokens →
    * empty (a short doc has no w-window to match). */
  def windowHashes(input: UTF8String, w: Int): ArrayData = {
    val text = input.toString.toLowerCase(java.util.Locale.ROOT)
    val toks = text.trim.split("\\s+")
    if (toks.length < w) return new GenericArrayData(Array.emptyLongArray)
    val tokHashes = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      tokHashes(i) = XxHash64Function.hash(UTF8String.fromString(toks(i)), StringType, 42L)
      i += 1
    }
    val out = new Array[Long](toks.length - w + 1)
    var s = 0
    while (s <= toks.length - w) {
      var h = 17L
      var j = 0
      while (j < w) { h = XxHash64Function.hash(tokHashes(s + j), LongType, h); j += 1 }
      out(s) = h
      s += 1
    }
    new GenericArrayData(out)
  }

  def minhashLongs(arr: ArrayData, n: Int): ArrayData = {
    val sig = new Array[Long](n)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var e = 0
    val len = arr.numElements()
    while (e < len) {
      val h = arr.getLong(e)
      var i = 0
      while (i < n) {
        val hi = XxHash64Function.hash(h, LongType, i.toLong)
        if (hi < sig(i)) sig(i) = hi
        i += 1
      }
      e += 1
    }
    new GenericArrayData(sig)
  }

  def minhashStrings(arr: ArrayData, n: Int): ArrayData = {
    val sig = new Array[Long](n)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var e = 0
    val len = arr.numElements()
    while (e < len) {
      val h = XxHash64Function.hash(arr.getUTF8String(e), StringType, 42L)
      var i = 0
      while (i < n) {
        val hi = XxHash64Function.hash(h, LongType, i.toLong)
        if (hi < sig(i)) sig(i) = hi
        i += 1
      }
      e += 1
    }
    new GenericArrayData(sig)
  }

  def simhash64(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var e = 0
    val len = arr.numElements()
    while (e < len) {
      val h = XxHash64Function.hash(arr.getUTF8String(e), StringType, 42L)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1
        k += 1
      }
      e += 1
    }
    var fp = 0L
    var k = 0
    while (k < 64) {
      if (votes(k) > 0) fp |= (1L << k)
      k += 1
    }
    fp
  }

  /** murmur3 of (int, int, long) matching functions.hash(p, i, lit(seed)). */
  private def hashInt3(p: Int, i: Int, seed: Long): Int = {
    var h = Murmur3_x86_32.hashInt(p, 42)
    h = Murmur3_x86_32.hashInt(i, h)
    h = Murmur3_x86_32.hashLong(seed, h)
    h
  }

  def hyperplaneSignature(arr: ArrayData, planes: Int, seed: Long, table: Int): Int = {
    val dims = arr.numElements()
    var sig = 0
    var p = 0
    while (p < planes) {
      val pid = table * planes + p
      var proj = 0.0
      var i = 0
      while (i < dims) {
        // plane component: murmur3(hash(p', i, seed)) / MaxInt in [-1, 1)
        val comp = hashInt3(pid, i, seed) / Int.MaxValue.toDouble
        proj += arr.getFloat(i).toDouble * comp
        i += 1
      }
      if (proj >= 0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  /** Cosine accumulated in double in array order — bit-identical to the
    * SQL formulation Σ aᵢ·bᵢ / (√Σ aᵢ² · √Σ bᵢ²) (oracle parity). */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** L2-normalize a float vector (double accumulation; zero vectors pass
    * through). One primitive loop — the composable
    * transform-divides-by-sqrt-aggregate formulation re-evaluates the
    * norm per element (HOF-capture trap). */
  def l2Normalize(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val x = v.getFloat(i).toDouble; ss += x * x; i += 1 }
    if (ss == 0.0) return v
    val norm = math.sqrt(ss)
    val out = new Array[Float](n)
    i = 0
    while (i < n) { out(i) = (v.getFloat(i).toDouble / norm).toFloat; i += 1 }
    new GenericArrayData(out)
  }

  /** Unicode NFC normalization (java.text.Normalizer). Spark has no
    * built-in normalization function; DuckDB's nfc_normalize is the
    * oracle counterpart. Pure-ASCII input short-circuits — the common
    * case pays one scan, no allocation. */
  def nfcNormalize(input: UTF8String): UTF8String = {
    val s = input.toString
    var ascii = true
    var i = 0
    while (ascii && i < s.length) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii || java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** Argmax-cosine centroid index; ties keep the lowest index. */
  def nearestCentroid(v: ArrayData, cs: Array[Array[Float]]): Int = {
    val dims = v.numElements()
    var vn = 0.0
    var i = 0
    while (i < dims) { val x = v.getFloat(i).toDouble; vn += x * x; i += 1 }
    val vNorm = math.sqrt(vn)
    var best = -1
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < cs.length) {
      val cv = cs(c)
      val n = math.min(dims, cv.length)
      var dot = 0.0
      var cn = 0.0
      var j = 0
      while (j < n) {
        val x = v.getFloat(j).toDouble
        val y = cv(j).toDouble
        dot += x * y
        cn += y * y
        j += 1
      }
      val sim = dot / (vNorm * math.sqrt(cn))
      if (sim > bestSim) { bestSim = sim; best = c }
      c += 1
    }
    // a zero (or NaN-containing) vector makes every sim NaN and no
    // comparison fires — default to cell 0 instead of returning -1
    // (which would crash downstream element_at(…, 0))
    if (best < 0) 0 else best
  }

  /** Index of `v`'s quantile bucket: the count of `bounds` strictly
    * below `v`, by binary search — the per-row half of z-order rank
    * normalization. O(log B) per row vs the O(B) interpreted
    * higher-order-function scan (HOFs are CodegenFallback; at 255
    * boundaries × millions of rows the scan dominated the write). */
  def bucketIndex(v: Double, bounds: Array[Double]): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v > bounds(mid)) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Centered projection onto row-major `components` (k×d): out_j =
    * Σ_i (v_i − mean_i)·C_j_i — the PCA/rotation apply kernel. One tight
    * loop per row, float output (storage parity with the embedding
    * column). */
  def projectCentered(v: ArrayData, mean: Array[Double],
      components: Array[Array[Double]]): ArrayData = {
    val d = math.min(v.numElements(), mean.length)
    val centered = new Array[Double](d)
    var i = 0
    while (i < d) {
      centered(i) = v.getFloat(i) - mean(i)
      i += 1
    }
    val out = new Array[Any](components.length)
    var j = 0
    while (j < components.length) {
      val c = components(j)
      var acc = 0.0
      var x = 0
      val lim = math.min(d, c.length)
      while (x < lim) { acc += centered(x) * c(x); x += 1 }
      out(j) = acc.toFloat
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Deflate compression ratio of the text's UTF-8 bytes (compressed ÷
    * raw, BEST_SPEED, raw stream — no zlib header noise on short docs).
    * The model-free repetition proxy quality pipelines use alongside
    * rule gates: templated/looping text compresses far below prose,
    * and the signal needs no trained model, no vocabulary, and no
    * second pass. One Deflater per call, output buffer reused and only
    * COUNTED (never kept) — memory is O(64 KB) regardless of doc size.
    * Empty text ratios 1.0 by convention. */
  def compressionRatio(input: UTF8String): Double = {
    val bytes = input.getBytes
    if (bytes.length == 0) return 1.0
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.BEST_SPEED, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](65536)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / bytes.length
    } finally d.end()
  }

  /** d-dimensional Hilbert-curve index of non-negative coords, each in
    * [0, 2^bits): Skilling's transpose algorithm (J. Skilling,
    * "Programming the Hilbert curve", AIP Conf. Proc. 707, 2004) —
    * convert axes to the transposed Hilbert form in place, then
    * interleave bit-planes MSB-first into one long. O(bits·d) integer
    * ops per row, no allocation beyond the caller's coords array
    * (MUTATED in place — callers pass a scratch buffer). Total index
    * width bits·d must fit a non-negative long (≤ 63 bits). */
  def hilbertIndex(x: Array[Long], bits: Int): Long = {
    val n = x.length
    // axes → transposed Hilbert (Gray-ish decode with axis rotations)
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0L) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) {
      if ((x(n - 1) & q) != 0L) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // transposed planes → single index: bit b of x(j) lands at output
    // bit b·n + (n−1−j) (x(0) carries the most significant plane bits)
    var h = 0L
    var b = 0
    while (b < bits) {
      var j = 0
      while (j < n) {
        h |= ((x(j) >>> b) & 1L) << (b * n + (n - 1 - j))
        j += 1
      }
      b += 1
    }
    h
  }

  /** Nearest centroid by squared L2 distance (ties keep the lowest
    * index) — the product-quantization codebook metric: PQ minimizes
    * per-subspace reconstruction error ‖x_s − c‖², which argmax-cosine
    * does not (it ignores magnitude). Same guard as the cosine variant:
    * NaN distances never fire a comparison → default to cell 0. */
  def nearestCentroidL2(v: ArrayData, cs: Array[Array[Float]]): Int = {
    val dims = v.numElements()
    var best = -1
    var bestDist = Double.PositiveInfinity
    var c = 0
    while (c < cs.length) {
      val cv = cs(c)
      val n = math.min(dims, cv.length)
      var dist = 0.0
      var j = 0
      while (j < n) {
        val d = v.getFloat(j).toDouble - cv(j).toDouble
        dist += d * d
        j += 1
      }
      if (dist < bestDist) { bestDist = dist; best = c }
      c += 1
    }
    if (best < 0) 0 else best
  }

  /** The n nearest centroids by cosine, ascending-similarity-last —
    * i.e. result(0) is the argmax [[nearestCentroid]] would return, ties
    * broken by lower index (same rule). The per-query probe-cell
    * selection of a batched k-NN join, where queries are ROWS and the
    * driver-side sort used by the single-query search cannot run.
    * Insertion-select into fixed arrays: n is the nProbe knob (≤ tens),
    * so O(k·n) beats a heap. Zero/NaN vectors fall back to cell 0,
    * matching [[nearestCentroid]]. */
  def nearestCentroidsTopN(v: ArrayData, cs: Array[Array[Float]],
      n: Int): ArrayData = {
    val dims = v.numElements()
    var vn = 0.0
    var i = 0
    while (i < dims) { val x = v.getFloat(i).toDouble; vn += x * x; i += 1 }
    val vNorm = math.sqrt(vn)
    val take = math.min(n, cs.length)
    val topIdx = new Array[Int](take)
    val topSim = new Array[Double](take)
    var filled = 0
    var c = 0
    while (c < cs.length) {
      val cv = cs(c)
      val m = math.min(dims, cv.length)
      var dot = 0.0
      var cn = 0.0
      var j = 0
      while (j < m) {
        val x = v.getFloat(j).toDouble
        val y = cv(j).toDouble
        dot += x * y
        cn += y * y
        j += 1
      }
      val sim = dot / (vNorm * math.sqrt(cn))
      // insert if it beats the current tail (strictly — equal sims keep
      // the earlier index, the nearestCentroid tie rule); NaN never
      // inserts, so a degenerate vector hits the filled==0 fallback
      if (!java.lang.Double.isNaN(sim) &&
          (filled < take || sim > topSim(filled - 1))) {
        var pos = if (filled < take) filled else take - 1
        while (pos > 0 && sim > topSim(pos - 1)) {
          topSim(pos) = topSim(pos - 1); topIdx(pos) = topIdx(pos - 1)
          pos -= 1
        }
        topSim(pos) = sim; topIdx(pos) = c
        if (filled < take) filled += 1
      }
      c += 1
    }
    if (filled == 0) new GenericArrayData(Array(0))
    else new GenericArrayData(java.util.Arrays.copyOf(topIdx, filled))
  }

  /** Coarse-cell residual: x − centroids(cell), the IVFADC encode input
    * (Jégou 2011 §IV-A — quantizing the residual instead of the raw
    * vector spends the code budget on the within-cell detail the coarse
    * quantizer already localized). Out-of-range cells fail fast. */
  def centroidResidual(v: ArrayData, cell: Int,
      table: Array[Array[Float]]): ArrayData = {
    if (cell < 0 || cell >= table.length)
      throw new IllegalArgumentException(
        s"cell $cell out of range [0, ${table.length})")
    val cent = table(cell)
    val n = v.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      out(i) = v.getFloat(i) - (if (i < cent.length) cent(i) else 0f)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Σ_i q(i)·codes(i) — the code-side contraction of an SQ8
    * (per-vector min/max scalar-quantized) inner product: with
    * x̂_i = min + code_i·(max−min)/255,
    * ⟨q, x̂⟩ = min·Σq + (max−min)/255 · THIS. Integer codes never touch
    * float reconstruction inside the scan. */
  def sq8Dot(codes: ArrayData, q: Array[Float]): Double = {
    val n = math.min(codes.numElements(), q.length)
    var sum = 0.0
    var i = 0
    while (i < n) { sum += q(i) * codes.getInt(i).toDouble; i += 1 }
    sum
  }

  /** Asymmetric-distance (ADC) score of one PQ code row: Σ_s
    * lut[s·kPer + codes(s)], where `lut` is the query's flat
    * per-subspace inner-product table. m array reads per row in a tight
    * loop — the hot full-corpus scan of PQ search. Out-of-range codes
    * fail fast: a corrupt code silently reading another subspace's table
    * segment would return a plausible-but-wrong score. */
  def adcScore(codes: ArrayData, lut: Array[Double], kPer: Int): Double = {
    val m = codes.numElements()
    var sum = 0.0
    var s = 0
    while (s < m) {
      val c = codes.getInt(s)
      if (c < 0 || c >= kPer)
        throw new IllegalArgumentException(
          s"PQ code $c out of range [0, $kPer) at subspace $s")
      sum += lut(s * kPer + c)
      s += 1
    }
    sum
  }

  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** Per-document DSIR score over an n-gram array: each gram buckets at
    * `(unsigned 32-bit of its md5 prefix) % buckets` — bit-identical to
    * SQL `conv(substring(md5(g), 1, 8), 16, 10) % buckets` (the first 8
    * hex chars ARE the first 4 digest bytes) — and `iw` accumulates
    * `lut[bucket]` per OCCURRENCE. Returns (n_feats, iw). One tight
    * loop per row, MessageDigest reused thread-locally: the scoring
    * pass needs no explode, no shuffle, no join. */
  def dsirScore(grams: ArrayData, lut: Array[Double], buckets: Int): InternalRow = {
    val md = md5Local.get()
    val n = grams.numElements()
    var iw = 0.0
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(grams.getUTF8String(i).getBytes)
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      iw += lut((h % buckets).toInt)
      i += 1
    }
    InternalRow(n.toLong, iw)
  }

  /** Line-level repetition and boilerplate signals (Rae et al., Gopher
    * 2021 §A1.1), all five from ONE hash pass over the doc's non-empty
    * trimmed lines: (n_lines, dup_line_frac, dup_line_char_frac,
    * bullet_line_frac, ellipsis_line_frac). dup_line_frac counts every
    * occurrence beyond a line's first; dup_line_char_frac weights those
    * occurrences by character length over total line characters. The
    * explode-lines → groupBy(doc, line) formulation shuffles the corpus
    * at LINE granularity twice; this is a per-row expression — zero
    * shuffle, and the per-doc hash map is bounded by the doc itself. */
  def lineRepStats(input: UTF8String): InternalRow = {
    val lines = input.toString.split("\n", -1)
    val counts = new java.util.HashMap[String, Array[Int]]()
    var n = 0
    var totalChars = 0L
    var bullets = 0
    var ellipses = 0
    var i = 0
    while (i < lines.length) {
      val l = lines(i).trim
      if (l.nonEmpty) {
        n += 1
        totalChars += l.length
        val c0 = l.charAt(0)
        if (c0 == '-' || c0 == '*' || c0 == '•') bullets += 1
        if (l.endsWith("...") || l.charAt(l.length - 1) == '…') ellipses += 1
        val slot = counts.get(l)
        if (slot == null) counts.put(l, Array(1)) else slot(0) += 1
      }
      i += 1
    }
    if (n == 0)
      return new GenericInternalRow(Array[Any](0, 0.0, 0.0, 0.0, 0.0))
    var dupLines = 0
    var dupChars = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue()(0)
      if (c > 1) {
        dupLines += c - 1
        dupChars += (c - 1).toLong * e.getKey.length
      }
    }
    new GenericInternalRow(Array[Any](n,
      dupLines.toDouble / n,
      dupChars.toDouble / totalChars,
      bullets.toDouble / n,
      ellipses.toDouble / n))
  }

  /** Shannon entropy (bits) of the string's code-point distribution,
    * via the order-insensitive identity H = log2(n) − (Σ c·log2 c)/n —
    * near 0 for degenerate repetition, ~4.2 for English prose, ~log2 of
    * the alphabet for random bytes. Empty input → 0.0. One pass, one
    * doc-bounded count map — a per-row expression, zero shuffle. */
  def charEntropy(input: UTF8String): Double = {
    val s = input.toString
    if (s.isEmpty) return 0.0
    val counts = new java.util.HashMap[Integer, Array[Int]]()
    var i = 0
    var n = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1)) else slot(0) += 1
    }
    val ln2 = math.log(2.0)
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0).toDouble
      acc += c * (math.log(c) / ln2)
    }
    math.log(n) / ln2 - acc / n
  }

  /** Greedy BPE segmentation of one lowercased, whitespace-split text
    * (Sennrich 2016 apply): per word, repeatedly merge every occurrence
    * of the adjacent symbol pair with the LOWEST merge rank until no
    * ranked pair remains; emit all words' subwords in order. The rank
    * key joins the pair with a space — symbols come from
    * whitespace-split words and can never contain one, so ("a","bc")
    * never collides with ("ab","c"). Per-row work bounded by the row;
    * the rank table rides as a codegen reference object. */
  def bpeSegment(input: UTF8String,
      ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val words = input.toLowerCase.toString.trim.split("\\s+")
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var w = 0
    while (w < words.length) {
      val word = words(w)
      if (word.nonEmpty) {
        var syms = new java.util.ArrayList[String]()
        var i = 0
        while (i < word.length) {
          val cp = word.codePointAt(i)
          val cc = Character.charCount(cp)
          syms.add(word.substring(i, i + cc))
          i += cc
        }
        var done = false
        while (!done && syms.size > 1) {
          var bestRank = Int.MaxValue
          var bestPair: String = null
          var j = 0
          while (j < syms.size - 1) {
            val key = syms.get(j) + " " + syms.get(j + 1)
            val r = ranks.get(key)
            if (r != null && r.intValue() < bestRank) {
              bestRank = r.intValue(); bestPair = key
            }
            j += 1
          }
          if (bestPair == null) done = true
          else {
            val merged = new java.util.ArrayList[String](syms.size)
            var k = 0
            while (k < syms.size) {
              if (k < syms.size - 1 &&
                  (syms.get(k) + " " + syms.get(k + 1)) == bestPair) {
                merged.add(syms.get(k) + syms.get(k + 1)); k += 2
              } else { merged.add(syms.get(k)); k += 1 }
            }
            syms = merged
          }
        }
        var m = 0
        while (m < syms.size) {
          out += UTF8String.fromString(syms.get(m)); m += 1
        }
      }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** How many of the array's 64-bit hashes the Bloom filter might
    * contain — the map-side prefilter count for Bloom-gated
    * decontamination. Overestimates only (Bloom filters have no false
    * negatives), so a `count >= minHits` gate never drops a true
    * candidate. */
  def bloomContainedCount(arr: ArrayData,
      bf: org.apache.spark.util.sketch.BloomFilter): Int = {
    val len = arr.numElements()
    var hits = 0
    var i = 0
    while (i < len) {
      if (bf.mightContainLong(arr.getLong(i))) hits += 1
      i += 1
    }
    hits
  }
}

private object Gen {
  val Ops = "org.apache.spark.sql.graft.GraftHashOps"
}

/** xxHash64 of each string element, then an n-way min-sketch:
  * sig[i] = min over elements of xxh64(elementHash, seed=i).
  * Input: array<string>; output: array<long> of length n. */
case class MinHashSignature(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_minhash_signature"

  override def nullSafeEval(input: Any): Any =
    GraftHashOps.minhashStrings(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${Gen.Ops}.minhashStrings($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** 64-bit SimHash over string elements: per-element xxHash64, bit-majority
  * vote. Input: array<string>; output: long. */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = LongType
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(GraftHashOps.simhash64(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${Gen.Ops}.simhash64($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Hyperplane sign signature: project the float vector onto `planes`
  * deterministic pseudo-random hyperplanes (murmur3-derived components in
  * [-1,1)), pack signs into an int bucket id. Input: array<float>. */
case class HyperplaneSignature(child: Expression, planes: Int, seed: Long, table: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = IntegerType
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_hyperplane_signature"

  override def nullSafeEval(input: Any): Any =
    java.lang.Integer.valueOf(GraftHashOps.hyperplaneSignature(
      input.asInstanceOf[ArrayData], planes, seed, table))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${Gen.Ops}.hyperplaneSignature($c, $planes, ${seed}L, $table);")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)
}

/** Hashed distinct k-shingles straight from text: lowercase, whitespace-
  * tokenize, and hash each k-token window by chaining per-token xxHash64 —
  * one pass, no intermediate shingle strings (the composable
  * split+transform+array_join formulation costs ~150 interpreted
  * array_joins per row and dominated the LSH pipelines).
  * Input: string; output: array<long> (distinct). Fewer than k tokens →
  * one shingle over all tokens (matching Dedup.shingles). */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    GraftHashOps.shingleHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${Gen.Ops}.shingleHashes($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Hashed distinct character k-grams (see
  * GraftHashOps.charShingleHashes) — the short-key shingle primitive
  * for fuzzy record linkage. */
case class CharShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_char_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    GraftHashOps.charShingleHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${Gen.Ops}.charShingleHashes($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): CharShingleHashes =
    copy(child = newChild)
}

/** Positional rolling w-token window hashes (see GraftHashOps.windowHashes).
  * Input: string; output: array<long>, index i = window starting at token i. */
case class WindowHashes(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_window_hashes"

  override def nullSafeEval(input: Any): Any =
    GraftHashOps.windowHashes(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${Gen.Ops}.windowHashes($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
}

/** MinHash signature over pre-hashed shingles (array<long>). */
case class MinHashSignatureLongs(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_minhash_signature_longs"

  override def nullSafeEval(input: Any): Any =
    GraftHashOps.minhashLongs(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${Gen.Ops}.minhashLongs($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureLongs =
    copy(child = newChild)
}

/** Cosine similarity of two float vectors, accumulated in double in array
  * order (bit-identical to the SQL formulation — required for oracle
  * parity). */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(GraftHashOps.cosine(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = ${Gen.Ops}.cosine($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Index of the nearest centroid by cosine similarity (double accumulation
  * in array order, same arithmetic as CosineSimilarity); ties keep the
  * lowest index. Centroids ride along in the expression (a handful of
  * small vectors — broadcast with the serialized plan), so cell assignment
  * is one map-side pass: no corpus expansion, no shuffle, no window. */
case class NearestCentroidIndex(child: Expression, centroids: Seq[Seq[Float]])
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = IntegerType
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_nearest_centroid"

  @transient private lazy val cs: Array[Array[Float]] = centroids.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any =
    java.lang.Integer.valueOf(GraftHashOps.nearestCentroid(
      input.asInstanceOf[ArrayData], cs))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val csRef = ctx.addReferenceObj("centroids", cs, "float[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${Gen.Ops}.nearestCentroid($c, $csRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidIndex =
    copy(child = newChild)
}

/** Quantile-bucket index of a double column against sorted boundary
  * literals (see GraftHashOps.bucketIndex): codegen'd binary search,
  * one tight loop per row — the map-side assignment step of the
  * z-order layout writer. */
case class BucketIndex(child: Expression, bounds: Seq[Double])
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = IntegerType
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bucket_index"

  @transient private lazy val bs: Array[Double] = bounds.toArray

  override def nullSafeEval(input: Any): Any =
    java.lang.Integer.valueOf(GraftHashOps.bucketIndex(
      input.asInstanceOf[Double], bs))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("bounds", bs, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${Gen.Ops}.bucketIndex($c, $bRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BucketIndex =
    copy(child = newChild)
}

/** Centered linear projection of a float vector onto a k×d component
  * matrix (see GraftHashOps.projectCentered) — the PCA apply path.
  * Mean and components ride inline as reference objects (k·d doubles —
  * model-sized, like the PQ LUTs); codegen'd, shuffle-free. */
case class ProjectCentered(child: Expression, mean: Seq[Double],
    components: Seq[Seq[Double]])
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_project_centered"

  @transient private lazy val m: Array[Double] = mean.toArray
  @transient private lazy val cs: Array[Array[Double]] =
    components.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any =
    GraftHashOps.projectCentered(input.asInstanceOf[ArrayData], m, cs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("pcaMean", m, "double[]")
    val cRef = ctx.addReferenceObj("pcaComps", cs, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${Gen.Ops}.projectCentered($c, $mRef, $cRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): ProjectCentered =
    copy(child = newChild)
}

/** Deflate compression ratio of a text column (see
  * GraftHashOps.compressionRatio) — codegen'd scalar, zero shuffle. */
case class CompressionRatio(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_compression_ratio"

  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(GraftHashOps.compressionRatio(
      input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${Gen.Ops}.compressionRatio($c);")

  override protected def withNewChildInternal(newChild: Expression): CompressionRatio =
    copy(child = newChild)
}

/** d-dimensional Hilbert-curve position of long-typed coordinates (see
  * GraftHashOps.hilbertIndex). The layout alternative to the Morton
  * z-value: the Hilbert curve never makes the long diagonal jumps
  * Morton's bit-interleave takes between quadrants, so consecutive
  * curve positions are always ADJACENT cells — tighter per-file
  * bounding boxes at the same file count. Codegen'd straight-line
  * integer loop; participates in whole-stage codegen like any built-in. */
case class HilbertIndex(children: Seq[Expression], bits: Int)
    extends Expression with ExpectsInputTypes {
  require(children.nonEmpty && children.size <= 8,
    "1 to 8 hilbert coordinates")
  require(bits >= 1 && bits * children.size <= 63,
    s"bits*dims must fit a non-negative long, got $bits*${children.size}")

  override def dataType: DataType = LongType
  override def inputTypes: Seq[AbstractDataType] =
    Seq.fill(children.size)(LongType)
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "graft_hilbert_index"

  override def eval(input: InternalRow): Any = {
    val arr = new Array[Long](children.size)
    var i = 0
    while (i < arr.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      arr(i) = v.asInstanceOf[Long]
      i += 1
    }
    java.lang.Long.valueOf(GraftHashOps.hilbertIndex(arr, bits))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("hcoords")
    val anyNull = evals.map(_.isNull.toString).mkString(" || ")
    val fill = evals.zipWithIndex
      .map { case (e, i) => s"$arr[$i] = ${e.value};" }.mkString("\n")
    val childCode = evals.map(_.code.toString).mkString("\n")
    ev.copy(code = code"""
      $childCode
      boolean ${ev.isNull} = $anyNull;
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        long[] $arr = new long[${children.size}];
        $fill
        ${ev.value} = ${Gen.Ops}.hilbertIndex($arr, $bits);
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertIndex =
    copy(children = newChildren)
}

/** [[NearestCentroidIndex]] under squared-L2 distance instead of cosine —
  * the codebook metric for product quantization (see
  * GraftHashOps.nearestCentroidL2). Centroids ride inline; PQ codebooks
  * are small by construction (k per subspace, typically 256). */
case class NearestCentroidL2Index(child: Expression, centroids: Seq[Seq[Float]])
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = IntegerType
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_nearest_centroid_l2"

  @transient private lazy val cs: Array[Array[Float]] = centroids.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any =
    java.lang.Integer.valueOf(GraftHashOps.nearestCentroidL2(
      input.asInstanceOf[ArrayData], cs))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val csRef = ctx.addReferenceObj("centroids", cs, "float[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${Gen.Ops}.nearestCentroidL2($c, $csRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidL2Index =
    copy(child = newChild)
}

/** [[NearestCentroidIndex]] reading the centroid table from a Spark
  * BROADCAST instead of embedding it in the expression: at large k·d
  * (say 10⁵ centroids × 768 dims) an embedded table is hundreds of MB
  * serialized into every task's plan, while a broadcast ships once per
  * executor over the torrent protocol and the plan carries only the
  * handle. Same arithmetic, same tie-breaking — assignment results are
  * identical to the inline variant. The generated code resolves
  * `bc.value()` once per partition into a mutable field, so the per-row
  * path is the same array walk as the inline variant. */
case class NearestCentroidBroadcast(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[Array[Array[Float]]])
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = IntegerType
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_nearest_centroid_bc"

  override def nullSafeEval(input: Any): Any =
    java.lang.Integer.valueOf(GraftHashOps.nearestCentroid(
      input.asInstanceOf[ArrayData], bc.value))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("centroidsBc", bc,
      "org.apache.spark.broadcast.Broadcast")
    // one broadcast resolution per generated-class instance (≈ per
    // partition), not per row
    val cs = ctx.addMutableState("float[][]", "graftCentroids",
      v => s"$v = (float[][]) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${Gen.Ops}.nearestCentroid($c, $cs);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidBroadcast =
    copy(child = newChild)
}

/** ADC score of a PQ code array against a query's flat lookup table
  * (see GraftHashOps.adcScore). The table (m·kPer doubles, built
  * driver-side) rides as a reference object, so scoring is m array
  * reads inside whole-stage codegen — the `aggregate()` higher-order
  * formulation this replaces is CodegenFallback and evaluated
  * interpreted per row per subspace, the same pitfall [[BucketIndex]]
  * fixed for the z-order writer, and ADC is the hot full-corpus scan
  * of the billion-vector search path. */
case class PqAdcScore(child: Expression, lut: Seq[Double], kPer: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(IntegerType))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_pq_adc_score"

  @transient private lazy val l: Array[Double] = lut.toArray

  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(GraftHashOps.adcScore(
      input.asInstanceOf[ArrayData], l, kPer))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("lut", l, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${Gen.Ops}.adcScore($c, $lRef, $kPer);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcScore =
    copy(child = newChild)
}

/** The n nearest centroids of a vector by cosine, best first (see
  * GraftHashOps.nearestCentroidsTopN) — per-ROW probe-cell selection
  * for the batched k-NN join, where the driver-side cell ranking of the
  * single-query searches cannot run because queries are data. Same
  * reference-object centroid table and tie rules as
  * [[NearestCentroidIndex]]. */
case class NearestCentroidsTopN(child: Expression,
    centroids: Seq[Seq[Float]], n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_nearest_centroids_topn"

  @transient private lazy val cs: Array[Array[Float]] =
    centroids.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any =
    GraftHashOps.nearestCentroidsTopN(input.asInstanceOf[ArrayData], cs, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val csRef = ctx.addReferenceObj("centroids", cs, "float[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${Gen.Ops}.nearestCentroidsTopN($c, $csRef, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidsTopN =
    copy(child = newChild)
}

/** Code-side SQ8 inner-product contraction Σ q_i·code_i (see
  * GraftHashOps.sq8Dot). The query rides as a reference object; the
  * per-row work is one fused int-load/multiply-add loop inside
  * whole-stage codegen — the scan never reconstructs floats, the
  * (q_min, q_max) affine correction is plain column arithmetic
  * outside. */
case class Sq8Dot(child: Expression, query: Seq[Float])
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(IntegerType))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_sq8_dot"

  @transient private lazy val q: Array[Float] = query.toArray

  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(GraftHashOps.sq8Dot(
      input.asInstanceOf[ArrayData], q))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qRef = ctx.addReferenceObj("query", q, "float[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${Gen.Ops}.sq8Dot($c, $qRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Sq8Dot =
    copy(child = newChild)
}

/** Coarse-cell residual x − centroids[cell] (see
  * GraftHashOps.centroidResidual) — the map-side encode input of
  * residual IVF-PQ. The centroid table rides as a reference object
  * (coarse tables are k·d floats; for very large k pair this with a
  * broadcast the way [[NearestCentroidBroadcast]] does for assignment).
  * Codegen'd: a zip_with(vec, element_at(...)) composition would be a
  * CodegenFallback HOF on the full-corpus encode scan. */
case class CentroidResidual(left: Expression, right: Expression,
    centroids: Seq[Seq[Float]])
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), IntegerType)
  override def prettyName: String = "graft_centroid_residual"

  @transient private lazy val cs: Array[Array[Float]] =
    centroids.map(_.toArray).toArray

  override def nullSafeEval(vec: Any, cell: Any): Any =
    GraftHashOps.centroidResidual(vec.asInstanceOf[ArrayData],
      cell.asInstanceOf[Int], cs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val csRef = ctx.addReferenceObj("centroids", cs, "float[][]")
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = ${Gen.Ops}.centroidResidual($v, $c, $csRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CentroidResidual =
    copy(left = newLeft, right = newRight)
}

/** L2 normalization of a float vector (codegen'd; see
  * GraftHashOps.l2Normalize). */
case class L2Normalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_l2_normalize"

  override def nullSafeEval(input: Any): Any =
    GraftHashOps.l2Normalize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${Gen.Ops}.l2Normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): L2Normalize =
    copy(child = newChild)
}

/** Unicode NFC normalization of a string column (codegen'd; see
  * GraftHashOps.nfcNormalize). */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = StringType
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    GraftHashOps.nfcNormalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${Gen.Ops}.nfcNormalize($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Column-level wrappers. */
/** Gopher-style line-repetition signals as one struct-valued pass (see
  * GraftHashOps.lineRepStats): n_lines + four fractions from a single
  * per-row hash loop, inside whole-stage codegen. The alternative —
  * explode lines, groupBy(doc, line), re-aggregate — shuffles the
  * corpus at line granularity twice; at 100 TB the line table is the
  * corpus several times over. */
case class LineRepStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = LineRepStats.schema
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_line_rep_stats"

  override def nullSafeEval(input: Any): Any =
    GraftHashOps.lineRepStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${Gen.Ops}.lineRepStats($c);")

  override protected def withNewChildInternal(newChild: Expression): LineRepStats =
    copy(child = newChild)
}

object LineRepStats {
  val schema: StructType = StructType(Seq(
    StructField("n_lines", IntegerType, nullable = false),
    StructField("dup_line_frac", DoubleType, nullable = false),
    StructField("dup_line_char_frac", DoubleType, nullable = false),
    StructField("bullet_line_frac", DoubleType, nullable = false),
    StructField("ellipsis_line_frac", DoubleType, nullable = false)))
}

/** Per-document DSIR log-likelihood-ratio score over a pre-built n-gram
  * array (see GraftHashOps.dsirScore). The log-ratio LUT rides as a
  * reference object into the generated class — one `double[]` per plan,
  * like [[PqAdcScore]]'s ADC table; the per-row path is a tight
  * md5-and-accumulate loop with no explode, no shuffle, no join. */
case class DsirScore(child: Expression, lut: Array[Double], buckets: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DsirScore.schema
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_dsir_score"

  override def nullSafeEval(input: Any): Any =
    GraftHashOps.dsirScore(input.asInstanceOf[ArrayData], lut, buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("dsirLut", lut, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${Gen.Ops}.dsirScore($c, $lutRef, $buckets);")
  }

  override protected def withNewChildInternal(newChild: Expression): DsirScore =
    copy(child = newChild)
}

object DsirScore {
  val schema: StructType = StructType(Seq(
    StructField("n_feats", LongType, nullable = false),
    StructField("iw", DoubleType, nullable = false)))
}

/** Greedy BPE subword segmentation under a learned merge-rank table
  * (see GraftHashOps.bpeSegment). */
case class BpeSegment(child: Expression,
    ranks: java.util.HashMap[String, Integer])
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bpe_segment"

  override def nullSafeEval(input: Any): Any =
    GraftHashOps.bpeSegment(input.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${Gen.Ops}.bpeSegment($c, $ranksRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSegment =
    copy(child = newChild)
}

/** Shannon entropy (bits) of a string's code-point distribution (see
  * GraftHashOps.charEntropy). */
case class CharEntropy(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_char_entropy"

  override def nullSafeEval(input: Any): Any =
    GraftHashOps.charEntropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${Gen.Ops}.charEntropy($c);")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

/** Count of array elements a broadcast Bloom filter might contain (see
  * GraftHashOps.bloomContainedCount). The filter rides as a broadcast
  * handle — like [[NearestCentroidBroadcast]], the generated code
  * resolves `bc.value()` once per generated-class instance, so the
  * per-row path is a tight mightContainLong loop with no per-row
  * broadcast lookup. */
case class BloomContainedCount(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[
      org.apache.spark.util.sketch.BloomFilter])
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = IntegerType
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bloom_contained_count"

  override def nullSafeEval(input: Any): Any =
    java.lang.Integer.valueOf(GraftHashOps.bloomContainedCount(
      input.asInstanceOf[ArrayData], bc.value))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bc,
      "org.apache.spark.broadcast.Broadcast")
    val bf = ctx.addMutableState("org.apache.spark.util.sketch.BloomFilter",
      "graftBloom",
      v => s"$v = (org.apache.spark.util.sketch.BloomFilter) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${Gen.Ops}.bloomContainedCount($c, $bf);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContainedCount =
    copy(child = newChild)
}

object sketch {
  import org.apache.spark.sql.classic.ExpressionUtils.{column, expression}
  def minhash_signature(c: Column, n: Int): Column =
    column(MinHashSignature(expression(c), n))
  def simhash64(c: Column): Column = column(SimHash64(expression(c)))
  def hyperplane_signature(c: Column, planes: Int, seed: Long, table: Int): Column =
    column(HyperplaneSignature(expression(c), planes, seed, table))
  def cosine(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))
  def shingle_hashes(c: Column, k: Int): Column =
    column(ShingleHashes(expression(c), k))
  def char_shingle_hashes(c: Column, k: Int): Column =
    column(CharShingleHashes(expression(c), k))
  def window_hashes(c: Column, w: Int): Column =
    column(WindowHashes(expression(c), w))
  def nfc(c: Column): Column = column(NfcNormalize(expression(c)))
  def l2_normalize(c: Column): Column = column(L2Normalize(expression(c)))
  def minhash_signature_longs(c: Column, n: Int): Column =
    column(MinHashSignatureLongs(expression(c), n))
  def nearest_centroid(c: Column, centroids: Seq[Seq[Float]]): Column =
    column(NearestCentroidIndex(expression(c), centroids))
  def nearest_centroid_bc(c: Column,
      bc: org.apache.spark.broadcast.Broadcast[Array[Array[Float]]]): Column =
    column(NearestCentroidBroadcast(expression(c), bc))
  def nearest_centroid_l2(c: Column, centroids: Seq[Seq[Float]]): Column =
    column(NearestCentroidL2Index(expression(c), centroids))
  def bucket_index(c: Column, bounds: Seq[Double]): Column =
    column(BucketIndex(expression(c), bounds))
  def hilbert_index(cs: Seq[Column], bits: Int): Column =
    column(HilbertIndex(cs.map(expression), bits))
  def compression_ratio(c: Column): Column =
    column(CompressionRatio(expression(c)))
  def project_centered(c: Column, mean: Seq[Double],
      components: Seq[Seq[Double]]): Column =
    column(ProjectCentered(expression(c), mean, components))
  def pq_adc_score(c: Column, lut: Seq[Double], kPer: Int): Column =
    column(PqAdcScore(expression(c), lut, kPer))
  def centroid_residual(vec: Column, cell: Column,
      centroids: Seq[Seq[Float]]): Column =
    column(CentroidResidual(expression(vec), expression(cell), centroids))
  def sq8_dot(codes: Column, query: Seq[Float]): Column =
    column(Sq8Dot(expression(codes), query))
  def nearest_centroids_topn(vec: Column, centroids: Seq[Seq[Float]],
      n: Int): Column =
    column(NearestCentroidsTopN(expression(vec), centroids, n))
  def line_rep_stats(c: Column): Column = column(LineRepStats(expression(c)))
  def dsir_score(c: Column, lut: Array[Double], buckets: Int): Column =
    column(DsirScore(expression(c), lut, buckets))
  def char_entropy(c: Column): Column = column(CharEntropy(expression(c)))
  def bpe_segment(c: Column,
      ranks: java.util.HashMap[String, Integer]): Column =
    column(BpeSegment(expression(c), ranks))
  def bloom_contained_count(c: Column,
      bc: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter]): Column =
    column(BloomContainedCount(expression(c), bc))
  def ac_matches(c: Column,
      bc: org.apache.spark.broadcast.Broadcast[AcAutomaton]): Column =
    column(AcMatches(expression(c), bc))
}
