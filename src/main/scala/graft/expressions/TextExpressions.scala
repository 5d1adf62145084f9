package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom expressions for per-document fingerprint kernels.
  *
  * Each replaces a higher-order-function fold whose interpreted
  * per-element lambda calls dominate corpus-scale runs. Hash values are
  * bit-identical to the HOF formulations (Spark's two-argument xxhash64
  * chain: seed 42, then per-child XXH64 mix), so swapping implementations
  * never changes results. Every expression has a real `doGenCode` that
  * calls its static kernel in [[TextKernels]]: the tokenization child
  * stays inside WholeStageCodegen (a CodegenFallback here would force the
  * whole subtree — including the regex split — through interpreted eval).
  */
object TextExpr {
  private def col(e: Expression): Column = ExpressionUtils.column(e)
  private def expr(c: Column): Expression = ExpressionUtils.expression(c)

  /** Public Column↔Expression bridge for code outside org.apache.spark.sql
    * (ExpressionUtils is private[sql]) — used by the SQL function injector
    * to wrap composed Column functions as expression builders.
    * expressionOf converts the whole ColumnNode tree to catalyst
    * expressions (ColumnNodeToExpressionConverter): a plain
    * ExpressionUtils.expression wrapper leaves a ColumnNodeExpression
    * leaf that the SQL analyzer would never resolve.
    */
  def columnOf(e: Expression): Column = col(e)
  def expressionOf(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** O(1) hash-probe membership in a bounded driver-built id set (see
    * [[LongSetContains]] — never array_contains over a plan literal,
    * whose per-probe linear scan goes quadratic when both the set and
    * the probed relation grow with the corpus).
    */
  def inLongSet(c: Column, ids: Array[Long]): Column =
    columnOf(LongSetContains(expressionOf(c), new LongIdSet(ids)))

  /** Order-sensitive chained hash over a token array:
    * acc_{i+1} = xxhash64(acc_i, tok_i), acc_0 = 0.
    */
  def rollingHash(tokens: Column): Column = col(RollingHash(expr(tokens)))

  /** Winnowing-style sketch: the `w` smallest distinct xxhash64 values of
    * the n-gram shingles of the token array, ascending.
    */
  def winnowSketch(tokens: Column, n: Int, w: Int): Column =
    col(WinnowSketch(expr(tokens), n, w))

  /** SimHash-64 over a token array: token hash bit p votes ±1 on
    * accumulator p; sign bits pack into the fingerprint.
    */
  def simhash64(tokens: Column): Column = col(SimHash64(expr(tokens)))

  /** Portable SimHash variant: per-token MD5 (first 64 digest bits,
    * hex-reading order) instead of xxhash64, fingerprint returned as a
    * 64-char '0'/'1' string — reproducible by any engine with an md5()
    * (the DuckDB oracle recomputes it from hex digits).
    */
  def md5SimhashBits(tokens: Column): Column = col(Md5SimHashBits(expr(tokens)))

  /** k-component MinHash signature over the n-gram shingles of a token
    * array; null when the array has fewer than n tokens.
    */
  def minhashSig(tokens: Column, n: Int, k: Int): Column =
    col(MinHashSig(expr(tokens), n, k))

  /** Deduplicated space-joined n-gram shingles of a token array —
    * compiled twin of array_distinct(transform(sequence, concat_ws ∘
    * slice)), same strings in the same (first-occurrence) order.
    */
  def shinglesOf(tokens: Column, n: Int): Column = col(ShinglesOf(expr(tokens), n))

  /** Per-position xxhash64 gram fingerprints of a token array — see
    * [[TextKernels.gramHashes]].
    */
  def gramHashes(tokens: Column, n: Int): Column = col(GramHashes(expr(tokens), n))

  /** Per-position md5 HEX fingerprints of every n-token window — the
    * compiled twin of transform(sequence(1, len-n+1),
    * i → md5(concat_ws(' ', slice(a, i, n)))): identical lowercase-hex
    * strings in position order. The interpreted HOF rebuilt a fresh
    * string AND evaluated a lambda per corpus gram — the dominant
    * in-task cost of the exact-fingerprint span operators (d30/d31);
    * the kernel digests each window as a slice of one shared joined
    * buffer ([[TextKernels.joinDoc]]).
    */
  def md5GramHexes(tokens: Column, n: Int): Column = col(Md5GramHexes(expr(tokens), n))

  /** n-grams with multiplicity — compiled twin of the
    * transform(sequence, concat_ws ∘ slice) HOF, same strings in order.
    */
  def ngramsOf(tokens: Column, n: Int): Column = col(NgramsOf(expr(tokens), n))

  /** LSH band buckets of a MinHash signature: array of (band,
    * xxhash64(band, sig[band·r .. band·r+r])) structs, bit-identical to
    * the transform(sequence(...)) HOF formulation (Spark's two-argument
    * xxhash64 over an int and an array<long> slice) but compiled — the
    * banding runs once per corpus row, and an interpreted lambda there
    * is per-row overhead at any scale.
    */
  def minhashBands(sig: Column, bands: Int, r: Int): Column =
    col(MinHashBands(expr(sig), bands, r))

  /** SimHash pigeonhole chunks: array of (chunk, chunk-bits) structs —
    * the compiled twin of the shiftright/mask transform lambda.
    */
  def simhashChunks(simhash: Column, chunks: Int, width: Int): Column =
    col(SimHashChunks(expr(simhash), chunks, width))

  /** Count of positions where two long arrays hold equal values — the
    * matching-components numerator of the MinHash Jaccard estimator.
    * Runs once per CANDIDATE pair, so it must be a compiled loop: the
    * zip_with + aggregate formulation evaluates interpreted (~1 ms per
    * 64-component pair) and dominated candidate prefiltering at scale.
    */
  def sigMatchCount(a: Column, b: Column): Column =
    col(SigMatchCount(expr(a), expr(b)))

  /** Six stopword/CJK/punctuation counters in ONE text scan — replaces
    * the six regexp_extract_all passes of the language-ID + quality
    * heuristics (each pass re-walked the whole document).
    */
  def langQualityCounts(text: Column): Column = col(LangQualityCounts(expr(text)))

  /** BPE subword pieces per word of a token array (greedy lowest-rank
    * merging with the learned codec): array&lt;array&lt;string&gt;&gt;,
    * inner concat == the word. The codec rides along as a codegen
    * reference object — the model is bounded (the merge table), the
    * walk is one pass per document, pure map.
    */
  def bpeEncode(tokens: Column, codec: graft.functions.BpeCodec): Column =
    col(BpeEncode(expr(tokens), codec))

  /** Flat decodable BPE id stream of a token array — see
    * [[TextKernels.bpeEncodeIdStream]].
    */
  def bpeEncodeIdStream(tokens: Column, idc: graft.functions.BpeIdCodec): Column =
    col(BpeEncodeIdStream(expr(tokens), idc))

  /** Whitespace-normalized text back from an id stream — see
    * [[TextKernels.bpeDecodeIdStream]].
    */
  def bpeDecodeIdStream(ids: Column, idc: graft.functions.BpeIdCodec): Column =
    col(BpeDecodeIdStream(expr(ids), idc))

  /** Gopher-style repetition counters over a token array — see
    * [[TextKernels.repetitionCounts]].
    */
  def repetitionCounts(tokens: Column): Column = col(RepetitionCounts(expr(tokens)))

  /** Kept tokens after intra-document duplicated-k-gram span removal —
    * see [[TextKernels.repetitionScrub]].
    */
  def repetitionScrub(tokens: Column, k: Int): Column =
    col(RepetitionScrub(expr(tokens), k))

  /** Whole-document md5 winnowing: (empreinte, sketch) struct — the
    * pure-map replacement for the posexplode + windows formulation.
    */
  def md5WinnowSketch(tokens: Column, n: Int, w: Int): Column =
    col(Md5WinnowSketch(expr(tokens), n, w))

  /** Non-overlapping width-token chunks — compiled twin of the
    * transform(sequence) HOF.
    */
  def chunksOf(tokens: Column, width: Int): Column = col(ChunksOf(expr(tokens), width))
}

/** Static JIT-friendly kernels shared by interpreted eval and generated
  * code. A top-level object with no companion class compiles to a mirror
  * class with static methods, so janino-generated Java calls
  * `TextKernels.rollingHash(arr)` directly — one static call per row, the
  * loop body JIT-compiled once.
  */
object TextKernels {
  private val space = UTF8String.fromString(" ")

  /** xxhash64(string-col) — Spark seed 42. */
  @inline private def hashTok(t: UTF8String): Long = XXH64.hashUTF8String(t, 42L)

  /** MessageDigest.getInstance does a provider lookup per call; digests
    * are stateful, so share per thread, reset per use.
    */
  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  def rollingHash(a: ArrayData): Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    // xxhash64(long-col, string-col) — Spark chains child hashes
    while (i < n) {
      acc = XXH64.hashUTF8String(a.getUTF8String(i), XXH64.hashLong(acc, 42L))
      i += 1
    }
    acc
  }

  /** Hash of the space-joined n-token shingle starting at i. */
  @inline private def shingleHash(a: ArrayData, i: Int, n: Int): Long = {
    val parts = new Array[UTF8String](2 * n - 1)
    var j = 0
    while (j < n) {
      if (j > 0) parts(2 * j - 1) = space
      parts(2 * j) = a.getUTF8String(i + j)
      j += 1
    }
    hashTok(UTF8String.concat(parts: _*))
  }

  /** The document's tokens space-joined ONCE into a shared buffer with
    * per-token start/end byte offsets. Every n-token window's joined
    * gram is then a contiguous SLICE [starts(i), ends(i+n-1)) of it —
    * the per-window hash/digest reads the shared bytes directly, where
    * the former per-window build (a parts array + UTF8String.concat)
    * allocated and copied O(gram · doc) bytes per document; this copies
    * O(doc) once (guide step 2: per-task work — same hash function,
    * same bytes, bit-identical values). Null tokens return null —
    * callers fall back to the per-window path (the HOF null-skip
    * semantics can't be expressed as a slice).
    */
  private final class JoinedDoc(
      val buf: Array[Byte], val starts: Array[Int], val ends: Array[Int])

  private def joinDoc(a: ArrayData): JoinedDoc = {
    val nTok = a.numElements()
    val lens = new Array[Int](nTok)
    var total = if (nTok > 1) nTok - 1 else 0
    var i = 0
    while (i < nTok) {
      val t = a.getUTF8String(i)
      if (t == null) return null
      lens(i) = t.numBytes()
      total += lens(i)
      i += 1
    }
    val buf = new Array[Byte](total)
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var pos = 0
    i = 0
    while (i < nTok) {
      if (i > 0) { buf(pos) = ' '.toByte; pos += 1 }
      starts(i) = pos
      a.getUTF8String(i).writeToMemory(
        buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + pos)
      pos += lens(i)
      ends(i) = pos
      i += 1
    }
    new JoinedDoc(buf, starts, ends)
  }

  /** xxhash64 (seed 42) of the window's slice of the joined buffer —
    * the same bytes [[shingleHash]] concatenates, hashed in place.
    */
  @inline private def sliceHash(d: JoinedDoc, i: Int, n: Int): Long =
    XXH64.hashUnsafeBytes(d.buf,
      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + d.starts(i),
      d.ends(i + n - 1) - d.starts(i), 42L)

  /** xxhash64 (Spark seed 42) of every n-token window's space-joined
    * gram, in position order: out(i) = hash of the gram starting at
    * 0-based i — the compiled twin of transform(sequence(1, len-n+1),
    * i → xxhash64(concat_ws(' ', slice(a, i, n)))), which evaluated an
    * interpreted lambda + a fresh string build per corpus gram and
    * dominated the span-scrub stage. Empty when fewer than n tokens.
    */
  def gramHashes(a: ArrayData, n: Int): ArrayData = {
    val nTok = a.numElements()
    if (nTok < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](nTok - n + 1)
    val d = joinDoc(a)
    var i = 0
    if (d == null) while (i <= nTok - n) { out(i) = shingleHash(a, i, n); i += 1 }
    else while (i <= nTok - n) { out(i) = sliceHash(d, i, n); i += 1 }
    new GenericArrayData(out)
  }

  private val hexDigits = "0123456789abcdef".getBytes

  /** Lowercase md5 hex of every n-token window's space-joined gram, in
    * position order — bit-identical to Spark's
    * md5(concat_ws(' ', slice(a, i, n))) per position (same joined
    * bytes, same digest, same lowercase hex). Windows digest slices of
    * the shared joined buffer; the null-token fallback replicates
    * concat_ws's null-skip via [[joinWindow]].
    */
  def md5GramHexes(a: ArrayData, n: Int): ArrayData = {
    val nTok = a.numElements()
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val d = joinDoc(a)
    val md = md5Local.get()
    val out = new Array[AnyRef](nTok - n + 1)
    var i = 0
    while (i <= nTok - n) {
      md.reset()
      val digest =
        if (d != null) {
          md.update(d.buf, d.starts(i), d.ends(i + n - 1) - d.starts(i))
          md.digest()
        } else md.digest(joinWindow(a, i, n).getBytes)
      val hex = new Array[Byte](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = hexDigits((digest(b) >> 4) & 0xf)
        hex(2 * b + 1) = hexDigits(digest(b) & 0xf)
        b += 1
      }
      out(i) = UTF8String.fromBytes(hex)
      i += 1
    }
    new GenericArrayData(out)
  }

  def winnowSketch(a: ArrayData, n: Int, w: Int): ArrayData = {
    val nTok = a.numElements()
    if (nTok < n) return new GenericArrayData(Array.empty[Long])
    val hs = new java.util.TreeSet[java.lang.Long]()
    val d = joinDoc(a)
    var i = 0
    if (d == null) while (i <= nTok - n) { hs.add(shingleHash(a, i, n)); i += 1 }
    else while (i <= nTok - n) { hs.add(sliceHash(d, i, n)); i += 1 }
    val out = new Array[Long](math.min(w, hs.size))
    val it = hs.iterator()
    var k = 0
    while (k < out.length) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** MinHash signature; null when fewer than n tokens. Each shingle is
    * hashed once, then mixed per component with
    * XXH64.hashLong(shingleHash, seeds(c)) — k cheap long mixes instead
    * of k string hashes.
    */
  def minhashSig(a: ArrayData, n: Int, k: Int, seeds: Array[Long]): ArrayData = {
    val nTok = a.numElements()
    if (nTok < n) return null
    val sig = Array.fill(k)(Long.MaxValue)
    val d = joinDoc(a)
    var i = 0
    while (i <= nTok - n) {
      val h0 = if (d == null) shingleHash(a, i, n) else sliceHash(d, i, n)
      var c = 0
      while (c < k) {
        val h = XXH64.hashLong(h0, seeds(c))
        if (h < sig(c)) sig(c) = h
        c += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  def md5SimhashBits(a: ArrayData): UTF8String = {
    val nTok = a.numElements()
    val weights = new Array[Int](64)
    val md = md5Local.get()
    var i = 0
    while (i < nTok) {
      md.reset()
      val digest = md.digest(a.getUTF8String(i).getBytes)
      var j = 0
      while (j < 64) {
        if (((digest(j >> 3) & 0xff) >>> (7 - (j & 7)) & 1) == 1) weights(j) += 1
        else weights(j) -= 1
        j += 1
      }
      i += 1
    }
    val bits = new Array[Byte](64)
    var j = 0
    while (j < 64) { bits(j) = if (weights(j) > 0) '1' else '0'; j += 1 }
    UTF8String.fromBytes(bits)
  }

  /** Space-join of the token window [start, start+len), skipping null
    * elements exactly as concat_ws does (all-null → ""). The declared
    * gram schemas are containsNull = false; without the skip,
    * UTF8String.concat would null out any gram touching a null token
    * and violate that schema on the SQL surface.
    */
  private def joinWindow(a: ArrayData, start: Int, len: Int): UTF8String = {
    val parts = new Array[UTF8String](2 * len - 1)
    var k = 0
    var j = 0
    while (j < len) {
      val t = a.getUTF8String(start + j)
      if (t != null) {
        if (k > 0) { parts(k) = space; k += 1 }
        parts(k) = t; k += 1
      }
      j += 1
    }
    if (k == 0) UTF8String.EMPTY_UTF8
    else UTF8String.concat(java.util.Arrays.copyOfRange(parts, 0, k): _*)
  }

  /** Deduplicated space-joined n-gram shingles (first-occurrence order,
    * matching array_distinct(transform(...)) bit-for-bit). Runs per
    * VERIFICATION-CANDIDATE doc in the dedup pipeline — under
    * high-collision corpora those number in the thousands, where the
    * interpreted HOF build cost ~1 ms per doc.
    */
  def shinglesOf(a: ArrayData, n: Int): ArrayData = {
    val nTok = a.numElements()
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= nTok - n) {
      seen.add(joinWindow(a, i, n))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size)))
  }

  /** n-grams WITH multiplicity (the corpus-frequency unit) — same
    * strings as [[shinglesOf]] before its dedup, same order.
    */
  def ngramsOf(a: ArrayData, n: Int): ArrayData = {
    val nTok = a.numElements()
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[AnyRef](nTok - n + 1)
    var i = 0
    while (i <= nTok - n) {
      out(i) = joinWindow(a, i, n)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Band buckets: (band, xxhash64(band, sig-slice)) — the chained hash
    * matches Spark's two-argument xxhash64 over (int, array<long>):
    * seed 42 → hashInt(band) → per-element hashLong fold over the slice.
    */
  def minhashBands(sig: ArrayData, bands: Int, r: Int): ArrayData = {
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var h = XXH64.hashInt(b, 42L)
      var j = 0
      while (j < r) { h = XXH64.hashLong(sig.getLong(b * r + j), h); j += 1 }
      out(b) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](b, h))
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Pigeonhole chunks: (chunk, (h >> chunk·width) & mask) — arithmetic
    * shift to mirror Spark's shiftright exactly.
    */
  def simhashChunks(h: Long, chunks: Int, width: Int): ArrayData = {
    val mask = (1L << width) - 1
    val out = new Array[Any](chunks)
    var c = 0
    while (c < chunks) {
      out(c) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](c, (h >> (c * width)) & mask))
      c += 1
    }
    new GenericArrayData(out)
  }

  def sigMatchCount(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    // null slots never match (getLong on a null slot reads raw 0 bits,
    // which would spuriously equal a real 0L); internal signatures are
    // null-free, but the SQL surface accepts nullable-element arrays
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  def simhash64(a: ArrayData): Long = {
    val nTok = a.numElements()
    val weights = new Array[Long](64)
    var i = 0
    while (i < nTok) {
      val h = hashTok(a.getUTF8String(i))
      var p = 0
      while (p < 64) {
        if (((h >>> p) & 1L) == 1L) weights(p) += 1L else weights(p) -= 1L
        p += 1
      }
      i += 1
    }
    var fp = 0L
    var p = 0
    while (p < 64) { if (weights(p) > 0) fp |= (1L << p); p += 1 }
    fp
  }

  /** Non-overlapping `width`-token chunks (space-joined), full chunks
    * only — compiled twin of the transform(sequence, concat_ws ∘ slice)
    * HOF (same strings, same order).
    */
  def chunksOf(a: ArrayData, width: Int): ArrayData = {
    val nTok = a.numElements()
    if (nTok < width) return new GenericArrayData(Array.empty[Any])
    val out = new Array[AnyRef](nTok / width)
    var c = 0
    while (c < out.length) {
      out(c) = joinWindow(a, c * width, width)
      c += 1
    }
    new GenericArrayData(out)
  }

  /** MOSS-style md5 winnowing, whole-document kernel: 3-gram md5-16
    * fingerprints, window-w minima (truncated at the tail, matching
    * ROWS BETWEEN CURRENT ROW AND w-1 FOLLOWING), deduplicated and
    * sorted — plus the global minimum as the document fingerprint.
    * Returns (empreinte, comma-joined sketch); ("", "") under n tokens.
    *
    * This replaces a posexplode + two doc-partitioned windows + a
    * collect_list groupBy: that plan shuffled and SORTED every token
    * occurrence in the corpus (~100 M rows at the 100× stress) to
    * compute a value that only ever depends on one document. Here it is
    * pure map — no exchange at any corpus size; the md5 work itself is
    * unchanged (bit-identical output, same DuckDB oracle).
    */
  def md5WinnowSketch(a: ArrayData, n: Int, w: Int)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val empty = UTF8String.EMPTY_UTF8
    val nTok = a.numElements()
    if (nTok < n)
      return org.apache.spark.sql.catalyst.InternalRow(empty, empty)
    val grams = nTok - n + 1
    val md = md5Local.get()
    val d = joinDoc(a)
    val hs = new Array[String](grams)
    var i = 0
    while (i < grams) {
      md.reset()
      // digest the window's slice of the shared joined buffer (same
      // bytes the former per-window concat built — see joinDoc)
      val digest =
        if (d != null) {
          md.update(d.buf, d.starts(i), d.ends(i + n - 1) - d.starts(i))
          md.digest()
        } else {
          val parts = new Array[UTF8String](2 * n - 1)
          var j = 0
          while (j < n) {
            if (j > 0) parts(2 * j - 1) = space
            parts(2 * j) = a.getUTF8String(i + j)
            j += 1
          }
          md.digest(UTF8String.concat(parts: _*).getBytes)
        }
      // first 8 digest bytes = the 16-hex-char prefix of md5 hex
      val hex = new Array[Char](16)
      var b = 0
      while (b < 8) {
        hex(2 * b) = Character.forDigit((digest(b) >> 4) & 0xf, 16)
        hex(2 * b + 1) = Character.forDigit(digest(b) & 0xf, 16)
        b += 1
      }
      hs(i) = new String(hex)
      i += 1
    }
    var empreinte = hs(0)
    i = 1
    while (i < grams) { if (hs(i) < empreinte) empreinte = hs(i); i += 1 }
    val minima = new java.util.TreeSet[String]()
    i = 0
    while (i < grams) {
      var m = hs(i)
      var j = i + 1
      val end = math.min(i + w, grams)
      while (j < end) { if (hs(j) < m) m = hs(j); j += 1 }
      minima.add(m)
      i += 1
    }
    val sb = new java.lang.StringBuilder()
    val it = minima.iterator()
    while (it.hasNext) { if (sb.length > 0) sb.append(','); sb.append(it.next()) }
    org.apache.spark.sql.catalyst.InternalRow(
      UTF8String.fromString(empreinte), UTF8String.fromString(sb.toString))
  }

  /** word → language-membership bitmask for [[langQualityCounts]]
    * (bit 0 en, 1 fr, 2 de, 3 es). Built once; words are the exact
    * case-sensitive stopword alternatives of the regex formulation.
    */
  private val stopMask: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    def add(words: Seq[String], bit: Int): Unit = words.foreach { w =>
      val prev = m.get(w)
      m.put(w, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << bit)))
    }
    add(Seq("the", "a", "of", "to", "in", "and", "is", "it", "that", "for"), 0)
    add(Seq("le", "la", "les", "de", "des", "un", "une", "et", "est", "que"), 1)
    add(Seq("der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "auf"), 2)
    add(Seq("el", "la", "los", "las", "de", "un", "una", "y", "es", "que"), 3)
    m
  }

  /** Word char for \b purposes. Java's \b is UNICODE-aware even without
    * UNICODE_CHARACTER_CLASS (unlike \w, which stays ASCII): "idées"
    * is ONE word, so \bes\b does not match its tail — the kernel must
    * agree with the regexp_extract_all formulation it replaces.
    */
  @inline private def isWordChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'

  /** One pass over the raw text replacing SIX regexp_extract_all scans:
    * counts[0..3] = en/fr/de/es stopword hits (the \b(...)\b regex
    * semantics: a maximal word-char run equal to a stopword — inside a
    * run there are no word boundaries, so run-membership and the
    * non-overlapping regex count coincide exactly), counts[4] = CJK
    * chars in U+4E00..U+9FFF, counts[5] = [.,!?;:] punctuation chars.
    */
  /** BPE-encode each token of the array: nested (word → pieces)
    * arrays. Null tokens (possible on the nullable SQL surface) encode
    * as an empty piece array — losslessness holds for the non-null
    * rows, and nothing NPEs.
    */
  /** Flat decodable BPE id stream: per word, the piece ids (memoized
    * codec walk + one hash probe per piece), with the codec's reserved
    * separator id between consecutive words — one compiled pass per
    * document (the interpreted transform + element_at(map) formulation
    * paid a lambda per corpus piece).
    */
  def bpeEncodeIdStream(a: ArrayData, idc: graft.functions.BpeIdCodec): ArrayData = {
    val n = a.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Int])
    val buf = new scala.collection.mutable.ArrayBuffer[Int](n * 4)
    var i = 0
    while (i < n) {
      if (i > 0) buf += idc.sepId
      val ids = idc.idsOf(a.getUTF8String(i).toString)
      var j = 0
      while (j < ids.length) { buf += ids(j); j += 1 }
      i += 1
    }
    new GenericArrayData(buf.toArray)
  }

  /** Exact inverse of [[bpeEncodeIdStream]] for unk-free streams:
    * separator → single space, every other id → its piece text, one
    * string build per document. An unknown id fails loudly — a lossy
    * stream must never decode to silently wrong text.
    */
  def bpeDecodeIdStream(ids: ArrayData, idc: graft.functions.BpeIdCodec): UTF8String = {
    val n = ids.numElements()
    val sb = new java.lang.StringBuilder(n * 4)
    var i = 0
    while (i < n) {
      val id = ids.getInt(i)
      if (id == idc.sepId) sb.append(' ')
      else {
        val p = idc.pieceOf(id)
        if (p == null) throw new IllegalArgumentException(
          s"bpeDecodeIdStream: id $id is not in the vocabulary (lossy stream — " +
            "the corpus carries pieces the tokenizer never learned; re-train it)")
        sb.append(p)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def bpeEncode(a: ArrayData, codec: graft.functions.BpeCodec): ArrayData = {
    val n = a.numElements()
    val out = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      val t = a.getUTF8String(i)
      out(i) =
        if (t == null) new GenericArrayData(Array.empty[Any])
        else {
          val pieces = codec.encodeWord(t.toString)
          val arr = new Array[AnyRef](pieces.length)
          var j = 0
          while (j < pieces.length) {
            arr(j) = UTF8String.fromString(pieces(j)); j += 1
          }
          new GenericArrayData(arr)
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  def langQualityCounts(s: UTF8String): ArrayData = {
    val str = s.toString
    val counts = new Array[Long](6)
    val n = str.length
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (isWordChar(c)) {
        var j = i
        while (j < n && isWordChar(str.charAt(j))) {
          val cj = str.charAt(j)
          if (cj >= 0x4e00 && cj <= 0x9fff) counts(4) += 1L
          j += 1
        }
        // longest stopword is 5 chars — longer runs never hit, so skip
        // the substring allocation for them
        val mask = if (j - i <= 5) stopMask.get(str.substring(i, j)) else null
        if (mask != null) {
          val m = mask.intValue()
          if ((m & 1) != 0) counts(0) += 1L
          if ((m & 2) != 0) counts(1) += 1L
          if ((m & 4) != 0) counts(2) += 1L
          if ((m & 8) != 0) counts(3) += 1L
        }
        i = j
      } else {
        if (c >= 0x4e00 && c <= 0x9fff) counts(4) += 1L
        else if (c == '.' || c == ',' || c == '!' || c == '?' || c == ';' || c == ':')
          counts(5) += 1L
        i += 1
      }
    }
    new GenericArrayData(counts)
  }

  /** One pass over a token array computing the Gopher-style repetition
    * counters: [n_tokens, top-token occurrences, n_bigrams, top-bigram
    * occurrences, bigram instances whose bigram occurs ≥ 2 in the doc].
    * In-row hash maps — a per-doc statistic must never become a
    * corpus-wide (doc, gram) shuffle. Fractions are derived by the
    * caller (top/total and duplicated/total).
    */
  def repetitionCounts(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](5)
    out(0) = n.toLong
    if (n > 0) {
      val tokCounts = new java.util.HashMap[UTF8String, Integer](n * 2)
      var top = 0
      var i = 0
      while (i < n) {
        val c = tokCounts.merge(a.getUTF8String(i), Integer.valueOf(1),
          (x: Integer, y: Integer) => Integer.valueOf(x.intValue() + y.intValue()))
        if (c.intValue() > top) top = c.intValue()
        i += 1
      }
      out(1) = top.toLong
    }
    if (n >= 2) {
      val biCounts = new java.util.HashMap[String, Integer](n * 2)
      var i = 0
      while (i < n - 1) {
        val bg = a.getUTF8String(i).toString + " " + a.getUTF8String(i + 1).toString
        biCounts.merge(bg, Integer.valueOf(1),
          (x: Integer, y: Integer) => Integer.valueOf(x.intValue() + y.intValue()))
        i += 1
      }
      out(2) = (n - 1).toLong
      var topBg = 0L
      var dup = 0L
      val it = biCounts.values().iterator()
      while (it.hasNext) {
        val c = it.next().intValue()
        if (c > topBg) topBg = c.toLong
        if (c >= 2) dup += c.toLong
      }
      out(3) = topBg
      out(4) = dup
    }
    new GenericArrayData(out)
  }

  /** Intra-document duplicated-span removal — the in-row APPLY side of
    * the d19 repetition signals and the doc-scoped twin of the corpus
    * span scrub: a k-gram occurrence whose gram text appeared at an
    * EARLIER position in the same document is a removal hit; every
    * token covered by a hit window [pos, pos+k-1] drops; the first
    * occurrence always survives. Marking each hit's own window is
    * exactly the d30/d31 gaps-and-islands coverage: consecutive hits on
    * the same island sit ≤ k apart, so their windows overlap or touch
    * and their union IS the merged span — no interval merge needed.
    * Sub-width documents (< k tokens) keep every token. Pure per-row
    * work: no exchange at any corpus size.
    */
  def repetitionScrub(a: ArrayData, k: Int): ArrayData = {
    val n = a.numElements()
    if (n < k) {
      val out = new Array[AnyRef](n)
      var i = 0
      while (i < n) {
        val t = a.getUTF8String(i)
        out(i) = if (t == null) UTF8String.EMPTY_UTF8 else t.clone()
        i += 1
      }
      return new GenericArrayData(out)
    }
    val nGrams = n - k + 1
    val seen = new java.util.HashSet[UTF8String](nGrams * 2)
    var covered: Array[Boolean] = null
    var i = 0
    while (i < nGrams) {
      val g = joinWindow(a, i, k)
      if (!seen.add(g)) {
        if (covered == null) covered = new Array[Boolean](n)
        var j = i
        val e = i + k
        while (j < e) { covered(j) = true; j += 1 }
      }
      i += 1
    }
    val buf = new java.util.ArrayList[AnyRef](n)
    var t = 0
    while (t < n) {
      if (covered == null || !covered(t)) {
        val s = a.getUTF8String(t)
        buf.add(if (s == null) UTF8String.EMPTY_UTF8 else s.clone())
      }
      t += 1
    }
    new GenericArrayData(buf.toArray)
  }
}

case class RollingHash(child: Expression)
    extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override def nullSafeEval(input: Any): Any =
    TextKernels.rollingHash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"org.apache.spark.sql.graft.TextKernels.rollingHash($x)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

case class WinnowSketch(child: Expression, n: Int, w: Int)
    extends UnaryExpression
    with ImplicitCastInputTypes {
  require(n > 0 && w > 0, "n and w must be positive")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_sketch"

  override def nullSafeEval(input: Any): Any =
    TextKernels.winnowSketch(input.asInstanceOf[ArrayData], n, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"org.apache.spark.sql.graft.TextKernels.winnowSketch($x, $n, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowSketch =
    copy(child = newChild)
}

/** MinHash signature in one pass per row: each n-gram shingle is hashed
  * once (xxhash64 of the space-joined string), then mixed per component
  * with XXH64.hashLong(shingleHash, seed_i). A pure map expression:
  * signatures need NO shuffle at any corpus size (the DataFrame
  * alternative — explode + k min aggregates — shuffles |shingles| rows
  * and was ~5x slower even with map-side combine).
  */
case class MinHashSig(child: Expression, n: Int, k: Int)
    extends UnaryExpression
    with ImplicitCastInputTypes {
  require(n > 0 && k > 0, "n and k must be positive")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  @transient private lazy val seeds: Array[Long] =
    MinHashSig.seedsFor(k)

  override def nullSafeEval(input: Any): Any =
    TextKernels.minhashSig(input.asInstanceOf[ArrayData], n, k, seeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      x => {
        val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
        s"""
        ${ev.value} = org.apache.spark.sql.graft.TextKernels.minhashSig($x, $n, $k, $seedsRef);
        ${ev.isNull} = ${ev.value} == null;
        """
      }
    )

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def seedsFor(k: Int): Array[Long] = Array.tabulate(k)(i => XXH64.hashInt(i, 42L))
}

/** MD5-based SimHash over a token array, emitted as a 64-char bit string
  * (bit j = bit (7 - j%8) of digest byte j/8 — i.e. the bits in the order
  * the hex string reads). Tokens vote with multiplicity; accumulator > 0
  * sets '1'. Defined over MD5 precisely so non-Spark engines can verify
  * fingerprints bit-for-bit.
  */
case class Md5SimHashBits(child: Expression)
    extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_md5_simhash_bits"

  override def nullSafeEval(input: Any): Any =
    TextKernels.md5SimhashBits(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"org.apache.spark.sql.graft.TextKernels.md5SimhashBits($x)")

  override protected def withNewChildInternal(newChild: Expression): Md5SimHashBits =
    copy(child = newChild)
}

/** Deduplicated n-gram shingles of a token array (compiled loop). */
case class ShinglesOf(child: Expression, n: Int)
    extends UnaryExpression
    with ImplicitCastInputTypes {
  require(n > 0, "n must be positive")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    TextKernels.shinglesOf(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"org.apache.spark.sql.graft.TextKernels.shinglesOf($x, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesOf =
    copy(child = newChild)
}

/** Per-position xxhash64 gram fingerprints (compiled window loop). */
case class GramHashes(child: Expression, n: Int)
    extends UnaryExpression
    with ImplicitCastInputTypes {
  require(n > 0, "n must be positive")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_hashes"

  override def nullSafeEval(input: Any): Any =
    TextKernels.gramHashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"org.apache.spark.sql.graft.TextKernels.gramHashes($x, $n)")

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

/** Per-position md5 hex gram fingerprints (compiled loop — see
  * [[TextExpr.md5GramHexes]]).
  */
case class Md5GramHexes(child: Expression, n: Int)
    extends UnaryExpression
    with ImplicitCastInputTypes {
  require(n > 0, "n must be positive")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_md5_gram_hexes"

  override def nullSafeEval(input: Any): Any =
    TextKernels.md5GramHexes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"org.apache.spark.sql.graft.TextKernels.md5GramHexes($x, $n)")

  override protected def withNewChildInternal(newChild: Expression): Md5GramHexes =
    copy(child = newChild)
}

/** LSH band buckets of a MinHash signature (compiled banding loop). */
case class MinHashBands(child: Expression, bands: Int, r: Int)
    extends UnaryExpression
    with ImplicitCastInputTypes {
  require(bands > 0 && r > 0, "bands and r must be positive")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("band", IntegerType, nullable = false),
      StructField("bucket", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_minhash_bands"

  override def nullSafeEval(input: Any): Any =
    TextKernels.minhashBands(input.asInstanceOf[ArrayData], bands, r)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"org.apache.spark.sql.graft.TextKernels.minhashBands($x, $bands, $r)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

/** SimHash pigeonhole chunk keys (compiled chunking loop). */
case class SimHashChunks(child: Expression, chunks: Int, width: Int)
    extends UnaryExpression
    with ImplicitCastInputTypes {
  require(chunks > 0 && width > 0, "chunks and width must be positive")
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("chunk", IntegerType, nullable = false),
      StructField("ckey", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_simhash_chunks"

  override def nullSafeEval(input: Any): Any =
    TextKernels.simhashChunks(input.asInstanceOf[Long], chunks, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"org.apache.spark.sql.graft.TextKernels.simhashChunks($x, $chunks, $width)")

  override protected def withNewChildInternal(newChild: Expression): SimHashChunks =
    copy(child = newChild)
}

/** Equal-component count of two array&lt;long&gt; signatures. */
case class SigMatchCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sig_match_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.sigMatchCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"org.apache.spark.sql.graft.TextKernels.sigMatchCount($x, $y)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SigMatchCount =
    copy(left = newLeft, right = newRight)
}

case class SimHash64(child: Expression)
    extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any =
    TextKernels.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"org.apache.spark.sql.graft.TextKernels.simhash64($x)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

case class NgramsOf(child: Expression, n: Int)
    extends UnaryExpression
    with ImplicitCastInputTypes {
  require(n > 0, "n must be positive")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ngrams"

  override def nullSafeEval(input: Any): Any =
    TextKernels.ngramsOf(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"org.apache.spark.sql.graft.TextKernels.ngramsOf($x, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramsOf =
    copy(child = newChild)
}

case class ChunksOf(child: Expression, width: Int)
    extends UnaryExpression
    with ImplicitCastInputTypes {
  require(width > 0, "width must be positive")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_chunks"

  override def nullSafeEval(input: Any): Any =
    TextKernels.chunksOf(input.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"org.apache.spark.sql.graft.TextKernels.chunksOf($x, $width)")

  override protected def withNewChildInternal(newChild: Expression): ChunksOf =
    copy(child = newChild)
}

case class Md5WinnowSketch(child: Expression, n: Int, w: Int)
    extends UnaryExpression
    with ImplicitCastInputTypes {
  require(n > 0 && w > 0, "n and w must be positive")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("empreinte", StringType, nullable = false),
    StructField("sketch", StringType, nullable = false)))
  override def prettyName: String = "graft_md5_winnow_sketch"

  override def nullSafeEval(input: Any): Any =
    TextKernels.md5WinnowSketch(input.asInstanceOf[ArrayData], n, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      x => s"org.apache.spark.sql.graft.TextKernels.md5WinnowSketch($x, $n, $w)")

  override protected def withNewChildInternal(newChild: Expression): Md5WinnowSketch =
    copy(child = newChild)
}

/** Subword-encode a token array with a learned BPE codec: one inner
  * piece array per token. The codec travels by `addReferenceObj`, so
  * the expression stays inside WholeStageCodegen (a virtual call per
  * row against a driver-built, executor-cached model — the same shape
  * Spark uses for its own reference-carrying expressions).
  */
case class BpeEncode(child: Expression, codec: graft.functions.BpeCodec)
    extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType =
    ArrayType(ArrayType(StringType, containsNull = false), containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  override def nullSafeEval(input: Any): Any =
    TextKernels.bpeEncode(input.asInstanceOf[ArrayData], codec)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCodec", codec, classOf[graft.functions.BpeCodec].getName)
    defineCodeGen(ctx, ev,
      x => s"org.apache.spark.sql.graft.TextKernels.bpeEncode($x, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

/** Flat decodable BPE id stream (compiled codec walk + vocab probes). */
case class BpeEncodeIdStream(child: Expression, idc: graft.functions.BpeIdCodec)
    extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode_ids"

  override def nullSafeEval(input: Any): Any =
    TextKernels.bpeEncodeIdStream(input.asInstanceOf[ArrayData], idc)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeIdCodec", idc, classOf[graft.functions.BpeIdCodec].getName)
    defineCodeGen(ctx, ev,
      x => s"org.apache.spark.sql.graft.TextKernels.bpeEncodeIdStream($x, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeIdStream =
    copy(child = newChild)
}

/** Inverse of [[BpeEncodeIdStream]] (compiled string rebuild). */
case class BpeDecodeIdStream(child: Expression, idc: graft.functions.BpeIdCodec)
    extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(IntegerType))
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_bpe_decode_ids"

  override def nullSafeEval(input: Any): Any =
    TextKernels.bpeDecodeIdStream(input.asInstanceOf[ArrayData], idc)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeIdCodec", idc, classOf[graft.functions.BpeIdCodec].getName)
    defineCodeGen(ctx, ev,
      x => s"org.apache.spark.sql.graft.TextKernels.bpeDecodeIdStream($x, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeDecodeIdStream =
    copy(child = newChild)
}

case class LangQualityCounts(child: Expression)
    extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lang_quality_counts"

  override def nullSafeEval(input: Any): Any =
    TextKernels.langQualityCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      x => s"org.apache.spark.sql.graft.TextKernels.langQualityCounts($x)")

  override protected def withNewChildInternal(newChild: Expression): LangQualityCounts =
    copy(child = newChild)
}

case class RepetitionCounts(child: Expression)
    extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_repetition_counts"

  override def nullSafeEval(input: Any): Any =
    TextKernels.repetitionCounts(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      x => s"org.apache.spark.sql.graft.TextKernels.repetitionCounts($x)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionCounts =
    copy(child = newChild)
}

/** Intra-document duplicated-span removal over a token array — returns
  * the kept tokens (see [[TextKernels.repetitionScrub]]). The whole
  * operator is one compiled per-row call inside WholeStageCodegen.
  */
case class RepetitionScrub(child: Expression, k: Int)
    extends UnaryExpression
    with ImplicitCastInputTypes {
  require(k > 0, "k must be positive")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_repetition_scrub"

  override def nullSafeEval(input: Any): Any =
    TextKernels.repetitionScrub(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      x => s"org.apache.spark.sql.graft.TextKernels.repetitionScrub($x, $k)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionScrub =
    copy(child = newChild)
}

/** Bounded driver-built long-id set shipped as a codegen reference —
  * the [[HashedWeights]] holder pattern for membership probes.
  */
final class LongIdSet(ids: Array[Long]) extends Serializable {
  private val s = new java.util.HashSet[java.lang.Long](math.max(16, ids.length * 2))
  ids.foreach(x => s.add(x))
  def contains(x: Long): Boolean = s.contains(x)
}

/** O(1) membership of a long id in a bounded driver-built set — the
  * tombstone probe (graft.operators.Pack.tombstone). `array_contains`
  * over a plan-literal id array is a LINEAR scan per probed entry,
  * which made the scrub's per-entry cost O(ids) and the whole pass
  * quadratic across decades (ids × provenance entries both grow with
  * the corpus — caught by the x1000 probe, SCALE.md round-14); the
  * hash probe restores O(entries). Works identically under
  * WholeStageCodegen and inside interpreted higher-order-function
  * lambdas (where the tombstone rebuild actually runs).
  */
case class LongSetContains(child: Expression, set: LongIdSet)
    extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_in_long_set"

  override def nullSafeEval(input: Any): Any =
    set.contains(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("longIdSet", set, classOf[LongIdSet].getName)
    defineCodeGen(ctx, ev, x => s"$ref.contains($x)")
  }

  override protected def withNewChildInternal(newChild: Expression): LongSetContains =
    copy(child = newChild)
}
