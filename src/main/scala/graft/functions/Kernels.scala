package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static per-row kernels shared by the interpreted eval path and the
  * generated-code path of graft's Catalyst expressions. A top-level
  * Scala object emits static forwarders, so whole-stage-generated Java
  * calls these directly — the expression participates in codegen
  * instead of forcing its whole stage onto the interpreted path (what
  * CodegenFallback would do).
  */
object Kernels {
  val SEED = 42L
  val MERSENNE: Long = 2147483647L

  @inline private def xxh(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, SEED)

  def quantize(arr: ArrayData, scale: Int, isFloat: Boolean): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    if (isFloat) while (i < n) { out(i) = math.floor(arr.getFloat(i).toDouble * scale).toLong; i += 1 }
    else while (i < n) { out(i) = math.floor(arr.getDouble(i) * scale).toLong; i += 1 }
    new GenericArrayData(out)
  }

  /** Bigram repetition stats in one per-row pass (r15): `[n2, top2]` —
    * total bigram count (= tokens − 1) and the multiplicity of the
    * most-repeated bigram. Identity is EXACT token-pair equality (a
    * per-doc hash map keyed on the adjacent token pair), bit-identical
    * to the former explode → count(doc, bigram) → max pipeline but
    * with ZERO shuffles: a per-doc metric never needed one — the old
    * shape shuffled every bigram of the corpus twice (guide §2.4).
    * Null for docs with fewer than 2 tokens (the operator filters
    * those out before calling).
    */
  def rep2Stats(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return null
    val counts = new java.util.HashMap[UTF8String, Array[Int]](n * 2)
    var best = 0
    var i = 0
    while (i < n - 1) {
      // key = the concatenated bigram (same identity as the former
      // concat(tok_i, ' ', tok_{i+1}) grouping key)
      val key = UTF8String.concatWs(UTF8String.fromString(" "),
        arr.getUTF8String(i), arr.getUTF8String(i + 1))
      var slot = counts.get(key)
      if (slot == null) { slot = new Array[Int](1); counts.put(key, slot) }
      slot(0) += 1
      if (slot(0) > best) best = slot(0)
      i += 1
    }
    new GenericArrayData(Array[Long](n - 1L, best.toLong))
  }

  def simhash64(arr: ArrayData): Long = {
    val acc = new Array[Int](64)
    var i = 0; val n = arr.numElements()
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) {
        val h = xxh(t)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L; var j = 0
    while (j < 64) { if (acc(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  /** Returns null when the doc has no complete shingle. */
  def minhashShingleSig(arr: ArrayData, ngram: Int, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    val p = MERSENNE
    val seen = new java.util.HashSet[Long]()
    val sig = Array.fill[Long](numHashes)(Long.MaxValue)
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i + ngram <= n) {
      val parts = new Array[UTF8String](ngram)
      var k = 0
      while (k < ngram) { parts(k) = arr.getUTF8String(i + k); k += 1 }
      val x = ((xxh(UTF8String.concatWs(sep, parts: _*)) % p) + p) % p
      if (seen.add(x)) {
        var j = 0
        while (j < numHashes) {
          val h = (((2L * j + 1) * x + 7919L * (j + 1)) % p + p) % p
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    if (seen.isEmpty) null else new GenericArrayData(sig)
  }

  def shingleHashes(arr: ArrayData, ngram: Int): ArrayData = {
    val n = arr.numElements()
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i + ngram <= n) {
      val parts = new Array[UTF8String](ngram)
      var k = 0
      while (k < ngram) { parts(k) = arr.getUTF8String(i + k); k += 1 }
      seen.add(xxh(UTF8String.concatWs(sep, parts: _*)))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  def winnow(arr: ArrayData, k: Int, w: Int): ArrayData = {
    val B = 0x9E3779B97F4A7C15L
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val h = new Array[Long](n)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      h(i) = if (t == null) 0L else xxh(t)
      i += 1
    }
    val m = n - k + 1
    val r = new Array[Long](m)
    var bk = 1L
    var j = 1
    while (j < k) { bk *= B; j += 1 }
    var acc = 0L
    j = 0
    while (j < k) { acc = acc * B + h(j); j += 1 }
    r(0) = acc
    i = 1
    while (i < m) {
      acc = (acc - h(i - 1) * bk) * B + h(i + k - 1)
      r(i) = acc
      i += 1
    }
    val fps = new java.util.TreeSet[java.lang.Long]()
    if (m <= w) {
      var best = 0
      i = 1
      while (i < m) { if (r(i) <= r(best)) best = i; i += 1 }
      fps.add(r(best))
    } else {
      i = 0
      while (i + w <= m) {
        var best = i
        var t = i + 1
        while (t < i + w) { if (r(t) <= r(best)) best = t; t += 1 }
        fps.add(r(best))
        i += 1
      }
    }
    val out = new Array[Long](fps.size)
    val it = fps.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** CJK-aware tokenization (the IK-analyzer stand-in for J9 —
    * reference IkUtil.java:12-28): whitespace-split, then each token is
    * segmented into maximal CJK ([一-鿿], the unified-ideograph
    * BMP block) and non-CJK runs. A CJK run of n ≥ 2 chars emits its
    * n−1 overlapping character bigrams (the standard dictionary-free
    * CJK segmentation); single CJK chars and non-CJK runs are emitted
    * whole. Whitespace is the regex-\s set so the DuckDB oracle's
    * regexp_extract_all formulation is token-identical.
    */
  def cjkTokens(s: UTF8String): ArrayData = {
    val str = s.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val n = str.length
    @inline def isWs(c: Char) =
      c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == 0x0B
    @inline def isCjk(c: Char) = c >= 0x4E00 && c <= 0x9FFF
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (isWs(c)) i += 1
      else if (isCjk(c)) {
        var j = i + 1
        while (j < n && isCjk(str.charAt(j))) j += 1
        if (j - i == 1) out += UTF8String.fromString(str.substring(i, j))
        else {
          var k = i
          while (k + 2 <= j) { out += UTF8String.fromString(str.substring(k, k + 2)); k += 1 }
        }
        i = j
      } else {
        var j = i + 1
        while (j < n && !isWs(str.charAt(j)) && !isCjk(str.charAt(j))) j += 1
        out += UTF8String.fromString(str.substring(i, j))
        i = j
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Symmetric int8 scalar quantization (FAISS SQ8 shape):
    * code_i = clamp(floor(x_i · 127 / amax + 0.5), −127, 127), one
    * signed byte per dimension — 4× smaller than float32, 8× smaller
    * than the milli-quantized long array. Cosine is scale-invariant,
    * so similarities against SQ8 codes need no dequantization.
    */
  def sq8Encode(arr: ArrayData, amax: Double, isFloat: Boolean): Array[Byte] = {
    val n = arr.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      val c = math.floor(x * 127.0 / amax + 0.5)
      out(i) = (if (c > 127.0) 127 else if (c < -127.0) -127 else c.toInt).toByte
      i += 1
    }
    out
  }

  /** ADC (asymmetric distance computation) dot: full-precision query
    * longs × int8 corpus codes — exact integer math, no accumulation
    * order sensitivity.
    */
  def dot8(q: ArrayData, codes: Array[Byte]): Long = {
    val n = math.min(q.numElements(), codes.length)
    var s = 0L; var i = 0
    while (i < n) { s += q.getLong(i) * codes(i); i += 1 }
    s
  }

  /** Σ code_i² of an int8 code vector. */
  def normSq8(codes: Array[Byte]): Long = {
    var s = 0L; var i = 0
    while (i < codes.length) { val x: Long = codes(i); s += x * x; i += 1 }
    s
  }

  def signProjBucket(a: ArrayData, planes: Int): Long = {
    val n = a.numElements()
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var s = 0L; var i = 0
      while (i < n) {
        val sign = if ((XXH64.hashLong(i.toLong, p.toLong) & 1L) == 0L) 1L else -1L
        s += a.getLong(i) * sign
        i += 1
      }
      if (s > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }
}
