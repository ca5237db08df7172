package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot per-row kernels.
  *
  * Spark's higher-order functions (transform/aggregate/zip_with) are
  * interpreted per element — a 64-dim dot product via zip_with costs
  * ~64 lambda invocations per row. These expressions run the loop
  * inside one JVM method per row (and DotLong/NormSqLong generate
  * straight-line Java via doGenCode), which benchmarked ~4-10× faster
  * on the similarity/dedup operators and removes the explode +
  * 64-aggregate shuffles the declarative formulations needed.
  *
  * Hashing uses Spark's XXH64 (same kernel as the xxhash64() SQL
  * function, seed 42) so signatures are deterministic and reproducible
  * across clusters.
  */
object VectorExprs {
  val SEED = 42L
  val MERSENNE: Long = 2147483647L // 2^31-1

  private[functions] def xxh(s: UTF8String, seed: Long = SEED): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  /** floor(x * scale) per element: float/double array → long array. */
  case class QuantizeVec(child: Expression, scale: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val elemType = child.dataType.asInstanceOf[ArrayType].elementType
      val n = arr.numElements()
      val out = new Array[Long](n)
      var i = 0
      elemType match {
        case FloatType =>
          while (i < n) { out(i) = math.floor(arr.getFloat(i).toDouble * scale).toLong; i += 1 }
        case DoubleType =>
          while (i < n) { out(i) = math.floor(arr.getDouble(i) * scale).toLong; i += 1 }
        case other => throw new IllegalArgumentException(s"QuantizeVec: $other")
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Integer dot product of two long arrays (codegen'd tight loop). */
  case class DotLong(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var s = 0L; var i = 0
      while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
      s
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |long $acc = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += $a.getLong($i) * $b.getLong($i);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Σ v_i² of a long array (codegen'd). */
  case class NormSqLong(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      var s = 0L; var i = 0; val n = a.numElements()
      while (i < n) { val x = a.getLong(i); s += x * x; i += 1 }
      s
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i"); val x = ctx.freshName("x")
        val acc = ctx.freshName("acc")
        s"""
           |long $acc = 0L;
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  long $x = $a.getLong($i);
           |  $acc += $x * $x;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 64-bit SimHash over a token array (per-occurrence weighting):
    * bit j of the output is the sign of Σ_tokens (±1 by bit j of the
    * token's xxhash64).
    */
  case class SimHash64(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
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
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** MinHash signature over word n-gram shingles, computed straight
    * from the token array (shingling + hashing + 64 permutation minima
    * in one pass; distinct shingles deduped by hash). Permutation i is
    * h_i(x) = ((2i+1)·x + 7919·(i+1)) mod (2³¹−1) over x = xxhash64
    * mod p — matching Dedup's declarative formulation.
    */
  case class MinHashShingleSig(child: Expression, ngram: Int, numHashes: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val p = MERSENNE
      val seen = new java.util.HashSet[Long]()
      val sig = Array.fill[Long](numHashes)(Long.MaxValue)
      var i = 0
      val sep = UTF8String.fromString(" ")
      while (i + ngram <= n) {
        val parts = new Array[UTF8String](ngram)
        var k = 0
        while (k < ngram) { parts(k) = arr.getUTF8String(i + k); k += 1 }
        val shingle = UTF8String.concatWs(sep, parts: _*)
        val x = ((xxh(shingle) % p) + p) % p
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
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Distinct word-n-gram shingle hashes of a token array — the
    * join-able form for inverted-index similarity. 64-bit xxhash64
    * identity: shingle-hash equality == shingle string equality with
    * collision probability ~n²/2⁶⁵ (negligible at any corpus size that
    * fits a join). Joining on longs instead of shingle strings shrinks
    * shuffle width ~3× and removes string hashing from the join probe.
    */
  case class ShingleHashes(child: Expression, ngram: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
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
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Winnowing document fingerprint (Schleimer et al., SIGMOD'03 —
    * the MOSS algorithm): polynomial rolling hash over k-gram token
    * windows, then the minimum hash of each w-length window of k-gram
    * hashes (rightmost-min tie-break) forms the fingerprint set.
    * Guarantees any shared run of ≥ w+k-1 tokens yields a shared
    * fingerprint — position-robust near-dup detection in one per-row
    * pass, no shuffle.
    */
  case class WinnowFingerprint(child: Expression, k: Int, w: Int)
      extends UnaryExpression with CodegenFallback {
    private val B = 0x9E3779B97F4A7C15L // odd multiplier (golden-ratio)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n < k) return new GenericArrayData(Array.empty[Long])
      // token hashes
      val h = new Array[Long](n)
      var i = 0
      while (i < n) {
        val t = arr.getUTF8String(i)
        h(i) = if (t == null) 0L else xxh(t)
        i += 1
      }
      // polynomial rolling hash over k-grams: r_i = Σ_j h(i+j)·B^(k-1-j)
      val m = n - k + 1
      val r = new Array[Long](m)
      var bk = 1L // B^(k-1)
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
      // winnowing: min of each w-window of r (rightmost min)
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
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Sign-random-projection bucket (LSH coarse quantizer): bit p of
    * the bucket is the sign of the projection of the vector onto a
    * deterministic ±1 hyperplane derived from xxhash64(p, i).
    */
  case class SignProjBucket(child: Expression, planes: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
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
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
}

/** Column-level API over the native expressions. */
object functions {
  import VectorExprs._
  import org.apache.spark.sql.graft.Bridge.{column => c, expression => e}
  def quantize_vec(col: Column, scale: Int): Column = c(QuantizeVec(e(col), scale))
  def dot_long(a: Column, b: Column): Column = c(DotLong(e(a), e(b)))
  def norm_sq_long(col: Column): Column = c(NormSqLong(e(col)))
  def simhash64(tokens: Column): Column = c(SimHash64(e(tokens)))
  def minhash_shingle_sig(tokens: Column, ngram: Int = 3, numHashes: Int = 64): Column =
    c(MinHashShingleSig(e(tokens), ngram, numHashes))
  def sign_proj_bucket(v: Column, planes: Int): Column = c(SignProjBucket(e(v), planes))
  def winnow_fingerprint(tokens: Column, k: Int = 5, w: Int = 4): Column =
    c(WinnowFingerprint(e(tokens), k, w))
  def shingle_hashes(tokens: Column, ngram: Int = 3): Column =
    c(ShingleHashes(e(tokens), ngram))
}
