package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ShiftLeft, ShiftRight, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import org.apache.spark.sql.graft.Bridge

/** Hot-path set operations on SORTED long arrays as a custom Catalyst
  * expression.
  *
  * `array_intersect` builds a hash set per invocation with boxed
  * elements; on a candidate-verify join evaluating millions of pairs it
  * dominates the whole dedup job (measured ~8µs/pair at sf0.1). A merge
  * walk over two sorted primitive arrays is ~20× cheaper and allocates
  * nothing. Sorting happens once per document upstream, not per pair.
  */
object ArrayOps {

  /** |a ∩ b| for two sorted, distinct `array<bigint>` columns. */
  case class SortedLongIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val nx = x.numElements(); val ny = y.numElements()
      var i = 0; var j = 0; var c = 0
      while (i < nx && j < ny) {
        val vx = x.getLong(i); val vy = y.getLong(j)
        if (vx == vy) { c += 1; i += 1; j += 1 }
        else if (vx < vy) i += 1
        else j += 1
      }
      c
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  def sortedIntersectCount(a: Column, b: Column): Column =
    Bridge.column(SortedLongIntersectCount(Bridge.expression(a), Bridge.expression(b)))

  /** Jaccard similarity of two sorted, distinct long arrays:
    * |∩| / (|a| + |b| - |∩|).
    */
  def jaccardSortedLong(a: Column, b: Column): Column = {
    val inter = sortedIntersectCount(a, b).cast("double")
    val uni = size(a).cast("double") + size(b).cast("double") - inter
    when(uni === 0.0, lit(0.0)).otherwise(inter / uni)
  }

  /** Cosine similarity of two `array<double>` columns in ONE pass — the
    * zip_with/aggregate formulation allocates three intermediate arrays
    * per invocation, which dominates pairwise similarity joins.
    * Accumulation order matches the sequential HOF version exactly
    * (component-wise, left to right), so results are bit-identical to the
    * previous formulation and to DuckDB's list_cosine_similarity.
    * Zero-norm inputs yield 0.0 by convention; mismatched lengths yield
    * NULL (the HOF formulation's zip_with null-padding poisoned the
    * aggregate to NULL — a silent prefix-cosine would be a wrong answer).
    */
  case class CosineDouble(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      if (x.numElements() != y.numElements()) return null
      val n = x.numElements()
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        // a NULL element poisons the result to NULL, exactly like the
        // zip_with/aggregate HOF this is bit-identical to — getDouble on
        // a null slot would contribute a silent 0.0 instead
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val vx = x.getDouble(i); val vy = y.getDouble(i)
        dot += vx * vy; na += vx * vx; nb += vy * vy
        i += 1
      }
      val d = math.sqrt(na) * math.sqrt(nb)
      if (d == 0.0) 0.0 else dot / d
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  def cosineDouble(a: Column, b: Column): Column =
    Bridge.column(CosineDouble(Bridge.expression(a), Bridge.expression(b)))

  /** Squared Euclidean distance in one native pass — the [[CosineDouble]]
    * sibling for the PQ/k-center metric. Bit-identical to the
    * `aggregate(zip_with(a, b, (x,y) => (x−y)²), 0.0, _+_)` HOF
    * formulation it replaces (same left-to-right `0.0 + t₀² + t₁² + …`
    * accumulation), but a single CodegenFallback node: the HOF form
    * compiles a fresh whole-stage-codegen body per distinct plan, which
    * dominated the k-center traversal's per-round driver time (each
    * round's plan embeds a new centroid literal, so nothing is reused).
    * Mismatched lengths yield NULL (the zip_with null-padding poisoned
    * the aggregate to NULL — a silent prefix distance would be a wrong
    * answer).
    */
  case class SqDistDouble(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      if (x.numElements() != y.numElements()) return null
      val n = x.numElements()
      var d = 0.0
      var i = 0
      while (i < n) {
        // NULL element → NULL result, matching the HOF fold (see
        // CosineDouble)
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val t = x.getDouble(i) - y.getDouble(i)
        d += t * t
        i += 1
      }
      d
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  def sqDistDouble(a: Column, b: Column): Column =
    Bridge.column(SqDistDouble(Bridge.expression(a), Bridge.expression(b)))

  /** Sorted distinct xxhash64 values of every n-char window of a string —
    * the whole MinHash shingling stage as ONE native pass. Equivalent to
    * `array_sort(array_distinct(transform(<n-char windows>, xxhash64)))`
    * (same per-window xxhash64 with Spark's seed 42 over UTF-8 bytes,
    * windows by CHARACTER) but without building a char array, n shifted
    * slices, or any per-element interpreted lambda. Normalization stays
    * upstream in column functions.
    */
  case class ShingleHashes(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    require(n > 0, "shingle width must be positive")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String]
      val numChars = s.numChars()
      val m = numChars - (n - 1)
      if (m <= 0) new GenericArrayData(Array.empty[Long])
      else {
        // one pass to index char -> byte offset, then hash each window's
        // byte slice in place. substringSQL per window would copy and
        // re-scan from the string head (O(len²) on multi-byte text).
        val base = s.getBaseObject
        val baseOff = s.getBaseOffset
        val numBytes = s.numBytes
        val charOff = new Array[Int](numChars + 1)
        var b = 0; var c = 0
        while (b < numBytes) {
          charOff(c) = b
          b += UTF8String.numBytesForFirstByte(org.apache.spark.unsafe.Platform.getByte(base, baseOff + b))
          c += 1
        }
        charOff(numChars) = numBytes
        val hs = new Array[Long](m)
        var i = 0
        while (i < m) {
          val start = charOff(i)
          hs(i) = XXH64.hashUnsafeBytes(base, baseOff + start,
            charOff(i + n) - start, 42L)
          i += 1
        }
        java.util.Arrays.sort(hs)
        // dedup in place over the sorted run
        var out = 0
        var j = 0
        while (j < m) {
          if (out == 0 || hs(j) != hs(out - 1)) { hs(out) = hs(j); out += 1 }
          j += 1
        }
        new GenericArrayData(java.util.Arrays.copyOf(hs, out))
      }
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Sorted distinct hashes of n-char windows of `text` (pre-normalized). */
  def shingleHashes(text: Column, n: Int): Column =
    Bridge.column(ShingleHashes(Bridge.expression(text), n))

  /** Sorted distinct xxhash64 values of word n-grams from a token array —
    * hash-identical to `array_sort(array_distinct(transform(
    * wordNgramsOfTokens(toks, n), xxhash64)))` (same space-joined bytes,
    * same seed 42) without materializing n shifted slices, the zipped
    * string array, or any interpreted lambda. One reusable byte buffer
    * per row.
    */
  case class WordNgramHashes(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    require(n > 0, "ngram width must be positive")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val total = arr.numElements()
      val m = total - (n - 1)
      if (m <= 0) new GenericArrayData(Array.empty[Long])
      else {
        val toks = new Array[UTF8String](total)
        var i = 0
        // NULL elements (possible via the SQL surface) count as empty
        // tokens rather than NPE-ing the executor
        while (i < total) {
          toks(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8
            else arr.getUTF8String(i)
          i += 1
        }
        val BYTE_OFF = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
        var buf = new Array[Byte](64)
        val hs = new Array[Long](m)
        var w = 0
        while (w < m) {
          var len = n - 1 // the joining spaces
          var k = 0
          while (k < n) { len += toks(w + k).numBytes; k += 1 }
          if (buf.length < len) buf = new Array[Byte](math.max(len, buf.length * 2))
          var off = 0
          k = 0
          while (k < n) {
            if (k > 0) { buf(off) = ' '; off += 1 }
            val t = toks(w + k)
            t.writeToMemory(buf, BYTE_OFF + off)
            off += t.numBytes
            k += 1
          }
          hs(w) = XXH64.hashUnsafeBytes(buf, BYTE_OFF, len, 42L)
          w += 1
        }
        java.util.Arrays.sort(hs)
        var out = 0
        var j = 0
        while (j < m) {
          if (out == 0 || hs(j) != hs(out - 1)) { hs(out) = hs(j); out += 1 }
          j += 1
        }
        new GenericArrayData(java.util.Arrays.copyOf(hs, out))
      }
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def wordNgramHashes(tokens: Column, n: Int): Column =
    Bridge.column(WordNgramHashes(Bridge.expression(tokens), n))

  /** Hash kernels shared by the SimHash / hyperplane-LSH expressions.
    *
    * "xxhash" is the fast default (XXH64, Spark seed 42). "md5" exists so
    * an external SQL engine can replicate the signatures bit-for-bit from
    * nothing but standard `md5()` + integer arithmetic — that is what
    * turns the LSH operators from rows-only checks into exact DuckDB
    * oracles (the driver's t2 gate). MD5 on short tokens costs ~100 ns,
    * irrelevant next to the shuffle these ops feed.
    */
  object Md5Kernel {
    private val md = new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

    /** First 15 hex nibbles of MD5(bytes) as a 60-bit non-negative long —
      * exactly `(strpos-parse of substr(md5(x), 1, 15))` in SQL. 60 bits
      * keeps every SQL-side shift below the BIGINT overflow boundary.
      */
    def hash60(bytes: Array[Byte]): Long = {
      val d = md.get().digest(bytes)
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
      v >>> 4 // drop the 16th nibble: 15 nibbles = 60 bits
    }

    /** Rademacher ±1 from MD5("i:j"): +1 iff the first hex nibble is < 8,
      * i.e. `strpos('01234567', substr(md5(i||':'||j), 1, 1)) > 0`.
      */
    def sign(i: Int, j: Int): Double = {
      val d = md.get().digest(s"$i:$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if ((d(0) & 0x80) == 0) 1.0 else -1.0
    }
  }

  /** 64-bit SimHash of a string-token array in one native pass: hash each
    * token once, accumulate per-bit counts, pack the majority vote.
    * Replaces an interpreted aggregate-of-zip_with chain that allocated a
    * 64-int array per token.
    *
    * `kernel` picks the per-token hash: "xxhash" (XXH64 seed 42 —
    * identical to `transform(tokens, xxhash64)`) or "md5" (low 60 bits of
    * MD5 — SQL-replicable, see [[Md5Kernel]]; bits 60-63 are always 0).
    */
  case class SimHash64(child: Expression, kernel: String = "xxhash")
      extends UnaryExpression with CodegenFallback {
    require(kernel == "xxhash" || kernel == "md5", s"unknown kernel $kernel")
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val counts = new Array[Int](64)
      val useMd5 = kernel == "md5"
      var i = 0
      while (i < n) {
        // NULL elements (possible via the SQL surface) hash as empty
        // tokens rather than NPE-ing the executor
        val t = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8
          else arr.getUTF8String(i)
        val h =
          if (useMd5) Md5Kernel.hash60(t.getBytes)
          else XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
        var b = 0
        while (b < 64) {
          counts(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
        i += 1
      }
      var sig = 0L
      var b = 0
      while (b < 64) {
        if (counts(b) * 2 > n) sig |= (1L << b)
        b += 1
      }
      sig
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def simhash64Native(tokens: Column, kernel: String = "xxhash"): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens), kernel))

  /** MinHash signature of a pre-hashed long array in one native pass:
    * k affine permutations h_i(x) = (a_i·x + b_i) mod p over the Mersenne
    * prime 2^31-1, taking the min per permutation — numerically identical
    * to [[VectorFunctions.minhashSignatureOfHashes]] (same constants,
    * same pmod semantics) without k interpreted array traversals.
    */
  case class MinHashSignature(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    private val P = 2147483647L // 2^31 - 1
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val sig = new Array[Long](k)
      if (n == 0) {
        java.util.Arrays.fill(sig, P)
      } else {
        java.util.Arrays.fill(sig, Long.MaxValue)
        var i = 0
        while (i < n) {
          // pmod(h, P): java % can be negative for negative h
          val h0 = arr.getLong(i) % P
          val h = if (h0 < 0) h0 + P else h0
          var j = 0
          while (j < k) {
            val a = 1L + 2L * j
            val b = 104729L * (j + 1) % P
            val v0 = (h * a + b) % P
            val v = if (v0 < 0) v0 + P else v0
            if (v < sig(j)) sig(j) = v
            j += 1
          }
          i += 1
        }
      }
      new GenericArrayData(sig)
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def minhashSignatureNative(hashes: Column, k: Int): Column = {
    // k = 0 would give every row an empty signature (whole corpus in one
    // LSH bucket → cross product) and k < 0 a NegativeArraySizeException
    // at eval — fail at plan time like the sibling builders
    require(k > 0, s"minhash signature length must be positive, got $k")
    Bridge.column(MinHashSignature(Bridge.expression(hashes), k))
  }

  /** Random-hyperplane LSH bucket in one native pass. The ±1 hyperplane
    * matrix is precomputed once at plan time instead of re-hashed per
    * element per row; the projection accumulates left-to-right like a
    * sequential aggregate (and like DuckDB's `list_dot_product`).
    *
    * `kernel` picks the sign derivation: "xxhash" (sign of
    * xxhash64(i, j), seed 42 — the original column formulation) or "md5"
    * (sign of the first MD5 nibble of "i:j" — SQL-replicable, see
    * [[Md5Kernel]]). Both are Rademacher hyperplanes with the same LSH
    * collision guarantees; only reproducibility outside the JVM differs.
    */
  case class HyperplaneBucket(child: Expression, nBits: Int, dim: Int,
      kernel: String = "xxhash")
      extends UnaryExpression with CodegenFallback {
    require(nBits > 0 && nBits <= 63, "nBits in [1, 63]")
    require(kernel == "xxhash" || kernel == "md5", s"unknown kernel $kernel")
    override def dataType: DataType = LongType
    @transient private lazy val signs: Array[Array[Double]] =
      if (kernel == "md5") Array.tabulate(nBits, dim)(Md5Kernel.sign)
      else Array.tabulate(nBits, dim) { (i, j) =>
        val h = XXH64.hashInt(j, XXH64.hashInt(i, 42L))
        if ((h & 1L) == 0L) 1.0 else -1.0
      }
    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val n = math.min(v.numElements(), dim)
      var bucket = 0L
      var i = 0
      while (i < nBits) {
        val row = signs(i)
        var proj = 0.0
        var j = 0
        while (j < n) { proj += v.getDouble(j) * row(j); j += 1 }
        if (proj >= 0) bucket |= (1L << i)
        i += 1
      }
      bucket
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def hyperplaneBucket(vec: Column, nBits: Int, dim: Int,
      kernel: String = "xxhash"): Column =
    Bridge.column(HyperplaneBucket(Bridge.expression(vec), nBits, dim, kernel))

  /** Rademacher random-projection dimensionality reduction (Achlioptas
    * 2003 / Johnson-Lindenstrauss): out_i = Σ_j v_j·sign(i,j) / √outDim
    * over the SAME deterministic sign derivation as
    * [[HyperplaneBucket]] — the signed projections LSH thresholds are
    * here kept as values, so pairwise inner products are preserved in
    * expectation (JL) at outDim/dim of the storage and compute. The
    * sign matrix (outDim × dim doubles) materializes once per executor
    * at expression init — nothing is broadcast, nothing per-row.
    *
    * `kernel = "md5"` makes the matrix SQL-replicable
    * ([[Md5Kernel.sign]]) — the exact-oracle configuration; accumulation
    * is component-order sequential, matching `list_dot_product`.
    */
  case class RandomProjection(child: Expression, outDim: Int, dim: Int,
      kernel: String = "xxhash")
      extends UnaryExpression with CodegenFallback {
    require(outDim > 0 && dim > 0, "outDim and dim must be positive")
    require(kernel == "xxhash" || kernel == "md5", s"unknown kernel $kernel")
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    @transient private lazy val signs: Array[Array[Double]] =
      if (kernel == "md5") Array.tabulate(outDim, dim)(Md5Kernel.sign)
      else Array.tabulate(outDim, dim) { (i, j) =>
        val h = XXH64.hashInt(j, XXH64.hashInt(i, 42L))
        if ((h & 1L) == 0L) 1.0 else -1.0
      }
    @transient private lazy val scale = math.sqrt(outDim.toDouble)
    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val n = math.min(v.numElements(), dim)
      val out = new Array[Double](outDim)
      var i = 0
      while (i < outDim) {
        val row = signs(i)
        var proj = 0.0
        var j = 0
        while (j < n) { proj += v.getDouble(j) * row(j); j += 1 }
        out(i) = proj / scale
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def randomProjection(vec: Column, outDim: Int, dim: Int,
      kernel: String = "xxhash"): Column =
    Bridge.column(RandomProjection(Bridge.expression(vec), outDim, dim, kernel))

  /** Column-by-column bit shifts — the `functions.shiftleft/shiftright`
    * API only accepts a literal Int shift, but the underlying Catalyst
    * expressions take any expression (needed inside lambda bodies).
    */
  def shiftLeftC(v: Column, bits: Column): Column =
    Bridge.column(ShiftLeft(Bridge.expression(v), Bridge.expression(bits)))
  def shiftRightC(v: Column, bits: Column): Column =
    Bridge.column(ShiftRight(Bridge.expression(v), Bridge.expression(bits)))
}
