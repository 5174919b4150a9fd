package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Codegen-native shingling / MinHash kernels.
  *
  * The declarative formulation of word-k-shingles — `transform(sequence(...),
  * i -> array_join(slice(split(text), i, k), ' '))` — is built from
  * higher-order functions, which Spark evaluates INTERPRETED (HOFs have no
  * doGenCode), re-allocating a slice array and a joined string per shingle
  * and re-evaluating the whole chain once per consuming plan leg. Measured on
  * the 5k-doc sf0.1 corpus that chain costs ~2.5 s per evaluation and
  * dominates the near-dup operators. These expressions compute the same
  * values in one tight loop per row, participate in whole-stage codegen
  * (doGenCode emits a single static call), and cost milliseconds at the same
  * scale.
  *
  * Bit-compatibility contracts (relied on by the DuckDB oracles and specs):
  *  - [[ShingleHashes]]`(text, k)` ==
  *    `transform(array_distinct(wordShingles(text, k)), xxhash64)` — the hash
  *    is Spark's xxhash64 (seed 42) over the UTF8 bytes of each distinct
  *    shingle string, first-occurrence order, so joining/aggregating on the
  *    hash is equality on the shingle string modulo 2^-64 collisions.
  *  - [[MinHashSignature]]`(hashes, n)(i)` ==
  *    `array_min(transform(hashes, h -> xxhash64(h, i)))` — the per-plane
  *    mix replays XxHash64's fold (hashLong then hashInt) exactly, computed
  *    in ONE traversal for all n planes instead of n array passes.
  */
object ShingleHash {

  private val WS: Pattern = Pattern.compile("\\s+")

  /** Distinct xxhash64 values of the word-k-shingles of `text`; tokenization
    * mirrors `split(trim(text), "\\s+")` (ASCII-space trim, Java regex split
    * with limit -1). Texts with fewer than k words produce ONE shingle (all
    * words joined), like the declarative form.
    */
  def hashes(text: UTF8String, k: Int): ArrayData = {
    val s = text.toString
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    val words = WS.split(s.substring(b, e), -1)
    val n = words.length
    // UTF8 bytes of each word, converted once
    val wb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { wb(i) = words(i).getBytes("UTF-8"); i += 1 }

    val nShingles = if (n >= k) n - k + 1 else 1
    val width = if (n >= k) k else n
    val out = new Array[Long](nShingles)
    var nOut = 0
    val seen = new java.util.HashSet[java.lang.Long](nShingles * 2)
    var buf = new Array[Byte](64)
    i = 0
    while (i < nShingles) {
      var len = width - 1 // separator spaces
      var w = 0
      while (w < width) { len += wb(i + w).length; w += 1 }
      if (len > buf.length) buf = new Array[Byte](math.max(len, buf.length * 2))
      var pos = 0
      w = 0
      while (w < width) {
        if (w > 0) { buf(pos) = ' '; pos += 1 }
        val a = wb(i + w)
        System.arraycopy(a, 0, buf, pos, a.length)
        pos += a.length
        w += 1
      }
      val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, 42L)
      if (seen.add(h)) { out(nOut) = h; nOut += 1 }
      i += 1
    }
    new GenericArrayData(if (nOut == out.length) out
                         else java.util.Arrays.copyOf(out, nOut))
  }

  /** One-pass MinHash signature over pre-hashed shingles: for each plane i,
    * min over the array of `xxhash64(h, i)` replayed bit-exactly
    * (hashInt(i, hashLong(h, 42))). Null elements are skipped, like the
    * declarative `array_min(transform(...))` form skips them.
    */
  def minhash(hashes: ArrayData, numHashes: Int): ArrayData = {
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = hashes.numElements()
    var j = 0
    while (j < n) {
      if (!hashes.isNullAt(j)) {
        val h42 = XXH64.hashLong(hashes.getLong(j), 42L)
        var i = 0
        while (i < numHashes) {
          val v = XXH64.hashInt(i, h42)
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  /** 64-bit SimHash of whitespace-tokenized text: every word votes ±1 on
    * each bit position according to its (murmur3 + splitmix64-finalized)
    * hash; the sign of the per-bit sum forms the fingerprint. Exactly the
    * algorithm the former Scala UDF used — the fingerprint only needs to be
    * internally consistent — now one codegen'd static call.
    */
  def simhash64(text: UTF8String): Long = {
    val words = text.toString.trim.split("\\s+")
    val votes = new Array[Int](64)
    var w = 0
    while (w < words.length) {
      var h = scala.util.hashing.MurmurHash3.stringHash(words(w)).toLong & 0xffffffffL
      h = h * 0x9e3779b97f4a7c15L
      h ^= (h >>> 32); h *= 0xbf58476d1ce4e5b9L; h ^= (h >>> 29)
      var b = 0
      while (b < 64) { votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1); b += 1 }
      w += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** `values` minus the members of a sorted long set, via binary search: the
    * set is built ONCE (a sorted primitive array in the expression, shared by
    * reference across the task's rows) and probed in O(log n) — unlike
    * `array_except(col, lit(set))`, which rebuilds a hash set from the
    * literal on EVERY row. Null elements pass through untouched.
    */
  def exceptSorted(values: ArrayData, sorted: Array[Long]): ArrayData = {
    val n = values.numElements()
    val out = new Array[java.lang.Long](n)
    var nOut = 0
    var j = 0
    while (j < n) {
      if (values.isNullAt(j)) { out(nOut) = null; nOut += 1 }
      else {
        val v = values.getLong(j)
        if (java.util.Arrays.binarySearch(sorted, v) < 0) {
          out(nOut) = java.lang.Long.valueOf(v); nOut += 1
        }
      }
      j += 1
    }
    new GenericArrayData(
      if (nOut == n) out else java.util.Arrays.copyOf(out, nOut))
  }
}

/** `array<long>` of distinct shingle-string xxhash64 values — see
  * [[ShingleHash.hashes]].
  */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"shingle width must be >= 1, got $k")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires a string input, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override protected def nullSafeEval(input: Any): Any =
    ShingleHash.hashes(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHash.hashes($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Fixed-length `array<long>` MinHash signature of a pre-hashed shingle set —
  * see [[ShingleHash.minhash]].
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  override protected def nullSafeEval(input: Any): Any =
    ShingleHash.minhash(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHash.minhash($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Array-minus-sorted-set — see [[ShingleHash.exceptSorted]]. The set rides
  * the expression as a sorted primitive array (one copy per task via the
  * codegen references array, never rebuilt per row).
  */
case class LongSetExcept(child: Expression, sorted: Array[Long])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"long_set_except requires array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = child.dataType // preserves containsNull
  override def prettyName: String = "long_set_except"
  override protected def nullSafeEval(input: Any): Any =
    ShingleHash.exceptSorted(input.asInstanceOf[ArrayData], sorted)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sortedSet", sorted, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHash.exceptSorted($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): LongSetExcept =
    copy(child = newChild)
}

/** 64-bit SimHash fingerprint of a text column — see
  * [[ShingleHash.simhash64]]. Null text yields null (the former UDF mapped
  * null to the empty-document fingerprint 0; null-out is the Spark-idiomatic
  * contract and keeps null rows out of the bucket join).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires a string input, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(input: Any): Any =
    ShingleHash.simhash64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHash.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object ShingleExprs {
  /** Column API for [[SimHash64]]. */
  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))

  /** Column API for [[ShingleHashes]]. */
  def wordShingleHashes(text: Column, k: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), k))

  /** Column API for [[MinHashSignature]]. */
  def minhashSignature(hashes: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(hashes), numHashes))

  /** Column API for [[LongSetExcept]]; `set` is defensively sorted here. */
  def longSetExcept(values: Column, set: Array[Long]): Column = {
    val s = set.clone(); java.util.Arrays.sort(s)
    ColumnBridge.column(LongSetExcept(ColumnBridge.expression(values), s))
  }
}
