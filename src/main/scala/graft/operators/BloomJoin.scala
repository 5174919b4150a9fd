package graft.operators

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter pre-filtered join — the shuffle-volume cut for a selective
  * join whose dimension side is too big to broadcast whole.
  *
  * At 100 TB the expensive part of `fact JOIN dim` is shuffling the fact
  * side; when the join keeps only a small fraction of fact rows, most of
  * that shuffle is wasted on rows with no partner. A Bloom filter of the dim
  * keys is megabytes where the dim itself is gigabytes: build it in one
  * tree-aggregated pass over the dim keys, ship it inside the plan, and
  * drop non-matching fact rows map-side BEFORE the exchange. The exact join
  * that follows removes the false positives, so the result is row-identical
  * to the plain join — only the shuffled volume changes (by 1 - selectivity
  * - fpp). This is the manual form of Spark's AQE runtime bloom-filter
  * rewrite (`spark.sql.optimizer.runtime.bloomFilter.*`), usable where that
  * rewrite does not fire (non-equi pre-filters, reused filters, semi joins
  * against an already-computed key set).
  *
  * [[BloomMightContain]] is a native Catalyst predicate with `doGenCode`, so
  * the probe stays inside whole-stage codegen — one virtual call per row, no
  * UDF boundary.
  */
object BloomJoin {

  /** One-pass Bloom filter over `dim`'s `key` column (nulls skipped).
    * `expectedItems`/`fpp` size the filter (1M items at 1% fpp ≈ 1.2 MB —
    * task-binary scale, NOT driver-memory scale; `BloomFilter.create` fails
    * fast on absurd sizings). Integral keys are inserted as longs, strings
    * as UTF-8 bytes — [[mightContain]] tests the same encodings.
    */
  def keyBloom(dim: DataFrame, key: String, expectedItems: Long,
      fpp: Double = 0.01): BloomFilter = {
    val dt = dim.schema(key).dataType
    val keyed = dim.select(
      dt match {
        case LongType | IntegerType | ShortType | ByteType =>
          col(key).cast(LongType)
        case StringType => col(key)
        case other => throw new IllegalArgumentException(
          s"bloom join key must be integral or string, got $other for '$key'")
      }).filter(col(key).isNotNull)
    val isString = dt == StringType
    keyed.rdd.treeAggregate(BloomFilter.create(expectedItems, fpp))(
      seqOp = (bf, row) => {
        if (isString) bf.putBinary(row.getString(0).getBytes("UTF-8"))
        else bf.putLong(row.getLong(0))
        bf
      },
      combOp = (a, b) => a.mergeInPlace(b))
  }

  /** `true` iff `key` might be in the serialized Bloom filter (null → null).
    * False positives at the configured fpp, never false negatives.
    */
  def mightContain(bloomBytes: Array[Byte], key: Column): Column =
    ColumnBridge.column(
      BloomMightContain(ColumnBridge.expression(key), bloomBytes))

  private def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** `fact` rows whose `key` appears in `dim` — row-identical to
    * `fact.join(dim, key, "left_semi")`, but non-matching fact rows are
    * dropped map-side by the Bloom probe before the join's exchange.
    */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame, key: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bytes = serialize(keyBloom(dim, key, expectedItems, fpp))
    fact.filter(mightContain(bytes, fact(key)))
      .join(dim.select(key), Seq(key), "left_semi")
  }

  /** Inner join with the same map-side Bloom pre-filter on the fact side. */
  def bloomInnerJoin(fact: DataFrame, dim: DataFrame, key: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bytes = serialize(keyBloom(dim, key, expectedItems, fpp))
    fact.filter(mightContain(bytes, fact(key))).join(dim, Seq(key))
  }

  /** [[keyBloomBytes]] pre-serialized for [[mightContain]] — for callers that
    * compose the pre-filter with their own join shape (e.g. a composite
    * key hashed to one long on both sides).
    */
  def keyBloomBytes(dim: DataFrame, key: String, expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] =
    serialize(keyBloom(dim, key, expectedItems, fpp))

  /** [[mightContain]] with the filter shipped as a Spark BROADCAST variable
    * instead of a plan-embedded literal (opt guide §3.2's own caveat; r18
    * verdict issue #3): a literal filter rides EVERY task binary of every
    * stage that references the predicate and is deserialized per task,
    * while a broadcast ships once per executor via the block manager and
    * is deserialized once. That is what lets the caller's size guard scale
    * with driver memory instead of a constant tuned to the task-binary
    * path. Same probe semantics, same `bloom_might_contain` plan name.
    *
    * The broadcast is [[BroadcastLifecycle]]-tracked: callers may release
    * it once their actions are done; the bench's between-run clearState
    * drops it regardless.
    */
  def mightContainBroadcast(
      bc: org.apache.spark.broadcast.Broadcast[BloomFilter],
      key: Column): Column =
    ColumnBridge.column(
      BloomMightContainBC(ColumnBridge.expression(key), bc))

  /** [[keyBloom]] wrapped into a lifecycle-tracked broadcast, for
    * [[mightContainBroadcast]]. */
  def keyBloomBroadcast(dim: DataFrame, key: String, expectedItems: Long,
      fpp: Double = 0.01)
      : org.apache.spark.broadcast.Broadcast[BloomFilter] =
    graft.BroadcastLifecycle.track(
      dim.sparkSession.sparkContext.broadcast(
        keyBloom(dim, key, expectedItems, fpp)))
}

/** `bloom.mightContain(child)` as a codegen-native predicate. The filter
  * travels as serialized bytes (stable across JVM serialization) and is
  * deserialized once per deserialized expression instance via a transient
  * lazy val; codegen pins the deserialized object in the plan's reference
  * array, so the hot path is a single `mightContainLong`/`mightContainBinary`
  * call per row.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with Predicate {

  override def nullable: Boolean = child.nullable

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain does not support input type $other")
  }

  override protected def nullSafeEval(v: Any): Any = v match {
    case l: java.lang.Long => bloom.mightContainLong(l)
    case i: java.lang.Integer => bloom.mightContainLong(i.toLong)
    case s: java.lang.Short => bloom.mightContainLong(s.toLong)
    case b: java.lang.Byte => bloom.mightContainLong(b.toLong)
    case u: UTF8String => bloom.mightContainBinary(u.getBytes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$ref.mightContainBinary($c.getBytes())")
      case LongType =>
        defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
      case _ =>
        defineCodeGen(ctx, ev, c => s"$ref.mightContainLong((long) $c)")
    }
  }

  override def prettyName: String = "bloom_might_contain"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[BloomMightContain]] over a BROADCAST filter: the expression carries
  * only the lightweight broadcast handle — tasks fetch the filter blocks
  * from the block manager (once per executor) instead of deserializing a
  * filter-sized literal from every task binary. Hot path is identical: a
  * cached reference + one `mightContainLong`/`mightContainBinary` per row
  * (the codegen null-check branch is predicted after the first row).
  */
case class BloomMightContainBC(
    child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[BloomFilter])
    extends UnaryExpression with Predicate {

  override def nullable: Boolean = child.nullable

  @transient private lazy val bloom: BloomFilter = bc.value

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain does not support input type $other")
  }

  override protected def nullSafeEval(v: Any): Any = v match {
    case l: java.lang.Long => bloom.mightContainLong(l)
    case i: java.lang.Integer => bloom.mightContainLong(i.toLong)
    case s: java.lang.Short => bloom.mightContainLong(s.toLong)
    case b: java.lang.Byte => bloom.mightContainLong(b.toLong)
    case u: UTF8String => bloom.mightContainBinary(u.getBytes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomCls = classOf[BloomFilter].getName
    val bcRef = ctx.addReferenceObj("bloomBc", bc,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val bloomVar = ctx.addMutableState(bloomCls, "bloomFilter")
    def probe(call: String => String)(c: String): String =
      s"(($bloomVar != null) ? $bloomVar" +
        s" : ($bloomVar = ($bloomCls) $bcRef.value())).${call(c)}"
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, probe(c => s"mightContainBinary($c.getBytes())"))
      case LongType =>
        defineCodeGen(ctx, ev, probe(c => s"mightContainLong($c)"))
      case _ =>
        defineCodeGen(ctx, ev, probe(c => s"mightContainLong((long) $c)"))
    }
  }

  override def prettyName: String = "bloom_might_contain"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
