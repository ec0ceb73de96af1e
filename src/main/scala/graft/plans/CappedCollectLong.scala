package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Aggregation buffer for [[CappedCollectLong]]: a growable PRIMITIVE
  * long array (update runs once per occurrence row — the hottest loop in
  * the inverted-index build — so no per-row boxing), or an overflow flag
  * once the cap is crossed, at which point the array is DROPPED and the
  * hot key costs one boolean for the rest of the aggregation. */
final class CappedLongsBuf(var overflowed: Boolean, var n: Int, var arr: Array[Long]) {
  def add(v: Long, cap: Int): Unit =
    if (!overflowed) {
      if (n >= cap) { overflowed = true; arr = CappedLongsBuf.Empty; n = 0 }
      else {
        if (n == arr.length)
          arr = java.util.Arrays.copyOf(arr, math.min(cap, math.max(8, arr.length * 2)))
        arr(n) = v
        n += 1
      }
    }
}
object CappedLongsBuf {
  val Empty = new Array[Long](0)
}

/** `capped_collect_list`-style aggregate: collect up to `cap` longs per
  * group; a group exceeding the cap evaluates to NULL (the "hot key"
  * signal). NULL inputs are skipped and do not count toward the cap
  * (standard aggregate-input semantics). Fuses the inverted-index df-cap
  * + bucket build into ONE aggregation — the separate count-then-anti-join
  * shape paid a second full shuffle of the occurrence relation just to
  * learn which keys were hot. Buffer memory grows geometrically to at
  * most `cap` longs BEFORE overflow and is constant AFTER it, so
  * unbounded hot keys (stopword shingles at corpus scale) cannot blow an
  * aggregation buffer — the property the two-phase shape existed to
  * guarantee, now held by construction in one phase. */
case class CappedCollectLong(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedLongsBuf] with UnaryLike[Expression] {

  require(cap > 0, s"capped_collect_list needs cap > 0, got $cap")

  // analysis-time input validation: without it a non-bigint child would
  // pass analysis and die with a ClassCastException on an executor
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT column, got ${child.dataType.sql}")

  override def createAggregationBuffer(): CappedLongsBuf =
    new CappedLongsBuf(false, 0, CappedLongsBuf.Empty)

  override def update(buf: CappedLongsBuf, input: InternalRow): CappedLongsBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long], cap)
    buf
  }

  override def merge(buf: CappedLongsBuf, other: CappedLongsBuf): CappedLongsBuf = {
    if (buf.overflowed || other.overflowed || buf.n + other.n > cap) {
      buf.overflowed = true
      buf.arr = CappedLongsBuf.Empty
      buf.n = 0
    } else {
      var i = 0
      while (i < other.n) { buf.add(other.arr(i), cap); i += 1 }
    }
    buf
  }

  override def eval(buf: CappedLongsBuf): Any =
    if (buf.overflowed) null
    else {
      val out = new Array[Any](buf.n)
      var i = 0
      while (i < buf.n) { out(i) = buf.arr(i); i += 1 }
      new GenericArrayData(out)
    }

  override def serialize(buf: CappedLongsBuf): Array[Byte] = {
    val n = if (buf.overflowed) 0 else buf.n
    val bb = java.nio.ByteBuffer.allocate(1 + 4 + 8 * n)
    bb.put(if (buf.overflowed) 1.toByte else 0.toByte)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedLongsBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val overflowed = bb.get() == 1.toByte
    val n = bb.getInt()
    val arr = new Array[Long](n)
    var i = 0
    while (i < n) { arr(i) = bb.getLong(); i += 1 }
    new CappedLongsBuf(overflowed, n, arr)
  }

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_capped_collect"

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CappedCollectLong =
    copy(child = newChild)
}

object CappedCollectLong {
  val FuncName = "graft_capped_collect"

  /** Builder for registry injection: (col, capLiteral). The cap must be a
    * positive int-range integer literal — a bigint literal that silently
    * truncated through toInt would run with a WRONG cap. */
  def builder(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      s"$FuncName expects (column, cap literal), got ${children.length} args")
    val cap = children(1) match {
      case Literal(v: Int, _) => v.toLong
      case Literal(v: Long, _) => v
      case other => throw new IllegalArgumentException(
        s"$FuncName cap must be an integer literal, got $other")
    }
    require(cap >= 1 && cap <= Int.MaxValue,
      s"$FuncName cap must be in [1, ${Int.MaxValue}], got $cap")
    CappedCollectLong(children.head, cap.toInt)
  }

  /** Idempotent per-session registration — callers that did not build
    * their session through GraftExtensions still get the function. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val id = FunctionIdentifier(FuncName)
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(id))
      registry.registerFunction(id,
        new ExpressionInfo(classOf[CappedCollectLong].getName, FuncName),
        builder _)
  }
}
