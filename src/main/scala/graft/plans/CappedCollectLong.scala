package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Aggregation buffer for [[CappedCollectLong]]: the collected ids, or an
  * overflow flag once the cap is crossed — at which point the ids are
  * DROPPED, so a hot key's buffer costs one boolean for the rest of the
  * aggregation instead of growing with its document frequency. */
final class CappedLongsBuf(var overflowed: Boolean,
                           val ids: java.util.ArrayList[java.lang.Long])

/** `capped_collect_list`-style aggregate: collect up to `cap` longs per
  * group; a group exceeding the cap evaluates to NULL (the "hot key"
  * signal). Fuses the inverted-index df-cap + bucket build into ONE
  * aggregation — the separate count-then-anti-join shape paid a second
  * full shuffle of the occurrence relation just to learn which keys were
  * hot. Buffer memory is bounded by `cap` BEFORE overflow and constant
  * AFTER it, so unbounded hot keys (stopword shingles at corpus scale)
  * cannot blow an aggregation buffer — the property the two-phase shape
  * existed to guarantee, now held by construction in one phase. */
case class CappedCollectLong(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedLongsBuf] with UnaryLike[Expression] {

  require(cap > 0, s"capped_collect_list needs cap > 0, got $cap")

  override def createAggregationBuffer(): CappedLongsBuf =
    new CappedLongsBuf(false, new java.util.ArrayList[java.lang.Long]())

  override def update(buf: CappedLongsBuf, input: InternalRow): CappedLongsBuf = {
    if (!buf.overflowed) {
      val v = child.eval(input)
      if (v != null) {
        buf.ids.add(v.asInstanceOf[Long])
        if (buf.ids.size() > cap) { buf.overflowed = true; buf.ids.clear() }
      }
    }
    buf
  }

  override def merge(buf: CappedLongsBuf, other: CappedLongsBuf): CappedLongsBuf = {
    if (buf.overflowed || other.overflowed ||
      buf.ids.size() + other.ids.size() > cap) {
      buf.overflowed = true
      buf.ids.clear()
    } else buf.ids.addAll(other.ids)
    buf
  }

  override def eval(buf: CappedLongsBuf): Any =
    if (buf.overflowed) null
    else {
      val out = new Array[Any](buf.ids.size())
      var i = 0
      while (i < out.length) { out(i) = buf.ids.get(i).longValue(); i += 1 }
      new GenericArrayData(out)
    }

  override def serialize(buf: CappedLongsBuf): Array[Byte] = {
    val n = if (buf.overflowed) 0 else buf.ids.size()
    val bb = java.nio.ByteBuffer.allocate(1 + 4 + 8 * n)
    bb.put(if (buf.overflowed) 1.toByte else 0.toByte)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(buf.ids.get(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedLongsBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val overflowed = bb.get() == 1.toByte
    val n = bb.getInt()
    val ids = new java.util.ArrayList[java.lang.Long](math.max(4, n))
    var i = 0
    while (i < n) { ids.add(bb.getLong()); i += 1 }
    new CappedLongsBuf(overflowed, ids)
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

  /** Builder for registry injection: (col, capLiteral). */
  def builder(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      s"$FuncName expects (column, cap literal), got ${children.length} args")
    val cap = children(1) match {
      case Literal(v: Int, _) => v
      case Literal(v: Long, _) => v.toInt
      case other => throw new IllegalArgumentException(
        s"$FuncName cap must be an integer literal, got $other")
    }
    CappedCollectLong(children.head, cap)
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
