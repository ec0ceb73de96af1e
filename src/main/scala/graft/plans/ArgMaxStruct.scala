package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.{DataType, StructType}

/** Aggregation buffer for [[ArgMaxStruct]]: the single greatest struct
  * row seen so far (an owned UnsafeRow copy), or null while empty.
  * Constant memory per group — one row — regardless of how many versions
  * a hot entity accumulates. */
final class ArgMaxBuf(var best: UnsafeRow)

/** `max(struct(version..., payload...))` as a typed imperative aggregate.
  *
  * The declarative `Max` over a struct carries a struct-typed buffer,
  * which UnsafeRow cannot hold mutably, so Catalyst demotes the whole
  * aggregation to SortAggregate — every map split gets locally sorted by
  * the grouping key just to compute a running maximum. This class holds
  * the buffer as a plain object instead, which puts the aggregation in
  * ObjectHashAggregateExec: hash-based partial aggregation, map-side
  * combine, zero sorts anywhere in the plan. Semantics are identical to
  * the declarative form (lexicographic struct comparison via the
  * interpreted ordering, NULL structs skipped), so the two formulations
  * are interchangeable — [[graft.operators.EventOps.latestOn]] keeps a
  * differential spec pinning that.
  */
case class ArgMaxStruct(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArgMaxBuf] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if RowOrdering.isOrderable(s) => TypeCheckResult.TypeCheckSuccess
    case s: StructType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an orderable struct, got ${s.sql}")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRUCT column, got ${other.sql}")
  }

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  @transient private lazy val ord =
    TypeUtils.getInterpretedOrdering(structType)
  @transient private lazy val toUnsafe = UnsafeProjection.create(structType)

  override def createAggregationBuffer(): ArgMaxBuf = new ArgMaxBuf(null)

  override def update(buf: ArgMaxBuf, input: InternalRow): ArgMaxBuf = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (buf.best == null || ord.compare(row, buf.best) > 0)
        buf.best = toUnsafe(row).copy()
    }
    buf
  }

  override def merge(buf: ArgMaxBuf, other: ArgMaxBuf): ArgMaxBuf = {
    if (other.best != null &&
        (buf.best == null || ord.compare(other.best, buf.best) > 0))
      buf.best = other.best
    buf
  }

  override def eval(buf: ArgMaxBuf): Any = buf.best

  override def serialize(buf: ArgMaxBuf): Array[Byte] =
    if (buf.best == null) Array.emptyByteArray else buf.best.getBytes

  override def deserialize(bytes: Array[Byte]): ArgMaxBuf =
    if (bytes.isEmpty) new ArgMaxBuf(null)
    else {
      val row = new UnsafeRow(structType.size)
      row.pointTo(bytes, bytes.length)
      new ArgMaxBuf(row)
    }

  override def nullable: Boolean = true
  override def dataType: DataType = child.dataType
  override def prettyName: String = ArgMaxStruct.FuncName

  override def withNewMutableAggBufferOffset(newOffset: Int): ArgMaxStruct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArgMaxStruct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ArgMaxStruct =
    copy(child = newChild)
}

object ArgMaxStruct {
  val FuncName = "graft_latest"

  def builder(children: Seq[Expression]): Expression = {
    require(children.length == 1,
      s"$FuncName expects exactly one struct argument, got ${children.length}")
    ArgMaxStruct(children.head)
  }

  /** Idempotent per-session registration (same pattern as
    * [[CappedCollectLong.ensureRegistered]]). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val id = FunctionIdentifier(FuncName)
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(id))
      registry.registerFunction(id,
        new ExpressionInfo(classOf[ArgMaxStruct].getName, FuncName),
        builder _)
  }
}
