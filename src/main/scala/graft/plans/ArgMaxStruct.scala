package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, CreateNamedStruct, EqualTo, Expression, ExpressionInfo, GreaterThan, If, IsNotNull, LessThan, Literal, Not, Or, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.{DeclarativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.{TernaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, LongType, StructField, StructType}

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
  * combine. Semantics are identical to the declarative form
  * (lexicographic struct comparison via the interpreted ordering, NULL
  * structs skipped), so the two formulations are interchangeable —
  * [[graft.operators.EventOps.latestOn]] keeps a differential spec
  * pinning that.
  *
  * SCALE BOUNDARY (found the hard way — the 20M-vector gate probe filled
  * a 65 GB disk in one stage): ObjectHashAggregateExec falls back to
  * SORT-based aggregation once a task's hash map passes
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` distinct
  * keys (default 128) — past that, the REST of the task's input is
  * sorted by the grouping key, which on a candidate-pair relation is
  * exactly the corpus-sized sort this class exists to avoid. Use this
  * class only for shapes whose payload genuinely needs object buffers
  * (strings/arrays — [[graft.operators.EventOps.latestOn]]); there,
  * deployments should raise the threshold to their per-task key-count
  * budget (each extra key costs one buffered UnsafeRow). For the
  * all-primitive (score, id, payload) arg-max shape use [[ArgMaxBest]],
  * which stays in HashAggregateExec at ANY key cardinality: its
  * fixed-width buffer map spills by externally merging the per-key
  * BUFFERS (one row per key), never by sorting the input.
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

/** `argmax` over the all-primitive shape the engine's hot paths share:
  * keep the row with the greatest `score` (ties broken by the SMALLEST
  * `id`), carrying one extra `payload` (long or double). Returns
  * `struct(score DOUBLE, id BIGINT, payload <input type>)`, or NULL
  * when no input row had a non-null (score, id).
  *
  * This is a [[DeclarativeAggregate]] with a fixed-width primitive
  * buffer (score, id, payload, seen), so it planner-selects into
  * HashAggregateExec: whole-stage-codegen'd map-side partial
  * aggregation whose UnsafeFixedWidthAggregationMap, under memory
  * pressure, spills and merge-sorts the per-key BUFFERS — one row per
  * key — never the input relation. [[ArgMaxStruct]] (object buffer →
  * ObjectHashAggregateExec) degrades to sorting the task's remaining
  * INPUT once it sees more than
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` (128)
  * keys; on the IVF gate's candidate-pair relation at 20M vectors that
  * sort was measured filling a 65 GB disk. Every arg-max over candidate
  * pairs (IVF search k=1, incremental dedup best-match, shingle-index
  * probe) uses this class; only payloads that genuinely need object
  * buffers stay on [[ArgMaxStruct]].
  *
  * Double comparison semantics match the interpreted struct ordering
  * ArgMaxStruct uses (Spark's nan-safe compare: NaN is greatest,
  * NaN = NaN) — the ArgMaxBestSpec differential pins the two
  * formulations row-equal, ties included.
  */
case class ArgMaxBest(
    score: Expression, id: Expression, payload: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends DeclarativeAggregate with TernaryLike[Expression] {

  override def first: Expression = score
  override def second: Expression = id
  override def third: Expression = payload

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType &&
        (payload.dataType == LongType || payload.dataType == DoubleType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (DOUBLE, BIGINT, BIGINT|DOUBLE), got " +
        s"(${score.dataType.sql}, ${id.dataType.sql}, ${payload.dataType.sql})")

  private lazy val bScore = AttributeReference("bScore", DoubleType, nullable = false)()
  private lazy val bId = AttributeReference("bId", LongType, nullable = false)()
  private lazy val bPay = AttributeReference("bPay", payload.dataType, nullable = true)()
  private lazy val bSeen = AttributeReference("bSeen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bScore, bId, bPay, bSeen)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal(Double.NegativeInfinity), Literal(Long.MaxValue),
    Literal.create(null, payload.dataType), Literal(false))

  // a row is a candidate only with non-null (score, id); `better` is the
  // same (score DESC, id ASC) preference the struct ordering encoded as
  // (score, -id). And(valid, better) is false — never null — when the
  // row is invalid (Kleene AND), so the If guards stay deterministic.
  private def takeRow: Expression = {
    val valid = And(IsNotNull(score), IsNotNull(id))
    val better = Or(Not(bSeen),
      Or(GreaterThan(score, bScore),
        And(EqualTo(score, bScore), LessThan(id, bId))))
    And(valid, better)
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val take = takeRow
    Seq(If(take, score, bScore), If(take, id, bId),
      If(take, payload, bPay), Or(bSeen, And(IsNotNull(score), IsNotNull(id))))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val otherBetter = And(bSeen.right, Or(Not(bSeen.left),
      Or(GreaterThan(bScore.right, bScore.left),
        And(EqualTo(bScore.right, bScore.left),
          LessThan(bId.right, bId.left)))))
    Seq(If(otherBetter, bScore.right, bScore.left),
      If(otherBetter, bId.right, bId.left),
      If(otherBetter, bPay.right, bPay.left),
      Or(bSeen.left, bSeen.right))
  }

  override lazy val evaluateExpression: Expression = If(bSeen,
    CreateNamedStruct(Seq(
      Literal("score"), bScore, Literal("id"), bId, Literal("payload"), bPay)),
    Literal.create(null, dataType))

  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("payload", payload.dataType, nullable = true)))
  override def prettyName: String = ArgMaxBest.FuncName

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): ArgMaxBest =
    copy(score = newFirst, id = newSecond, payload = newThird)
}

object ArgMaxBest {
  val FuncName = "graft_argmax_best"

  def builder(children: Seq[Expression]): Expression = {
    require(children.length == 3,
      s"$FuncName expects (score, id, payload), got ${children.length} args")
    ArgMaxBest(children(0), children(1), children(2))
  }

  /** Idempotent per-session registration. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val id = FunctionIdentifier(FuncName)
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(id))
      registry.registerFunction(id,
        new ExpressionInfo(classOf[ArgMaxBest].getName, FuncName),
        builder _)
  }
}
