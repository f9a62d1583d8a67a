package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}

/** Theta-sketch set operations (Apache DataSketches `theta`, on the Spark
  * classpath): the sketch family HLL cannot replace when the question is an
  * INTERSECTION — "how many distinct users did BOTH A and B" — because HLL
  * unions only. A theta sketch retains the k smallest value-hashes, so
  * union/intersection are set algebra over retained entries, and — the
  * property every oracle row here leans on — the retained set is
  * order-INDEPENDENT (min-k of a fixed hash set), making estimates
  * deterministic for a fixed input corpus regardless of partitioning.
  * Below k distinct values the sketch is the exact set (estimates are
  * exact); above, the relative error is ~1/sqrt(k) against the UNION mass.
  *
  * [[ThetaSketchAgg]] is a native `TypedImperativeAggregate` — the live
  * `Union` object rides the hash-aggregate buffer between rows (no
  * per-row deserialize; Spark's own datasketches HLL agg uses the same
  * shape) and serializes to the compact ordered form only at shuffle
  * boundaries, so a 100 TB scan ships k-bounded sketch bytes, never keys.
  */
case class ThetaSketchAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def prettyName: String = "graft_theta_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes a long/int/string key column, got ${t.sql}")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType    => buffer.update(v.asInstanceOf[Long])
      case IntegerType => buffer.update(v.asInstanceOf[Int].toLong)
      case StringType  => buffer.update(v.toString)
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  // compact ordered form both at rest and on the wire: deterministic bytes
  // for a fixed input set, so even a binary compare of sketches is stable
  override def eval(buffer: Union): Any = buffer.getResult.toByteArray
  override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(Sketches.heapifySketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** `theta_union_agg(sk)` — union-merge of SERIALIZED theta sketches, the
  * merge-on-read half of the at-rest sketch table
  * ([[graft.analytics.Relational.writeCohortSketches]]): day-grain sketch
  * rows persist as compact bytes, and every coarser cohort answer unions
  * them back without touching raw keys. The mirror of Spark's own
  * `hll_union_agg`, for the theta family. Union is commutative,
  * associative and IDEMPOTENT over retained-entry sets, so the estimate
  * is deterministic for a fixed input row set regardless of partitioning
  * or duplication — the property the maintenance job's exactly-once
  * argument rides. */
case class ThetaUnionAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def prettyName: String = "graft_theta_union_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes a serialized theta sketch (binary) column, got ${t.sql}")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null)
      buffer.union(Sketches.wrapSketch(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray
  override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(Sketches.heapifySketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(n: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)
}

/** Static entry points the generated code calls — resolved at codegen
  * time, one short-lived wrap per sketch pair (sketch tables are
  * group-count-sized, so these run a handful of times per query). */
object ThetaOps {
  def intersectEstimate(a: Array[Byte], b: Array[Byte]): Long = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(Sketches.wrapSketch(Memory.wrap(a)))
    i.intersect(Sketches.wrapSketch(Memory.wrap(b)))
    Math.round(i.getResult.getEstimate)
  }

  def estimate(a: Array[Byte]): Long =
    Math.round(Sketches.wrapSketch(Memory.wrap(a)).getEstimate)

  def aNotBEstimate(a: Array[Byte], b: Array[Byte]): Long = {
    val d = SetOperation.builder().buildANotB()
    Math.round(d.aNotB(Sketches.wrapSketch(Memory.wrap(a)),
      Sketches.wrapSketch(Memory.wrap(b))).getEstimate)
  }
}

/** `theta_anotb_estimate(a, b)` — rounded distinct-count estimate of the
  * set difference A \ B of two serialized theta sketches. */
case class ThetaAnotBEstimate(left: Expression, right: Expression)
  extends BinaryExpression {

  override def prettyName: String = "graft_theta_anotb_estimate"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes two serialized theta sketches (binary)")

  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaOps.aNotBEstimate(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ThetaOps.aNotBEstimate($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaAnotBEstimate =
    copy(left = newLeft, right = newRight)
}

/** `theta_intersect_estimate(a, b)` — rounded distinct-count estimate of
  * the intersection of two serialized theta sketches. */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
  extends BinaryExpression {

  override def prettyName: String = "graft_theta_intersect_estimate"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes two serialized theta sketches (binary)")

  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaOps.intersectEstimate(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ThetaOps.intersectEstimate($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersectEstimate =
    copy(left = newLeft, right = newRight)
}

object ThetaExpressions {

  val aggBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1,
      s"graft_theta_sketch_agg requires (key), got ${exprs.length} args")
    ThetaSketchAgg(exprs.head)
  }

  val unionAggBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1,
      s"graft_theta_union_agg requires (sketch), got ${exprs.length} args")
    ThetaUnionAgg(exprs.head)
  }

  val intersectBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2,
      s"graft_theta_intersect_estimate requires (a, b), got ${exprs.length} args")
    ThetaIntersectEstimate(exprs(0), exprs(1))
  }

  val anotbBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2,
      s"graft_theta_anotb_estimate requires (a, b), got ${exprs.length} args")
    ThetaAnotBEstimate(exprs(0), exprs(1))
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_theta_sketch_agg", aggBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_theta_union_agg", unionAggBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_theta_intersect_estimate", intersectBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_theta_anotb_estimate", anotbBuilder, "built-in")
  }

  def theta_sketch_agg(key: Column): Column =
    call_function("graft_theta_sketch_agg", key)

  def theta_union_agg(sk: Column): Column =
    call_function("graft_theta_union_agg", sk)

  def theta_intersect_estimate(a: Column, b: Column): Column =
    call_function("graft_theta_intersect_estimate", a, b)

  def theta_anotb_estimate(a: Column, b: Column): Column =
    call_function("graft_theta_anotb_estimate", a, b)
}
