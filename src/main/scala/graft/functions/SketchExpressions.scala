package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Probe side of the count-min sketch. Spark ships the BUILD side as the
  * `count_min_sketch` aggregate but gives SQL no way to query the resulting
  * binary — estimation normally happens host-side via
  * `CountMinSketch.readFrom`. `graft_cms_estimate` closes that gap as a
  * native expression, so sketch lookups run in-plan (and in the oracle-
  * checked audit, q104) instead of in driver code.
  *
  * The sketch argument must be foldable (a literal, the same contract as
  * `BloomFilterMightContain`): the ~100 KB–MB sketch deserializes ONCE per
  * task via a lazy reference object, never per row.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      // a foldable NULL (lit(null).cast("binary")) must fail ANALYSIS, not
      // surface later as an opaque NPE from CountMinSketch.readFrom(null)
      // when the lazy sketch is first forced at codegen/eval time
      case (BinaryType, LongType) if left.foldable =>
        if (left.eval(InternalRow.empty) == null)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires a non-null sketch literal — got NULL")
        else TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable (literal) sketch — got a non-constant binary")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, bigint), got (${l.catalogString}, ${r.catalogString})")
    }

  @transient private lazy val sketch: CountMinSketch =
    CountMinSketch.readFrom(left.eval(InternalRow.empty).asInstanceOf[Array[Byte]])

  override def nullSafeEval(sketchBytes: Any, v: Any): Any =
    sketch.estimateCount(v.asInstanceOf[java.lang.Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the deserialized sketch rides the references array — built once at
    // codegen time, shared by every row the generated class processes
    val sketchRef = ctx.addReferenceObj("cmsSketch", sketch, classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, (_, v) =>
      s"${ev.value} = $sketchRef.estimateCount(java.lang.Long.valueOf($v));")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

/** `graft_bounded_collect(key, cap)` — collect up to `cap` long keys per
  * group, SORTED ascending in the result (round 17, the q74 candidate-build
  * rewrite): the df-capped blocking pattern needs each rare gram's doc-id
  * list, but `collect_list` buffers EVERY id of hot groups — unbounded
  * per-group aggregation state, the exact 100 TB OOM hazard the repo's
  * BottomKMd5 expression exists to avoid on the per-row side. This
  * aggregate's buffer is capped at `cap` entries: groups with ≤ cap rows
  * collect EXACTLY (update and merge only ever drop past the cap), larger
  * groups return a truncated array — callers must gate on a count computed
  * in the same aggregate (`df <= cap`) before trusting contents, which the
  * df-capped blocking filter does by construction. The sort makes the
  * result a pure function of the group's value SET (partitioning order
  * never leaks into the output). */
case class BoundedCollectLongAgg(
    child: Expression,
    cap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[Long]]
  with UnaryLike[Expression] {

  override def prettyName: String = "graft_bounded_collect"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName takes a bigint key column, got ${child.dataType.sql}")
    else if (cap < 1 || cap > 4096)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName cap must be in [1, 4096], got $cap — the point is a " +
          "small bound; use collect_list deliberately for unbounded state")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): scala.collection.mutable.ArrayBuffer[Long] =
    scala.collection.mutable.ArrayBuffer.empty[Long]

  override def update(buffer: scala.collection.mutable.ArrayBuffer[Long],
      input: InternalRow): scala.collection.mutable.ArrayBuffer[Long] = {
    val v = child.eval(input)
    if (v != null && buffer.length < cap) buffer += v.asInstanceOf[Long]
    buffer
  }

  override def merge(buffer: scala.collection.mutable.ArrayBuffer[Long],
      other: scala.collection.mutable.ArrayBuffer[Long]): scala.collection.mutable.ArrayBuffer[Long] = {
    var i = 0
    while (buffer.length < cap && i < other.length) {
      buffer += other(i); i += 1
    }
    buffer
  }

  override def eval(buffer: scala.collection.mutable.ArrayBuffer[Long]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      buffer.toArray.sorted)

  override def serialize(buffer: scala.collection.mutable.ArrayBuffer[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.ArrayBuffer[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (bb.remaining() >= 8) out += bb.getLong
    out
  }

  override def withNewMutableAggBufferOffset(n: Int): BoundedCollectLongAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BoundedCollectLongAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): BoundedCollectLongAgg =
    copy(child = newChild)
}

object SketchExpressions {

  val cmsEstimateBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2,
      s"graft_cms_estimate requires (sketch, key), got ${exprs.length} args")
    CmsEstimate(exprs(0), exprs(1))
  }

  val boundedCollectBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2,
      s"graft_bounded_collect requires (key, cap), got ${exprs.length} args")
    val capExpr = exprs(1)
    require(capExpr.foldable, "graft_bounded_collect cap must be a literal")
    BoundedCollectLongAgg(exprs.head,
      capExpr.eval(InternalRow.empty).asInstanceOf[Number].intValue())
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cms_estimate", cmsEstimateBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bounded_collect", boundedCollectBuilder, "built-in")
  }

  def cms_estimate(sketch: Column, key: Column): Column =
    call_function("graft_cms_estimate", sketch, key)

  def bounded_collect(key: Column, cap: Int): Column =
    call_function("graft_bounded_collect", key,
      org.apache.spark.sql.functions.lit(cap))
}
