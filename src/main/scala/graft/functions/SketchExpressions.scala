package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
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

object SketchExpressions {

  val cmsEstimateBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2,
      s"graft_cms_estimate requires (sketch, key), got ${exprs.length} args")
    CmsEstimate(exprs(0), exprs(1))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cms_estimate", cmsEstimateBuilder, "built-in")

  def cms_estimate(sketch: Column, key: Column): Column =
    call_function("graft_cms_estimate", sketch, key)
}
