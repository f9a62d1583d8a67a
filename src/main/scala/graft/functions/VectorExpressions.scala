package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the vector hot path (SURVEY §7.3: the one
  * anticipated custom `Expression`).
  *
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` evaluates higher-order
  * lambdas interpretively — fine for one probe row, ruinous for the
  * 2M-pair near-dup sweep. `DotProduct` compiles to a tight Java loop
  * inside whole-stage codegen (~50× less per-pair overhead) while keeping
  * the summation order strictly sequential, so results stay bit-identical
  * to the fold it replaces (and to DuckDB's list_dot_product oracle).
  *
  * Inputs must be array<double>; both nulls and length mismatches follow
  * the fold's semantics (null in → null out; shorter array bounds the sum).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<double>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  /** The one builder both registration paths share: arity-checked so SQL
    * misuse fails analysis with a clear message instead of dropping
    * arguments or throwing IndexOutOfBounds. */
  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2,
      s"graft_dot requires exactly 2 arguments, got ${exprs.length}")
    DotProduct(exprs(0), exprs(1))
  }

  /** Register `graft_dot` in the session's function registry (idempotent).
    * The registry route keeps us on public API — Column-from-Expression
    * constructors are private[sql] in Spark 4. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", builder, "built-in")

  /** Column-level dot product over two array<double> columns. Callers must
    * have invoked [[register]] on the session first. */
  def dot_product(a: Column, b: Column): Column = call_function("graft_dot", a, b)
}

/** Production registration path: inject `graft_dot` at session build via
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`). The registry route in
  * [[VectorExpressions.register]] covers sessions built without the
  * extension (e.g. the driver's Verify/Bench mains).
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      VectorExpressions.builder))
    e.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashHex].getName, "graft_minhash"),
      TextExpressions.minhashBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunks].getName, "graft_cdc_chunks"),
      TextExpressions.cdcChunksBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      BloomExpressions.aggBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_bloom_contains"),
      BloomExpressions.containsBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "graft_cms_estimate"),
      SketchExpressions.cmsEstimateBuilder))
  }
}
