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

/** All sign-LSH band values of a vector in ONE codegen'd pass — the banding
  * substrate behind q34/q66/q72. The composed form (`nbits` separate
  * `graft_dot` calls against sign-vector literals, then bit packing across
  * `nbits` CASE expressions) traverses the vector once per hyperplane
  * through separate expression invocations; this fuses the whole
  * nbits×dim multiply-add grid plus the bit packing into one tight loop
  * with the sign matrix as a codegen reference object.
  *
  * Bit-identical to the composed form by construction: per hyperplane the
  * products accumulate in strictly ascending dimension order (the same
  * order `DotProduct` sums, which is also the oracle's embedded-literal
  * order), the sign test is the same strict `> 0`, and packing bit j into
  * band j/bandSize at position j%bandSize reproduces the Σ bit·2^k
  * packing exactly. Sign matrix: sign(j,i) = +1 iff the first hex nibble
  * of md5("h<j>:<i>") is even — seedless, engine-reproducible (the rule
  * [[graft.vector.Similarity.signHyperplanes]] delegates to). */
case class LshBands(child: Expression, nbits: Int, bandSize: Int, dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.LongType

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_bands"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(DoubleType, _) if nbits > 0 && bandSize > 0 &&
        nbits % bandSize == 0 && bandSize <= 63 && dim > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires 0 < bandSize <= 63, bandSize | nbits, dim > 0")
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double>, got ${t.catalogString}")
    }
  }

  /** Flattened row-major (nbits × dim) for a branch-free codegen loop. */
  @transient private lazy val signsFlat: Array[Double] = {
    val m = VectorExpressions.signMatrix(nbits, dim)
    val flat = new Array[Double](nbits * dim)
    var j = 0
    while (j < nbits) {
      System.arraycopy(m(j), 0, flat, j * dim, dim); j += 1
    }
    flat
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val out = new Array[Long](nbits / bandSize)
    var j = 0
    while (j < nbits) {
      var s = 0.0
      var i = 0
      while (i < n) { s += v.getDouble(i) * signsFlat(j * dim + i); i += 1 }
      if (s > 0) out(j / bandSize) |= (1L << (j % bandSize))
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val signsRef = ctx.addReferenceObj("lshSigns", signsFlat, "double[]")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |long[] $out = new long[${nbits / bandSize}];
         |for (int $j = 0; $j < $nbits; $j++) {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $signsRef[$j * $dim + $i];
         |  }
         |  if ($s > 0) $out[$j / $bandSize] |= (1L << ($j % $bandSize));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBands =
    copy(child = newChild)
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

  /** Deterministic ±1 hyperplane signs (the q34/q66/q72 banding rule):
    * sign(j,i) = +1 iff the first hex nibble of md5("h<j>:<i>") is even. */
  def signMatrix(nbits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nbits, dim) { (j, i) =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"h$j:$i".getBytes("UTF-8"))
      if (((h(0) >> 4) & 0xf) % 2 == 0) 1.0 else -1.0
    }

  /** graft_lsh_bands(v, nbits, bandSize, dim) — the three shape arguments
    * must be integer literals (the sign matrix is a codegen constant). */
  val lshBandsBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 4,
      s"graft_lsh_bands requires (v, nbits, bandSize, dim), got ${exprs.length} args")
    def lit(e: Expression, name: String): Int = {
      require(e.foldable, s"graft_lsh_bands: $name must be a literal")
      e.eval(org.apache.spark.sql.catalyst.InternalRow.empty) match {
        case n: java.lang.Integer => n.intValue()
        case n: java.lang.Long => n.intValue()
        case other => throw new IllegalArgumentException(
          s"graft_lsh_bands: $name must be an integer literal, got $other")
      }
    }
    LshBands(exprs(0), lit(exprs(1), "nbits"), lit(exprs(2), "bandSize"),
      lit(exprs(3), "dim"))
  }

  /** Register `graft_dot` + `graft_lsh_bands` in the session's function
    * registry (idempotent). The registry route keeps us on public API —
    * Column-from-Expression constructors are private[sql] in Spark 4. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_lsh_bands", lshBandsBuilder, "built-in")
  }

  /** Column-level dot product over two array<double> columns. Callers must
    * have invoked [[register]] on the session first. */
  def dot_product(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** All sign-LSH band values of `v` in one pass (array<long> of
    * nbits/bandSize entries). Callers must have invoked [[register]]. */
  def lsh_bands(v: Column, nbits: Int, bandSize: Int, dim: Int): Column =
    call_function("graft_lsh_bands", v,
      org.apache.spark.sql.functions.lit(nbits),
      org.apache.spark.sql.functions.lit(bandSize),
      org.apache.spark.sql.functions.lit(dim))
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
    e.injectFunction((
      FunctionIdentifier("graft_lsh_bands"),
      new ExpressionInfo(classOf[LshBands].getName, "graft_lsh_bands"),
      VectorExpressions.lshBandsBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "graft_word_ngrams"),
      TextExpressions.wordNgramsBuilder))
  }
}
