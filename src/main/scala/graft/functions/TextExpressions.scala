package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The per-row shingle→MinHash loop, callable from generated code: word
  * `ngram`-grams over the token array, and for each seed s ∈ [0, numHashes)
  * the lexicographic min of md5Hex("s:" ++ gram) — exactly the value the
  * exploded formulation aggregates, and exactly DuckDB's
  * `list_min(list_transform(grams, g -> md5(s || ':' || g)))`, so results
  * stay oracle-identical. Null when the doc is shorter than `ngram` tokens
  * (no shingles ⇒ no signature, matching the left-join-null contract). */
object MinHashHelper {
  def compute(tokens: ArrayData, numHashes: Int, ngram: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < ngram) return null
    val mins = new Array[String](numHashes)
    var i = 0
    while (i <= n - ngram) {
      val sb = new java.lang.StringBuilder
      var k = 0
      var hasNull = false
      while (k < ngram) {
        val tok = tokens.getUTF8String(i + k)
        if (tok == null) hasNull = true
        else {
          if (k > 0) sb.append(' ')
          sb.append(tok.toString)
        }
        k += 1
      }
      // a gram touching a null token contributes nothing (DuckDB's
      // null-propagating concat + null-skipping list_min behave the same)
      if (!hasNull) {
        val gram = sb.toString
        var s = 0
        while (s < numHashes) {
          val h = org.apache.commons.codec.digest.DigestUtils.md5Hex(s + ":" + gram)
          if (mins(s) == null || h.compareTo(mins(s)) < 0) mins(s) = h
          s += 1
        }
      }
      i += 1
    }
    if (mins(0) == null) return null // every gram touched a null token
    new GenericArrayData(mins.map(UTF8String.fromString))
  }
}

/** MinHash signature as ONE map-side expression (SURVEY U6; the scale fix
  * for the round-1 shingle pipeline): the exploded formulation shuffles
  * every token row by doc_id for the trigram window and again for the
  * signature aggregate — at 100 TB that is two shuffles of the tokenized
  * corpus. This expression keeps the whole shingle→minhash loop inside the
  * row, so signatures come out of the parquet scan with NO shuffle at all;
  * codegen emits a single static call per row (the loop runs compiled,
  * whole-stage codegen span stays intact). */
case class MinHashHex(child: Expression, numHashes: Int = 8, ngram: Int = 3)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true // short docs yield null signatures
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.catalogString}")
    }
  }

  override def nullSafeEval(t: Any): Any =
    MinHashHelper.compute(t.asInstanceOf[ArrayData], numHashes, ngram)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinHashHelper.compute($c, $numHashes, $ngram);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashHex =
    copy(child = newChild)
}

object TextExpressions {

  /** Shared builder (registry + extensions): 1 arg, fixed 8×trigram shape —
    * the Dedup contract. */
  val minhashBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1,
      s"graft_minhash requires exactly 1 argument, got ${exprs.length}")
    MinHashHex(exprs.head)
  }

  /** Register `graft_minhash` on the session (idempotent; public-API route,
    * same rationale as [[VectorExpressions.register]]). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash", minhashBuilder, "built-in")

  /** 8-hash trigram MinHash signature of a token-array column (null when
    * under 3 tokens). Callers must [[register]] first. */
  def minhash_hex(tokens: Column): Column = call_function("graft_minhash", tokens)
}
