package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.call_function

/** Runtime bloom-filter surface (the manual analogue of Spark's
  * InjectRuntimeFilter, which only fires on join patterns the optimizer
  * recognizes — reusing the same Catalyst machinery it uses internally:
  * `BloomFilterAggregate` to build the sketch, `BloomFilterMightContain`
  * (codegen'd) to probe it).
  *
  * At 100 TB this is the difference between shuffling the full fact table
  * into a join and shuffling only the ~selectivity fraction that can
  * possibly match: the build side aggregates a KB–MB sketch, the sketch
  * ships to every scan task as a literal (exactly how Spark distributes its
  * own runtime filters), and the probe runs inside whole-stage codegen
  * before the exchange. False positives are tolerated because a normal
  * equi-join afterwards gives the exact answer — sketch-then-verify, the
  * same shape as q55's prefiltered jaccard.
  *
  * Keys are hashed with Spark's own `XxHash64` on both sides, so a bloom
  * built on `o_orderkey` probes correctly against `l_orderkey`.
  */
object BloomExpressions {

  /** graft_bloom_agg(key, estimatedItems, numBits) → binary sketch.
    * The analyzer wraps the returned AggregateFunction in a Complete
    * AggregateExpression, the same path Spark's built-in sketch aggregates
    * take through the function registry. */
  val aggBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3,
      s"graft_bloom_agg requires (key, estimatedItems, numBits), got ${exprs.length} args")
    new BloomFilterAggregate(new XxHash64(Seq(exprs(0))), exprs(1), exprs(2))
  }

  /** graft_bloom_contains(bloomBinary, key) → boolean. The bloom argument
    * must be foldable (a literal sketch) — `BloomFilterMightContain`
    * deserializes it once per task, not per row. */
  val containsBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2,
      s"graft_bloom_contains requires (bloom, key), got ${exprs.length} args")
    BloomFilterMightContain(exprs(0), new XxHash64(Seq(exprs(1))))
  }

  /** Register both functions in the session registry (idempotent; same
    * public-API route as [[VectorExpressions.register]]). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg", aggBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_contains", containsBuilder, "built-in")
  }

  def bloom_agg(key: Column, estimatedItems: Column, numBits: Column): Column =
    call_function("graft_bloom_agg", key, estimatedItems, numBits)

  def bloom_contains(bloom: Column, key: Column): Column =
    call_function("graft_bloom_contains", bloom, key)
}
