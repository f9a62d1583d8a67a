package graft.quality

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** U4 — custom typed aggregator: weighted violation score per group.
  *
  * Folds per-row violation counts into the reference's per-event score
  * formula aggregated over a group:
  * `mean over rows of max(0, 1 − k·violations)` (expectations.py:94) —
  * i.e. "how healthy is this partition/session/hour", the quantity the
  * reference computes row-at-a-time and averages by hand.
  *
  * An `Aggregator[IN, BUF, OUT]` gets Spark's full partial-aggregation
  * treatment (map-side combine, codegen'd buffer updates) — at 100 TB the
  * reduce(sum, count) buffer is 16 bytes per group regardless of row count.
  * Register with `udaf(...)` for SQL use.
  */
class WeightedScore(k: Double) extends Aggregator[Long, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), violations: Long): (Double, Long) =
    (b._1 + math.max(0.0, 1.0 - k * violations), b._2 + 1)
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0) 1.0 else b._1 / b._2
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object WeightedScore {
  import org.apache.spark.sql.functions.udaf

  /** Register as a SQL/DataFrame aggregate function `weighted_score_<k>`. */
  def register(spark: org.apache.spark.sql.SparkSession, k: Double): String = {
    val name = s"weighted_score_${(k * 100).toInt}"
    spark.udf.register(name, udaf(new WeightedScore(k)))
    name
  }
}
