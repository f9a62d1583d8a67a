package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shuffle-avoidance utilities for the 100 TB path (SURVEY §4.2 "join
  * strategy" + the brief's partitioning/bucketing/salting checklist).
  *
  * - Bucketing: write both join sides bucketed by the join key → repeated
  *   joins read co-located buckets with NO exchange on either side. The
  *   right trade when a fact table is joined on the same key by many
  *   downstream queries (orders ⋈ lineitem here).
  * - Salting: explode a hot key into `saltFactor` sub-keys on the skewed
  *   side and replicate the other side, so one giant key no longer pins a
  *   single reducer. AQE's skew-join split handles moderate skew
  *   automatically; salting is the deliberate version for pathological keys.
  */
object ScaleJoins {

  /** Write `df` as a bucketed+sorted table (co-located layout). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — plans as a
    * sort-merge join with zero Exchange operators when bucket counts match. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Salted equi-join: `facts ⋈ dim` on `key` where some fact keys are hot.
    * Facts get a random salt in [0, saltFactor); the dimension side is
    * replicated across all salts (explode of a literal range — dimension
    * rows × saltFactor, fine for dimension-sized tables). Result equals the
    * plain join, but the shuffle key is (key, salt) so hot keys spread over
    * saltFactor reducers. */
  /** The fact-side salting expression of [[saltedJoin]], exposed so the
    * skew spec measures the EXACT salt the join shuffles on. */
  def withSalt(facts: DataFrame, saltFactor: Int): DataFrame =
    facts.withColumn("_salt", (rand(seed = 42) * saltFactor).cast("int"))

  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val salted = withSalt(facts, saltFactor)
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Q98 — bloom-prefiltered join (the manual InjectRuntimeFilter): revenue
    * of lineitems belonging to top-price orders. The qualifying orders
    * aggregate to a bloom sketch (bounded: numBits/8 = 1 MB regardless of
    * corpus size — sized m/n = 8 bits per item at the 1M-item capacity for
    * ~2% FPR; a codebook-class driver collect, like q41's IVF centroids);
    * the sketch probes the lineitem SCAN inside whole-stage codegen, so at
    * 100 TB only the ~10% of fact rows that can possibly match reach the
    * join exchange. The equi-join after the probe removes bloom false
    * positives — the output is EXACT and the oracle is the plain join,
    * sketch-free (q55's sketch-then-verify contract). */
  def bloomPrefilterJoin(spark: SparkSession, dir: String,
      priceFloor: Double = 450000.0): DataFrame = {
    import graft.functions.BloomExpressions
    import graft.sources.Tables
    BloomExpressions.register(spark)
    val hot = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > priceFloor)
      .select("o_orderkey")
    val sketch: Array[Byte] = hot
      .agg(BloomExpressions.bloom_agg(
        col("o_orderkey"), lit(1000000L), lit(1048576L * 8)))
      .head.getAs[Array[Byte]](0)
    val pre = Tables.lineitem(spark, dir)
      .filter(BloomExpressions.bloom_contains(lit(sketch), col("l_orderkey")))
    pre.join(hot, pre("l_orderkey") === hot("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum("l_quantity").as("sum_qty"))
      .orderBy("l_returnflag")
  }

  /** Count Exchange operators in a plan — the unit tests' shuffle meter. */
  def exchangeCount(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.size
}
