package graft

import org.apache.spark.sql.functions._
import graft.analytics.ScaleJoins

/** Shuffle-avoidance: bucketed co-located joins + salted skew joins. */
class ScaleJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join on matching buckets plans with zero shuffles") {
    // managed-table locations outlive the session's in-memory catalog
    Seq("orders_b", "lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
    val l = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    ScaleJoins.writeBucketed(o, "orders_b", "o_orderkey", 4)
    ScaleJoins.writeBucketed(l, "lineitem_b", "o_orderkey", 4)
    val joined = ScaleJoins.bucketedJoin(spark, "orders_b", "lineitem_b", "o_orderkey")
    assert(ScaleJoins.exchangeCount(joined) == 0) // co-located: no exchange
    assert(joined.count() == l.count())           // every line matches its order
    // contrast: the plain parquet join needs at least one shuffle
    val plain = o.join(l, "o_orderkey")
    assert(ScaleJoins.exchangeCount(plain) >= 1 ||
      plain.queryExecution.executedPlan.toString.contains("Broadcast"))
  }

  test("salted join equals the plain join and spreads the hot key") {
    // hot key: 10k rows of key=1, a handful elsewhere
    val facts = ((1 to 10000).map(_ => (1, "hot")) ++ Seq((2, "a"), (3, "b")))
      .toDF("k", "payload")
    val dim = Seq((1, "dim1"), (2, "dim2"), (3, "dim3"), (4, "dim4")).toDF("k", "attr")
    val plain = facts.join(dim, "k")
    val salted = ScaleJoins.saltedJoin(facts, dim, "k", saltFactor = 8)
    assert(salted.count() == plain.count())
    assert(salted.groupBy("k", "attr").count().orderBy("k").collect().toSeq ==
      plain.groupBy("k", "attr").count().orderBy("k").collect().toSeq)
  }

  test("salting bounds the max reducer partition under 100x key skew") {
    // one hot custkey carries 100× the mass of each of 50 uniform keys —
    // the pathological shape AQE's skew split mitigates but salting solves
    // deliberately. Reducer assignment is simulated with Spark's own
    // murmur3 `hash()` (the HashPartitioning function), so the counts are
    // exactly what the exchange would place on each of the P reducers.
    val p = 32
    val saltFactor = 8
    val facts = ((1 to 5000).map(_ => 1L) ++
      (2L to 51L).flatMap(k => Seq.fill(50)(k.toLong))).toDF("k")
    val total = 5000 + 50 * 50
    val uniform = total.toDouble / p
    def maxReducerRows(df: org.apache.spark.sql.DataFrame,
        keys: org.apache.spark.sql.Column*): Long =
      df.groupBy(pmod(hash(keys: _*), lit(p)).as("reducer"))
        .count().agg(max("count")).head().getLong(0)
    // unsalted: the hot key pins ONE reducer with its whole 5000-row mass
    val unsaltedMax = maxReducerRows(facts, col("k"))
    assert(unsaltedMax >= 5000, s"hot key should pin a reducer: $unsaltedMax")
    assert(unsaltedMax > saltFactor * uniform,
      f"unsalted max $unsaltedMax should exceed saltFactor×uniform (${saltFactor * uniform}%.0f)")
    // salted with the join's exact salt: the hot key spreads over
    // saltFactor sub-keys and the max reducer stays near uniform
    val salted = ScaleJoins.withSalt(facts, saltFactor)
    val saltedMax = maxReducerRows(salted, col("k"), col("_salt"))
    assert(saltedMax <= saltFactor * uniform,
      f"salted max $saltedMax must stay within saltFactor×uniform (${saltFactor * uniform}%.0f)")
    // two hot sub-keys (625 rows each) can still hash-collide onto one
    // reducer, so the guaranteed cut is saltFactor/2, not saltFactor
    assert(saltedMax < unsaltedMax / 3,
      s"salting should cut the max reducer at least 3×: $saltedMax vs $unsaltedMax")
  }

  test("q03SkewSafe is row-identical to q03 and shuffles on (key, salt)") {
    import graft.analytics.Relational
    val plain = Relational.q03(spark, sf0001).collect().toSeq
    assert(Relational.q03SkewSafe(spark, sf0001, saltFactor = 4)
      .collect().toSeq == plain)
    // With broadcast off (at sf0.001 the 600-row replicated dim would
    // otherwise broadcast and hide the shuffle), the customer-side exchange
    // must key on the salt too — that's the point: a hot custkey spreads
    // over saltFactor reducers instead of pinning one.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val salted = Relational.q03SkewSafe(spark, sf0001, saltFactor = 4)
      val plan = salted.queryExecution
        .explainString(org.apache.spark.sql.execution.SimpleMode)
      val saltedShuffle = plan.linesIterator
        .exists(l => l.contains("hashpartitioning") && l.contains("_salt"))
      assert(saltedShuffle, s"no salted shuffle key in plan:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bloom sketch has no false negatives and the probe is codegen'd") {
    import graft.functions.BloomExpressions
    BloomExpressions.register(spark)
    // build over evens, probe everything: every member MUST hit (bloom
    // guarantees no false negatives); odds may false-positive, that's fine
    val members = spark.range(0, 2000, 2).select(col("id"))
    val sketch = members
      .agg(BloomExpressions.bloom_agg(col("id"), lit(10000L), lit(80000L)))
      .head.getAs[Array[Byte]](0)
    val probed = spark.range(0, 2000)
      .withColumn("hit", BloomExpressions.bloom_contains(lit(sketch), col("id")))
    val missedMembers = probed.filter(col("id") % 2 === 0 && !col("hit")).count()
    assert(missedMembers == 0, "bloom dropped a true member (false negative)")
    // and it actually filters: the odd side can't ALL false-positive
    assert(probed.filter(col("hit")).count() < 2000)
    // SQL registration path works too. The probe key must be BIGINT like
    // the build side: XxHash64 hashes by input type width, so an INT 2 and
    // a BIGINT 2 produce different hashes — same rule as joining mixed-type
    // keys anywhere.
    assert(spark.sql(
      s"SELECT graft_bloom_contains(X'${sketch.map("%02x".format(_)).mkString}', CAST(2 AS BIGINT)) AS h")
      .head.getBoolean(0))
  }

  test("q98 bloom prefilter equals the sketch-free join; probe sits at the scan") {
    val bloomed = ScaleJoins.bloomPrefilterJoin(spark, sf0001, priceFloor = 300000.0)
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .filter(col("o_totalprice") > 300000.0).select("o_orderkey")
    val l = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val plain = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"), sum("l_quantity").as("sum_qty"))
      .orderBy("l_returnflag")
    assert(bloomed.collect().toSeq == plain.collect().toSeq)
    // the might_contain probe must run BEFORE the join exchange — i.e. it
    // appears in a Filter directly over the lineitem scan, so at scale the
    // fact table thins out before anything shuffles
    val plan = bloomed.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    val filterLine = plan.linesIterator.find(_.contains("might_contain"))
    assert(filterLine.isDefined, s"no bloom probe in plan:\n$plan")
  }
}
