package graft

import org.apache.spark.sql.functions._
import graft.analytics.Relational

/** Spot checks for the relational contract on sf0.001 (the full
  * hash-compare against DuckDB runs via Verify + tools/selfcheck.py). */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("q02 groups on the (returnflag, linestatus) domain") {
    val r = Relational.q02(spark, sf0001).collect()
    assert(r.length <= 6 && r.nonEmpty)
    assert(r.map(_.getString(0)).toSet.subsetOf(Set("A", "N", "R")))
  }

  test("q05 + q06 partition the customer table") {
    val semi = Relational.q05(spark, sf0001).count()
    val anti = Relational.q06(spark, sf0001).count()
    val total = spark.read.parquet(s"$sf0001/customer.parquet").count()
    assert(semi + anti == total)
  }

  test("q07 emits at most 3 rows per customer, rank-ordered") {
    val r = Relational.q07(spark, sf0001)
    val maxPer = r.groupBy("o_custkey").count().agg(max("count")).head().getLong(0)
    assert(maxPer <= 3)
  }

  test("q09 session gap boundary: exactly 600 s stays in-session (strict >)") {
    // build a tiny events table: user 1 with gaps 600s (same session) and
    // 601s (new session)
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val rows = Seq(0L, 600L, 1201L).zipWithIndex.map { case (off, i) =>
      (i.toLong, java.sql.Timestamp.from(base.plusSeconds(off)), 1L, "click", 1.0, "{}")
    }
    val dir = eventsDir(rows)
    val sessions = Relational.q09(spark, dir).collect()
    // events at t=0 and t=600 share session 1; t=1201 (gap 601) opens session 2
    assert(sessions.length == 2)
    assert(sessions.map(_.getLong(2)).toSeq == Seq(2L, 1L)) // event counts
  }

  test("q13 set algebra matches a hand computation") {
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
    val c = spark.read.parquet(s"$sf0001/customer.parquet")
    val withF = o.filter($"o_orderstatus" === "F").select($"o_custkey").distinct()
      .collect().map(_.getLong(0)).toSet
    val pos = c.filter($"c_acctbal" > 0).select($"c_custkey").collect().map(_.getLong(0)).toSet
    val bld = c.filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
      .collect().map(_.getLong(0)).toSet
    val expected = (withF intersect pos) diff bld
    val got = Relational.q13(spark, sf0001).collect().map(_.getLong(0)).toSet
    assert(got == expected)
  }

  test("q14 is the global top-10 by price desc") {
    val r = Relational.q14(spark, sf0001).collect()
    assert(r.length == 10)
    val prices = r.map(_.getDouble(1)).toSeq
    assert(prices == prices.sorted.reverse)
  }

  test("q123 skew advisor: salt factor is the exact partition-fill ceiling") {
    val ev = graft.sources.Tables.events(spark, sf0001)
    val total = ev.count()
    val counts = ev.groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = Relational.q123(spark, sf0001).collect()
    assert(out.length == 15)
    // descending by count with user_id tiebreak — a total order
    val keys = out.map(r => (r.getAs[Long]("cnt"), r.getAs[Long]("user_id")))
    assert(keys.sortBy { case (c, u) => (-c, u) }.sameElements(keys))
    // the top row IS the global max
    assert(out.head.getAs[Long]("cnt") == counts.values.max)
    out.foreach { r =>
      val cnt = r.getAs[Long]("cnt")
      assert(cnt == counts(r.getAs[Long]("user_id")))
      val salt = (cnt * 32 + total - 1) / total
      assert(r.getAs[Long]("salt") == salt)
      assert(r.getAs[Long]("share_ppm") == cnt * 1000000L / total)
      assert(r.getAs[Long]("hot") == (if (salt > 1) 1L else 0L))
    }
  }

  test("q124: merged partials equal the full recompute exactly") {
    val merged = Relational.q124(spark, sf0001).collect()
    // the claim q124 exists to verify, computed the direct way
    val full = graft.sources.Tables.events(spark, sf0001)
      .select($"event_type",
        org.apache.spark.sql.functions.round($"value" * 100, 0).cast("long").as("cents"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum($"cents").as("s"),
        min($"cents").as("lo"), max($"cents").as("hi"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(merged.length == full.size)
    merged.foreach { r =>
      val (n, s, lo, hi) = full(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_events") == n)
      assert(r.getAs[Long]("sum_cents") == s)
      assert(r.getAs[Long]("min_cents") == lo)
      assert(r.getAs[Long]("max_cents") == hi)
      // avg derived from merged partials, never averaged across sides
      assert(r.getAs[Double]("avg_value") == s.toDouble / n / 100.0)
    }
  }

  test("q20 counts match a correlated recount for a sample order") {
    val r = Relational.q20(spark, sf0001)
    val some = r.filter($"n_shipped_30d" > 0).head()
    val (key, n) = (some.getLong(0), some.getLong(1))
    val o = spark.read.parquet(s"$sf0001/orders.parquet").filter($"o_orderkey" === key).head()
    // Spark 4 surfaces parquet TIMESTAMP(isAdjustedToUTC=false) as NTZ
    val od = o.getAs[java.time.LocalDateTime]("o_orderdate")
    val manual = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .filter($"l_orderkey" === key &&
        $"l_shipdate" >= lit(od) &&
        $"l_shipdate" < lit(od.plusDays(30)))
      .count()
    assert(manual == n)
  }

  test("q142 hll reach: exact distincts per type + '_all', every sketch estimate in bound") {
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    val rows = (0 until 40).map { i =>
      (i.toLong, ts(i), (i % 7).toLong, if (i % 2 == 0) "click" else "view",
        1.0, "{}")
    }
    val dir = eventsDir(rows)
    val r = Relational.hllReach(spark, dir).collect()
      .map(x => x.getString(0) -> x).toMap
    // users 0..6 alternate click/view by event index parity: evens (clicks)
    // hit users 0..6 (20 events), odds (views) hit users 0..6 too
    assert(r("click").getLong(1) == 7L && r("view").getLong(1) == 7L)
    assert(r("_all").getLong(1) == 7L)
    // sparse-mode HLL is exact at this cardinality: every audit arm passes
    assert(r.values.forall(_.getLong(2) == 1L))
    // run on the fixture corpus too: the 5% bound must hold at sf0.001
    val fx = Relational.hllReach(spark, sf0001).collect()
    assert(fx.nonEmpty && fx.forall(_.getLong(2) == 1L))
  }

  test("q144 theta overlap: exact pairwise intersections below k, estimate audit green") {
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    // users 0..9 click; users 5..14 view; users 12..14 also error
    val rows =
      (0 until 10).map(i => (i.toLong, ts(i), i.toLong, "click", 1.0, "{}")) ++
      (0 until 10).map(i => (100L + i, ts(i), 5L + i, "view", 1.0, "{}")) ++
      (0 until 3).map(i => (200L + i, ts(i), 12L + i, "error", 1.0, "{}"))
    val dir = eventsDir(rows)
    val r = Relational.thetaOverlap(spark, dir).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x).toMap
    // click∩view = {5..9} (5), click∩error = ∅, view∩error = {12..14} (3)
    assert(r(("click", "view")).getLong(4) == 5L)
    assert(r(("click", "error")).getLong(4) == 0L)
    assert(r(("error", "view")).getLong(4) == 3L)
    assert(r.values.forall(_.getLong(5) == 1L), "sub-k sketches must be exact")
    // fixture corpus: the audit bound must hold there too
    val fx = Relational.thetaOverlap(spark, sf0001).collect()
    assert(fx.nonEmpty && fx.forall(_.getLong(5) == 1L))
  }

  test("q146 theta retention: exact cohort arithmetic, A\\B estimates audit green") {
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    // even event_ids (base): users 0..5; odd event_ids (current): users 4..9
    // → retained {4,5}=2, churned {0..3}=4, new {6..9}=4
    val rows =
      (0 until 6).map(i => (2L * i, ts(i), i.toLong, "click", 1.0, "{}")) ++
      (0 until 6).map(i => (2L * i + 1, ts(i), 4L + i, "click", 1.0, "{}"))
    val r = Relational.thetaRetention(spark, eventsDir(rows)).head()
    assert(r.getLong(0) == 6L && r.getLong(1) == 6L)
    assert(r.getLong(2) == 2L && r.getLong(3) == 4L && r.getLong(4) == 4L)
    assert(r.getLong(5) == 1L && r.getLong(6) == 1L && r.getLong(7) == 1L)
    // fixture corpus: every sketch audit must hold there too
    val fx = Relational.thetaRetention(spark, sf0001).head()
    assert(fx.getLong(5) == 1L && fx.getLong(6) == 1L && fx.getLong(7) == 1L)
  }

  test("reach sketches survive the parquet round-trip: at-rest rollup equals direct and exact") {
    val path = java.nio.file.Files.createTempDirectory("reach_sk").toString
    Relational.writeReachSketches(spark, sf0001, path)
    val atRest = Relational.reachFromSketches(spark, path).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // served WITHOUT touching events; equals exact distincts at this
    // cardinality (sparse-exact HLL) — the same values q142 audits
    val exact = Relational.hllReach(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(atRest.keySet == exact.keySet)
    exact.foreach { case (t, n) =>
      assert(math.abs(atRest(t) - n) <= math.max(1L, (n * 0.05).toLong),
        s"type $t: at-rest ${atRest(t)} vs exact $n") }
    // appending one more day-grain sketch row keeps merging (the ingest
    // model): union of table + extra row = strictly larger reach
    val before = atRest("_all")
    import spark.implicits._
    spark.range(900000, 900050)
      .select(lit("click").as("event_type"), lit("2030-01-01").as("day"),
        col("id"))
      .groupBy("event_type", "day")
      .agg(hll_sketch_agg(col("id")).as("sk"))
      .write.mode("append").parquet(path)
    val after = Relational.reachFromSketches(spark, path).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after("_all") >= before + 45, s"${after("_all")} vs $before")
  }

  test("cohort sketch table: day-grain union serves estimates identical to direct aggregation") {
    import graft.functions.ThetaExpressions
    import org.apache.spark.sql.functions._
    ThetaExpressions.register(spark)
    val path = java.nio.file.Files.createTempDirectory("cohort_sk").toString
    Relational.writeCohortSketches(spark, sf0001, path)
    // the claim q150/q151 lean on: theta min-k retention is a semilattice,
    // so union over (cohort, day) partials equals one direct aggregate —
    // not merely within tolerance, identically
    val ev = graft.sources.Tables.events(spark, sf0001)
    val sk = ev.groupBy("event_type")
      .agg(ThetaExpressions.theta_sketch_agg(col("user_id")).as("sk"))
    val direct = sk.as("a").join(sk.as("b"),
        col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type"), col("b.event_type"),
        ThetaExpressions.theta_intersect_estimate(col("a.sk"), col("b.sk")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val served = Relational.overlapFromSketches(spark, path).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(served == direct,
      s"table-served overlap drifted from direct aggregation: $served vs $direct")
    // retention: exact at this cardinality (below k), so the served
    // estimates must equal the exact cohort arithmetic
    val base = ev.filter(col("event_id") % 2 === 0).select("user_id").distinct()
    val cur = ev.filter(col("event_id") % 2 =!= 0).select("user_id").distinct()
    val nBase = base.count(); val nCur = cur.count()
    val retained = base.join(cur, Seq("user_id")).count()
    val r = Relational.retentionFromSketches(spark, path).head()
    assert(r.getLong(0) == retained && r.getLong(1) == nBase - retained &&
      r.getLong(2) == nCur - retained,
      s"served retention (${r.toSeq}) vs exact ($retained, ${nBase - retained}, ${nCur - retained})")
  }

  test("q158: CMS linearity — the day-grain table serves q104's estimates bit for bit; duplication breaks it") {
    import org.apache.spark.sql.functions._
    val path = java.nio.file.Files.createTempDirectory("freqtbl").toString
    Relational.writeFreqSketches(spark, sf0001, path)
    // the served row IS q104 with the sketch read from the table: merged
    // per-day sketches sum to the one-pass global sketch (same geometry,
    // same seed), so the two frames must be identical including flags
    val direct = Relational.q104(spark, sf0001).collect().map(_.toSeq).toSeq
    val served = Relational.heavyHittersServed(spark, sf0001, path)
      .collect().map(_.toSeq).toSeq
    assert(served == direct,
      "table-served heavy hitters drifted from the one-pass sketch")
    // estimate-only serving: bounded probe, NO events scan in the plan
    val probe = direct.take(3).map(_.head.asInstanceOf[Long])
    val est = Relational.freqEstimatesFromSketches(spark, path, probe)
    assert(!est.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode).contains("events.parquet"),
      "estimate serving must never scan events")
    // CMS never underestimates: each probe key's served estimate covers
    // its exact count
    val exact = direct.map(r => r.head.asInstanceOf[Long] ->
      r(1).asInstanceOf[Long]).toMap
    est.collect().foreach(r =>
      assert(r.getLong(1) >= exact(r.getLong(0)),
        s"CMS underestimated key ${r.getLong(0)}"))
    // the additivity caveat is REAL, not documentation: a duplicated day
    // row (what an at-least-once replay would append) inflates estimates
    // — CMS merge is additive, so this table cannot ride the HLL/theta
    // idempotence argument and is rebuilt, not stream-folded
    val dup = java.nio.file.Files.createTempDirectory("freqtbl_dup").toString
    val tbl = spark.read.parquet(path)
    tbl.unionByName(tbl.limit(1)).write.mode("overwrite").parquet(dup)
    val inflated = Relational.freqEstimatesFromSketches(spark, dup, probe)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val clean = est.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(probe.exists(k => inflated(k) > clean(k)),
      "duplicating a day row must inflate some estimate (additive merge)")
  }

  test("freq table live fold: tag-committed batches restore exactly-once by ledger; fold ≡ one-pass global") {
    import org.apache.spark.sql.functions._
    val path = java.nio.file.Files.createTempDirectory("freqtbl_live").toString
    Relational.writeFreqSketches(spark, sf0001, path)
    // a batch of NEW traffic: sf0.001's events with offset ids (new users,
    // same day grain — the hardest merge path: batch rows land on the
    // SAME days as base rows and must sum, not replace)
    val batchDir = java.nio.file.Files.createTempDirectory("freq_batch").toString
    graft.sources.Tables.events(spark, sf0001)
      .withColumn("event_id", col("event_id") + 1000000000L)
      .withColumn("user_id", col("user_id") + 1000000000L)
      .write.mode("overwrite").parquet(s"$batchDir/events.parquet")
    assert(Relational.appendFreqSketches(spark, batchDir, path, "b1"))
    // replay short-circuits: the ledger, not idempotence, is what makes
    // the additive sketch exactly-once
    assert(!Relational.appendFreqSketches(spark, batchDir, path, "b1"))
    assert(Relational.freqAppliedTags(spark, path) == Set("b1"))
    // union corpus for the exact arm + the one-pass reference sketch
    val unionDir = java.nio.file.Files.createTempDirectory("freq_union").toString
    graft.sources.Tables.events(spark, sf0001)
      .unionByName(graft.sources.Tables.events(spark, batchDir))
      .write.mode("overwrite").parquet(s"$unionDir/events.parquet")
    // served report over (base + committed fold) ≡ q104 over the union
    // corpus, bit for bit — CMS linearity across the ledger boundary
    val served = Relational.heavyHittersServed(spark, unionDir, path)
      .collect().map(_.toSeq).toSeq
    val direct = Relational.q104(spark, unionDir).collect().map(_.toSeq).toSeq
    assert(served == direct,
      "ledger-folded freq table drifted from the one-pass union sketch")
    // a fenced fold commits nothing and leaves no staging debris
    val demoted = new IllegalStateException("fence: lease superseded")
    val e = intercept[IllegalStateException] {
      Relational.appendFreqSketches(spark, batchDir, path, "b2",
        fence = () => throw demoted)
    }
    assert(e eq demoted)
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path, "_batches/b2")))
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(path, "_batches"))
      .forall(!_.getPath.getName.startsWith(".staging_")))
  }

  test("theta sketch agg: merge across partitions is order-independent and exact below k") {
    import graft.functions.ThetaExpressions
    ThetaExpressions.register(spark)
    import spark.implicits._
    // 2000 distinct keys scattered over 8 partitions: the TypedImperative
    // buffers serialize at the shuffle boundary and union back; below
    // k=4096 retained entries the estimate is the exact count however the
    // partial merges interleave
    val est = spark.range(0, 2000).repartition(8)
      .select(ThetaExpressions.theta_sketch_agg(col("id")).as("sk"))
      .select(graft.functions.ThetaExpressions.theta_intersect_estimate(
        col("sk"), col("sk")).as("self"))
      .head.getLong(0)
    assert(est == 2000L, s"self-intersection of an exact sketch, got $est")
  }
}
