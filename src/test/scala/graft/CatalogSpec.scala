package graft

import org.apache.spark.sql.functions._
import graft.quality.WeightedScore
import graft.sources.Catalog
import graft.streaming.Streaming

/** S8/A11 partition catalog + U4 udaf registration. */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  test("listPartitions reports hive partitions with file counts and sizes") {
    val dir = java.nio.file.Files.createTempDirectory("lake").toString
    val df = Seq(
      ("e1", java.sql.Timestamp.valueOf("2024-03-05 07:30:00")),
      ("e2", java.sql.Timestamp.valueOf("2024-03-05 08:30:00")),
      ("e3", java.sql.Timestamp.valueOf("2024-03-06 07:30:00"))).toDF("event_id", "timestamp")
    Streaming.withHivePartitions(df).write.mode("overwrite")
      .partitionBy("year", "month", "day", "hour").json(dir)
    val parts = Catalog.listPartitions(spark, dir)
    assert(parts.length == 3)
    assert(parts.map(_.partition).toSeq == Seq(
      "year=2024/month=3/day=5/hour=7", "year=2024/month=3/day=5/hour=8",
      "year=2024/month=3/day=6/hour=7"))
    assert(parts.forall(p => p.file_count >= 1 && p.total_size_mb >= 0))
    val summary = Catalog.lakeSummary(spark, Map("bronze" -> dir))
    assert(summary("bronze")._1 == parts.map(_.file_count).sum)
  }

  test("partitionStats derives per-file row counts distributed") {
    val stats = Catalog.partitionStats(
      spark.read.parquet(s"$sf0001/lineitem.parquet"))
    val total = stats.agg(sum("row_count")).head().getLong(0)
    assert(total == spark.read.parquet(s"$sf0001/lineitem.parquet").count())
  }

  test("WeightedScore registers as a SQL aggregate and computes group scores") {
    val name = WeightedScore.register(spark, 0.2)
    Seq(("s1", 0L), ("s1", 1L), ("s2", 5L), ("s2", 10L))
      .toDF("session_id", "violations").createOrReplaceTempView("v")
    val r = spark.sql(
      s"SELECT session_id, $name(violations) AS score FROM v GROUP BY session_id ORDER BY session_id")
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(r("s1") - 0.9) < 1e-9)  // mean(1.0, 0.8)
    assert(r("s2") == 0.0)                  // both clamped to 0
  }

  test("mergeEvolved resolves schema drift per column in both directions") {
    // base predates `lang`; the change set postdates `src` — the merge must
    // hold BOTH rules at once without an extra shuffle's worth of plumbing
    val base = Seq((1L, 10L, "web"), (2L, 20L, "pdf"), (3L, 30L, "web"))
      .toDF("doc_id", "v", "src")
    val changes = Seq(
      (2L, 2000L, "en", "upsert"),  // matched update
      (4L, 4000L, "fr", "upsert"),  // unmatched insert
      (3L, 0L, "de", "delete"))     // matched delete
      .toDF("doc_id", "v", "lang", "op")
    val out = Catalog.mergeEvolved(base, changes).orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getString(2), r.getString(3), r.getString(4))).toMap
    // kept row: base values survive, the NEW column backfills NULL
    assert(byId(1L) == ((10L, "web", null, "kept")))
    // updated row: shared column takes the change value, the base-only
    // column is UNCHANGED (missing from source ≠ set to NULL)
    assert(byId(2L) == ((2000L, "pdf", "en", "updated")))
    // inserted row: base-only column has no value to inherit → NULL
    assert(byId(4L) == ((4000L, null, "fr", "inserted")))
    // output schema is the BY-NAME union, base columns first
    assert(Catalog.mergeEvolved(base, changes).columns.toSeq ==
      Seq("doc_id", "v", "src", "lang", "action"))

    // edge: a change set whose VALUE columns are entirely disjoint from the
    // base's — updates must keep every base value and only attach the new
    // columns; inserts carry only the new columns
    val disjoint = Seq((2L, "x", "upsert"), (9L, "y", "upsert"))
      .toDF("doc_id", "tag", "op")
    val d = Catalog.mergeEvolved(base, disjoint).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.get(1), r.getString(2), r.getString(3), r.getString(4))).toMap
    assert(d(2L) == ((20L, "pdf", "x", "updated"))) // base values untouched
    assert(d(9L) == ((null, null, "y", "inserted")))
    assert(d(1L) == ((10L, "web", null, "kept")))
  }

  test("skippingStats manifest: exhaustive row coverage and sound skip verdicts") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val stats = Catalog.skippingStats(spark, sf0001).collect()
    // the manifest covers every row exactly once
    assert(stats.map(_.getAs[Long]("n_rows")).sum == docs.count())
    // skip soundness: a skipped file must contain NO row matching the
    // predicate (n_chars >= 900) — the property the reader relies on
    val skipped = stats.filter(_.getAs[Long]("skip_long_docs") == 1L)
      .map(_.getAs[Long]("file_id")).toSet
    if (skipped.nonEmpty) {
      val matches = docs.filter(col("n_chars") >= 900)
        .select((col("doc_id") / 250).cast("long").as("file_id"))
        .collect().map(_.getLong(0)).toSet
      assert(matches.intersect(skipped).isEmpty)
    }
    // flag consistency with the manifest's own max
    stats.foreach { r =>
      assert((r.getAs[Long]("skip_long_docs") == 1L) ==
        (r.getAs[Long]("max_n_chars") < 900L))
    }
  }

  test("zorderLayout: exact normalized interleave; BOTH dimensions prunable per file") {
    val rows = Catalog.zorderLayout(spark, sf0001).collect()
    // the z-value is the exact bit interleave of the min-max-normalized
    // dimensions (recomputed independently here)
    val (xs0, ys0) = (rows.map(_.getAs[Long]("zx")), rows.map(_.getAs[Long]("zy")))
    val (minX, maxX, minY, maxY) = (xs0.min, xs0.max, ys0.min, ys0.max)
    def norm(v: Long, lo: Long, hi: Long): Long =
      if (hi == lo) 0L else (v - lo) * 255 / (hi - lo)
    def interleave(x: Long, y: Long): Long =
      (0 until 8).map(i => (((x >> i) & 1L) << (2 * i)) |
        (((y >> i) & 1L) << (2 * i + 1))).sum
    rows.foreach { r =>
      assert(r.getAs[Long]("zval") == interleave(
        norm(r.getAs[Long]("zx"), minX, maxX),
        norm(r.getAs[Long]("zy"), minY, maxY)))
    }
    // the skipping property: group rows into equal-count files under (a)
    // z-order and (b) a lexicographic zx-then-zy sort; a predicate prunes
    // by ONE column's per-file extent, so the z-order must bound BOTH
    // dimensions at once where lex leaves the trailing one unbounded
    val perFile = math.max(1, rows.length / 16)
    def meanExtents(sorted: Seq[(Long, Long)]): (Double, Double) = {
      val boxes = sorted.grouped(perFile).map { g =>
        val (xs, ys) = g.unzip
        ((xs.max - xs.min + 1).toDouble, (ys.max - ys.min + 1).toDouble)
      }.toSeq
      (boxes.map(_._1).sum / boxes.length, boxes.map(_._2).sum / boxes.length)
    }
    val byZ = rows.sortBy(r => (r.getAs[Long]("zval"), r.getAs[Long]("doc_id")))
      .map(r => (r.getAs[Long]("zx"), r.getAs[Long]("zy"))).toSeq
    val byLex = rows.sortBy(r => (r.getAs[Long]("zx"), r.getAs[Long]("zy")))
      .map(r => (r.getAs[Long]("zx"), r.getAs[Long]("zy"))).toSeq
    val (zEx, zEy) = meanExtents(byZ)
    val (_, lexEy) = meanExtents(byLex)
    // trailing (zy) dimension: z-order files must be far tighter than lex
    assert(zEy < 0.5 * lexEy, s"z-order zy extent $zEy vs lex $lexEy")
    // leading (zx) dimension: still bounded well below its global range
    assert(zEx < 0.5 * (maxX - minX + 1).toDouble,
      s"z-order zx extent $zEx vs global ${maxX - minX + 1}")
  }

  test("compact rewrites a many-small-files directory into few target files") {
    val src = java.nio.file.Files.createTempDirectory("small").toString
    val dst = java.nio.file.Files.createTempDirectory("compacted").toString
    spark.range(10000).toDF("id").repartition(50)
      .write.mode("overwrite").parquet(src)
    // debris from a crashed write must not count toward the plan: spark.read
    // would never load files under hidden directories
    val tmpDir = new java.io.File(s"$src/_temporary/0")
    tmpDir.mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$src/_temporary/0/part-junk.parquet"),
      Array.fill(4096)(0.toByte))
    val (before, after) = Catalog.compact(spark, src, dst,
      targetFileBytes = 10L * 1024 * 1024)
    assert(before == 50)
    assert(after == 1) // well under one 10MB target
    assert(spark.read.parquet(dst).count() == 10000)
  }

  test("compactionPlan: bins partition the small files, in order, under 2x target") {
    val target = 10000L
    val plan = Catalog.compactionPlan(spark, sf0001).collect()
    val smallFiles = graft.sources.Tables.documents(spark, sf0001)
      .groupBy($"lang", org.apache.spark.sql.functions.expr("doc_id div 50").as("file_id"))
      .agg(org.apache.spark.sql.functions.sum("n_chars").as("bytes"))
      .filter($"bytes" < target).collect()
    // conservation: every small file lands in exactly one bin
    assert(plan.map(_.getAs[Long]("n_files")).sum == smallFiles.length)
    assert(plan.map(_.getAs[Long]("bin_bytes")).sum ==
      smallFiles.map(_.getAs[Long]("bytes")).sum)
    // quantization bound: a bin holds at most target + one crossing file
    assert(plan.forall(_.getAs[Long]("bin_bytes") < 2 * target))
    // packing actually happens (multi-file bins exist at this scale)
    assert(plan.exists(_.getAs[Long]("n_files") > 1))
    // within a partition, bins are ascending with non-overlapping file spans
    plan.groupBy(_.getAs[String]("lang")).foreach { case (lang, bins) =>
      val ordered = bins.sortBy(_.getAs[Long]("bin_id"))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("last_file") < b.getAs[Long]("first_file"),
            s"$lang: overlapping spans")
        case _ =>
      }
    }
  }

  test("vacuumAudit: COW semantics — touched files reclaim whole objects, untouched keep") {
    val out = Catalog.vacuumAudit(spark, sf0001).collect()
    val statuses = out.map(_.getAs[String]("status")).toSet
    assert(statuses == Set("keep", "reclaim"), s"both statuses must appear: $statuses")
    out.foreach { r =>
      val touched = r.getAs[Long]("n_updates") + r.getAs[Long]("n_deletes") > 0
      assert((r.getAs[String]("status") == "reclaim") == touched)
      // COW reclaims the whole old object or nothing
      if (touched) assert(r.getAs[Long]("reclaim_bytes") > 0)
      else assert(r.getAs[Long]("reclaim_bytes") == 0L)
      // the rewrite carries everything except deletes
      assert(r.getAs[Long]("n_carried") ==
        r.getAs[Long]("n_rows") - r.getAs[Long]("n_deletes"))
    }
    // file accounting covers the corpus exactly once
    assert(out.map(_.getAs[Long]("n_rows")).sum ==
      graft.sources.Tables.documents(spark, sf0001).count())
  }

  test("logReplay (merge-on-read) equals the iterated copy-on-write merge fold") {
    import org.apache.spark.sql.functions.{col, lit}
    val docs = graft.sources.Tables.documents(spark, sf0001)
    // the SAME log generator logReplay unions — shared seam, no hand-sync
    def changeSet(v: Long) = Catalog.logVersion(docs, v).drop("version")
    // copy-on-write: fold the same log through mergeEvolved one version
    // at a time, starting from an empty base with the target schema
    val empty = docs.limit(0).select(col("doc_id"), lit(0L).as("value"))
    val cow = (0L to 2L).foldLeft(empty) { (base, v) =>
      Catalog.mergeEvolved(base, changeSet(v), keyCol = "doc_id").drop("action")
    }.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // merge-on-read: one-pass latest-wins replay of the identical log
    val mor = Catalog.logReplay(spark, sf0001, asOf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(mor.map(t => t._1 -> t._3).toMap == cow,
      "replay state must equal the iterated merge state")
    // the reported version really is the winning (latest touching) one
    mor.foreach { case (id, v, _) =>
      val touches = (0L to 2L).filter(w => id % (w + 2) == 0)
      assert(v == touches.max, s"doc $id: version $v vs touches $touches")
    }
  }

  test("LoadGen mix matches the producer's 70/20/10 roll thresholds") {
    import graft.streaming.LoadGen
    val rate = spark.range(1000)
      .select(org.apache.spark.sql.functions.current_timestamp().as("timestamp"),
        $"id".as("value"))
    val mix = LoadGen.shape(rate).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mix("user_click") == 700)
    assert(mix("order") == 200)
    assert(mix("inventory_cdc") == 100)
    val sessions = LoadGen.shape(rate).select("session_id").distinct().count()
    assert(sessions == 20) // the ~20-session pool
  }
}
