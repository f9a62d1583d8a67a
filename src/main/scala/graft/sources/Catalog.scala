package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition catalog (SURVEY S8/A11) — the Spark rewrite of
  * `DataLakeCatalog` (`/root/reference/data/lake_writer.py:233-286`):
  * per-partition file_count + total_size_mb, and a per-table lake summary.
  *
  * Two implementations on purpose:
  * - [[listPartitions]] walks the FileSystem like the reference walks S3
  *   keys — exact, driver-side, right for operational tooling on one table.
  * - [[partitionStats]] derives the same stats distributed from
  *   `input_file_name()` — the path that still works when "list the
  *   partitions" means scanning a 100 TB lake's manifest in parallel.
  */
object Catalog {

  case class PartitionInfo(partition: String, file_count: Long, total_size_mb: Double)

  /** List Hive-style partitions under `root` with file counts and sizes
    * (key pattern `year=YYYY/month=MM/...`, lake_writer.py:118-141; listing
    * shape :244-266). Ordered by partition path like the reference's
    * lexicographic S3 listing (O1). */
  def listPartitions(spark: SparkSession, root: String): Seq[PartitionInfo] = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // qualify so URI relativization works across schemes (file:, s3a:, hdfs:)
    val base = fs.makeQualified(new Path(root))
    if (!fs.exists(base)) return Seq.empty
    val files = fs.listFiles(base, true)
    val acc = scala.collection.mutable.Map.empty[String, (Long, Long)]
    while (files.hasNext) {
      val f = files.next()
      if (!f.getPath.getName.startsWith("_")) {
        val rel = base.toUri.relativize(f.getPath.toUri).getPath
        val dir = rel.lastIndexOf('/') match {
          case -1 => ""
          case i  => rel.substring(0, i)
        }
        if (dir.contains("=")) {
          val (c, s) = acc.getOrElse(dir, (0L, 0L))
          acc(dir) = (c + 1, s + f.getLen)
        }
      }
    }
    acc.toSeq.sortBy(_._1).map { case (p, (c, sz)) =>
      PartitionInfo(p, c, math.rint(sz / 1048576.0 * 100) / 100)
    }
  }

  /** Lake summary per table root (get_lake_summary, lake_writer.py:268-286):
    * object count + total size per prefix. */
  def lakeSummary(spark: SparkSession, roots: Map[String, String]): Map[String, (Long, Double)] =
    roots.map { case (name, root) =>
      val parts = listPartitions(spark, root)
      name -> (parts.map(_.file_count).sum,
        math.rint(parts.map(_.total_size_mb).sum * 100) / 100)
    }

  /** Distributed partition stats from the files behind a DataFrame scan:
    * groupBy(input_file_name) — runs on executors, scales with the lake. */
  def partitionStats(df: DataFrame): DataFrame =
    df.withColumn("file", input_file_name())
      .groupBy("file")
      .agg(count(lit(1)).as("row_count"))
      .orderBy("file")

  /** Small-file compaction — the operational answer to the reference's
    * 100-event gzip bronze files (lake_writer.py:111 flushes every 100
    * events / 30 s, so a day of bronze is thousands of tiny objects, the
    * classic small-files problem at lake scale). Reads a source directory,
    * sizes it from the listing, and rewrites with ceil(total/target)
    * output files. Returns (files before, files after). */
  def compact(spark: SparkSession, src: String, dst: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      format: String = "parquet"): (Long, Long) = {
    // one listing pass accumulates both file count and byte size (object
    // store LIST calls are the expensive part of compaction planning);
    // hidden SEGMENTS anywhere in the path (_temporary/.staging debris from
    // a crashed write) are excluded — spark.read would never load them, so
    // counting them would inflate nOut
    val fs = new Path(src).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = fs.makeQualified(new Path(src))
    val it = fs.listFiles(base, true)
    var flatFiles = 0L
    var totalBytes = 0L
    while (it.hasNext) {
      val f = it.next()
      val rel = base.toUri.relativize(f.getPath.toUri).getPath
      val hidden = rel.split('/').exists(seg =>
        seg.startsWith("_") || seg.startsWith("."))
      if (!hidden) { flatFiles += 1; totalBytes += f.getLen }
    }
    val nOut = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes)
    val df = spark.read.format(format).load(src)
    df.repartition(nOut.toInt).write.mode("overwrite").format(format).save(dst)
    (flatFiles, nOut)
  }

  /** Q101 — SCHEMA-EVOLUTION merge across lake snapshots: a v1 snapshot
    * written before `source`/`n_chars` existed unions with the current
    * shape via `unionByName(allowMissingColumns = true)` — absent columns
    * null-fill per side, matched BY NAME not position (the positional-union
    * trap when snapshots disagree on column order). Zero-shuffle: unions
    * concatenate partitions; the only exchange is the presentation sort.
    * At lake scale this is how a reader spans old and new partitions of an
    * evolving table without rewriting history. The two snapshots here are
    * disjoint projections of `documents` (doc_id parity stands in for
    * "written before/after the schema change"). */
  def snapshotMerge(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val v1 = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("lang"))
      .withColumn("snapshot", lit("v1"))
    val v2 = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("snapshot", lit("v2"))
    v1.unionByName(v2, allowMissingColumns = true)
      .orderBy("doc_id")
  }

  /** Q111 — MERGE upsert (the lakehouse `MERGE INTO` semantics, engine-
    * side): a base snapshot merged with a change set carrying
    * upsert/delete ops — matched upserts UPDATE, unmatched upserts INSERT,
    * deletes drop the row (delete of an absent key is a no-op). ONE
    * doc_id-keyed full-outer join — exactly the merge-on-read shape; at
    * 100 TB both sides shuffle once on the merge key and AQE handles the
    * change-set-much-smaller-than-base asymmetry. The base/changes here
    * are deterministic projections of `documents` standing in for two
    * table states. */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val base = docs.filter(col("doc_id") % 3 =!= 2)
      .select(col("doc_id"), col("n_chars").as("v"))
    val changes = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), (col("n_chars") + 1000).as("u_v"),
        when(col("doc_id") % 10 === 0, "delete").otherwise("upsert").as("op"))
    base.as("b").join(changes.as("u"),
        col("b.doc_id") === col("u.doc_id"), "full_outer")
      .filter(coalesce(col("u.op"), lit("")) =!= "delete")
      .select(
        coalesce(col("u.doc_id"), col("b.doc_id")).as("doc_id"),
        when(col("u.op") === "upsert", col("u.u_v")).otherwise(col("b.v")).as("v"),
        when(col("u.doc_id").isNull, "kept")
          .when(col("b.doc_id").isNull, "inserted")
          .otherwise("updated").as("action"))
      .orderBy("doc_id")
  }

  /** Q114 — DATA-SKIPPING MANIFEST: the per-file column statistics a
    * lakehouse table format keeps (min/max/null-count per pruning column)
    * plus the skip verdict for a concrete predicate — the mechanism behind
    * "read 3 of 40,000 files" at 100 TB, where partition pruning alone is
    * too coarse. Files are simulated as fixed doc_id ranges (`fileRows`
    * rows per file — the stand-in for real file boundaries, which the test
    * corpus's single parquet file can't provide). ONE aggregate pass keyed
    * by file_id builds the whole manifest; the skip flag
    * (`max_n_chars < threshold` ⇒ no row can match `n_chars ≥ threshold`)
    * is a projection over the manifest, the exact evaluation a reader runs
    * per file before opening it. Manifest size = file count, orders of
    * magnitude below row count. */
  def skippingStats(spark: SparkSession, dir: String,
      fileRows: Long = 250, nCharsThreshold: Long = 900): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(expr(s"doc_id div $fileRows").as("file_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        min("n_chars").as("min_n_chars"),
        max("n_chars").as("max_n_chars"),
        min("lang").as("min_lang"),
        max("lang").as("max_lang"),
        sum(when(col("source").isNull, 1L).otherwise(0L)).as("null_source"))
      .withColumn("skip_long_docs",
        (col("max_n_chars") < nCharsThreshold).cast("long"))
      .orderBy("file_id")

  /** Q115 — Z-ORDER LAYOUT KEY: multi-dimensional clustering for the
    * data-skipping manifest ([[skippingStats]]) — interleave the bits of
    * two pruning dimensions so rows near each other in (x, y) land in the
    * same output file, making BOTH columns' min/max ranges tight per file
    * (a lexicographic sort gets one column tight, the other spans
    * everything). x = capped n_chars bucket (range dimension), y = md5 coin
    * of (lang, source) (the q44/q63 hash convention — categorical
    * dimension).
    *
    * Dimensions are min-max NORMALIZED to the full 8-bit range before
    * interleaving (exact integer arithmetic): raw interleave degenerates
    * whenever one dimension uses fewer bits than the other — with zx ≤ 34
    * (6 bits) the unnormalized z-value is dominated by zy's high bits and
    * the "z-order" collapses to a plain zy sort (measured on the test
    * corpus: per-file zx extent ≈ global). Normalization is what real
    * z-order implementations do (rank or min-max scale per dimension).
    *
    * Plan shape: one tiny bounds aggregate broadcast back (scalar idiom),
    * then a pure map — the 8-round HOF fold is codegen'd, zero shuffle;
    * the presentation sort at write time IS the z-order
    * `repartitionByRange(zval)`. `z_file` boxes `fileSpan` consecutive
    * z-values into one target file. */
  def zorderLayout(spark: SparkSession, dir: String,
      fileSpan: Long = 4096): DataFrame = {
    val dims = Tables.documents(spark, dir)
      .select(col("doc_id"),
        least(lit(255L), expr("n_chars div 16")).cast("long").as("zx"),
        expr("cast(conv(substring(md5(concat(lang, ':', source)), 1, 2), 16, 10) as bigint)")
          .as("zy"))
    val bounds = dims.agg(
      min("zx").as("min_zx"), max("zx").as("max_zx"),
      min("zy").as("min_zy"), max("zy").as("max_zy"))
    dims.crossJoin(broadcast(bounds))
      .withColumn("nx", expr(
        "CASE WHEN max_zx = min_zx THEN cast(0 as bigint) " +
          "ELSE ((zx - min_zx) * 255) div (max_zx - min_zx) END"))
      .withColumn("ny", expr(
        "CASE WHEN max_zy = min_zy THEN cast(0 as bigint) " +
          "ELSE ((zy - min_zy) * 255) div (max_zy - min_zy) END"))
      .withColumn("zval", expr(
        """aggregate(sequence(0, 7), cast(0 as bigint), (acc, i) -> acc
          | + (shiftright(nx, i) % 2) * shiftleft(cast(1 as bigint), 2*i)
          | + (shiftright(ny, i) % 2) * shiftleft(cast(1 as bigint), 2*i + 1))"""
          .stripMargin))
      .withColumn("z_file", expr(s"zval div $fileSpan"))
      .select("doc_id", "zx", "zy", "zval", "z_file")
      .orderBy("zval", "doc_id")
  }

  /** SCHEMA-EVOLVED MERGE — [[mergeUpsert]]'s semantics when the change set
    * and the base DISAGREE on schema, the way real lakehouse merges do once
    * a table evolves (q101's `unionByName(allowMissingColumns)` rule
    * composed into the merge itself). Per-column resolution, computed by
    * NAME over the union of both sides' value columns:
    *
    *  - column on both sides: upsert takes the change value, otherwise base
    *  - column only on the base (the change set predates it or dropped it):
    *    unchanged for kept/updated rows, NULL for inserts
    *  - column only on the change set (added after the base was written):
    *    change value for upserts, NULL-backfilled for kept rows — the
    *    evolve-on-merge behavior, no history rewrite
    *
    * Still ONE key-keyed full-outer join — schema evolution costs no extra
    * shuffle; the column arithmetic is projection-only. */
  def mergeEvolved(base: DataFrame, changes: DataFrame,
      keyCol: String = "doc_id", opCol: String = "op"): DataFrame = {
    val baseCols = base.columns.filterNot(_ == keyCol).toSeq
    val chCols = changes.columns.filterNot(c => c == keyCol || c == opCol).toSeq
    val outCols = baseCols ++ chCols.filterNot(baseCols.contains)
    val chTypes = changes.schema.map(f => f.name -> f.dataType).toMap
    val upsert = col(s"u.$opCol") === "upsert"
    val vals = outCols.map { c =>
      (baseCols.contains(c), chCols.contains(c)) match {
        case (true, true) => when(upsert, col(s"u.$c")).otherwise(col(s"b.$c")).as(c)
        case (true, false) => col(s"b.$c").as(c)
        case _ => when(upsert, col(s"u.$c")).otherwise(lit(null).cast(chTypes(c))).as(c)
      }
    }
    val action = when(col(s"u.$keyCol").isNull, "kept")
      .when(col(s"b.$keyCol").isNull, "inserted")
      .otherwise("updated").as("action")
    base.as("b").join(changes.as("u"),
        col(s"b.$keyCol") === col(s"u.$keyCol"), "full_outer")
      .filter(coalesce(col(s"u.$opCol"), lit("")) =!= "delete")
      .select((coalesce(col(s"u.$keyCol"), col(s"b.$keyCol")).as(keyCol) +: vals)
        :+ action: _*)
  }

  /** Q113 — [[mergeEvolved]] over the standard snapshot stand-ins, covering
    * BOTH evolution directions at once: the base carries `src` (missing
    * from the change set — updates leave it alone, inserts NULL it) and the
    * change set carries `lang` (new since the base was written — kept rows
    * backfill NULL). */
  def mergeUpsertEvolved(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val base = docs.filter(col("doc_id") % 3 =!= 2)
      .select(col("doc_id"), col("n_chars").as("v"), col("source").as("src"))
    val changes = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), (col("n_chars") + 1000).as("v"), col("lang"),
        when(col("doc_id") % 10 === 0, "delete").otherwise("upsert").as("op"))
    mergeEvolved(base, changes).orderBy("doc_id")
  }

  /** Q112 — SNAPSHOT DIFF (change-data-feed between two table states):
    * which rows were added, removed, or changed — the audit a lake emits
    * so downstream incrementals consume deltas instead of full rescans.
    * Same single keyed full-outer join shape as [[mergeUpsert]]; unchanged
    * rows are filtered out, so the output is delta-sized, not
    * snapshot-sized. */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val old = docs.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"), col("n_chars").as("old_v"))
    val cur = docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"), (col("n_chars") + col("doc_id") % 3).as("new_v"))
    old.as("o").join(cur.as("c"), col("o.doc_id") === col("c.doc_id"), "full_outer")
      .select(
        coalesce(col("o.doc_id"), col("c.doc_id")).as("doc_id"),
        col("old_v"), col("new_v"),
        when(col("o.doc_id").isNull, "added")
          .when(col("c.doc_id").isNull, "removed")
          .when(col("old_v") =!= col("new_v"), "changed")
          .otherwise("unchanged").as("status"))
      .filter(col("status") =!= "unchanged")
      .orderBy("doc_id")
  }

  /** Q122 — COMPACTION PLAN (the planning half of [[compact]], as a
    * declarative query): given the per-file manifest (files simulated as
    * `(lang, doc_id div fileRows)` groups, byte size proxied by
    * `sum(n_chars)` — same stand-in convention as [[skippingStats]]),
    * bin-pack small files into target-size rewrite groups the way a
    * lakehouse OPTIMIZE does. The packing rule is OFFSET-QUANTIZED, not
    * greedy first-fit: within each partition (`lang`), `bin_id =
    * (inclusive_cumsum - 1) div target` assigns a file to the bin its
    * cumulative END offset falls in, so bin boundaries are fixed
    * multiples of `targetBytes` rather than resetting per bin (files
    * already ≥ target are excluded up front; they are not small-file
    * debris). Quantization is the price of a single window pass — true
    * greedy reset-per-bin is non-associative and needs a sequential
    * fold — and its known wart is an occasional undersized bin when a
    * large file crosses a boundary (its successor slice may hold little
    * mass); bins still never exceed target + one crossing file, and a
    * residual small bin is simply input to the next OPTIMIZE round.
    * Output is one row per planned rewrite group with its file span, so
    * the executor of the plan knows exactly which contiguous files each
    * output object replaces.
    *
    * Scale shape: the window runs over the FILE MANIFEST (one row per
    * file, orders of magnitude below row count — same argument as
    * q114), partitioned by the table partition key, so no global sort
    * and no skew: each lake partition's plan is independent. At 100 TB
    * this is a metadata-only query; the expensive part (the rewrite)
    * is [[compact]]. */
  def compactionPlan(spark: SparkSession, dir: String,
      fileRows: Long = 50, targetBytes: Long = 10000): DataFrame =
    binPack(
      Tables.documents(spark, dir)
        .groupBy(col("lang"), expr(s"doc_id div $fileRows").as("file_id"))
        .agg(sum("n_chars").as("bytes")),
      targetBytes)

  /** [[compactionPlan]]'s packing rule over any `(lang, file_id, bytes)`
    * manifest — the seam PropertySpec differentials against a scalar
    * fold of the same quantized rule. */
  def binPack(files: DataFrame, targetBytes: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang").orderBy("file_id")
    files
      .filter(col("bytes") < targetBytes)
      .withColumn("cum", sum("bytes").over(w))
      .withColumn("bin_id", expr(s"(cum - 1) div $targetBytes"))
      .groupBy("lang", "bin_id")
      .agg(
        count(lit(1)).as("n_files"),
        sum("bytes").as("bin_bytes"),
        min("file_id").as("first_file"),
        max("file_id").as("last_file"))
      .orderBy("lang", "bin_id")
  }

  /** Q126 — CHANGE-LOG REPLAY (the merge-on-read READ path): resolve
    * the table state as of version `asOf` from an ordered change log in
    * ONE pass — latest op per key among versions ≤ asOf wins, a
    * surviving delete erases the key — instead of folding N sequential
    * [[mergeEvolved]] merges (the copy-on-write path q111/q113 take and
    * the streaming sink materializes). CatalogSpec proves the
    * equivalence: this replay ≡ the iterated merge fold over the same
    * log. The log is a deterministic stand-in (version v touches
    * `doc_id % (v+2) == 0`, value = n_chars + 100v, every 7th touch a
    * delete); a real lakehouse reads it from delta files.
    *
    * Scale shape: union concatenates the per-version delta scans (no
    * shuffle), then ONE doc_id-keyed window picks winners — at 100 TB
    * the cost is delta mass + one shuffle, which is exactly why
    * merge-on-read reads beat rewriting the base per change set. */
  /** One version of q126's deterministic change-log stand-in, shared
    * with CatalogSpec's iterated-merge differential so both replay the
    * IDENTICAL log (the binPack-seam convention: never hand-sync the
    * premise of an equivalence proof). */
  def logVersion(docs: DataFrame, v: Long): DataFrame =
    docs.filter(col("doc_id") % (v + 2) === 0)
      .select(col("doc_id"), lit(v).as("version"),
        (col("n_chars") + v * 100).as("value"),
        when((col("doc_id") + v) % 7 === 0, "delete")
          .otherwise("upsert").as("op"))

  def logReplay(spark: SparkSession, dir: String, asOf: Long = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val log = (0L to 3L).map(v => logVersion(docs, v)).reduce(_ unionByName _)
    val w = Window.partitionBy("doc_id").orderBy(desc("version"))
    log.filter(col("version") <= asOf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") === "upsert")
      .select("doc_id", "version", "value")
      .orderBy("doc_id")
  }

  /** Q125 — VACUUM / RETENTION AUDIT under copy-on-write semantics: a
    * change feed touching ANY row of a file forces that file's rewrite,
    * after which the ENTIRE old object is dead weight, reclaimable once
    * past the retention window — untouched files are kept as-is. The
    * audit reports, per old-layout file, how many rows the change feed
    * updates vs deletes, how many rows the rewrite must carry forward
    * (everything except deletes), and the bytes the vacuum will free
    * (the whole file when touched: COW reclaims old OBJECTS, not rows —
    * the row-level purge view is q116's job). Change feed is a sparse
    * deterministic stand-in: `doc_id % touchMod == 0` touches,
    * alternate touches (`% (2·touchMod)`) are deletes.
    *
    * Scale shape: one keyed aggregate over the corpus → manifest-sized
    * output; at 100 TB the change-feed membership test rides the scan
    * (it is a pure predicate), so the audit costs one map-side-combined
    * pass, no join — the reason real table formats can answer "what
    * will VACUUM free" without touching data files. */
  def vacuumAudit(spark: SparkSession, dir: String,
      fileRows: Long = 25, touchMod: Long = 97): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(expr(s"doc_id div $fileRows").as("file_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum((col("doc_id") % touchMod === 0 &&
             col("doc_id") % (2 * touchMod) =!= 0).cast("long")).as("n_updates"),
        sum((col("doc_id") % (2 * touchMod) === 0).cast("long")).as("n_deletes"),
        sum("n_chars").as("file_bytes"))
      .withColumn("n_carried", col("n_rows") - col("n_deletes"))
      .withColumn("status",
        when(col("n_updates") + col("n_deletes") > 0, "reclaim")
          .otherwise("keep"))
      .withColumn("reclaim_bytes",
        when(col("status") === "reclaim", col("file_bytes")).otherwise(0L))
      .select("file_id", "n_rows", "n_updates", "n_deletes", "n_carried",
        "status", "reclaim_bytes")
      .orderBy("file_id")
}
