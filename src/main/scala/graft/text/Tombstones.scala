package graft.text

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DOC-SET PURGE for the maintained artifacts (round 16 — the r15
  * verdict's task #2: q116's right-to-be-forgotten audit counted what a
  * purge WOULD touch, but no operator deleted anything — DocStore rows
  * were add-only, posting/position buckets carried forward
  * byte-for-byte, so a governance deletion meant full rebuilds of six
  * artifacts at 100 TB).
  *
  * The protocol is the standard tombstone design (the Lucene/Delta
  * delete model, re-expressed in this repo's tag-committed idiom):
  *
  *  1. [[purge]] commits the doc-id set as a tag-committed delta under
  *     `<artifactRoot>/_tombstones/<tag>/ids` — the
  *     [[graft.IndexVersions.appendTaggedBatch]] protocol verbatim, so a
  *     purge is atomic, replay-safe (same tag short-circuits) and
  *     crash-recoverable like every other fold here.
  *  2. READERS consult the set: every doc-granular serving path attaches
  *     [[filter]] — a broadcast anti-join, taken ONLY when the artifact
  *     actually carries tombstones (one existence probe per query;
  *     an unpurged artifact's plans are byte-identical to round 15's).
  *     From the commit on, a purged doc is unfetchable and unrankable
  *     even though its bytes still sit in the immutable files.
  *  3. The next COMPACTION bakes them out physically: the rewrite drops
  *     tombstoned rows and corrects the derived statistics by
  *     SUBTRACTING the purged footprint (cost ∝ purged mass, never a
  *     second corpus pass — the rewrite itself is the corpus pass
  *     compaction already pays), then marks each tombstone delta with
  *     the version/generation that baked it ([[markBaked]]).
  *  4. [[vacuumBaked]] drops a delta once every COMMITTED version is at
  *     or past its bake point — in-flight readers of pre-bake versions
  *     keep the filter until those versions themselves vacuum.
  *
  * TRANSITIONAL SEMANTICS (documented, not hidden): between purge and
  * bake, vocabulary statistics that aggregate over docs (df, n_occ,
  * trigram counts, n_docs/avgdl) still include the purged docs — ranked
  * pages EXCLUDE purged docs immediately, but surviving docs' scores
  * shift to their rebuild-on-survivors values only at the bake (exactly
  * Lucene's deleted-docs semantics). MaxScore's max_tf/min_dl bounds
  * are carried, not recomputed — stale bounds stay ADMISSIBLE (an upper
  * bound over a superset), so gated answers equal ungated ones
  * throughout.
  *
  * CROSS-ARTIFACT ORDER: a governance purge commits tombstones to the
  * INDEX artifacts first and the doc store LAST ([[purgeAll]]) — the
  * reverse of the store-before-index append order, for the same reason:
  * a serving page must never rank a doc the store already refuses. The
  * residual window (doc still id-fetchable from the store while the
  * index tombstones commit) is bounded by the purge run itself.
  *
  * The purge-set is assumed GOVERNANCE-SIZED (bounded, broadcastable) —
  * the right-to-be-forgotten shape. A corpus-scale deletion is a
  * rebuild, not a tombstone set; [[purge]] refuses past
  * [[MaxTombstoneIds]] to keep that boundary loud. */
object Tombstones {

  /** Dir under an artifact root holding tombstone deltas — underscore-
    * prefixed so no parquet scan or tag/generation listing sees it; the
    * generation-0 vacuum sweep spares it by name (protocol state, like
    * the writer lease — [[graft.IndexVersions.vacuumGenerations]]). */
  val Dir: String = graft.IndexVersions.TombstonesDir

  private val Marker = "ids/_SUCCESS"

  /** Bound on the accumulated tombstone-id count: past this the
    * broadcast anti-join stops being free and the operation wants a
    * rebuild (loud refusal, the proximity-gate convention). 10M ids ≈
    * 80 MB broadcast — comfortably under executor broadcast budgets. */
  val MaxTombstoneIds: Long = 10L * 1000 * 1000

  /** Commit `ids` as a tombstone delta under `artifactRoot` (tag-
    * committed, replay-safe; returns false when this tag is already
    * applied — the at-least-once short-circuit). */
  def purge(spark: SparkSession, artifactRoot: String, ids: Seq[Long],
      tag: String, fence: () => Unit = graft.IndexVersions.NoFence): Boolean = {
    import spark.implicits._
    require(ids.nonEmpty, "purge needs at least one doc id")
    val root = new Path(artifactRoot, Dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existing = idCount(spark, artifactRoot)
    require(existing + ids.length <= MaxTombstoneIds,
      s"tombstone set at $artifactRoot would exceed $MaxTombstoneIds ids " +
        s"($existing committed + ${ids.length} new) — a deletion of this " +
        "mass is a rebuild from the surviving corpus, not a tombstone set")
    graft.IndexVersions.appendTaggedBatch(fs, root, tag, Marker, fence) {
      staging =>
        ids.distinct.toDF("doc_id")
          .coalesce(1)
          .write.mode("overwrite").parquet(new Path(staging, "ids").toString)
    }
  }

  /** Commit the same tombstone set to several artifacts, INDEXES FIRST,
    * STORE LAST (pass the store as the final root — see the object doc's
    * ordering argument). Idempotent per (artifact, tag). */
  def purgeAll(spark: SparkSession, artifactRoots: Seq[String],
      ids: Seq[Long], tag: String): Unit =
    artifactRoots.foreach(r => purge(spark, r, ids, tag))

  /** Committed tombstone tags under an artifact root. */
  def committedTags(spark: SparkSession, artifactRoot: String): Set[String] = {
    val root = new Path(artifactRoot, Dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.IndexVersions.committedBatchTags(fs, root, Marker)
  }

  /** The artifact's tombstoned doc ids — None when it has never been
    * purged (the fast path every serving query takes: one existence
    * probe, no job). */
  def idsDf(spark: SparkSession, artifactRoot: String): Option[DataFrame] =
    idsDfFor(spark, artifactRoot, committedTags(spark, artifactRoot))

  /** [[idsDf]] pinned to an EXPLICIT tag snapshot — the compactor's
    * form: a bake must rewrite from exactly the deltas it will mark
    * baked, or a purge committing mid-compaction would be marked baked
    * without its rows having been dropped. */
  def idsDfFor(spark: SparkSession, artifactRoot: String,
      tags: Set[String]): Option[DataFrame] = {
    if (tags.isEmpty) None
    else Some(tags.toSeq.sorted
      .map(t => spark.read.parquet(s"$artifactRoot/$Dir/$t/ids")
        .select("doc_id"))
      .reduce(_ unionByName _)
      .distinct())
  }

  private def idCount(spark: SparkSession, artifactRoot: String): Long =
    idsDf(spark, artifactRoot).map(_.count()).getOrElse(0L)

  /** Committed tombstone tags NOT yet baked into version/generation `v`
    * — the adjustment set for readers whose purge correction is NOT
    * idempotent (the gram ledger's footprint subtraction must apply
    * exactly once: a baked generation already excludes the delta's
    * rows, so applying its correction again would double-subtract; the
    * doc-granular artifacts' anti-join filter never needed this —
    * filtering already-absent rows is a no-op). A tag is unbaked at `v`
    * when it has no bake point or its bake point is NEWER than `v`. */
  def unbakedTagsAt(spark: SparkSession, artifactRoot: String,
      v: Long): Set[String] = {
    val root = new Path(artifactRoot, Dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    committedTags(spark, artifactRoot)
      .filter(t => bakedVersion(fs, new Path(root, t)).forall(_ > v))
  }

  /** Drop tombstoned docs from a doc-granular frame — a BROADCAST
    * anti-join on `idCol`, attached only when the artifact carries
    * tombstones (an unpurged artifact's plan is untouched). The serving
    * seam every read path of a purgeable artifact goes through. */
  def filter(spark: SparkSession, artifactRoot: String, df: DataFrame,
      idCol: String = "doc_id"): DataFrame =
    filterWith(df, idsDf(spark, artifactRoot), idCol)

  /** [[filter]] against an already-resolved id set (the compactor's
    * form — one snapshot feeds the rewrite and every correction). */
  def filterWith(df: DataFrame, ids: Option[DataFrame],
      idCol: String = "doc_id"): DataFrame = ids match {
    case None => df
    case Some(t) => df.join(broadcast(t.withColumnRenamed("doc_id", "__ts_id")),
      col(idCol) === col("__ts_id"), "left_anti")
  }

  /** The rows of `df` belonging to tombstoned docs — the purged
    * FOOTPRINT a bake subtracts from derived statistics (purged-mass-
    * sized by construction). Empty frame when no tombstones. */
  def footprintWith(df: DataFrame, ids: Option[DataFrame],
      idCol: String = "doc_id"): DataFrame = ids match {
    case None => df.limit(0)
    case Some(t) => df.join(broadcast(t.withColumnRenamed("doc_id", "__ts_id")),
      col(idCol) === col("__ts_id"), "left_semi")
  }

  /** Record that version/generation `v` physically excludes every id of
    * every currently-committed tombstone delta (called by the artifact's
    * compactor AFTER its publish commits): writes a `_baked` file naming
    * `v` into each delta that lacks one. Idempotent; never overwrites an
    * earlier bake point (the FIRST baking version is the binding one for
    * vacuum safety). */
  def markBaked(spark: SparkSession, artifactRoot: String, v: Long,
      tags: Set[String]): Unit = {
    val fs = new Path(artifactRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    tags.foreach { t =>
      val baked = new Path(s"$artifactRoot/$Dir/$t/_baked")
      if (!fs.exists(baked)) {
        val out = fs.create(baked, false)
        try out.write(v.toString.getBytes("UTF-8")) finally out.close()
      }
    }
  }

  private def bakedVersion(fs: FileSystem, tagDir: Path): Option[Long] = {
    val p = new Path(tagDir, "_baked")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try scala.util.Try(scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString.trim.toLong).toOption
      finally in.close()
    }
  }

  /** Drop tombstone deltas whose bake point is at or before EVERY
    * committed version/generation (`minLiveVersion` — the caller passes
    * min(committed...) for its layout): only then does no readable state
    * still need the filter. Returns the removed delta paths. */
  def vacuumBaked(spark: SparkSession, artifactRoot: String,
      minLiveVersion: Long): Seq[String] = {
    val root = new Path(artifactRoot, Dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    committedTags(spark, artifactRoot).toSeq.sorted.flatMap { t =>
      val tagDir = new Path(root, t)
      bakedVersion(fs, tagDir) match {
        case Some(v) if v <= minLiveVersion =>
          fs.delete(tagDir, true); Seq(tagDir.toString)
        case _ => Seq.empty
      }
    }
  }
}
