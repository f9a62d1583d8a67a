package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** At-rest INVERTED POSTING layout for lexical retrieval — the text
  * analogue of [[graft.vector.CellIndex]] (round 8; the follow-up named by
  * SCALING.md's hybrid-bottleneck finding: every BM25 query was paying a
  * full corpus tokenize/aggregate pass).
  *
  * [[write]] pays the tokenize ONCE: postings land as
  * `(tok, doc_id, tf, dl)` rows — doc length DENORMALIZED onto each
  * posting, the impact-file trick that makes scoring join-free —
  * parquet-partitioned by a murmur3 term bucket (`tb=k/` dirs), with the
  * document-frequency table partitioned the same way and the two corpus
  * scalars (doc count, token count) persisted beside them. Readers then
  * score a query by scanning ONLY the buckets its terms hash into
  * (PartitionFilters pruning — per-query IO tracks posting-list mass, not
  * corpus mass) and never touch `documents` at all.
  *
  * Partitioning by hash bucket rather than by raw term keeps the
  * directory count fixed (a 100 TB corpus has billions of distinct terms
  * — one dir per term is a metadata explosion; term-hash buckets are how
  * a distributed index shards its dictionary), while still pruning the
  * scan to |query| buckets of `buckets`. Inside a bucket, postings for
  * one term are contiguous enough for row-group statistics to prune
  * further (`tok` min/max per row group). */
object TextIndex {

  /** Build the index: ONE tokenize pass (the (doc,tok) count table is
    * checkpointed so the three writes below share it — three independent
    * actions would each re-scan and re-aggregate the corpus; ReuseExchange
    * only dedups within a single plan), then postings/df/stats writes.
    * The bucket count is PERSISTED in stats — appends must reuse it, a
    * different count would silently mis-prune carried-forward postings.
    * Deterministic in the corpus — rebuilding is idempotent.
    *
    * LAYOUT COMPATIBILITY: the dfreq schema is part of the index format —
    * the MaxScore bounds (max_tf, min_dl) were ADDED to it in round 9, so
    * an index built before that must be REBUILT, not appended: serving and
    * append both select those columns and fail with an unresolved-column
    * AnalysisException on the old layout (loudly, with no wrong answers —
    * but also with no in-place migration; the posting files are the
    * expensive part and they did not change, so a rebuild costs one
    * corpus pass). */
  def write(spark: SparkSession, dir: String, indexPath: String,
      buckets: Int = 16): Unit = {
    // a base-layout overwrite is the one protocol op that MUTATES a root
    // in place — drop the session's root-keyed metadata memos so a
    // same-path in-session rebuild (spec harnesses) cannot serve stale
    // scalars (the SessionMemos immutability contract)
    graft.SessionMemos.evict(spark, MetaMemo)
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
    val dt = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dl = dt.groupBy("doc_id").agg(sum("tf").as("dl"))
    val tb = pmod(hash(col("tok")), lit(buckets))
    val posts = dt.join(dl, Seq("doc_id"))
    posts
      .withColumn("tb", tb)
      .repartition(col("tb"))
      .sortWithinPartitions("tok", "doc_id") // row-group stats prune by term
      .write.mode("overwrite").partitionBy("tb")
      .parquet(s"$indexPath/postings")
    // df rides with the per-term MAX-IMPACT BOUNDS (max tf, min dl — both
    // posting-local, so they merge exactly under append): the driver-side
    // inputs to [[bm25Indexed]]'s MaxScore pruning. Appends keep them tight
    // enough (max/min only widen), never stale.
    posts.groupBy("tok")
      .agg(count(lit(1)).as("df"), max("tf").as("max_tf"), min("dl").as("min_dl"))
      .withColumn("tb", tb)
      .repartition(col("tb"))
      .write.mode("overwrite").partitionBy("tb")
      .parquet(s"$indexPath/dfreq")
    dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("n_toks"))
      .withColumn("buckets", lit(buckets.toLong))
      .coalesce(1) // 1 row — corpus scalars, not data
      .write.mode("overwrite").parquet(s"$indexPath/stats")
    // dt was an intermediate for this build only
    graft.Checkpoints.release(sc, graft.Checkpoints.pinnedSince(sc, before))
  }

  /** Committed index versions under `indexPath`, oldest first: version 0
    * is [[write]]'s base layout (`postings/`+`dfreq/`+`stats/` directly
    * under the root); appends publish `v<N>/` dirs holding the same
    * triple. Committed = the version's `stats/_SUCCESS` present (stats is
    * the last artifact each assembly writes), digit-checked like every
    * snapshot resolver in this repo. */
  private def committedVersions(spark: SparkSession, indexPath: String): Seq[Long] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val versioned = fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("v"))
      .filter(n => { val s = n.stripPrefix("v"); s.nonEmpty && s.forall(_.isDigit) })
      .filter(n => fs.exists(new Path(root, s"$n/stats/_SUCCESS")))
      .map(_.stripPrefix("v").toLong)
    val base =
      if (fs.exists(new Path(root, "stats/_SUCCESS"))) Seq(0L) else Seq.empty
    (base ++ versioned).sorted
  }

  private def versionRoot(indexPath: String, v: Long): String =
    if (v == 0L) indexPath else s"$indexPath/v$v"

  /** The index root readers resolve: the newest committed version. */
  def currentRoot(spark: SparkSession, indexPath: String): String = {
    val vs = committedVersions(spark, indexPath)
    require(vs.nonEmpty, s"no committed text index under $indexPath")
    versionRoot(indexPath, vs.max)
  }

  /** INCREMENTAL maintenance (round 8 — [[graft.vector.CellIndex.append]]'s
    * protocol on the lexical side, with a STRONGER equivalence: a text
    * index carries no trained state, so append-then-query is equal to
    * rebuilding over the union corpus EXACTLY, not just under-the-same-
    * codebook). Per batch (`batchDir/documents.parquet`; doc_ids must be
    * new): current posting bucket files carry forward BYTE-FOR-BYTE (a
    * new doc never changes an old doc's postings — tf and dl are
    * doc-local), the batch's postings append as new files in their hash
    * buckets, the vocabulary-sized df table merges by keyed sum, and the
    * two corpus scalars add. Publish = dot-prefixed staging + ONE atomic
    * rename of `v<N>`; a crashed attempt is invisible. Old versions stay
    * for time-travel until [[vacuumVersions]].
    *
    * OPERATING MODEL — SINGLE LIVE WRITER: the publish protocol makes a
    * lost race SAFE (per-attempt staging isolation + the guarded rename —
    * the loser throws, the committed index is never disturbed, and a
    * retry re-resolves and lands on the next version; spec'd in
    * TextIndexAppendSpec), but not COORDINATED: two live maintenance
    * streams on one index would fail one stream per batch rather than
    * take turns. Run one [[graft.app.IndexMaintenanceJob]] per index;
    * treat the IllegalStateException as the at-least-once retry signal it
    * is, not a liveness strategy. */
  def append(spark: SparkSession, batchDir: String, indexPath: String,
      tag: Option[String] = None,
      fence: () => Unit = graft.IndexVersions.NoFence): Unit = {
    graft.IndexVersions.requireValidTag(tag)
    import org.apache.hadoop.fs.{FileUtil, Path}
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(indexPath)
    val fs = root.getFileSystem(conf)
    val versions = committedVersions(spark, indexPath)
    require(versions.nonEmpty, s"append needs an existing index at $indexPath")
    val cur = versionRoot(indexPath, versions.max)
    val next = versions.max + 1
    val target = new Path(root, s"v$next")
    // staging path is unique PER ATTEMPT (nonce suffix): two concurrent
    // appenders that resolve the same next version must each assemble in
    // isolation — a shared deterministic staging dir could interleave into
    // a mixed assembly that publishes with a valid _SUCCESS, which the
    // target-rename guard cannot detect (round-8 review finding). The
    // guarded rename below is now the ONLY contention point; a crashed
    // attempt's orphan staging dir is swept by [[vacuumVersions]].
    val staging = new Path(root,
      s".staging_v${next}_${java.util.UUID.randomUUID().toString.take(8)}")
    // the bucket count is the INDEX'S, never a caller parameter: a count
    // differing from the one the carried-forward posting files were
    // written with would silently exclude them from pruned query scans
    // (round-8 review finding). One stats read serves all three scalars.
    val (nDocs, nToks, buckets) = readStatsRowAt(spark, cur)
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val toks = Tables.documents(spark, batchDir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
    // one batch tokenize shared by the three writes (the write() rule)
    val dt = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dl = dt.groupBy("doc_id").agg(sum("tf").as("dl"))
    val tb = pmod(hash(col("tok")), lit(buckets))
    // batch postings into their buckets; current bucket files then copy in
    // beside them (part names embed job UUIDs — no collisions)
    dt.join(dl, Seq("doc_id"))
      .withColumn("tb", tb)
      .repartition(col("tb"))
      .sortWithinPartitions("tok", "doc_id")
      .write.mode("overwrite").partitionBy("tb")
      .parquet(new Path(staging, "postings").toString)
    fs.listStatus(new Path(cur, "postings")).toSeq
      .filter(_.getPath.getName.startsWith("tb="))
      .foreach { s =>
        val dstB = new Path(new Path(staging, "postings"), s.getPath.getName)
        fs.mkdirs(dstB)
        fs.listStatus(s.getPath).toSeq
          .filter(f => f.getPath.getName.startsWith("part-"))
          .foreach(f => FileUtil.copy(fs, f.getPath, fs,
            new Path(dstB, f.getPath.getName), false, conf))
      }
    // df merge: vocabulary-sized keyed sum (never corpus mass); the
    // max-impact bounds merge exactly — max of maxes, min of mins — so
    // MaxScore pruning stays sound across any number of appends
    spark.read.parquet(s"$cur/dfreq").select("tok", "df", "max_tf", "min_dl")
      .unionByName(dt.join(dl, Seq("doc_id")).groupBy("tok")
        .agg(count(lit(1)).as("df"), max("tf").as("max_tf"),
          min("dl").as("min_dl")))
      .groupBy("tok").agg(sum("df").as("df"), max("max_tf").as("max_tf"),
        min("min_dl").as("min_dl"))
      .withColumn("tb", tb)
      .repartition(col("tb"))
      .write.mode("overwrite").partitionBy("tb")
      .parquet(new Path(staging, "dfreq").toString)
    // scalars add exactly (bucket count carried forward); stats is written
    // LAST — its _SUCCESS is the version's commit marker
    dl.agg((count(lit(1)) + nDocs).as("n_docs"),
        (coalesce(sum("dl"), lit(0L)) + nToks).as("n_toks")) // empty-batch-safe
      .withColumn("buckets", lit(buckets.toLong))
      .coalesce(1)
      .write.mode("overwrite").parquet(new Path(staging, "stats").toString)
    graft.Checkpoints.release(sc, graft.Checkpoints.pinnedSince(sc, before))
    // applied-batch ledger — atomic with the publish, survives vacuum
    // (union carried forward); the streaming sink's exactly-once guard
    graft.IndexVersions.writeLedger(fs, staging,
      graft.IndexVersions.readLedger(fs, new Path(cur)).append(tag))
    // guarded atomic publish: never replaces a COMMITTED concurrent winner
    graft.IndexVersions.publish(fs, staging, target,
      t => fs.exists(new Path(t, "stats/_SUCCESS")), fence)
  }

  /** Every committed version with its root and applied-batch LEDGER (tag
    * set + untagged-append count), oldest first — the input to
    * cross-index consistent resolution
    * ([[graft.IndexPair.consistentRoots]]). */
  def versionsWithTags(spark: SparkSession,
      indexPath: String): Seq[(Long, String, graft.IndexVersions.Ledger)] = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    committedVersions(spark, indexPath).map { v =>
      val p = versionRoot(indexPath, v)
      // a committed version's ledger is immutable (written once before
      // the publish rename; version numbers never reuse in a lineage) —
      // memoized so resolver-using page queries pay one ledger read per
      // version per SESSION, not per call (round-16 ADVICE fix, low)
      (v, p, graft.SessionMemos.getOrComputeScalar(spark, "vledger", p)(
        graft.IndexVersions.readLedger(fs, new Path(p))))
    }
  }

  /** Batch tags already folded into the current committed version (the
    * exactly-once guard for at-least-once streaming maintenance). */
  def appliedTags(spark: SparkSession, indexPath: String): Set[String] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.IndexVersions.readTags(fs, new Path(currentRoot(spark, indexPath)))
  }

  /** Drop committed versions beyond the newest `keepLast` (floored at
    * one). The base layout counts as version 0; vacuuming it removes its
    * three artifact dirs, never the version dirs beside them.
    *
    * READ-DURATION CONTRACT: a reader that resolved a version via
    * [[currentRoot]] holds no lease — a vacuum completing mid-scan can
    * delete the directory under it. `keepLast >= 2` bounds the window (two
    * whole append+vacuum cycles must complete inside one scan), and
    * `graceMs` eliminates it: versions newer than `graceMs` (by dir
    * modification time) are retained regardless of count, so setting it
    * above the longest query duration makes in-flight readers safe.
    * Orphaned `.staging_*` assemblies (crashed attempts — per-attempt
    * nonce dirs are never reused) are swept once older than an hour.
    * (Shared implementation: [[graft.IndexVersions.vacuum]] — stats
    * listed first as commit-marker/grace probe.) */
  def vacuumVersions(spark: SparkSession, indexPath: String,
      keepLast: Int = 2, graceMs: Long = 0L): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.IndexVersions.vacuum(fs, root, committedVersions(spark, indexPath),
      v => if (v == 0L) Seq("stats", "postings", "dfreq") else Seq(s"v$v"),
      keepLast, graceMs,
      dirOwner = {
        case "stats" | "postings" | "dfreq" => Some(0L)
        case n if n.startsWith("v") && n.stripPrefix("v").nonEmpty &&
          n.stripPrefix("v").forall(_.isDigit) => Some(n.stripPrefix("v").toLong)
        case _ => None
      },
      relist = () => committedVersions(spark, indexPath)) ++
      vacuumBakedTombstones(spark, indexPath)
  }

  /** Retire tombstone deltas whose bake point is at or before every
    * surviving committed version (shared by both layouts' vacuums —
    * round 16): only then does no readable state still need them. */
  private def vacuumBakedTombstones(spark: SparkSession,
      indexPath: String): Seq[String] = {
    val vs = committedVersions(spark, indexPath)
    if (vs.isEmpty) Seq.empty
    else Tombstones.vacuumBaked(spark, indexPath, vs.min)
  }

  /** IN-CHAIN POSTING COMPACTION (round 13 — the operational tail the
    * carry-forward append leaves open: every fold copies the current
    * posting files forward byte-for-byte AND adds the batch's own
    * file-set, so a bucket's file count grows linearly with fold count
    * and the reader's per-file open/footer cost grows with it). Publish
    * `v<N+1>` whose postings and dfreq are REWRITTEN — one fresh sorted
    * file-set per bucket over the same rows — with stats copied and the
    * applied-batch LEDGER copied VERBATIM (same corpus, layout-only
    * change: the retrain convention — pairing and replay short-circuits
    * must not perturb). Served answers are identical by construction
    * (identical row sets, same bucketing/sort); the version chain's
    * staging + guarded-rename publish means readers never observe a
    * partial compaction and old versions stay until [[vacuumVersions]].
    * Lease-holder operation, like every compactor here. */
  /** TOMBSTONE BAKE (round 16 — [[Tombstones]] step 3): when the index
    * carries tombstones, the compaction rewrite additionally DROPS the
    * purged docs' posting rows and corrects the derived statistics by
    * SUBTRACTING the purged footprint — df per term, n_docs/n_toks —
    * so post-bake served answers equal a rebuild from the surviving
    * corpus exactly (spec'd). max_tf/min_dl are carried, not
    * recomputed: stale bounds are an upper bound over a superset, so
    * MaxScore stays admissible (answers unchanged, pruning at worst
    * slightly looser until a later full rewrite). Cost: the corpus pass
    * compaction already pays + aggregates over the PURGED footprint. */
  def compactVersion(spark: SparkSession, indexPath: String,
      fence: () => Unit = graft.IndexVersions.NoFence): String = {
    val tsTags = Tombstones.committedTags(spark, indexPath)
    val tsIds = Tombstones.idsDfFor(spark, indexPath, tsTags)
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    // the purged FOOTPRINT, materialized once (purged-mass-sized by
    // construction) — the df correction and the stats correction both
    // read it, so the bake adds ONE extra pass over the postings, not
    // one per corrected table
    var fp: Option[DataFrame] = None
    def footprintAt(cur: String): DataFrame = {
      if (fp.isEmpty) fp = Some(Tombstones.footprintWith(
          spark.read.parquet(s"$cur/postings"), tsIds)
        .select("tok", "doc_id", "tf", "dl").localCheckpoint())
      fp.get
    }
    val target = compactVersionWith(spark, indexPath, "text", fence,
      statsRewrite = tsIds.map { _ => (cur, staging) =>
        import org.apache.hadoop.fs.Path
        val minus = footprintAt(cur).select("doc_id", "dl").distinct()
          .agg(coalesce(count(lit(1)), lit(0L)).as("pd"),
            coalesce(sum("dl"), lit(0L)).as("pt"))
        spark.read.parquet(s"$cur/stats")
          .crossJoin(broadcast(minus))
          .select((col("n_docs") - col("pd")).as("n_docs"),
            (col("n_toks") - col("pt")).as("n_toks"), col("buckets"))
          .coalesce(1)
          .write.mode("overwrite").parquet(new Path(staging, "stats").toString)
      }) { (cur, staging) =>
      import org.apache.hadoop.fs.Path
      // tb values are already hash-correct — repartition ON the persisted
      // column, never recompute (a drifted hash would silently mis-prune)
      Tombstones.filterWith(spark.read.parquet(s"$cur/postings"), tsIds)
        .repartition(col("tb"))
        .sortWithinPartitions("tok", "doc_id")
        .write.mode("overwrite").partitionBy("tb")
        .parquet(new Path(staging, "postings").toString)
      val dfreq = spark.read.parquet(s"$cur/dfreq")
      val corrected = tsIds match {
        case None => dfreq
        case Some(_) =>
          val purgedDf = footprintAt(cur)
            .groupBy("tok").agg(count(lit(1)).as("pdf"))
          dfreq.join(purgedDf, Seq("tok"), "left")
            .withColumn("df", col("df") - coalesce(col("pdf"), lit(0L)))
            .filter(col("df") > 0)
            .select(dfreq.columns.map(col).toSeq: _*)
      }
      corrected
        .repartition(col("tb"))
        .write.mode("overwrite").partitionBy("tb")
        .parquet(new Path(staging, "dfreq").toString)
    }
    graft.Checkpoints.release(sc, graft.Checkpoints.pinnedSince(sc, before))
    Tombstones.markBaked(spark, indexPath,
      new org.apache.hadoop.fs.Path(target).getName.stripPrefix("v").toLong,
      tsTags)
    target
  }

  /** The shared publish-next-version-from-rewritten-artifacts protocol
    * behind [[compactVersion]] and [[compactPhraseVersion]] (round-13
    * review: the two carried it verbatim-duplicated — the exact drift
    * hazard the shared appendTaggedBatch closed for the append side):
    * resolve the current version ONCE, rewrite the layout's data
    * artifacts into staging via `rewrite(cur, staging)`, carry stats
    * verbatim (coalesced, the commit marker), copy the applied-tags
    * ledger (same corpus — the retrain convention), and publish via the
    * guarded rename. */
  private def compactVersionWith(spark: SparkSession, indexPath: String,
      kind: String, fence: () => Unit,
      // when set (a tombstone bake), writes the CORRECTED stats into
      // staging instead of the verbatim carry — still last, still the
      // commit marker (round 16)
      statsRewrite: Option[(String, org.apache.hadoop.fs.Path) => Unit] = None)(
      rewrite: (String, org.apache.hadoop.fs.Path) => Unit): String = {
    import org.apache.hadoop.fs.Path
    val root = new Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = committedVersions(spark, indexPath)
    require(versions.nonEmpty, s"no committed $kind index under $indexPath")
    val cur = versionRoot(indexPath, versions.max)
    val next = versions.max + 1
    val target = new Path(root, s"v$next")
    val staging = new Path(root,
      s".staging_v${next}_${java.util.UUID.randomUUID().toString.take(8)}")
    rewrite(cur, staging)
    statsRewrite match {
      case Some(sw) => sw(cur, staging)
      case None => spark.read.parquet(s"$cur/stats")
        .coalesce(1) // scalars carried verbatim; stats LAST = commit marker
        .write.mode("overwrite").parquet(new Path(staging, "stats").toString)
    }
    graft.IndexVersions.writeLedger(fs, staging,
      graft.IndexVersions.readLedger(fs, new Path(cur)))
    graft.IndexVersions.publish(fs, staging, target,
      t => fs.exists(new Path(t, "stats/_SUCCESS")), fence)
    target.toString
  }

  /** Data-file count of the current version's `artifact` dir — the
    * compaction-cadence probe ([[graft.app.IndexMaintenanceJob]] triggers
    * [[compactVersion]] past a threshold, the sketch tables' model). */
  private[graft] def artifactFileCount(spark: SparkSession, root: String,
      artifact: String): Int = {
    import org.apache.hadoop.fs.Path
    val p = new Path(root, artifact)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else fs.listStatus(p).toSeq.filter(_.isDirectory)
      .map(b => fs.listStatus(b.getPath)
        .count(_.getPath.getName.startsWith("part-"))).sum
  }

  def postingFileCount(spark: SparkSession, indexPath: String): Int =
    artifactFileCount(spark, currentRoot(spark, indexPath), "postings")

  // ---- positional PHRASE index --------------------------------------------

  /** At-rest POSITIONAL index for exact phrase and proximity search —
    * the capabilities the (tok, tf) posting layout cannot express
    * (bag-of-words scoring discards adjacency and distance). The single
    * positional artifact is `positions/`: rows `(tok, doc_id, i)` — every
    * token occurrence with its position — parquet-partitioned by a
    * murmur3 token bucket (`ub=k/` dirs, the [[write]] sharding rule:
    * fixed directory count at any vocabulary) and sorted within
    * partitions by (tok, doc_id, i) so row-group statistics prune inside
    * a bucket. An m-word phrase then resolves RELATIONALLY: it occurs at
    * (doc, p) iff token j of the phrase occurs at (doc, p + j) for all
    * j — an m-way position-chain equi-join of single-token position
    * lists, each partition-pruned to its bucket; per-query IO tracks the
    * QUERY tokens' position-list mass, never corpus mass. The same rows
    * answer proximity/slop queries ([[proximitySearch]]) — ONE artifact
    * serves both, which is why round 11 DROPPED the round-9 `bigrams/`
    * table (a second positional encoding of the same corpus: phrase
    * search via bigram chains read it, proximity could not — carrying
    * both roughly doubled positional storage and build cost for no
    * capability the unigram rows lack).
    *
    * `phrases/` persists the corpus trigram counts so the oracle row
    * derives its probe phrase FROM the index — no corpus pass at query
    * time. It is the FULL vocabulary-sized trigram-count table
    * (bucket-partitioned like `dfreq`), not a top-k — counts merge by
    * keyed sum under append, which a truncated top-k cannot. `udf/`
    * serves the proximity probe derivation the same way.
    *
    * Positions are doc-local, so [[appendPhraseIndex]] extends the
    * [[append]] carry-forward protocol verbatim — and with the same
    * EXACT equivalence: no trained state, so append-then-query equals a
    * union-corpus rebuild (spec'd). Stats is written LAST — its
    * _SUCCESS is the commit marker; appends publish `v<N>` dirs resolved
    * by the shared [[committedVersions]] rule. */
  def writePhraseIndex(spark: SparkSession, dir: String, indexPath: String,
      buckets: Int = 16): Unit = {
    graft.SessionMemos.evict(spark, MetaMemo) // the write() rebuild rule
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .localCheckpoint() // one tokenize feeds position + trigram passes
    writePhraseArtifacts(spark, toks, indexPath, buckets, nDocsBase = 0L)
    graft.Checkpoints.release(sc, graft.Checkpoints.pinnedSince(sc, before))
  }

  /** The four phrase-index artifacts for one corpus slice, written under
    * `root`: UNIGRAM positional postings (the one positional encoding —
    * phrase chains and proximity bands both resolve from it), the
    * mergeable trigram-count and unigram-df tables, and stats (LAST —
    * the commit marker). Shared by build and append.
    *
    * LAYOUT COMPATIBILITY (the dfreq rule): round 11 DROPPED the
    * `bigrams/` artifact ([[phraseSearch]] now chains `positions/`) — a
    * phrase index built before round 11 must be REBUILT, not appended:
    * its stranded `bigrams/` dir would never be carried forward nor
    * vacuumed under the new layout. */
  private def writePhraseArtifacts(spark: SparkSession,
      toks: DataFrame, root: String, buckets: Int, nDocsBase: Long): Unit = {
    graft.functions.TextExpressions.register(spark)
    val uni = toks.select(col("doc_id"), posexplode(col("toks")).as(Seq("i", "tok")))
    uni
      .withColumn("ub", pmod(hash(col("tok")), lit(buckets)))
      .repartition(col("ub"))
      .sortWithinPartitions("tok", "doc_id", "i")
      .write.mode("overwrite").partitionBy("ub")
      .parquet(s"$root/positions")
    // unigram df rides beside the positions (the dfreq pattern): the
    // proximity probe derivation reads THIS vocabulary-sized table, never
    // the corpus; df/n_occ merge by keyed sum under append (disjoint doc
    // ids make the distinct-doc counts additive)
    uni.groupBy("tok")
      .agg(countDistinct("doc_id").as("df"), count(lit(1)).as("n_occ"))
      .withColumn("ub", pmod(hash(col("tok")), lit(buckets)))
      .repartition(col("ub"))
      .write.mode("overwrite").partitionBy("ub")
      .parquet(s"$root/udf")
    toks.select(posexplode(
        graft.functions.TextExpressions.word_ngrams(col("toks"), 3, distinct = false)))
      .toDF("i", "gram")
      .groupBy("gram").agg(count(lit(1)).as("n"))
      .withColumn("pb", pmod(hash(col("gram")), lit(buckets)))
      .repartition(col("pb"))
      .write.mode("overwrite").partitionBy("pb")
      .parquet(s"$root/phrases")
    toks.agg((count(lit(1)) + nDocsBase).as("n_docs"))
      .withColumn("buckets", lit(buckets.toLong))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$root/stats")
  }

  /** The phrase-index root readers resolve — newest committed version
    * (the [[committedVersions]] rule: stats/_SUCCESS is the marker for
    * base and `v<N>` alike). */
  def phraseCurrentRoot(spark: SparkSession, indexPath: String): String = {
    val vs = committedVersions(spark, indexPath)
    require(vs.nonEmpty, s"no committed phrase index under $indexPath")
    versionRoot(indexPath, vs.max)
  }

  /** INCREMENTAL phrase-index maintenance — [[append]]'s protocol on the
    * positional artifact: position bucket files carry forward
    * BYTE-FOR-BYTE (positions are doc-local — a new doc never changes an
    * old doc's rows), the batch's positions land as new files in their
    * buckets, the vocabulary-sized trigram table merges by keyed sum,
    * n_docs adds.
    * Same staging-nonce + guarded-rename publish, same applied-tag
    * ledger, same single-live-writer model; append-then-query equals a
    * union-corpus rebuild EXACTLY (spec'd — no trained state anywhere). */
  def appendPhraseIndex(spark: SparkSession, batchDir: String,
      indexPath: String, tag: Option[String] = None,
      fence: () => Unit = graft.IndexVersions.NoFence): Unit = {
    graft.IndexVersions.requireValidTag(tag)
    import org.apache.hadoop.fs.{FileUtil, Path}
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(indexPath)
    val fs = root.getFileSystem(conf)
    val versions = committedVersions(spark, indexPath)
    require(versions.nonEmpty, s"append needs an existing phrase index at $indexPath")
    val cur = versionRoot(indexPath, versions.max)
    // enforce the round-11 layout contract LOUDLY: a pre-round-11 index
    // still carrying bigrams/ must be rebuilt, not appended — appending
    // would succeed silently while stranding the bigram buckets forever
    // (vacuum no longer manages them) (round-11 review finding)
    require(!fs.exists(new Path(cur, "bigrams")),
      s"$cur carries the retired bigrams/ artifact (pre-round-11 layout) — " +
        "rebuild this phrase index with writePhraseIndex instead of appending")
    val next = versions.max + 1
    val target = new Path(root, s"v$next")
    val staging = new Path(root,
      s".staging_v${next}_${java.util.UUID.randomUUID().toString.take(8)}")
    val (nDocs, buckets) = phraseStatsAt(spark, cur)
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val toks = Tables.documents(spark, batchDir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .localCheckpoint()
    // batch artifacts first (same writer as build), then current bucket
    // files copy in beside them and the trigram tables merge
    writePhraseArtifacts(spark, toks, staging.toString, buckets, nDocsBase = nDocs)
    // the positional artifact carries forward byte-for-byte (doc-local
    // rows: a new doc never changes an old doc's positions)
    for ((artifact, prefix) <- Seq("positions" -> "ub="))
      fs.listStatus(new Path(cur, artifact)).toSeq
        .filter(_.getPath.getName.startsWith(prefix))
        .foreach { s =>
          val dstB = new Path(new Path(staging, artifact), s.getPath.getName)
          fs.mkdirs(dstB)
          fs.listStatus(s.getPath).toSeq
            .filter(f => f.getPath.getName.startsWith("part-"))
            .foreach(f => FileUtil.copy(fs, f.getPath, fs,
              new Path(dstB, f.getPath.getName), false, conf))
        }
    // the two vocabulary-sized tables merge by keyed sum, then swap in
    def mergeSwap(artifact: String, keyCol: String, bucketCol: String,
        sums: Seq[String]): Unit = {
      val merged = new Path(staging, s"${artifact}_merged")
      spark.read.parquet(s"$cur/$artifact").select(keyCol, sums: _*)
        .unionByName(spark.read.parquet(new Path(staging, artifact).toString)
          .select(keyCol, sums: _*))
        .groupBy(keyCol).agg(sum(sums.head).as(sums.head),
          sums.tail.map(c => sum(c).as(c)): _*)
        .withColumn(bucketCol, pmod(hash(col(keyCol)), lit(buckets)))
        .repartition(col(bucketCol))
        .write.mode("overwrite").partitionBy(bucketCol)
        .parquet(merged.toString)
      fs.delete(new Path(staging, artifact), true)
      if (!fs.rename(merged, new Path(staging, artifact)))
        throw new IllegalStateException(
          s"$artifact-table swap failed in staging $staging")
    }
    mergeSwap("phrases", "gram", "pb", Seq("n"))
    mergeSwap("udf", "tok", "ub", Seq("df", "n_occ"))
    graft.Checkpoints.release(sc, graft.Checkpoints.pinnedSince(sc, before))
    graft.IndexVersions.writeLedger(fs, staging,
      graft.IndexVersions.readLedger(fs, new Path(cur)).append(tag))
    graft.IndexVersions.publish(fs, staging, target,
      t => fs.exists(new Path(t, "stats/_SUCCESS")), fence)
  }

  /** [[vacuumVersions]] for the phrase layout (its base quadruple is
    * `stats/`+`phrases/`+`positions/`+`udf/`): drop committed versions
    * beyond the newest `keepLast`, honor the same `graceMs` read-duration
    * contract, sweep crashed staging assemblies. A pre-round-11 index's
    * `bigrams/` dir is deliberately NOT managed — that layout must be
    * rebuilt, not vacuumed forward. */
  def vacuumPhraseVersions(spark: SparkSession, indexPath: String,
      keepLast: Int = 2, graceMs: Long = 0L): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.IndexVersions.vacuum(fs, root, committedVersions(spark, indexPath),
      v => if (v == 0L) Seq("stats", "phrases", "positions", "udf")
           else Seq(s"v$v"),
      keepLast, graceMs,
      dirOwner = {
        case "stats" | "phrases" | "positions" | "udf" => Some(0L)
        case n if n.startsWith("v") && n.stripPrefix("v").nonEmpty &&
          n.stripPrefix("v").forall(_.isDigit) => Some(n.stripPrefix("v").toLong)
        case _ => None
      },
      relist = () => committedVersions(spark, indexPath)) ++
      vacuumBakedTombstones(spark, indexPath)
  }

  /** [[compactVersion]] for the phrase layout: positions (the carried-
    * forward file-set growth lives here), udf and phrases rewritten to
    * one file-set per bucket, stats copied, ledger verbatim — served
    * phrase/proximity answers identical by construction. */
  /** TOMBSTONE BAKE on the positional layout (round 16 — the
    * [[compactVersion]] semantics): positions drop purged docs; udf
    * subtracts the purged docs' per-term df/n_occ; the trigram table
    * subtracts the purged docs' OWN trigram counts — reconstructed from
    * their position rows (purged mass only, never a corpus re-tokenize:
    * (doc, i → tok) IS the token sequence); n_docs corrects by the
    * purged docs present in the positions. A purged doc with ZERO
    * tokens has no footprint anywhere in this layout, so its n_docs
    * slot cannot be reclaimed until a rebuild — it matched no query, so
    * only avgdl-free phrase stats carry the one-count residue
    * (documented boundary). */
  def compactPhraseVersion(spark: SparkSession, indexPath: String,
      fence: () => Unit = graft.IndexVersions.NoFence): String = {
    graft.functions.TextExpressions.register(spark)
    val tsTags = Tombstones.committedTags(spark, indexPath)
    val tsIds = Tombstones.idsDfFor(spark, indexPath, tsTags)
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    // purged footprint materialized once (the compactVersion rule): the
    // udf, trigram, and stats corrections all read it
    var fp: Option[DataFrame] = None
    def purgedPos(cur: String): DataFrame = {
      if (fp.isEmpty) fp = Some(Tombstones.footprintWith(
          spark.read.parquet(s"$cur/positions"), tsIds)
        .select("tok", "doc_id", "i").localCheckpoint())
      fp.get
    }
    val target = compactVersionWith(spark, indexPath, "phrase", fence,
      statsRewrite = tsIds.map { _ => (cur, staging) =>
        import org.apache.hadoop.fs.Path
        val minus = purgedPos(cur).select("doc_id").distinct()
          .agg(coalesce(count(lit(1)), lit(0L)).as("pd"))
        spark.read.parquet(s"$cur/stats")
          .crossJoin(broadcast(minus))
          .select((col("n_docs") - col("pd")).as("n_docs"), col("buckets"))
          .coalesce(1)
          .write.mode("overwrite").parquet(new Path(staging, "stats").toString)
      }) { (cur, staging) =>
      import org.apache.hadoop.fs.Path
      Tombstones.filterWith(spark.read.parquet(s"$cur/positions"), tsIds)
        .repartition(col("ub"))
        .sortWithinPartitions("tok", "doc_id", "i")
        .write.mode("overwrite").partitionBy("ub")
        .parquet(new Path(staging, "positions").toString)
      val udf = spark.read.parquet(s"$cur/udf")
      val udf2 = tsIds match {
        case None => udf
        case Some(_) =>
          val minus = purgedPos(cur).groupBy("tok")
            .agg(countDistinct("doc_id").as("pdf"), count(lit(1)).as("pocc"))
          udf.join(minus, Seq("tok"), "left")
            .withColumn("df", col("df") - coalesce(col("pdf"), lit(0L)))
            .withColumn("n_occ", col("n_occ") - coalesce(col("pocc"), lit(0L)))
            .filter(col("n_occ") > 0)
            .select(udf.columns.map(col).toSeq: _*)
      }
      udf2
        .repartition(col("ub"))
        .write.mode("overwrite").partitionBy("ub")
        .parquet(new Path(staging, "udf").toString)
      val phrases = spark.read.parquet(s"$cur/phrases")
      val phrases2 = tsIds match {
        case None => phrases
        case Some(_) =>
          // purged docs' token sequences, rebuilt from their own
          // position rows (purged mass, one sort per doc)
          val purgedToks = purgedPos(cur)
            .groupBy("doc_id")
            .agg(transform(
              sort_array(collect_list(struct(col("i"), col("tok")))),
              s => s.getField("tok")).as("toks"))
          val minusN = purgedToks.select(posexplode(
              graft.functions.TextExpressions.word_ngrams(col("toks"), 3,
                distinct = false)))
            .toDF("i", "gram")
            .groupBy("gram").agg(count(lit(1)).as("pn"))
          phrases.join(minusN, Seq("gram"), "left")
            .withColumn("n", col("n") - coalesce(col("pn"), lit(0L)))
            .filter(col("n") > 0)
            .select(phrases.columns.map(col).toSeq: _*)
      }
      phrases2
        .repartition(col("pb"))
        .write.mode("overwrite").partitionBy("pb")
        .parquet(new Path(staging, "phrases").toString)
    }
    graft.Checkpoints.release(sc, graft.Checkpoints.pinnedSince(sc, before))
    Tombstones.markBaked(spark, indexPath,
      new org.apache.hadoop.fs.Path(target).getName.stripPrefix("v").toLong,
      tsTags)
    target
  }

  def positionFileCount(spark: SparkSession, indexPath: String): Int =
    artifactFileCount(spark, phraseCurrentRoot(spark, indexPath), "positions")

  /** Batch tags folded into the current committed phrase-index version —
    * the exactly-once guard for streaming maintenance, as [[appliedTags]]. */
  def phraseAppliedTags(spark: SparkSession, indexPath: String): Set[String] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.IndexVersions.readTags(fs, new Path(phraseCurrentRoot(spark, indexPath)))
  }

  /** The index's top corpus phrase (rank-1 trigram by (count desc, gram) —
    * the deterministic probe-derivation convention): a vocabulary-sized
    * scan of the persisted trigram table, never a corpus pass. */
  def topPhrase(spark: SparkSession, indexPath: String,
      pinnedRoot: Option[String] = None): Seq[String] = {
    val root = pinnedRoot.getOrElse(phraseCurrentRoot(spark, indexPath))
    // memoized per resolved root (MetaMemo): the trigram table of a
    // committed version is immutable, so the rank-1 probe is a pure
    // function of the root — q147/q156/q162/q164 share one derivation job
    memoMeta(spark, ("topphrase", root)) {
      val r = spark.read.parquet(s"$root/phrases")
        .orderBy(desc("n"), col("gram")).limit(1).collect()
      require(r.nonEmpty, s"phrase index at $indexPath has no phrases artifact")
      r.head.getString(0).split(" ").toSeq
    }
  }

  /** Exact phrase occurrences from the unigram positional index: per
    * doc, occurrence count and first position of the full phrase. The
    * phrase occurs at (doc, p) iff token j occurs at (doc, p + j) for
    * ALL j < m — an m-way position-chain equi-join (round 11: this
    * replaced the bigram-chain form, retiring the `bigrams/` artifact —
    * one positional encoding now serves phrase AND proximity). Each
    * phrase SLOT contributes one pruned position list (PartitionFilters
    * on `ub` — the bucket predicate is a foldable expression — plus
    * row-group pruning on the sorted `tok` column; a repeated token
    * pays its pruned scan once per slot — the join keys differ per
    * slot, so the subtrees cannot share an exchange); the
    * chain joins on (doc_id, normalized start position), so every
    * shuffle is keyed by doc. The first join already constrains the
    * intermediate to exact occurrences of the 2-token prefix — adjacency
    * is as selective a predicate as a bigram equality was, so
    * per-query cost tracks the query tokens' position mass exactly as
    * the bigram form's tracked its posting mass. */
  def phraseSearch(spark: SparkSession, indexPath: String,
      phrase: Seq[String], pinnedRoot: Option[String] = None): DataFrame = {
    require(phrase.length >= 2, "phrase search needs at least two words")
    // ONE version resolution for the whole query (the bm25Indexed rule);
    // a derive-then-search caller must pin the SAME root across both
    // calls or a concurrent fold can slide a version in between
    val root = pinnedRoot.getOrElse(phraseCurrentRoot(spark, indexPath))
    val buckets = phraseStatsAt(spark, root)._2
    val posts = spark.read.parquet(s"$root/positions")
    // VOCABULARY PRE-FLIGHT (round 11): one tiny lookup of the probe
    // tokens' corpus occurrence counts against the udf table
    // (vocabulary-sized, bucket-pruned to ≤ m buckets by the foldable ub
    // disjuncts, ≤ m rows collected — flat in corpus size). It buys two
    // things:
    //  1. OOV SHORT-CIRCUIT: any zero-occurrence token means the phrase
    //     cannot occur — answer empty WITHOUT scanning a single position
    //     list (negative lookups with out-of-vocabulary terms are a
    //     common production shape; the saved scans are the hot lists').
    //  2. RAREST-FIRST chain order for m ≥ 3: slots re-key to the same
    //     phrase-start p, so join order never changes the answer (inner
    //     equi-join; PhraseBench asserts it per pass) — but joining the
    //     two rarest slots first bounds the opening intermediate by the
    //     rarest pair's agreement instead of the hottest pair's
    //     co-occurrence mass. On THIS fixture (40-token vocabulary, no
    //     co-occurrence skew) the intermediates never dominate and the
    //     pre-flight is a measured ~0.2 s constant (tools/PhraseBench,
    //     SCALING.md round-11); on a Zipfian corpus the hottest-pair
    //     intermediate ("of the …") is orders of magnitude larger than
    //     the rare-anchored one, which is what the ordering bounds — the
    //     constant is paid for the at-scale worst case, not this box.
    val occOf: Map[String, Long] = {
      val want = phrase.distinct
      // memoized per (root, probe tokens): the udf table of a committed
      // version is immutable — q147's pre-flight serves q156/q162 free
      memoMeta(spark, ("occof", root, want)) {
        val pruned = spark.read.parquet(s"$root/udf")
          .filter(want.map(t => col("ub") === pmod(hash(lit(t)), lit(buckets))).reduce(_ || _))
          .filter(col("tok").isin(want: _*))
          .select(col("tok"), col("n_occ")).collect()
        val found = pruned.map(r => r.getString(0) -> r.getLong(1)).toMap
        want.map(t => t -> found.getOrElse(t, 0L)).toMap
      }
    }
    if (occOf.valuesIterator.contains(0L)) {
      import org.apache.spark.sql.types.{LongType, StructField}
      return emptyResult(spark,
        StructField("doc_id", LongType, nullable = false),
        StructField("n_occ", LongType, nullable = false),
        StructField("first_pos", LongType, nullable = false))
    }
    // one pruned scan per slot, re-keyed to the PHRASE start position
    // (i − j): a full occurrence is an m-way agreement on (doc, p).
    // m = 2 keeps slot order (a single join has no order to choose).
    val slots = if (phrase.length == 2) phrase.zipWithIndex
      else phrase.zipWithIndex.sortBy { case (t, _) => (occOf(t), t) }
    val lists = slots.map { case (t, j) =>
      posts
        .filter(col("ub") === pmod(hash(lit(t)), lit(buckets))) // folds → prunes
        .filter(col("tok") === t)
        .select(col("doc_id"), (col("i").cast("long") - lit(j)).as("p"))
    }
    // purged docs drop from phrase hits the moment their tombstone
    // commits (round 16 — [[Tombstones]]; no-op for unpurged indexes)
    Tombstones.filter(spark, indexPath,
        lists.reduce((a, b) => a.join(b, Seq("doc_id", "p")))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_occ"), min(col("p")).as("first_pos")))
      .orderBy("doc_id")
  }

  /** The q148 deterministic probe pair served FROM the index's unigram
    * df table (vocabulary-sized scan, never a corpus pass — the q132
    * derivation convention): the two HIGHEST-df terms, (df desc, tok)-
    * ordered. Deliberately no ubiquity filter — the hottest terms carry
    * the largest position lists, so the probe exercises the band join's
    * boundedness at its worst case (and guarantees non-empty results at
    * every fixture SF). */
  def deriveProximityTerms(spark: SparkSession, indexPath: String,
      pinnedRoot: Option[String] = None): (String, String) = {
    val ts = deriveProximityTermsN(spark, indexPath, 2, pinnedRoot)
    (ts(0), ts(1))
  }

  /** The q153 generalization of [[deriveProximityTerms]]: the `n`
    * HIGHEST-df terms ((df desc, tok)-ordered) from the index's udf
    * table — a vocabulary-sized scan, never a corpus pass, and the
    * worst-case probe set by construction (the hottest terms carry the
    * largest position lists). */
  def deriveProximityTermsN(spark: SparkSession, indexPath: String,
      n: Int, pinnedRoot: Option[String] = None): Seq[String] = {
    val root = pinnedRoot.getOrElse(phraseCurrentRoot(spark, indexPath))
    // memoized per (root, n): a pure function of the committed udf table
    memoMeta(spark, ("proxterms", root, n)) {
      val ts = spark.read.parquet(s"$root/udf")
        .orderBy(desc("df"), col("tok")).limit(n)
        .select("tok").collect().map(_.getString(0)).toSeq
      require(ts.length == n,
        s"proximity derivation needs $n distinct terms in $root/udf")
      ts
    }
  }

  /** PROXIMITY (slop) SEARCH from the unigram positional postings — the
    * standard IR capability next to exact phrase (round 10; q147's
    * documented residual): per doc, the ordered position pairs where
    * `tokA` occurs within `slop` tokens of `tokB` (|i_a − i_b| ≤ slop,
    * unordered window), with the closest distance. The m = 2 instance of
    * [[proximitySearchAll]]'s banded intersection (tokB is the anchor) —
    * see there for the geometry and boundedness argument. */
  def proximitySearch(spark: SparkSession, indexPath: String,
      tokA: String, tokB: String, slop: Int = 3,
      pinnedRoot: Option[String] = None): DataFrame =
    proximitySearchAll(spark, indexPath, Seq(tokA, tokB), slop, pinnedRoot)
      .select(col("doc_id"), col("n_tuples").as("n_pairs"),
        col("min_span").as("min_dist"))

  /** M-TERM PROXIMITY SEARCH (round 11 — the q148 banded intersection
    * generalized: "all of {t₁…tₘ} within a window of `slop`"): per doc,
    * the number of position tuples (one occurrence per term) whose span
    * max(i)−min(i) ≤ slop, with the tightest span. The one-band-match
    * trick COMPOSES to m lists by making one term the ANCHOR: bands have
    * width w = slop+1, the anchor emits its own band only, every other
    * term emits its band ±1. A qualifying tuple spans ≤ slop < w, so
    * every non-anchor position lies within one band of the anchor's —
    * the tuple matches at EXACTLY the anchor's band (the anchor emits
    * one band, so no tuple can match twice and no post-join dedup is
    * needed — the m=2 geometry argument verbatim). Shuffle mass is
    * ≤ (3(m−1)+1)× the terms' position mass keyed by (doc, band) —
    * never corpus mass, and never the ∏tf blowup a doc-keyed m-way join
    * risks on term-dense docs. The HOTTEST term should be the anchor
    * (last in `toks`): it is the one list not tripled by the ±1
    * emission. Anchor choice never changes the answer — only which band
    * each tuple matches in. */
  def proximitySearchAll(spark: SparkSession, indexPath: String,
      toks: Seq[String], slop: Int = 3,
      pinnedRoot: Option[String] = None): DataFrame = {
    require(toks.length >= 2, "proximity search needs at least two terms")
    require(toks.distinct.length == toks.length,
      s"proximity terms must be distinct: $toks")
    require(slop >= 1, "slop must be at least 1")
    val root = pinnedRoot.getOrElse(phraseCurrentRoot(spark, indexPath))
    proximityBanded(spark, indexPath, root, toks, slop, essential = None)
  }

  /** The shared banded-intersection core of [[proximitySearchAll]] and
    * [[proximitySearchGated]] — ONE definition so the gated form cannot
    * drift from the exact one it must equal. `essential`, when present,
    * doc-semi-joins EVERY position list before banding: a qualifying
    * tuple needs all terms in the doc, so restricting to the essential
    * term's doc set drops only docs that could never produce a tuple —
    * the answer is identical, the shuffle mass is bounded by the
    * essential term's document frequency. `essentialIds`, when present
    * instead (a rarest term whose df fits the page bound), pushes the
    * SAME restriction down as doc_id LITERALS — the [[graft.text.DocStore.fetchPage]]
    * row-group-pruning move: positions sort by (tok, doc_id, i), so the
    * hot lists' SCAN mass now also tracks the rarest term's absolute df,
    * not just the shuffle (round 13 — on the Zipf-tail fixture the
    * semi-join form still paid the hot lists' linear scan). */
  private def proximityBanded(spark: SparkSession, artifactRoot: String,
      root: String, toks: Seq[String], slop: Int,
      essential: Option[DataFrame],
      essentialIds: Option[Seq[Long]] = None): DataFrame = {
    val buckets = phraseStatsAt(spark, root)._2
    val posts = spark.read.parquet(s"$root/positions")
    val w = slop + 1
    def listOf(t: String) = {
      val l0 = posts
        .filter(col("ub") === pmod(hash(lit(t)), lit(buckets))) // folds → prunes
        .filter(col("tok") === t)
      val l = essentialIds
        .map(ids => l0.filter(col("doc_id").isin(ids: _*)))
        .getOrElse(l0)
        .select(col("doc_id"), col("i").cast("long").as("i"))
      essential.map(e => l.join(e, Seq("doc_id"), "left_semi")).getOrElse(l)
    }
    val m = toks.length
    val iCols = (0 until m).map(j => col(s"i$j"))
    val anchor = listOf(toks.last)
      .select(col("doc_id"), col("i").as(s"i${m - 1}"),
        (col("i") / w).cast("long").as("band"))
    val others = toks.init.zipWithIndex.map { case (t, j) =>
      listOf(t).select(col("doc_id"), col("i").as(s"i$j"),
        explode(array((col("i") / w).cast("long") - 1,
          (col("i") / w).cast("long"),
          (col("i") / w).cast("long") + 1)).as("band"))
    }
    val span = greatest(iCols: _*) - least(iCols: _*)
    // anchor joins FIRST: its single band per occurrence is the most
    // selective input, so every intermediate is constrained by it —
    // joining tripled lists against each other first would inflate
    // intermediates ~3× for the identical result (round-11 review)
    // purged docs drop from proximity hits the moment their tombstone
    // commits (round 16 — [[Tombstones]]; no-op for unpurged indexes)
    Tombstones.filter(spark, artifactRoot,
        (anchor +: others).reduce((a, b) => a.join(b, Seq("doc_id", "band")))
          .filter(span <= slop)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tuples"), min(span).as("min_span")))
      .orderBy("doc_id")
  }

  /** DF-GATED proximity (round 12 — the MaxScore essential-list idea
    * applied to position lists; the round-11 verdict's task #4):
    * [[proximitySearchAll]] pays every probe term's FULL position-list
    * mass, and a hottest-terms probe makes that corpus-linear by
    * construction (SCALING round-11c: the q148/q153 family rode
    * 0.83–0.87/decade at the third decade on exactly such probes). The
    * fix rides two facts. (1) A qualifying tuple needs EVERY term in
    * the doc, so the RAREST term's doc set is an essential filter: hot
    * lists only contribute positions from docs containing it —
    * semi-joining them first bounds shuffle mass by the rarest term's
    * df instead of the hottest's (size-based planning broadcasts the
    * doc set when it fits; Spark's runtime bloom filter covers the
    * shuffled case). (2) When even the rarest probe term's df share
    * exceeds `maxDfShare`, NO essential list exists — a stopword-only
    * proximity probe is corpus-linear in any positional index (the
    * Lucene common-grams trade) — so the probe is REFUSED loudly
    * instead of silently paid.
    *
    * EXACTNESS: the served answer equals [[proximitySearchAll]]'s for
    * every ACCEPTED probe — the threshold affects acceptance only,
    * never content (spec'd: gated ≡ ungated on mixed and all-rare
    * probes; all-hot refuses). The ungated form remains the
    * q148/q153 oracle path. OOV terms need no short-circuit here: an
    * absent rarest term has df 0 (always accepted) and an empty
    * essential list, so every join empties at essentially zero cost. */
  def proximitySearchGated(spark: SparkSession, indexPath: String,
      toks: Seq[String], slop: Int = 3, maxDfShare: Double = 0.05,
      pinnedRoot: Option[String] = None,
      // the literal-pushdown bound for the essential list (the fetchPage
      // page-size class; a collected set this small is a driver-bounded
      // probe, not data). Overridable so specs drive BOTH regimes on one
      // fixture.
      pushdownLimit: Long = 1024L,
      // PROBE-WIDE position-mass bound for the semi-join regime (round
      // 15 — the r14 verdict's task #3, the candidate-mass half of the
      // prune inequality the MaxScore gate gained in round 14 applied
      // here): the df-share gate bounds each TERM's share, but a wide
      // m-term probe of individually-acceptable terms still SCANS
      // Σₜ n_occ(t) position rows before the essential semi-join prunes
      // the shuffle — m mid-df terms can sum to corpus-scale scan mass
      // while every term passes the per-term gate. Refused when the
      // probe's summed position mass exceeds this share of the corpus's
      // total (both sides priced from the vocabulary-sized udf table —
      // no corpus pass). The PUSHDOWN regime is exempt by construction:
      // its per-list scan is row-group-pruned to the rarest term's doc
      // ids, so scan mass tracks the rarest ABSOLUTE df whatever the
      // probe width.
      maxPosShare: Double = 0.25): DataFrame = {
    require(toks.length >= 2, "proximity search needs at least two terms")
    require(toks.distinct.length == toks.length,
      s"proximity terms must be distinct: $toks")
    require(slop >= 1, "slop must be at least 1")
    require(maxDfShare > 0.0 && maxDfShare <= 1.0,
      s"maxDfShare must be in (0, 1]: $maxDfShare")
    require(maxPosShare > 0.0 && maxPosShare <= 1.0,
      s"maxPosShare must be in (0, 1]: $maxPosShare")
    val root = pinnedRoot.getOrElse(phraseCurrentRoot(spark, indexPath))
    val (nDocs, buckets) = phraseStatsAt(spark, root)
    // vocabulary-sized, bucket-pruned df + position-mass lookup (the
    // derivation convention — ≤ m rows collected, flat in corpus size);
    // memoized per (root, probe) like the phraseSearch pre-flight
    val statsOf: Map[String, (Long, Long)] =
      memoMeta(spark, ("udfstats", root, toks.sorted)) {
        val found = spark.read.parquet(s"$root/udf")
          .filter(toks.map(t => col("ub") === pmod(hash(lit(t)), lit(buckets)))
            .reduce(_ || _))
          .filter(col("tok").isin(toks: _*))
          .select(col("tok"), col("df"), col("n_occ")).collect()
          .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
        toks.map(t => t -> found.getOrElse(t, (0L, 0L))).toMap
      }
    val dfOf: Map[String, Long] = statsOf.map { case (t, (df, _)) => t -> df }
    val rarest = toks.minBy(t => (dfOf(t), t))
    require(nDocs == 0L || dfOf(rarest).toDouble / nDocs <= maxDfShare,
      s"proximity probe gated: every term exceeds df share $maxDfShare " +
        s"of the corpus (rarest '$rarest' is in ${dfOf(rarest)} of $nDocs " +
        "docs) — a stopword-only probe pays corpus-linear position mass " +
        "in any positional index; refine the probe or use the ungated " +
        "proximitySearchAll deliberately")
    // the probe-wide mass gate, priced only where it binds (the
    // semi-join regime) and only from the vocabulary-sized udf table
    if (dfOf(rarest) > pushdownLimit) {
      val probePos = statsOf.valuesIterator.map(_._2).sum
      val totalPos = memoMeta(spark, ("totalpos", root)) {
        spark.read.parquet(s"$root/udf")
          .agg(coalesce(sum(col("n_occ")), lit(0L))).collect().head.getLong(0)
      }
      require(totalPos == 0L || probePos.toDouble / totalPos <= maxPosShare,
        s"proximity probe gated: the ${toks.length}-term probe's summed " +
          s"position mass ($probePos of $totalPos corpus positions) " +
          s"exceeds share $maxPosShare — each term passes the per-term " +
          "df gate, but the semi-join regime scans every probe list in " +
          "full before pruning, so a wide probe of mid-df terms pays " +
          "corpus-scale scan mass; narrow the probe or use the ungated " +
          "proximitySearchAll deliberately")
    }
    val posts = spark.read.parquet(s"$root/positions")
    val essentialDocs = posts
      .filter(col("ub") === pmod(hash(lit(rarest)), lit(buckets)))
      .filter(col("tok") === rarest)
      .select(col("doc_id")).distinct()
    // TWO essential-list regimes, switched on the df the gate already
    // read (no extra pass):
    //  - rarest df within the page bound (the fetchPage/CandidatePushdown
    //    convention): COLLECT the doc ids and push them into every hot
    //    list scan as literals — (tok, doc_id)-sorted row groups prune,
    //    so per-query IO tracks the rarest term's ABSOLUTE df (measured
    //    ~flat across decades on the Zipf-tail fixture, SCALING round
    //    13). This is the regime the gate exists for: on a real
    //    vocabulary most accepted probes land here.
    //  - larger (still under maxDfShare): the distributed semi-join —
    //    shuffle mass bounded by the rarest df, scan mass by the probe
    //    lists (the round-12 form; size-based planning broadcasts the
    //    doc set when it fits).
    if (dfOf(rarest) <= pushdownLimit) {
      val ids = essentialDocs.collect().map(_.getLong(0)).toSeq
      if (ids.isEmpty)
        // OOV rarest term: no doc can qualify — the empty-result shape
        // at zero scan cost (isin on an empty list is not plannable)
        return proximityBanded(spark, indexPath, root, toks, slop,
          Some(essentialDocs))
      proximityBanded(spark, indexPath, root, toks, slop, essential = None,
        essentialIds = Some(ids))
    } else
      proximityBanded(spark, indexPath, root, toks, slop, Some(essentialDocs))
  }

  /** The q161 deterministic probe — the gated family's worst case with
    * an essential list: the two HIGHEST-df terms (the q153 convention —
    * maximal position mass) plus the LOWEST-df term (the essential
    * filter; df asc, tok — the q155 mustNot convention), anchor
    * (hottest) last. All from the vocabulary-sized udf table. */
  def deriveGatedProximityProbe(spark: SparkSession, indexPath: String,
      pinnedRoot: Option[String] = None): Seq[String] = {
    val root = pinnedRoot.getOrElse(phraseCurrentRoot(spark, indexPath))
    // memoized per root; the hot pair rides the shared (root, 2)
    // derivation q148/q152 also use, so only the rarest-term probe is new
    memoMeta(spark, ("gatedprobe", root)) {
      val hot = deriveProximityTermsN(spark, indexPath, 2, Some(root))
      val rare = spark.read.parquet(s"$root/udf")
        .orderBy(col("df"), col("tok")).limit(1)
        .select("tok").collect().map(_.getString(0)).toSeq
      val probe = Seq(rare.head, hot(1), hot(0))
      require(probe.distinct.length == 3,
        s"gated probe derivation needs 3 distinct terms in $root/udf " +
          s"(got hot=$hot, rare=$rare)")
      probe
    }
  }

  /** PROXIMITY-BOOSTED RETRIEVAL — both text artifacts composed, fully
    * index-resident (round 10; the term-proximity ranking lever of
    * Büttcher/Clarke/Lushman SIGIR'06, expressed as reciprocal-rank
    * fusion): the LEXICAL arm is [[bm25Indexed]]'s top-`m` from the
    * posting index (bag-of-words relevance), the PROXIMITY arm ranks the
    * positional index's within-`slop` co-occurrences by (closest pair
    * asc, pair count desc, doc_id) — documents where the probe terms
    * appear NEAR each other outrank scattered mentions, the signal
    * bag-of-words scoring discards. Fusion is the q134 RRF convention
    * (fixed-point 10⁶/(k+rank) contributions, integer sort key; absent
    * from a list = rank 0 = contributes nothing). Per-query cost: the two
    * arms' pruned posting/position scans + a ≤2m-row fusion — the corpus
    * is never tokenized and no scan leaves its buckets.
    *
    * `consistent` resolves ONE (text, phrase) version pair with EQUAL
    * applied-batch ledgers before either arm reads
    * ([[graft.IndexPair.consistentTextRoots]] — the q138 rule): under
    * live maintenance the two artifacts publish a batch as two separate
    * renames, and independent "current" resolution can fuse arms
    * computed over different corpus states. */
  def proximityRankedSearch(spark: SparkSession, indexPath: String,
      phraseIndexPath: String, m: Int = 50, kRrf: Int = 60, topN: Int = 20,
      slop: Int = 3, consistent: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (lexRoot, proxRoot) =
      if (consistent) {
        val (t, p) = graft.IndexPair.consistentTextRoots(spark, indexPath,
          phraseIndexPath)
        (Some(t), Some(p))
      } else (None, None)
    val lex = bm25Indexed(spark, indexPath, nq = 5, topN = m,
        pinnedRoot = lexRoot)
      .select(col("doc_id"), col("rnk").as("lex_rnk"))
    // ONE phrase-index resolution pins derivation and search together
    val pRoot = Some(proxRoot.getOrElse(phraseCurrentRoot(spark, phraseIndexPath)))
    val (ta, tb) = deriveProximityTerms(spark, phraseIndexPath, pinnedRoot = pRoot)
    val pOrder = Seq(col("min_dist").asc, col("n_pairs").desc, col("doc_id").asc)
    val pw = Window.partitionBy(spark_partition_id()).orderBy(pOrder: _*)
    // top-m via TakeOrderedAndProject, then a constant-partition rank over
    // the m survivors (the rankTopK convention — never a corpus window)
    val prox = proximitySearch(spark, phraseIndexPath, ta, tb, slop,
        pinnedRoot = pRoot)
      .orderBy(pOrder: _*).limit(m)
      .withColumn("prox_rnk", row_number().over(pw).cast("long"))
      .select(col("doc_id"), col("prox_rnk"))
    def contrib(rnk: Column): Column =
      when(rnk > 0, floor(lit(1000000.0) / (lit(kRrf) + rnk) + lit(0.5))
        .cast("long")).otherwise(lit(0L))
    val fused = prox.join(lex, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("prox_rnk"), lit(0L)).as("prox_rnk"),
        coalesce(col("lex_rnk"), lit(0L)).as("lex_rnk"))
      .withColumn("s6", contrib(col("prox_rnk")) + contrib(col("lex_rnk")))
    val order = Seq(desc("s6"), col("doc_id"))
    val w = Window.partitionBy(spark_partition_id()).orderBy(order: _*)
    fused.orderBy(order: _*).limit(topN)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("rnk"), col("doc_id"), col("prox_rnk"), col("lex_rnk"),
        (col("s6") * lit(1.0) / lit(1000000.0)).as("rrf_score"))
      .orderBy("rnk")
  }

  /** Empty result frame with a pinned contract schema — the OOV/empty
    * short-circuit shape shared by [[phraseSearch]], [[boolSearch]] and
    * [[DocStore.snippetSearch]] (one definition so an output-contract
    * change cannot miss its empty-branch twin). Callers pass full
    * StructFields so nullability matches the non-empty branch (round-11
    * review: a hardcoded nullable=false drifted snippet's empty schema
    * from its populated twin). */
  private[graft] def emptyResult(spark: SparkSession,
      fields: org.apache.spark.sql.types.StructField*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(fields))

  /** The q155 deterministic probe served FROM the index's df table (the
    * q132/q148 derivation convention — a vocabulary-sized, bucket-pruned
    * scan, never a corpus pass): must = the two HIGHEST-df terms
    * ((df desc, tok)-ordered — the worst-case intersection mass by
    * construction, and non-empty at every fixture SF), mustNot = the
    * LOWEST-df term ((df asc, tok)-ordered — the rarest term, so the
    * exclusion is exercised against a real but small posting list). */
  def deriveBoolTerms(spark: SparkSession, indexPath: String,
      pinnedRoot: Option[String] = None): (Seq[String], Seq[String]) = {
    val root = pinnedRoot.getOrElse(currentRoot(spark, indexPath))
    // memoized per root: q155 derives, q157 rides — two collects saved
    memoMeta(spark, ("boolterms", root)) {
      val dfreq = spark.read.parquet(s"$root/dfreq")
      val must = dfreq.orderBy(desc("df"), col("tok")).limit(2)
        .select("tok").collect().map(_.getString(0)).toSeq
      val not = dfreq.orderBy(col("df"), col("tok")).limit(1)
        .select("tok").collect().map(_.getString(0)).toSeq
      require(must.length == 2 && not.length == 1 &&
        (must ++ not).distinct.length == 3,
        s"bool derivation needs 3 distinct terms in $root/dfreq " +
          s"(got must=$must, mustNot=$not)")
      (must, not)
    }
  }

  /** BOOLEAN SET RETRIEVAL from the posting index — the unranked
    * companion to [[bm25Indexed]] (AND/NOT set semantics; the other half
    * of the classic inverted-index query surface): documents containing
    * ALL of `must` and NONE of `mustNot`, with each hit's doc length and
    * its must-terms' (min, max) term frequencies off the posting rows.
    *
    * The m-way intersection is ONE keyed aggregation, not m−1 joins: the
    * must terms' pruned posting lists union (each list bucket-pruned by
    * the foldable `tb` predicate + `tok` row-group pruning on the sorted
    * layout, the bm25Indexed scan shape), then `groupBy(doc_id)` counts
    * distinct-by-construction (tok, doc) posting rows — a doc hits all m
    * terms iff its group has m rows. One shuffle keyed by doc with
    * map-side partial aggregation (PlanSpec pins `partial_count`), vs
    * m−1 doc-keyed shuffle joins — at scale the intersection cost is the
    * must lists' posting mass, once. Negation is one left-anti join
    * against the mustNot lists' doc ids (anti join needs no distinct).
    *
    * The vocabulary pre-flight rides the dfreq lookup the method needs
    * anyway (tb per term): an out-of-vocabulary `must` term means NO doc
    * qualifies — answer empty with zero posting scans (the q147
    * short-circuit convention) — while out-of-vocabulary `mustNot` terms
    * exclude nothing and drop out. Per-query cost tracks the query
    * terms' posting mass; the corpus is never tokenized.
    *
    * `minShouldMatch` generalizes the conjunction to k-of-m (the classic
    * minimum-should-match dial: m = AND, 1 = OR) — the SAME counting
    * aggregation with `nhit ≥ k` instead of `= m`, so OR and k-of-m cost
    * exactly what AND costs; under k < m the (min, max) tf aggregate
    * covers the must terms PRESENT in each doc, which under AND is all
    * of them. An OOV term cannot contribute a hit but still counts
    * toward m (a query asking 2-of-3 where one term is unindexable must
    * not silently become 2-of-2), so the empty short-circuit fires
    * exactly when fewer than k terms resolve. */
  def boolSearch(spark: SparkSession, indexPath: String,
      must: Seq[String], mustNot: Seq[String] = Nil,
      pinnedRoot: Option[String] = None,
      minShouldMatch: Int = -1): DataFrame = {
    require(must.nonEmpty, "bool search needs at least one must term")
    require(must.distinct.length == must.length,
      s"must terms must be distinct: $must")
    require(mustNot.intersect(must).isEmpty,
      s"a term cannot be both must and mustNot: ${mustNot.intersect(must)}")
    val k = if (minShouldMatch < 0) must.length else minShouldMatch
    require(k >= 1 && k <= must.length,
      s"minShouldMatch must be in [1, ${must.length}]: $k")
    // ONE version resolution for the whole query (the bm25Indexed rule)
    val root = pinnedRoot.getOrElse(currentRoot(spark, indexPath))
    val buckets = readStatsRowAt(spark, root)._3
    val dfreq = spark.read.parquet(s"$root/dfreq")
    // term→bucket resolution memoized per (root, terms) — q155 resolves,
    // q157 (same probe, same root) rides
    def resolve(ts: Seq[String]): Map[String, Int] =
      if (ts.isEmpty) Map.empty
      else memoMeta(spark, ("booltb", root, ts.sorted)) {
        dfreq
          .filter(ts.map(t => col("tb") === pmod(hash(lit(t)), lit(buckets)))
            .reduce(_ || _))
          .filter(col("tok").isin(ts: _*))
          .select(col("tok"), col("tb").cast("int"))
          .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      }
    val mustTb = resolve(must)
    val notTb = resolve(mustNot) // OOV mustNot terms exclude nothing: drop
    // OOV must terms can never be hit, so the highest reachable count is
    // |resolved| — below the threshold, no doc qualifies, zero scans
    if (mustTb.size < k) {
      import org.apache.spark.sql.types.{LongType, StructField}
      // nullability matches the POPULATED plan (round-11 ADVICE): doc_id
      // is parquet-read (nullable), dl/min_tf/max_tf are min/max
      // aggregates (nullable) — an empty-vs-populated schema drift is
      // exactly what emptyResult's contract tells callers to prevent
      return emptyResult(spark,
        StructField("doc_id", LongType, nullable = true),
        StructField("dl", LongType, nullable = true),
        StructField("min_tf", LongType, nullable = true),
        StructField("max_tf", LongType, nullable = true))
    }
    val posts = spark.read.parquet(s"$root/postings")
    def listsOf(tb: Map[String, Int]) = posts
      .filter(col("tb").isin(tb.values.toSeq.distinct: _*))
      .filter(col("tok").isin(tb.keys.toSeq: _*))
    // dl is denormalized identically onto every posting of a doc, so
    // max() reads the constant without a first()-determinism argument
    val hits = listsOf(mustTb)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nhit"), min("tf").as("min_tf"),
        max("tf").as("max_tf"), max("dl").as("dl"))
      .filter(col("nhit") >= k)
    val kept =
      if (notTb.isEmpty) hits
      else hits.join(listsOf(notTb).select("doc_id"), Seq("doc_id"),
        "left_anti")
    // purged docs drop from the hit set the moment their tombstone
    // commits (round 16 — [[Tombstones]]; no-op for unpurged indexes)
    Tombstones.filter(spark, indexPath,
        kept.select(col("doc_id"), col("dl"), col("min_tf"), col("max_tf")))
      .orderBy("doc_id")
  }

  /** The corpus scalars persisted by [[write]]/[[append]] (newest
    * committed version). */
  def readStats(spark: SparkSession, indexPath: String): (Long, Long) =
    readStatsAt(spark, currentRoot(spark, indexPath))

  /** (nDocs, nToks) of a resolved root — `private[graft]` so the
    * MaxScoreBench meter can reproduce the shipped prune decision. */
  private[graft] def readStatsAt(spark: SparkSession, root: String): (Long, Long) = {
    val (n, t, _) = readStatsRowAt(spark, root)
    (n, t)
  }

  /** One read of the 1-row stats file for all three scalars — MEMOIZED
    * per resolved root ([[MetaMemo]]): a committed version's stats is
    * immutable, so the collect runs once per root per session instead of
    * once per serving query. No bucket
    * fallback: every [[write]] has persisted the `buckets` column since the
    * layout existed, so its absence can only mean a corrupted or
    * hand-assembled stats file — defaulting would reintroduce exactly the
    * silent mis-pruning (carried-forward postings excluded from query
    * scans) the persisted count exists to prevent (round-8 review finding). */
  private def readStatsRowAt(spark: SparkSession, root: String): (Long, Long, Int) =
    memoMeta(spark, ("stats", root)) {
      val df = spark.read.parquet(s"$root/stats")
      require(df.columns.contains("buckets"),
        s"text index stats at $root/stats has no 'buckets' column — corrupted " +
          "or hand-assembled stats; rebuild the index rather than guessing the " +
          "bucket count (a wrong count silently mis-prunes posting scans)")
      val r = df.collect().head
      (r.getAs[Long]("n_docs"), r.getAs[Long]("n_toks"),
        r.getAs[Long]("buckets").toInt)
    }

  /** The phrase layout's 1-row stats (n_docs, buckets) — memoized per
    * resolved root like [[readStatsRowAt]]; shared by the phrase/proximity
    * query paths, which previously each collected it per call. */
  private def phraseStatsAt(spark: SparkSession, root: String): (Long, Int) =
    memoMeta(spark, ("phrasestats", root)) {
      val r = spark.read.parquet(s"$root/stats")
        .select(col("n_docs"), col("buckets")).collect().head
      (r.getLong(0), r.getLong(1).toInt)
    }

  private val EpostsMemo = "textindex.eposts"

  /** Session memo for driver-side serving METADATA derived only from a
    * RESOLVED, immutable-once-committed artifact root (round 17 — the
    * r16 verdict's top task: every serving page re-ran the same
    * stats-read and probe-derivation collects as separate Spark jobs, and
    * at sf0.1 each such driver barrier costs ~80–150 ms; on a cluster
    * each is a scheduler round-trip per query). A committed version's
    * stats file and vocabulary tables are written once before the publish
    * rename and never rewritten (the vledger/carriedtags immutability
    * argument), so the 1-row stats scalars and the ≤nq-row probe
    * derivations are pure functions of the root — the first query on a
    * root pays the collect, every later query on the same root rides it.
    * Values are a handful of strings/longs per root, never data rows.
    * Evicted with the other memos ([[evictMemos]] — Bench's between-pass
    * eviction keeps each pass cold-build-then-ride, the round-7
    * protocol); [[write]]/[[writePhraseIndex]] evict too, so a same-path
    * in-session rebuild (spec harnesses) can never serve stale scalars. */
  private val MetaMemo = "textindex.meta"

  private def memoMeta[T](spark: SparkSession, key: Any)(compute: => T): T =
    graft.SessionMemos.getOrComputeScalar(spark, MetaMemo, key)(compute)

  /** Evict this module's session memos — the cache-map half of a full memo
    * eviction; MUST run beside [[graft.Checkpoints.evictSessionMemos]]
    * (which unpersists the retained blocks): blocks gone with the map
    * entry still present would make the next cache hit fail on a
    * truncated-lineage checkpoint instead of rebuilding (round-10 review
    * finding — the Dedup/Similarity evictMemos contract). */
  def evictMemos(spark: SparkSession): Unit =
    graft.SessionMemos.evict(spark, EpostsMemo, MetaMemo)

  /** A resolved query term with its pruning inputs: document frequency,
    * partition bucket, and the persisted per-term max-impact bounds. */
  private[graft] final case class QTerm(tok: String, df: Long, tb: Int,
    maxTf: Long, minDl: Long)

  /** The q132 deterministic query derivation served FROM the index's df
    * table (a vocabulary-sized scan — no corpus pass): the `nq` highest-df
    * non-ubiquitous terms, with each term's partition bucket so the
    * posting scan can prune. Driver-side nq rows. */
  def deriveQueryTerms(spark: SparkSession, indexPath: String,
      nq: Int = 5): Seq[(String, Long, Int)] = {
    val root = currentRoot(spark, indexPath)
    deriveQueryTermsAt(spark, root, readStatsAt(spark, root)._1, nq)
      .map(q => (q.tok, q.df, q.tb))
  }

  private[graft] def deriveQueryTermsAt(spark: SparkSession, root: String,
      nDocs: Long, nq: Int): Seq[QTerm] =
    // memoized per (root, nq): nDocs is itself a function of the root, so
    // it needs no key slot; q136 derives, q138/q152 ride
    memoMeta(spark, ("qterms", root, nq)) {
      spark.read.parquet(s"$root/dfreq")
        .filter(col("df") * 2 < nDocs)
        .orderBy(desc("df"), col("tok")).limit(nq)
        .select(col("tok"), col("df"), col("tb").cast("int"),
          col("max_tf"), col("min_dl"))
        .collect().map(r => QTerm(r.getString(0), r.getLong(1), r.getInt(2),
          r.getLong(3), r.getLong(4))).toSeq
    }

  /** The MaxScore term split for one query (Turtle & Flood 1995's
    * MaxScore, batch-shaped): `ub6` is each term's score CEILING — the
    * fixed-point Okapi contribution at the persisted (max tf, min dl)
    * bounds, monotone in both, +1 ulp slack — and `theta6` is a top-k
    * FLOOR: the topN-th best single-term contribution of the cheapest
    * (min-df) query term, an actual score at least topN docs meet.
    * `nonEssential` is the maximal ascending-ceiling prefix whose
    * ceilings SUM below the floor: a doc appearing in no essential list
    * totals strictly under theta6, hence under the true topN-th score —
    * provably outside the topN under any tie-break. */
  private[graft] final case class MaxScoreSplit(theta6: Long,
    essential: Seq[String], nonEssential: Seq[String], ub6: Map[String, Long])

  /** CANDIDATE-MASS GUARD on the MaxScore prune (round 14): the skew/mass
    * gate alone MISFIRES in the heavy-tail regime — measured on the
    * 1000× Zipf fixture, a 24-term probe spanning df ranks 7–29 passes
    * the ×8 skew ratio, yet its "essential" (rare) lists still carry
    * ~10⁵–10⁶ docs each, so the candidate set dwarfs the literal-IN
    * pushdown bound, the non-essential lists are probed through a
    * corpus-scale semi-join, and the "prune" ran 2.2× SLOWER than the
    * plain plan (11.8 vs 5.4 s). The win regime is candidates small
    * enough that the hot lists are read ONLY for candidate docs (ideally
    * the row-group-pruning IN pushdown) — so the prune additionally
    * requires the essential lists' summed df under this bound. The
    * synthetic rare-terms fixture (df ≈ 200 essentials beside a 45%-df
    * hot list — the classic MaxScore query shape) sits far inside it. */
  private[graft] val CandidateMassGate = 65536L

  /** The full prune decision — skew/mass gate, MaxScore split, and the
    * candidate-mass guard — returning the non-essential terms (empty =
    * plain plan). ONE definition for [[bm25Indexed]] and the
    * MaxScoreBench meter, so the measured decision is the shipped one. */
  private[graft] def nonEssentialTerms(spark: SparkSession, root: String,
      nDocs: Long, nToks: Long, qts: Seq[QTerm], topN: Int,
      minProbeMass: Long = DefaultMinProbeMass,
      tombstoneRoot: Option[String] = None): Seq[QTerm] = {
    val skewed = qts.size >= 2 &&
      qts.map(_.df).max >= SkewGateRatio * qts.map(_.df).min &&
      qts.map(_.df).sum >= minProbeMass
    if (!skewed) Seq.empty[QTerm]
    else {
      val split = maxScoreSplitAt(spark, root, nDocs, nToks, qts, topN,
        tombstoneRoot = tombstoneRoot)
      val essMass = qts
        .filterNot(q => split.nonEssential.contains(q.tok)).map(_.df).sum
      if (essMass > CandidateMassGate) Seq.empty[QTerm]
      else qts.filter(q => split.nonEssential.contains(q.tok))
    }
  }

  private[graft] def maxScoreSplitAt(spark: SparkSession, root: String,
      nDocs: Long, nToks: Long, qts: Seq[QTerm], topN: Int,
      k1: Double = 1.2, b: Double = 0.75,
      tombstoneRoot: Option[String] = None): MaxScoreSplit = {
    import spark.implicits._
    // driver replica of bm25S6's IEEE op sequence at the bound point;
    // the +1 fixed-point slack absorbs any residual ulp divergence
    val avgdl = nToks.toDouble / nDocs.toDouble
    def ub6(q: QTerm): Long = {
      val idf = math.log(((nDocs - q.df) + 0.5) / (q.df + 0.5) + 1.0)
      val tfn = q.maxTf * (k1 + 1) /
        (q.maxTf + k1 * (1.0 - b + b * q.minDl / avgdl))
      math.floor(idf * tfn * 1e6 + 0.5).toLong + 1
    }
    val sel = qts.minBy(q => (q.df, q.tok))
    // the floor probe excludes tombstoned docs (round 16): a purged
    // doc's partial score inflating theta6 would over-prune — a
    // SURVIVOR whose true rank is inside the topN could be dropped.
    // A survivors-only floor is ≤ the true floor, hence admissible.
    val selList = Tombstones.filter(spark,
      tombstoneRoot.getOrElse(root),
      spark.read.parquet(s"$root/postings")
        .filter(col("tb") === sel.tb && col("tok") === sel.tok))
    val selScored = TextOps.bm25S6(selList
      .join(broadcast(Seq((sel.tok, sel.df)).toDF("tok", "df")), Seq("tok"))
      .withColumn("n_docs", lit(nDocs))
      .withColumn("n_toks", lit(nToks)), k1, b)
    val partials = selScored.select("s6").orderBy(desc("s6")).limit(topN)
      .collect().map(_.getLong(0))
    val theta6 = if (partials.length >= topN) partials.last else 0L
    val ubs = qts.map(q => q.tok -> ub6(q)).toMap
    // ceilings ascending: once a prefix sum reaches the floor every longer
    // prefix does too, so this single pass finds the maximal prefix
    var acc = 0L
    val ne = Seq.newBuilder[String]
    qts.sortBy(q => (ubs(q.tok), q.tok)).foreach { q =>
      if (theta6 > 0 && acc + ubs(q.tok) < theta6) { acc += ubs(q.tok); ne += q.tok }
    }
    val nonEss = ne.result()
    MaxScoreSplit(theta6, qts.map(_.tok).filterNot(nonEss.contains), nonEss, ubs)
  }

  /** Above this many candidate docs, the non-essential lists filter via a
    * left-semi join instead of a literal IN (a driver list must stay
    * bounded); below it, the IN predicate reaches the parquet scan and
    * prunes row groups of the (tok, doc_id)-sorted layout. */
  private val CandidatePushdownLimit = 1024

  /** COST GATE for the MaxScore probe: the floor phase and the candidate
    * restriction pay two extra Spark actions, which only win when the
    * query's posting mass is SKEWED — a hot term's list dwarfing the
    * cheapest list is what non-essentiality can remove. Without at least
    * this df ratio between the largest and smallest query-term lists (or
    * with a single query term), the split would come back all-essential
    * anyway, so the probe is skipped outright and the pruned path is
    * byte-identical to the plain one — measured: the ungated probe cost
    * ~1 s of pure overhead per query on the unskewed bench corpus. */
  private[graft] val SkewGateRatio = 8L

  /** Second gate condition (round-9b 100× finding): ratio skew alone is
    * not enough — on the 100× rehearsal the gate fired (df ratio ≥ 8) but
    * the ENTIRE prunable posting mass scanned in under a second, so the
    * probe's two driver actions were pure overhead. The probe only pays
    * when the query terms' absolute posting mass is large enough that
    * skipping most of it beats two small Spark actions; below this many
    * total postings a straight scan is strictly cheaper on any target
    * hardware. Exactness is never at stake — the gate only picks which of
    * two identical-answer plans runs. */
  private[graft] val DefaultMinProbeMass = 5000000L

  /** BM25 served FROM the index (the indexed form of [[TextOps.bm25]]):
    * resolve query terms against the df table, scan ONLY their hash
    * buckets' postings (PartitionFilters pruning; dl rides the posting
    * row, so scoring is join-free beyond the nq-row broadcast), score
    * with the SAME shared Okapi expression, rank with the same integer-s6
    * tail. With the same (nq, topN) this returns exactly the ad-hoc
    * q132 answer (differential spec + the shared q136 oracle) — the index
    * changes where the work happens, not what is computed. Per-query cost
    * tracks the query terms' posting mass; the corpus is never tokenized
    * at query time.
    *
    * `prune` (default on) adds MAXSCORE EARLY TERMINATION behind a
    * cost gate ([[SkewGateRatio]] — without df skew between the query
    * terms' lists the probe is pure overhead and is skipped, leaving the
    * plain plan untouched) — the classic lexical lever once hot terms
    * carry corpus-sized posting lists: from
    * the df table's persisted (max tf, min dl) bounds and a top-k floor
    * taken off the cheapest list, terms whose score ceilings sum below
    * the floor become NON-ESSENTIAL ([[maxScoreSplitAt]]); their posting
    * lists are read only FOR docs that hit an essential list (literal IN
    * pushdown under [[CandidatePushdownLimit]] candidates — row-group
    * pruning on the sorted layout — else a semi-join). Docs pruned this
    * way provably cannot reach the topN, so the answer is EXACTLY the
    * unpruned one (differential spec on a skewed fixture + q136's hash). */
  def bm25Indexed(spark: SparkSession, indexPath: String, nq: Int = 5,
      topN: Int = 20, prune: Boolean = true,
      pinnedRoot: Option[String] = None,
      minProbeMass: Long = DefaultMinProbeMass): DataFrame = {
    import spark.implicits._
    // ONE version resolution for the whole query: resolving per artifact
    // would let a concurrent append publish between reads and mix stats
    // from vN with postings from vN+1 — scores of no committed version
    // (round-8 review finding). A pinned root extends the same rule
    // across indexes (graft.IndexPair's consistent pair).
    val root = pinnedRoot.getOrElse(currentRoot(spark, indexPath))
    val (nDocs, nToks) = readStatsAt(spark, root)
    val qts = deriveQueryTermsAt(spark, root, nDocs, nq)
    val ne = if (!prune) Seq.empty[QTerm]
      else nonEssentialTerms(spark, root, nDocs, nToks, qts, topN,
        minProbeMass, tombstoneRoot = Some(indexPath))
    val posts = spark.read.parquet(s"$root/postings")
    // the term predicate as a literal FILTER, not just the join: it
    // reaches the parquet scan as PushedFilters on `tok`, so the
    // sortWithinPartitions layout prunes ROW GROUPS inside each bucket —
    // the join alone would read every bucket row before dropping
    // non-query terms
    def listsOf(ts: Seq[QTerm]) = posts
      .filter(col("tb").isin(ts.map(_.tb).distinct: _*))
      .filter(col("tok").isin(ts.map(_.tok): _*))
    val rows =
      if (ne.isEmpty) listsOf(qts)
      else {
        val es = qts.filterNot(q => ne.exists(_.tok == q.tok))
        // materialized ONCE: the essential lists feed the candidate
        // collect, the union, and (in the semi-join branch) the join's
        // build side — re-scanning multi-million-row posting lists two
        // extra times per query would erode the IO win the probe exists
        // to deliver (round-9 review finding). Memoized through
        // SessionMemos (round-10 review finding — the minhashPairs
        // lifecycle): the returned plan still READS the checkpointed
        // blocks, so they cannot be released here, and a bare
        // localCheckpoint pinned them for the session's life. The memo
        // holds the carrier strongly (no stale registry ids when the
        // ContextCleaner collects an unreferenced frame), repeated pruned
        // queries on one index version ride one materialization (keyed by
        // root + essential terms — deterministic in both), and
        // [[graft.Checkpoints.evictSessionMemos]] reclaims the blocks
        // between serving generations (the bench already calls it). Size
        // is bounded by the ESSENTIAL lists, which the cost gate only
        // lets be the rare side of a skewed query.
        val ePosts = graft.SessionMemos.getOrBuild(spark, EpostsMemo,
            (root, es.map(_.tok).sorted)) {
          val sc = spark.sparkContext
          val beforeCkpt = sc.getPersistentRDDs.keySet
          val frame = listsOf(es).localCheckpoint()
          graft.Checkpoints.retainFor(spark,
            graft.Checkpoints.pinnedSince(sc, beforeCkpt))
          frame
        }
        val candIds = ePosts.select("doc_id").distinct()
          .limit(CandidatePushdownLimit + 1).collect().map(_.getLong(0))
        val nePosts =
          if (candIds.length <= CandidatePushdownLimit)
            listsOf(ne).filter(col("doc_id").isin(candIds: _*))
          else
            listsOf(ne).join(ePosts.select("doc_id").distinct(),
              Seq("doc_id"), "left_semi")
        ePosts.unionByName(nePosts)
      }
    // purged docs are unrankable from the moment their tombstone commits
    // (round 16 — [[Tombstones]] step 2; no-op for unpurged indexes).
    // The filter lands BEFORE the rank tail so a purged doc cannot steal
    // a topN slot; surviving docs' SCORES still read the pre-bake df —
    // the documented transitional semantics, corrected at compaction.
    val scored = Tombstones.filter(spark, indexPath, rows)
      .join(broadcast(qts.map(q => (q.tok, q.df)).toDF("tok", "df")), Seq("tok"))
      .withColumn("n_docs", lit(nDocs))
      .withColumn("n_toks", lit(nToks))
    TextOps.bm25RankTail(TextOps.bm25S6(scored), topN)
  }
}
