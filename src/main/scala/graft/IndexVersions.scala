package graft

import org.apache.hadoop.fs.{FileSystem, Path}

/** The pieces of the versioned-artifact publish protocol shared by the
  * at-rest indexes ([[graft.vector.CellIndex]], [[graft.text.TextIndex]]):
  * the applied-batch tags ledger and the guarded atomic publish. Keeping
  * them in one place holds the protocol's invariants in one definition —
  * the two index-local copies had already drifted on the base-commit
  * check (round-8 review finding). */
object IndexVersions {

  /** Ledger file name — underscore-prefixed so parquet directory scans
    * ignore it. */
  val TagsFile = "_applied_tags"

  /** The full applied-batch ledger a version carries: the tag SET plus a
    * COUNT of untagged appends. The count closes the round-9 review hole
    * in cross-index pairing: both append APIs accept `tag = None`, and an
    * untagged append used to produce a new version with an IDENTICAL
    * ledger — two different corpus states [[graft.IndexPair]] could not
    * tell apart, so the resolver could silently pair a vector version
    * with a text version differing by the untagged batch (the exact
    * mixed-corpus outcome it exists to prevent). With the counter, ledger
    * equality again means corpus-state equality within a lineage: tagged
    * appends grow the set, untagged appends grow the counter, and a
    * RETRAIN (geometry change, same corpus) copies the ledger verbatim —
    * the one operation that must NOT perturb pairing. */
  final case class Ledger(tags: Set[String], untagged: Long) {
    def append(tag: Option[String]): Ledger = {
      // Reserved / malformed tag shapes fail loudly here as the backstop
      // (loud beats escaping — round-10 review finding).
      requireValidTag(tag)
      Ledger(tags ++ tag, untagged + (if (tag.isEmpty) 1L else 0L))
    }
  }
  object Ledger { val empty: Ledger = Ledger(Set.empty, 0L) }

  private val UntaggedLine = "#untagged:"

  /** Reject reserved/malformed tag shapes BEFORE an append does any work
    * (the [[Ledger.append]] require is the backstop; failing there would
    * strand a fully-assembled staging dir on a bad tag). Three shapes are
    * rejected, each of which would silently corrupt the ledger's
    * tag-set ⇒ corpus-state bijection (round-10 ADVICE finding):
    *  - '#'-prefixed: '#' opens ledger metadata lines, so the tag would be
    *    dropped on read (and could misparse as the untagged counter) —
    *    breaking the exactly-once replay guard for exactly that tag;
    *  - blank (`Some("")`): empty lines are filtered on read and the
    *    untagged counter is NOT bumped (the Option is non-empty), so the
    *    new version's ledger would be byte-identical to its
    *    predecessor's — reopening exactly the [[graft.IndexPair]] pairing
    *    ambiguity the untagged counter was added to close;
    *  - containing '\n'/'\r': the ledger is line-delimited, so the tag
    *    would split into two tags on read and never match a replay. */
  def requireValidTag(tag: Option[String]): Unit = tag.foreach { t =>
    require(!t.startsWith("#"),
      s"batch tag must not start with '#' (reserved for ledger metadata): $t")
    require(t.nonEmpty,
      "batch tag must not be blank — a blank tag writes a ledger " +
        "indistinguishable from its predecessor's (use tag = None for an " +
        "untagged append, which bumps the untagged counter)")
    require(!t.exists(c => c == '\n' || c == '\r'),
      s"batch tag must not contain newlines (the ledger is line-delimited): ${t.replace("\n", "\\n").replace("\r", "\\r")}")
  }

  /** The ledger rules PLUS directory safety, for artifacts whose tag
    * names a filesystem dir (DocStore batches, freq-table folds): '/'
    * would nest, and a LEADING '.' is catastrophic two ways — tag "."
    * normalizes to the batches root itself (publish would delete every
    * committed batch as an "uncommitted leftover"), and ".staging_*"
    * tags land where the crashed-staging TTL sweep deletes committed
    * data (round-11 review finding). */
  def requireDirSafeTag(tag: String): Unit = {
    requireValidTag(Some(tag))
    require(!tag.contains("/"),
      s"batch tag must be dir-safe (no '/'): '$tag'")
    require(!tag.startsWith("."),
      s"batch tag must not start with '.' ('.' resolves to the batches " +
        s"root and '.staging_*' collides with the TTL sweep): '$tag'")
    // 'untagged_' is RESERVED for the nonce dirs minted by untagged
    // appends (round-15 ADVICE fix): ClusterIndex.compact exempts those
    // nonces from its unfinished-fold guard, so a USER tag wearing the
    // prefix whose fold crashed between delta commit and labels publish
    // would be silently carried as applied while its docs never received
    // labels — the exact silent loss the guard exists to block.
    require(!tag.startsWith(UntaggedNoncePrefix),
      s"batch tag must not start with '$UntaggedNoncePrefix' (reserved " +
        s"for untagged-append nonce dirs): '$tag'")
  }

  /** The reserved prefix of nonce delta dirs minted by UNTAGGED appends
    * ([[graft.text.ClusterIndex.append]]): never a valid user tag
    * ([[requireDirSafeTag]]), so guard exemptions keyed on it cannot be
    * spoofed by a user-supplied tag. */
  val UntaggedNoncePrefix = "untagged_"

  /** True iff `tag` is a MINTED untagged-append nonce — the prefix plus
    * exactly 8 lowercase-hex chars, the only dir names permitted to wear
    * the reserved prefix (an internal mint passes [[appendTaggedBatch]];
    * every public append validates its USER tag with the full
    * [[requireDirSafeTag]] reservation first). */
  def isMintedNonce(tag: String): Boolean =
    tag.startsWith(UntaggedNoncePrefix) && {
      val h = tag.drop(UntaggedNoncePrefix.length)
      h.length == 8 && h.forall(c => (c >= '0' && c <= '9') ||
        (c >= 'a' && c <= 'f'))
    }

  def readLedger(fs: FileSystem, dir: Path): Ledger = {
    val p = new Path(dir, TagsFile)
    if (!fs.exists(p)) Ledger.empty
    else {
      val in = fs.open(p)
      try {
        val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .filter(_.nonEmpty).toSeq
        Ledger(lines.filterNot(_.startsWith("#")).toSet,
          lines.collectFirst { case l if l.startsWith(UntaggedLine) =>
            l.stripPrefix(UntaggedLine).toLong }.getOrElse(0L))
      } finally in.close()
    }
  }

  def writeLedger(fs: FileSystem, dir: Path, ledger: Ledger): Unit = {
    val out = fs.create(new Path(dir, TagsFile), true)
    val lines = ledger.tags.toSeq.sorted ++
      (if (ledger.untagged > 0) Seq(s"$UntaggedLine${ledger.untagged}") else Nil)
    try out.write(lines.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  def readTags(fs: FileSystem, dir: Path): Set[String] =
    readLedger(fs, dir).tags

  def writeTags(fs: FileSystem, dir: Path, tags: Set[String]): Unit =
    writeLedger(fs, dir, Ledger(tags, 0L))

  /** Atomic publish with a LOST-UPDATE guard (round-8 review finding): a
    * target that is already COMMITTED means a concurrent publisher won the
    * race for this version number — deleting it would silently erase that
    * publisher's batch AND its ledger tags, so refuse instead (the caller
    * may re-read versions and retry on the next number). Only an
    * UNCOMMITTED leftover (a crashed earlier rename target) is replaced.
    * The rename result is checked — a false return (possible on HDFS) must
    * not be reported as success. */
  /** No-op fence for publishes outside any lease (direct builds, tests,
    * single-writer backfills — the documented default operating model). */
  val NoFence: () => Unit = () => ()

  def publish(fs: FileSystem, staging: Path, target: Path,
      committed: Path => Boolean, fence: () => Unit = NoFence): Unit = {
    // FENCING CHECK (round 11): a lease-holding caller passes a fence
    // bound to its acquisition epoch ([[checkFence]]); a writer whose
    // lease was stolen mid-assembly — the stop-the-world-pause-past-TTL
    // residual every heartbeat lease carries — fails HERE, before the
    // rename, instead of racing the new holder for the version number.
    // The staging dir is dropped on a fenced attempt: a demoted writer's
    // assembly must not linger for the TTL sweep to misread.
    try fence() catch {
      case e: Throwable => fs.delete(staging, true); throw e
    }
    if (fs.exists(target)) {
      if (committed(target)) {
        fs.delete(staging, true)
        throw new IllegalStateException(
          s"$target is already committed — concurrent publish detected; " +
            "re-resolve the current version and retry")
      }
      fs.delete(target, true)
    }
    require(fs.rename(staging, target),
      s"atomic publish failed: rename $staging -> $target returned false")
    // the exists-check/rename window is not atomic, and HDFS rename into a
    // directory that appeared in between MOVES THE SOURCE INSIDE IT and
    // returns true — the losing publisher would report success while its
    // data sat nested and unread. Detect that shape and fail loudly: a
    // silent lost update is the one outcome this protocol must not allow.
    if (fs.exists(new Path(target, staging.getName))) {
      fs.delete(new Path(target, staging.getName), true)
      throw new IllegalStateException(
        s"concurrent publish raced the rename of $target — this attempt " +
          "lost; re-resolve the current version and retry")
    }
  }

  /** Crashed staging assemblies older than this are garbage (far beyond
    * any append's assembly time). */
  val StagingTtlMs: Long = 60L * 60 * 1000

  /** TAG-COMMITTED BATCH-DIR APPEND — the add-only fold protocol shared
    * by [[graft.text.DocStore.append]],
    * [[graft.analytics.Relational.appendFreqSketches]] and
    * [[graft.text.Dedup.appendGramLedger]] (round-11 review: the first
    * two carried the protocol verbatim-duplicated, so the hardening fixes
    * embedded in it — dot exclusion, fence re-check in catch — could
    * drift apart on the next edit; ONE definition holds them).
    *
    * Protocol: dir-safe tag rules → committed-tag SHORT-CIRCUIT (returns
    * false; an at-least-once replay adds nothing) → TTL sweep of crashed
    * `.staging_*` assemblies under `batchesRoot` (this append's to
    * reclaim — no version vacuum visits a batches root) → staging write
    * via `writeStaging` (called with the nonce-unique staging dir; runs
    * ONLY when work is actually needed, so a replay never re-reads
    * layout scalars) → fenced guarded-rename [[publish]]. A lost
    * SAME-TAG race returns false like a replay — batch content is
    * deterministic, so the winner's commit IS this batch — but only
    * AFTER re-checking the fence: a demoted writer must fail loudly at
    * its first fenced mutation even when the new holder already
    * committed this tag, else the zombie continues folding the rest of
    * the artifact set (round-11 review finding). `committedMarker` is
    * the path inside a batch dir whose existence marks commit
    * ("rows/_SUCCESS" for the doc store's nested layout, "_SUCCESS" for
    * flat parquet tables). */
  def appendTaggedBatch(fs: FileSystem, batchesRoot: Path, tag: String,
      committedMarker: String, fence: () => Unit = NoFence)(
      writeStaging: Path => Unit): Boolean = {
    // a MINTED untagged nonce is an internal dir name, exempt from the
    // user-tag reservation (which every public append enforces at entry);
    // anything else wearing the prefix is rejected here as everywhere
    if (!isMintedNonce(tag)) requireDirSafeTag(tag)
    def committed(p: Path) = fs.exists(new Path(p, committedMarker))
    val target = new Path(batchesRoot, tag)
    if (committed(target)) return false
    if (fs.exists(batchesRoot)) {
      val cutoff = System.currentTimeMillis() - StagingTtlMs
      fs.listStatus(batchesRoot)
        .filter(s => s.getPath.getName.startsWith(".staging_") &&
          s.getModificationTime < cutoff)
        .foreach(s => fs.delete(s.getPath, true))
    }
    val staging = new Path(batchesRoot,
      s".staging_${tag}_${java.util.UUID.randomUUID().toString.take(8)}")
    writeStaging(staging)
    try { publish(fs, staging, target, committed, fence); true }
    catch {
      case e: Exception =>
        fence()
        if (committed(target)) false else throw e
    }
  }

  /** Committed batch tags under a [[appendTaggedBatch]] root. Dot-dirs
    * are EXCLUDED — a staging assembly whose Spark write finished
    * carries the marker before the publish rename, and listing it as
    * committed would double every row of an in-flight (or crashed)
    * batch; valid tags can never start with '.'
    * ([[requireDirSafeTag]]). */
  def committedBatchTags(fs: FileSystem, batchesRoot: Path,
      committedMarker: String): Set[String] =
    if (!fs.exists(batchesRoot)) Set.empty
    else fs.listStatus(batchesRoot).filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(t => !t.startsWith(".") &&
        fs.exists(new Path(batchesRoot, s"$t/$committedMarker"))).toSet

  // ---- compacted GENERATIONS for tag-committed batch-dir artifacts -------

  /** COMPACTED-GENERATION RESOLUTION (round 13 — the delta-chain
    * compaction the add-only artifacts lacked): a tag-committed batch-dir
    * artifact (DocStore, freq table, gram ledger, ClusterIndex) grows one
    * delta dir per fold for the stream's lifetime; correct by protocol,
    * but after thousands of folds the reader's listing/union cost
    * degrades exactly the way the sketch tables' file counts did before
    * their compaction. The fix is the [[graft.text.Dedup.compactGramLedger]]
    * pattern — fold committed deltas into a fresh base, CARRY THE APPLIED
    * TAGS FORWARD as empty committed deltas (the tags ARE the
    * exactly-once replay ledger; additive artifacts would silently
    * double-count a forgotten tag's replay) — made IN-PLACE TRIGGERABLE:
    * instead of a fresh path the deployment must swap by external
    * indirection, the compacted layout publishes as a GENERATION dir
    * `_g<N>/` under the artifact root (underscore-prefixed so the base
    * table's own parquet listing never sees it; explicit roots read
    * fine — the `_batches` convention), via the same staging-nonce +
    * guarded-rename [[publish]] every version chain here uses. The root
    * itself is generation 0. Readers and appenders resolve the NEWEST
    * committed generation and operate entirely within it; old
    * generations persist for in-flight readers until
    * [[vacuumGenerations]] (the version-chain grace contract).
    *
    * `markerRel` is the path inside a generation root whose existence
    * marks commit — the SAME marker the artifact's base build writes last
    * ("stats/_SUCCESS" for the doc store / gram ledger / cluster index,
    * "_SUCCESS" for the flat freq table). */
  def committedGenerations(fs: FileSystem, root: Path,
      markerRel: String): Seq[Long] = {
    if (!fs.exists(root)) return Seq.empty
    val gens = fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("_g") && n.stripPrefix("_g").nonEmpty &&
        n.stripPrefix("_g").forall(_.isDigit))
      .filter(n => fs.exists(new Path(root, s"$n/$markerRel")))
      .map(_.stripPrefix("_g").toLong)
    val base =
      if (fs.exists(new Path(root, markerRel))) Seq(0L) else Seq.empty
    (base ++ gens).sorted
  }

  def generationRoot(root: Path, g: Long): Path =
    if (g == 0L) root else new Path(root, s"_g$g")

  /** The generation root readers and appenders resolve: the newest
    * committed generation (the artifact root itself until the first
    * compaction). */
  def currentGeneration(fs: FileSystem, root: Path, markerRel: String): Path = {
    val gens = committedGenerations(fs, root, markerRel)
    require(gens.nonEmpty, s"no committed artifact under $root")
    generationRoot(root, gens.max)
  }

  /** TEST SEAM for the generation-race spec: invoked once per
    * [[withGeneration]] resolution with the resolved root, AFTER the
    * generation is pinned and BEFORE the caller's body reads it — the
    * exact window the round-13 TOCTOU class lived in. Production leaves
    * it a no-op; GenerationRaceSpec installs a hook that lands an
    * in-chain compaction in the window and asserts every artifact's
    * multi-step reads still serve ONE consistent generation. */
  @volatile private[graft] var onGenerationResolved: String => Unit = _ => ()

  /** RESOLVE-ONCE GENERATION COMBINATOR (round 14 — the round-13 TOCTOU
    * fix made STRUCTURAL, per that round's review): every maintained
    * artifact's multi-step read must resolve the current generation
    * exactly once and derive every path it touches from that root —
    * resolving twice lets a concurrent in-chain compaction flip the
    * generation in between, so a reader mixes the old base with the new
    * generation's (empty) delta set: dropped docs from served pages,
    * lost delta grams, undercounted CMS. Round 13 fixed that with
    * per-artifact `At`-suffixed helper conventions; nothing stopped the
    * next read path from calling its artifact's resolver twice again.
    * This combinator is the one place resolution happens: the four
    * artifacts' resolvers are thin wrappers over it, the [[onGenerationResolved]]
    * seam makes the resolved→read window testable, and a new read path
    * written as `withGeneration(...) { gen => … }` cannot re-resolve
    * without visibly stepping outside the block.
    *
    * `requireCommitted = false` resolves an absent/uncommitted artifact
    * to the root itself (build paths probe before writing — the
    * ClusterIndex convention); the default refuses loudly. */
  def withGeneration[T](fs: FileSystem, root: Path, markerRel: String,
      requireCommitted: Boolean = true)(body: Path => T): T = {
    val gens = committedGenerations(fs, root, markerRel)
    require(!requireCommitted || gens.nonEmpty,
      s"no committed artifact under $root")
    val gen = if (gens.isEmpty) root else generationRoot(root, gens.max)
    onGenerationResolved(gen.toString)
    body(gen)
  }

  /** The shared micro-batch size bound for FORCED broadcast hints in the
    * maintenance rewrites ([[graft.text.Dedup.rewriteBatchAgainstLedger]],
    * [[graft.text.ClusterIndex.append]]): a real streaming batch is far
    * under it, so its gram/band set broadcasts; a bulk backfill handed to
    * the same entry point degrades to the shuffle join instead of dying
    * at driver maxResultSize (AQE converts back at runtime when the built
    * side turns out small). ONE definition so the two call sites cannot
    * drift. */
  val MicroBatchMaxDocs: Long = 100000L

  /** Publish the next compacted generation: `writeLayout` assembles the
    * artifact's FULL layout (merged base + carried-tag empty deltas +
    * stats) in a dot-staging dir, then the guarded rename commits `_g<N>`
    * atomically — a crash mid-assembly leaves only a TTL-sweepable
    * staging dir, readers never observe a partial generation, and a lost
    * race to a concurrent compactor refuses loudly (the [[publish]]
    * contract). OPERATING MODEL: compaction runs under the artifact's
    * maintenance lease (single live writer — the fold jobs' model), so it
    * never races an append for the generation number; the fence makes a
    * paused-past-TTL zombie fail at the rename. */
  def publishGeneration(fs: FileSystem, root: Path, markerRel: String,
      fence: () => Unit = NoFence)(writeLayout: Path => Unit): Path = {
    // an empty generation list is legal here (a version-chain artifact
    // whose base/v0 was vacuumed has no root-level marker yet still
    // compacts); artifact-absent misuse fails earlier, in the caller's
    // own reads
    val gens = committedGenerations(fs, root, markerRel)
    val next = if (gens.isEmpty) 1L else gens.max + 1
    val target = new Path(root, s"_g$next")
    val staging = new Path(root,
      s".staging_g${next}_${java.util.UUID.randomUUID().toString.take(8)}")
    writeLayout(staging)
    publish(fs, staging, target,
      t => fs.exists(new Path(t, markerRel)), fence)
    target
  }

  /** Carry an artifact's applied batch tags into a compacted generation
    * as the generation's `_applied_tags` LEDGER FILE (the version-chain
    * ledger reused at the generation root) — NOT as empty delta dirs:
    * one dir per carried tag would keep the reader's per-tag
    * listing/union cost growing with TOTAL fold count after compaction,
    * the exact degradation compaction exists to remove. Folded tags'
    * rows live in the merged base; the file records only their replay
    * short-circuit. Forgetting a tag here would re-fold its batch on the
    * next at-least-once replay; for additive artifacts (doc rows, CMS
    * counts, gram n_occ) that double would be silent — which is why the
    * tags ride INSIDE the generation, committed by the same rename.
    *
    * The artifact's applied-tag view is then
    * [[committedBatchTags]] (live post-compaction delta dirs) ∪
    * [[carriedTags]] (this file); its READERS layer only the former. */
  def carryTagsForward(fs: FileSystem, genRoot: Path,
      tags: Set[String]): Unit = {
    tags.foreach(requireDirSafeTag)
    writeLedger(fs, genRoot, Ledger(tags, 0L))
  }

  /** Tags a compacted generation carries in its ledger file (empty for a
    * never-compacted root). */
  def carriedTags(fs: FileSystem, genRoot: Path): Set[String] =
    readLedger(fs, genRoot).tags

  /** Drop committed generations beyond the newest `keepLast` (floored at
    * one — generation 0's dirs are the artifact root's own layout and are
    * deliberately NOT deleted: the root IS the artifact; only `_g<N>`
    * dirs vacuum), honoring the version-chain `graceMs` read-duration
    * contract, then sweep crashed `.staging_*` assemblies (shared
    * [[vacuum]] mechanics). */
  def vacuumGenerations(fs: FileSystem, root: Path, markerRel: String,
      keepLast: Int = 2, graceMs: Long = 0L): Seq[String] = {
    val gens = committedGenerations(fs, root, markerRel).filter(_ > 0L)
    val removed = vacuum(fs, root, gens, v => Seq(s"_g$v"), keepLast, graceMs,
      dirOwner = {
        case n if n.startsWith("_g") && n.stripPrefix("_g").nonEmpty &&
          n.stripPrefix("_g").forall(_.isDigit) =>
          Some(n.stripPrefix("_g").toLong)
        case _ => None
      },
      relist = () => committedGenerations(fs, root, markerRel).filter(_ > 0L))
    // GENERATION 0 — the root's own layout — is reclaimed too once newer
    // generations push it past the retention floor (round-13 review
    // finding: never deleting it left the full pre-compaction corpus —
    // at the 1000× tier, half the artifact's bytes — as permanent dead
    // weight after the first compaction). Every root child except the
    // `_g<N>` generation dirs, TTL-swept staging, and the WRITER LEASE
    // is generation-0 data (rows/grams/sigs, delta dirs, the tag ledger
    // file, the commit marker), so the sweep is artifact-agnostic. The
    // lease file is PROTOCOL state, not generation data (round-14 ADVICE
    // finding): the fold jobs vacuum under their own root-level lease, so
    // sweeping it here made the active writer delete its own live lease
    // at the second compaction — epoch counter reset to 1 (re-validating
    // that writer's stale fencing tokens) and a parked standby's next
    // poll acquired over the live primary: two live writers on one
    // artifact, the exact split-brain the lease exists to prevent.
    // The TOMBSTONES dir is protocol state too (round 16 — the purge
    // ledger: deltas carry doc ids the READER FILTER and the next bake
    // still need; sweeping them as "generation-0 data" would silently
    // resurrect purged docs on every serving path). Its deltas retire
    // only through their own bake-aware vacuum
    // ([[graft.text.Tombstones.vacuumBaked]]).
    // Grace is measured from
    // when generation 0 was SUPERSEDED (the oldest surviving newer
    // generation's commit-marker mtime) — the dirs' own mtimes predate
    // the compaction by the stream's whole lifetime and would defeat the
    // in-flight-reader grace the vacuum contract promises.
    val allGens = committedGenerations(fs, root, markerRel)
    val newer = allGens.filter(_ > 0L)
    val gen0Removed =
      if (allGens.contains(0L) && newer.size >= math.max(keepLast, 1)) {
        val supersededAt = fs.getFileStatus(
          new Path(generationRoot(root, newer.min), markerRel))
          .getModificationTime
        if (graceMs <= 0L ||
            System.currentTimeMillis() - supersededAt >= graceMs)
          fs.listStatus(root).toSeq.map(_.getPath)
            .filterNot(p => p.getName.startsWith("_g") ||
              p.getName.startsWith(".staging_") ||
              p.getName == LeaseFile || p.getName == TombstonesDir)
            .map { p => fs.delete(p, true); p.toString }
        else Seq.empty
      } else Seq.empty
    removed ++ gen0Removed
  }

  /** Writer-lease file name (underscore-prefixed — invisible to parquet
    * scans, ignored by [[vacuum]]'s dirOwner maps). */
  val LeaseFile = "_writer_lease"

  /** Tombstone-ledger dir name ([[graft.text.Tombstones]] owns the
    * protocol; the constant lives here so [[vacuumGenerations]]'s gen-0
    * sweep can spare it without a downward package dependency). */
  val TombstonesDir = "_tombstones"

  /** WRITER LEASE (round 10 — the enforcement the single-live-writer
    * OPERATING MODEL lacked): a heartbeat file at the index root naming
    * the live maintenance writer. [[acquireLease]] succeeds when the file
    * is absent, names this owner (renewal — the heartbeat is the file's
    * mtime, refreshed by rewriting), or has gone stale past `ttlMs`
    * (steal — the previous writer is presumed dead). A second live
    * stream that fails to acquire should PARK its batch (skip, retry
    * next trigger) instead of burning a doomed append per batch against
    * the guarded rename.
    *
    * COORDINATION, NOT CORRECTNESS: plain filesystem create/overwrite is
    * not compare-and-swap, so two writers racing the same expired lease
    * can both believe they won for one batch — and that is fine, because
    * the per-attempt staging + guarded-rename publish remains the
    * correctness backstop (the loser of THAT race still throws loudly
    * and no committed data is disturbed). The lease turns sustained
    * dual-writer contention into quiet parking; it never replaces the
    * publish guard.
    *
    * FENCING EPOCHS (round 11): each ACQUIRE — fresh, steal, or a
    * holder's own per-batch re-acquire — bumps a counter stored in the
    * lease file; background HEARTBEATS ([[heartbeat]]) renew the mtime
    * only while the file still carries the renewer's exact
    * (owner, epoch) and never bump. The pair is a fencing token: a
    * mutation guarded by [[checkFence]] (threaded into [[publish]] as
    * its `fence`) fails loudly once ANY later acquisition exists —
    * including a steal from a writer paused stop-the-world past the TTL,
    * the residual window a heartbeat lease otherwise leaves to the
    * publish guard alone, and a same-owner successor incarnation (each
    * batch fences against its OWN acquisition, not its identity). The
    * check-to-rename window is milliseconds instead of a fold; the
    * guarded rename stays the backstop inside it. [[releaseLease]]
    * deletes the file, resetting the counter — sound under EQUALITY
    * fencing because release only runs at writer termination: a token
    * colliding with a post-release re-acquire would need the same owner
    * string, and every identity scheme here ([[DefaultOwner]] pid,
    * [[streamOwner]] nonce, [[checkpointOwner]] + Spark's one-query-per-
    * checkpoint rule) makes same-owner = same logical writer. */
  /** The lease file's (holder, epoch, mtime), or None when absent —
    * including when it VANISHES between the existence check and the read
    * (a concurrent releaseLease; treating that as absent keeps the
    * acquire/release paths exception-free under the one benign race the
    * protocol allows — round-10 review finding). Legacy single-line
    * files (pre-epoch) read as epoch 0.
    *
    * ABSENT-OR-BLANK READS RETRY briefly (round-11 review finding):
    * [[writeLease]] is a plain create(overwrite), so a reader racing an
    * acquire's rewrite can observe the file momentarily absent or
    * truncated. Concluding "absent" from that window would let a parked
    * writer's poll acquire OVER a live holder with the epoch counter
    * reset — so a vanished/blank read is only believed once it is
    * stable across three spaced attempts. releaseLease's genuine delete
    * stays correctly observable (stable across the retries). */
  private def readLease(fs: FileSystem, p: Path): Option[(String, Long, Long)] = {
    def once(): Option[(String, Long, Long)] =
      try {
        if (!fs.exists(p)) None
        else {
          val st = fs.getFileStatus(p)
          val in = fs.open(p)
          val lines =
            try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
            finally in.close()
          val holder = lines.headOption.getOrElse("").trim
          val epoch = lines.drop(1).headOption
            .flatMap(l => scala.util.Try(l.trim.toLong).toOption).getOrElse(0L)
          Some((holder, epoch, st.getModificationTime))
        }
      } catch { case _: java.io.FileNotFoundException => None }
    var attempt = once()
    var retries = 2
    while (retries > 0 && !attempt.exists(_._1.nonEmpty)) {
      Thread.sleep(25L)
      attempt = once()
      retries -= 1
    }
    attempt.filter(_._1.nonEmpty)
  }

  private def writeLease(fs: FileSystem, p: Path, owner: String,
      epoch: Long): Unit = {
    val out = fs.create(p, true)
    try out.write(s"$owner\n$epoch".getBytes("UTF-8")) finally out.close()
  }

  /** Acquire (or re-acquire) the writer lease, returning the FENCING
    * TOKEN — this acquisition's epoch — or None while a live other
    * holds it. Every successful call bumps the epoch: the token names
    * one acquisition, not one owner, so a holder's own next batch
    * invalidates tokens its previous batch minted (each batch fences
    * its own publishes with its own acquire). */
  def acquireLeaseEpoch(fs: FileSystem, root: Path, owner: String,
      ttlMs: Long): Option[Long] = {
    val p = new Path(root, LeaseFile)
    val won = readLease(fs, p) match {
      case Some((holder, _, mtime))
          if holder != owner && System.currentTimeMillis() - mtime < ttlMs =>
        None
      case Some((_, epoch, _)) =>
        writeLease(fs, p, owner, epoch + 1); Some(epoch + 1)
      case None =>
        writeLease(fs, p, owner, 1L); Some(1L)
    }
    // POST-WRITE VERIFY (round-11 review): two writers racing one expired
    // lease can both write; the file keeps the LAST. Re-reading converts
    // the first writer's "I won" into an immediate park instead of a
    // wasted fold that the fence kills at its first mutation — an
    // availability narrowing; the fence remains the correctness point
    // (a race landing between this verify and the caller's first fence
    // is caught there).
    won.filter(e => readLease(fs, p).exists {
      case (h, pe, _) => h == owner && pe == e
    })
  }

  def acquireLease(fs: FileSystem, root: Path, owner: String,
      ttlMs: Long): Boolean =
    acquireLeaseEpoch(fs, root, owner, ttlMs).isDefined

  /** Renew the lease's mtime WITHOUT bumping the epoch, iff the file
    * still carries exactly (owner, epoch) — the background-heartbeat
    * primitive. A false return means this acquisition is no longer
    * current (stolen, released, or superseded by the owner's own later
    * acquire).
    *
    * Renewal is METADATA-ONLY (`setTimes`), never a content rewrite
    * (round-11 review finding): a content-rewriting heartbeat has a
    * read-check-write race in which a tick that read its own (owner,
    * epoch), then stalled past the TTL while a thief wrote a higher
    * epoch, lands its stale bytes LAST — rolling the epoch back,
    * resurrecting the fenced writer, and fencing out the rightful new
    * holder. With setTimes the worst a stale tick can do is refresh the
    * CURRENT lease's mtime by one interval (briefly extending a thief's
    * steal window) — content, holder, and every issued fencing token
    * stay exactly as the last ACQUIRE wrote them. The check-to-setTimes
    * race is benign for the same reason. On stores without setTimes the
    * thrown error is swallowed by [[withHeartbeat]]'s tick guard — such
    * deployments need a CAS lease anyway (documented). */
  def heartbeat(fs: FileSystem, root: Path, owner: String,
      epoch: Long): Boolean = {
    val p = new Path(root, LeaseFile)
    readLease(fs, p) match {
      case Some((h, e, _)) if h == owner && e == epoch =>
        fs.setTimes(p, System.currentTimeMillis(), -1); true
      case _ => false
    }
  }

  /** Throw unless the lease at `root` still carries exactly
    * (owner, epoch) — the fence a lease-holding writer threads into
    * [[publish]] (and any other non-idempotent mutation). Failing means
    * the acquisition that authorized this work is no longer current:
    * stop, drop staged work, re-acquire before retrying. */
  def checkFence(fs: FileSystem, root: Path, owner: String,
      epoch: Long): Unit = {
    val cur = readLease(fs, new Path(root, LeaseFile))
    if (!cur.exists { case (h, e, _) => h == owner && e == epoch })
      throw new IllegalStateException(
        s"writer lease fenced: $owner@$epoch is no longer the current " +
          s"acquisition on $root (now: ${cur.map { case (h, e, _) =>
            s"$h@$e" }.getOrElse("<absent>")}) — the lease was stolen or " +
          "re-acquired mid-operation; this writer must abandon its work")
  }

  /** Writer identity for DIRECT single-caller use (one logical writer
    * per process — tests, replay drivers, backfills). Streaming sinks
    * must NOT share it across instances: use [[streamOwner]] (per-stream
    * nonce — two sinks in one JVM must not renew each other's lease) or
    * a checkpoint-derived stable identity ([[checkpointOwner]] — a
    * restarted stream renews its own lease instead of self-contending
    * with its dead incarnation for a TTL). One definition for every
    * lease-guarded job (round-11 review: the trio had duplicated). */
  val DefaultOwner: String = s"pid-${ProcessHandle.current().pid()}"
  val DefaultLeaseTtlMs: Long = 10L * 60 * 1000

  /** A fresh per-stream writer identity (evaluated once per sink start).
    * Right when distinct instances over one resource must contend (the
    * index-maintenance primary/standby model — both share a checkpoint,
    * so a checkpoint identity would let a standby impersonate the
    * primary). */
  def streamOwner(): String =
    s"$DefaultOwner-${java.util.UUID.randomUUID().toString.take(8)}"

  /** A STABLE writer identity derived from the stream's checkpoint path.
    * Spark forbids two concurrent queries on one checkpoint, so this is
    * unique per live sink — and stable across restarts, which makes a
    * redeployed stream's first acquire a RENEWAL instead of a TTL-long
    * self-contention with its dead incarnation's lease (round-11 review
    * finding). Right when there is no standby model over the resource. */
  def checkpointOwner(checkpoint: String): String =
    "ckpt-" + java.security.MessageDigest.getInstance("MD5")
      .digest(checkpoint.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)

  /** Run `body` with a BACKGROUND HEARTBEAT renewing this acquisition's
    * lease every ttlMs/3 (round-11 review finding): the per-batch-start
    * heartbeat alone goes stale during any single operation longer than
    * the TTL — a fold plus an advisor-triggered retrain easily is — and
    * a standby would then steal from a LIVE primary and start a second
    * streaming query against the shared checkpoint. The heartbeat
    * thread is a daemon holding no locks: a crashed or killed JVM stops
    * heartbeating and the lease expires normally. Renewal goes through
    * [[heartbeat]] — mtime only, epoch untouched, and it STOPS renewing
    * the moment the acquisition is no longer current (a bumping renewal
    * would invalidate the fold's own fencing token; an unconditional
    * rewrite would hide a theft from the thief). The remaining steal
    * window is a stop-the-world pause longer than the TTL — inherent to
    * every lease protocol; the epoch fence at publish time, then the
    * guarded rename, catch that case. Renewal failures are swallowed
    * (transient FS errors must not kill the fold); the next tick
    * retries. */
  def withHeartbeat[T](fs: FileSystem, root: Path, owner: String,
      ttlMs: Long, epoch: Long)(body: => T): T = {
    val interval = math.max(ttlMs / 3, 100L)
    @volatile var stop = false
    val t = new Thread(() => {
      while (!stop) {
        try Thread.sleep(interval)
        catch { case _: InterruptedException => () }
        if (!stop) {
          try { heartbeat(fs, root, owner, epoch); () }
          catch { case _: Throwable => () }
        }
      }
    }, s"graft-lease-heartbeat-$owner")
    t.setDaemon(true)
    t.start()
    try body finally { stop = true; t.interrupt(); t.join(2000) }
  }

  /** Drop the lease if this owner holds it (clean shutdown — a crashed
    * writer's lease simply expires). */
  def releaseLease(fs: FileSystem, root: Path, owner: String): Unit = {
    val p = new Path(root, LeaseFile)
    if (readLease(fs, p).exists(_._1 == owner))
      try { fs.delete(p, false); () }
      catch { case _: java.io.FileNotFoundException => () }
  }

  /** Shared VACUUM for every versioned index layout (round-9 review
    * finding: three near-verbatim copies had grown back — the drift this
    * file exists to prevent). Drops committed versions beyond the newest
    * `keepLast` (floored at one), honoring the `graceMs` read-duration
    * contract (versions newer than graceMs by the mtime of their FIRST
    * listed dir are retained regardless of count), then sweeps crashed
    * `.staging_*` assemblies older than [[StagingTtlMs]].
    *
    * `versionDirs(v)` names the dirs that constitute version v — one
    * entry for `v<N>`-style dirs, several for a base layout whose
    * artifacts sit beside them. List the COMMIT-MARKER dir first: it is
    * both the grace probe (written last at build, so its mtime is the
    * conservative one) and the first deletion, so a crash mid-vacuum
    * leaves an uncommitted-looking remnant rather than a marker with
    * missing data dirs.
    *
    * `dirOwner(name)` maps a root-child dir name to the version it
    * belongs to (None = not a version artifact — codebooks, lease files,
    * foreign dirs stay untouched). It closes the crash-mid-vacuum strand
    * (round-9 review finding): deleting the marker dir first makes a
    * half-vacuumed version UNCOMMITTED, so its surviving data dirs (e.g.
    * a multi-dir base layout's postings/dfreq after stats went) were
    * permanently unreclaimable — not `.staging_`, not a committed
    * version, invisible to every later pass. Now any artifact dir whose
    * owning version is not committed is swept once older than
    * [[StagingTtlMs]] — the same TTL that keeps an IN-PROGRESS base
    * build (which writes data dirs before its marker, in place) safe
    * from a concurrent vacuum, provided builds complete within the TTL.
    *
    * `relist()` re-reads the committed-version list IMMEDIATELY before
    * the stranded sweep deletes anything (round-10 ADVICE finding): a
    * base build or append whose assembly exceeded the TTL and COMMITTED
    * during this vacuum would otherwise have its just-committed dirs
    * deleted against the stale `versions` snapshot taken at entry —
    * silent data loss resting on the "builds finish within the TTL"
    * assumption. Re-listing narrows the TOCTOU window from
    * [vacuum-entry, sweep] to milliseconds. Defaults to the snapshot for
    * callers that cannot re-list. */
  def vacuum(fs: FileSystem, root: Path, versions: Seq[Long],
      versionDirs: Long => Seq[String], keepLast: Int,
      graceMs: Long, dirOwner: String => Option[Long] = _ => None,
      relist: () => Seq[Long] = null): Seq[String] = {
    val now = System.currentTimeMillis()
    def oldEnough(p: Path): Boolean = graceMs <= 0L ||
      now - fs.getFileStatus(p).getModificationTime >= graceMs
    val removed = versions.dropRight(math.max(keepLast, 1))
      .filter(v => oldEnough(new Path(root, versionDirs(v).head)))
      .flatMap(v => versionDirs(v).map { d =>
        val p = new Path(root, d); fs.delete(p, true); p.toString
      })
    val committed = versions.toSet
    val children = fs.listStatus(root).toSeq
    val staleStaging = children
      .filter(_.getPath.getName.startsWith(".staging_"))
      .filter(s => now - s.getModificationTime >= StagingTtlMs)
      .map { s => fs.delete(s.getPath, true); s.getPath.toString }
    val strandedCandidates = children
      .filter(s => dirOwner(s.getPath.getName).exists(v => !committed.contains(v)))
      .filter(s => now - s.getModificationTime >= StagingTtlMs)
      .filter(s => fs.exists(s.getPath)) // a removed version's dirs are gone already
    // re-list committed versions just before deleting — a build that
    // outlived the TTL may have committed since the entry snapshot
    val committedNow =
      if (strandedCandidates.isEmpty) committed
      else if (relist == null) committed
      else relist().toSet
    val stranded = strandedCandidates
      .filter(s => dirOwner(s.getPath.getName).exists(v => !committedNow.contains(v)))
      .map { s => fs.delete(s.getPath, true); s.getPath.toString }
    removed ++ staleStaging ++ stranded
  }
}
