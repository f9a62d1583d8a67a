package graft

import org.apache.spark.sql.SparkSession

/** Cross-index SNAPSHOT consistency for hybrid retrieval.
  *
  * [[graft.app.IndexMaintenanceJob]] folds each micro-batch into the
  * vector index and the text index as two separate publishes — correct
  * per index (each is atomic, versioned, exactly-once by tag), but a
  * hybrid query that resolves "current" on both independently can land
  * BETWEEN them: dense arm served from a corpus state that already
  * contains batch N, lexical arm from one that doesn't (or, after a crash
  * between the two folds, indefinitely until the replay). Fused ranks
  * then compare scores computed over different document sets.
  *
  * The fix needs no new protocol: both indexes already publish an
  * applied-batch LEDGER atomically with every version. Two versions
  * describe the same corpus state iff their ledgers are EQUAL — same
  * base lineage, same folded tagged batches, and (round-10) the same
  * COUNT of untagged appends: tag sets and the untagged counter only
  * grow within a lineage, so full-ledger equality is a proper
  * synchronization point even when a caller appended without a tag
  * (tag-set equality alone could not distinguish that state from the
  * one before the untagged batch). [[consistentRoots]] resolves the
  * NEWEST such pair; serving functions accept the pinned roots so one
  * resolution covers the whole query (the same resolve-once rule each
  * index applies internally). A retrain/cutover version copies its
  * predecessor's ledger verbatim — geometry changed, corpus did not —
  * so pairing survives a codebook swap by construction.
  *
  * Assumes both indexes were built from the same base corpus and
  * maintained by the same batch stream (the IndexMaintenanceJob model —
  * base versions carry empty ledgers and therefore pair with each other).
  */
object IndexPair {

  /** The N-ARTIFACT resolver (round 15 — the r14 verdict's task #2: the
    * pair resolvers closed the mid-publish window for fusion, but a
    * composite reader touching MORE artifacts — curation's cluster
    * labels + benchmark grams, the media page's phrase index + doc
    * store — resolving each independently could still mix corpus
    * states). Generalizes the pair rule two ways:
    *
    *  - `versioned` artifacts each supply their committed version list
    *    with ledgers; a candidate corpus state is admissible iff EVERY
    *    versioned list has a version with an EQUAL ledger (the existing
    *    equality rule — tag sets and the untagged counter only grow
    *    within a lineage, so equality is a proper synchronization
    *    point). The walk maximizes the FIRST list's version, then each
    *    subsequent list's.
    *  - `addOnly` artifacts (doc store, benchmark gram set — base + one
    *    delta dir per tag, no version chain) supply their committed tag
    *    set; they can serve any state whose tags are a SUBSET of that
    *    set (read base + exactly those deltas, or — for id-keyed
    *    fetches — the full set, which covers every subset). A candidate
    *    is admissible iff its tags ⊆ each add-only set and it carries
    *    NO untagged appends: an untagged versioned fold has no
    *    identifiable add-only counterpart, so no provably-synchronized
    *    composite state exists (maintenance flows always tag — the
    *    documented contract). Because the untagged counter only grows,
    *    one untagged append pins the resolution PERMANENTLY at the last
    *    all-tagged state — detected and reported on the loud channel
    *    every resolution ([[onPoisonedResolution]]; round-16 ADVICE
    *    fix) rather than served silently.
    *
    * Returns the resolved roots (aligned with `versioned`) plus the
    * agreed ledger — callers pin add-only reads to `ledger.tags`.
    * Throws if no committed tuple agrees (unrelated lineages — serving
    * a mixed corpus would be silently wrong, the one thing this
    * resolver exists to prevent). */
  /** Loud channel for the PERMANENT-staleness detection below (a spec
    * seam like [[IndexVersions.onGenerationResolved]]; the production
    * default writes to stderr — the repo's operator channel). */
  @volatile private[graft] var onPoisonedResolution: String => Unit =
    msg => Console.err.println(msg)

  def consistentRootsAll(
      versioned: Seq[Seq[(Long, String, IndexVersions.Ledger)]],
      addOnly: Seq[(String, Set[String])],
      what: String): (Seq[String], IndexVersions.Ledger) = {
    require(versioned.nonEmpty, "consistentRootsAll needs at least one " +
      "versioned artifact (add-only artifacts alone have a single state)")
    val newestFirst = versioned.map(_.reverse)
    // UNTAGGED-POISON DETECTION (round-16 ADVICE fix, high): with
    // add-only artifacts present, a corpus state is admissible only at
    // untagged == 0 — and the untagged counter only grows within a
    // lineage, so ONE untagged append (the documented tag=None mode of
    // the versioned appends) makes every LATER state inadmissible
    // FOREVER. The resolver would then silently pin the last all-tagged
    // state for the artifact's remaining lifetime — new docs never
    // serve, and the base version's empty ledger keeps the loud
    // no-tuple refusal below from ever firing. Detect the shape at its
    // root (the NEWEST version of any versioned list carrying
    // untagged > 0) and say so on the loud channel every resolution.
    // Why not throw: the pinned state is provably consistent — refusing
    // would turn bounded staleness into a serving outage. Why not drain
    // the counter at compaction (the third ADVICE option): a drained
    // ledger re-opens the round-10 mixed-corpus pairing — artifact A
    // compacted after untagged batch u1 would read (tags, 0) and pair
    // with artifact B's state from BEFORE u1, exactly the silent mix
    // the counter exists to prevent. Remediation is in the message.
    val poisoned = addOnly.nonEmpty &&
      newestFirst.exists(_.headOption.exists(_._3.untagged > 0L))
    if (poisoned) {
      val detail = newestFirst.flatMap(_.headOption)
        .filter(_._3.untagged > 0L)
        .map { case (v, p, l) => s"$p (version $v, ${l.untagged} untagged)" }
      onPoisonedResolution(
        s"[graft] WARNING: consistent-snapshot resolution for $what is " +
          s"PERMANENTLY PINNED behind untagged appends on: " +
          s"${detail.mkString("; ")}. States after the first untagged " +
          "append can never synchronize with the add-only artifacts " +
          s"(${addOnly.map(_._1).mkString(", ")}) — newer docs will not " +
          "serve from this composite until the artifacts are re-founded " +
          "from a common base. Maintenance folds into composite-served " +
          "artifacts must always pass a batch tag.")
    }
    val tuples = newestFirst.head.iterator.flatMap {
      case (_, headPath, ledger) =>
        val rest = newestFirst.tail.map(_.collectFirst {
          case (_, p, l) if l == ledger => p
        })
        val addOk = addOnly.forall { case (_, tags) =>
          ledger.tags.subsetOf(tags) && ledger.untagged == 0L
        }
        if (rest.forall(_.isDefined) && addOk)
          Iterator.single((headPath +: rest.map(_.get), ledger))
        else Iterator.empty
    }
    if (tuples.hasNext) tuples.next()
    else throw new IllegalStateException(
      s"no consistent $what snapshot: applied-batch ledgers " +
        s"${newestFirst.map(_.map(_._3))} (add-only tag sets " +
        s"${addOnly.map { case (n, t) => s"$n=${t.toSeq.sorted}" }}) " +
        "never agree — were these artifacts maintained from the same " +
        "batch stream, with tagged folds?" +
        (if (poisoned) " Untagged appends are present (see the warning " +
          "above): composite-served artifacts require tagged folds." else ""))
  }

  /** The newest (aRoot, bRoot) pair of two version lists whose ledgers
    * are equal — the pair form of [[consistentRootsAll]] (one algorithm;
    * the pair call sites keep their shape). Walks A's versions
    * newest-first, B's newest-first within each, so the pair maximizes
    * A's version and then B's; throws if no committed pair agrees (two
    * indexes from unrelated lineages — serving a mixed corpus would be
    * silently wrong, the one thing this resolver exists to prevent). */
  def consistentRootsOf(
      a: Seq[(Long, String, IndexVersions.Ledger)],
      b: Seq[(Long, String, IndexVersions.Ledger)],
      what: String): (String, String) = {
    val (roots, _) = consistentRootsAll(Seq(a, b), Seq.empty, what)
    (roots(0), roots(1))
  }

  /** The newest (vectorsPath, textRoot) pair whose applied-batch ledgers
    * are equal — the hybrid-retrieval (dense + lexical) pair. */
  def consistentRoots(spark: SparkSession, cellIndexPath: String,
      textIndexPath: String): (String, String) =
    consistentRootsOf(
      graft.vector.CellIndex.versionsWithTags(spark, cellIndexPath),
      graft.text.TextIndex.versionsWithTags(spark, textIndexPath),
      s"(vector $cellIndexPath, text $textIndexPath)")

  /** The newest (textRoot, phraseRoot) pair whose ledgers are equal —
    * the proximity-boosted retrieval pair (round 10): q152 fuses the
    * POSTING index with the POSITIONAL index, two separately-published
    * artifacts with exactly the crash-between-folds window the vector/
    * text pair has. Both layouts share the same version/commit-marker
    * scheme, so one ledger enumeration serves both. */
  def consistentTextRoots(spark: SparkSession, textIndexPath: String,
      phraseIndexPath: String): (String, String) =
    consistentRootsOf(
      graft.text.TextIndex.versionsWithTags(spark, textIndexPath),
      graft.text.TextIndex.versionsWithTags(spark, phraseIndexPath),
      s"(text $textIndexPath, phrase $phraseIndexPath)")
}
