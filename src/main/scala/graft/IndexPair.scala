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

  /** The newest (aRoot, bRoot) pair of two version lists whose ledgers
    * are equal — the generalized resolver every index PAIR shares. Walks
    * A's versions newest-first, B's newest-first within each, so the
    * pair maximizes A's version and then B's; throws if no committed
    * pair agrees (two indexes from unrelated lineages — serving a mixed
    * corpus would be silently wrong, the one thing this resolver exists
    * to prevent). */
  def consistentRootsOf(
      a: Seq[(Long, String, IndexVersions.Ledger)],
      b: Seq[(Long, String, IndexVersions.Ledger)],
      what: String): (String, String) = {
    val as = a.reverse
    val bs = b.reverse
    val pair = for {
      (_, aPath, aLedger) <- as.iterator
      (_, bPath, bLedger) <- bs.iterator
      if aLedger == bLedger
    } yield (aPath, bPath)
    if (pair.hasNext) pair.next()
    else throw new IllegalStateException(
      s"no consistent $what index pair: applied-batch ledgers " +
        s"${as.map(_._3)} and ${bs.map(_._3)} never agree — were these " +
        "indexes maintained from the same batch stream?")
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
