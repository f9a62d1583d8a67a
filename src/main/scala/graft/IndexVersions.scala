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

  def readTags(fs: FileSystem, dir: Path): Set[String] = {
    val p = new Path(dir, TagsFile)
    if (!fs.exists(p)) Set.empty
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).toSet
      finally in.close()
    }
  }

  def writeTags(fs: FileSystem, dir: Path, tags: Set[String]): Unit = {
    val out = fs.create(new Path(dir, TagsFile), true)
    try out.write(tags.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Atomic publish with a LOST-UPDATE guard (round-8 review finding): a
    * target that is already COMMITTED means a concurrent publisher won the
    * race for this version number — deleting it would silently erase that
    * publisher's batch AND its ledger tags, so refuse instead (the caller
    * may re-read versions and retry on the next number). Only an
    * UNCOMMITTED leftover (a crashed earlier rename target) is replaced.
    * The rename result is checked — a false return (possible on HDFS) must
    * not be reported as success. */
  def publish(fs: FileSystem, staging: Path, target: Path,
      committed: Path => Boolean): Unit = {
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
    * missing data dirs. */
  def vacuum(fs: FileSystem, root: Path, versions: Seq[Long],
      versionDirs: Long => Seq[String], keepLast: Int,
      graceMs: Long): Seq[String] = {
    val now = System.currentTimeMillis()
    def oldEnough(p: Path): Boolean = graceMs <= 0L ||
      now - fs.getFileStatus(p).getModificationTime >= graceMs
    val removed = versions.dropRight(math.max(keepLast, 1))
      .filter(v => oldEnough(new Path(root, versionDirs(v).head)))
      .flatMap(v => versionDirs(v).map { d =>
        val p = new Path(root, d); fs.delete(p, true); p.toString
      })
    val staleStaging = fs.listStatus(root).toSeq
      .filter(_.getPath.getName.startsWith(".staging_"))
      .filter(s => now - s.getModificationTime >= StagingTtlMs)
      .map { s => fs.delete(s.getPath, true); s.getPath.toString }
    removed ++ staleStaging
  }
}
