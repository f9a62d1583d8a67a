package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Portable.pround
import graft.functions.VectorExpressions
import graft.functions.VectorExpressions.dot_product

/** Partition-by-cell vector index — the AT-REST layout the 100 TB vector
  * path runs on (the shape [[Similarity.annIvf]]'s scaladoc names:
  * "partition-by-cell layout with per-cell scans").
  *
  * The ad-hoc queries (q41/q66) pay a full normalize + assign/signature
  * map pass over every vector on every run — correct, but linear in the
  * corpus per query (SCALING.md's q66/q72 finding). This index pays that
  * pass ONCE at write time: vectors land parquet-partitioned by their
  * trained IVF cell (`cell=k/` directories) with norms precomputed, the
  * codebook persisted beside them. Readers then get:
  *
  *  - [[annIvfIndexed]]: probe-cell resolution against the k-row codebook
  *    (driver-side), then a PARTITION-PRUNED scan of only the `nprobe`
  *    probed cell directories — per-query IO is cell-sized, not
  *    corpus-sized, and grows with cell population, not corpus count.
  *  - [[semanticClustersIndexed]]: SemDeDup-style sharded near-dup
  *    clustering — banded sign-LSH candidates WITHIN each cell (the join
  *    key is (cell, band_id, band_val), so blocks are bounded by
  *    cell × band collision, and the trained quantizer keeps semantically
  *    distant vectors out of each other's blocks entirely). The explicit
  *    trade vs the global-banded q66: cross-cell near-dups are not
  *    candidates (standard for sharded semantic dedup; cell count tunes
  *    the recall/cost point).
  *
  * Layout over `bucketBy`: directory partitioning gives PartitionFilters
  * pruning on any reader with zero session/catalog setup (bucketBy needs
  * a saved table + matching bucket specs); the within-cell joins still
  * key on cell, so no shuffle carries more than a cell's band block. */
object CellIndex {

  /** Build the index under `indexPath`: train a `k`-cell coarse codebook
    * ([[Similarity.trainIvfCodebook]] — deterministic Lloyd) AND per-
    * subspace PQ codebooks ([[Similarity.pqTrain]]), assign every vector
    * to its cell, attach its `pqM`-code PQ encoding, write `vectors/`
    * partitioned by cell with `codebook/` and `pq_codebook/` beside it.
    * One corpus pass beyond training; amortized across every indexed
    * query that follows — this is exactly the cost split FAISS's IVF-PQ
    * pays at index time so that serving is cell-pruned table lookups. */
  def write(spark: SparkSession, dir: String, indexPath: String,
      k: Int = 16, iters: Int = 3, pqM: Int = 4, pqK: Int = 16): Unit = {
    import spark.implicits._
    // write() rewrites the root codebook pair in place — drop the
    // session's codebook memos (the TextIndex.write rebuild rule)
    evictMemos(spark)
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val e = Similarity.withNorm(spark, dir).localCheckpoint()
    val cb = Similarity.trainIvfCodebook(e, k, iters)
    cb.toDF("cell", "centroid")
      .coalesce(1) // k rows — codebook, not data
      .write.mode("overwrite").parquet(s"$indexPath/codebook")
    val pqCbs = Similarity.pqTrain(spark, dir, m = pqM, k = pqK)
    pqCbs.zipWithIndex.flatMap { case (sub, s) =>
        sub.zipWithIndex.map { case (centroid, code) => (s, code, centroid) }
      }.toDF("s", "code", "centroid")
      .coalesce(1) // m·k rows
      .write.mode("overwrite").parquet(s"$indexPath/pq_codebook")
    Similarity.assignCells(e, cb)
      .join(Similarity.pqEncode(spark, dir, pqCbs), Seq("vec_id"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexPath/vectors")
    // e was an intermediate for this build only
    graft.Checkpoints.release(sc, graft.Checkpoints.pinnedSince(sc, before))
  }

  /** Committed vector-set versions under `indexPath`, oldest first.
    * Version 0 is [[write]]'s base `vectors/` dir; appends publish
    * `vectors_v<N>` dirs. Committed = `_SUCCESS` present (the snapshot
    * convention of the lakehouse merge sink), with the same strict digit
    * check so a stray dir is invisible, not a parse crash. */
  private def committedVersions(spark: SparkSession, indexPath: String): Seq[Long] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val versioned = fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("vectors_v"))
      .filter(n => { val s = n.stripPrefix("vectors_v"); s.nonEmpty && s.forall(_.isDigit) })
      .filter(n => fs.exists(new Path(root, s"$n/_SUCCESS")))
      .map(_.stripPrefix("vectors_v").toLong)
    // the base write is committed only once ITS _SUCCESS landed — a
    // crashed partial `vectors/` must be invisible, not served (round-8
    // review finding; same rule the versioned dirs already follow).
    // Operational note: tools that sync indexes between stores must
    // PRESERVE underscore marker files (several S3 sync defaults drop
    // them) or the copy will resolve as uncommitted.
    val base =
      if (fs.exists(new Path(root, "vectors/_SUCCESS"))) Seq(0L) else Seq.empty
    (base ++ versioned).sorted
  }

  private def versionPath(indexPath: String, v: Long): String =
    if (v == 0L) s"$indexPath/vectors" else s"$indexPath/vectors_v$v"

  /** The vector-set directory readers resolve: the newest committed
    * version ([[append]] publishes monotonically), falling back to the
    * base `vectors/`. */
  def currentVectorsPath(spark: SparkSession, indexPath: String): String = {
    val vs = committedVersions(spark, indexPath)
    require(vs.nonEmpty, s"no committed vector set under $indexPath")
    versionPath(indexPath, vs.max)
  }

  /** INCREMENTAL index maintenance (round 8 — the q64 sketch-ledger
    * pattern lifted to vectors): fold a new batch of embeddings
    * (`batchDir/embeddings.parquet`; vec_ids must be new — the id space
    * is the caller's) into the index WITHOUT retraining. The new batch is
    * assigned against the PERSISTED coarse codebook and PQ-encoded with
    * the PERSISTED subspace codebooks — so cell geometry never moves and
    * append-then-query ≡ indexing the union corpus under the same
    * codebook (differential spec). Current cell files are carried forward
    * BYTE-FOR-BYTE (append = file union inside each `cell=` dir — no
    * decode, no shuffle, no rewrite of existing data; at object-store
    * scale a server-side copy), only the batch pays assignment compute.
    * Publish follows the lakehouse merge protocol: everything assembles
    * in a dot-prefixed staging dir invisible to [[committedVersions]],
    * then ONE rename publishes `vectors_v<N>`; readers resolving through
    * [[currentVectorsPath]] never observe a cell-incomplete set, and a
    * crashed attempt (no `_SUCCESS`) is invisible until retried. Old
    * versions remain for time-travel until [[vacuumVersions]].
    *
    * OPERATING MODEL — SINGLE LIVE WRITER: a lost publish race is SAFE
    * (isolated per-attempt staging + guarded rename — the loser throws,
    * the committed set is untouched, a retry lands on the next version)
    * but not COORDINATED; two live maintenance streams on one index fail
    * one stream per batch instead of taking turns. Run one
    * [[graft.app.IndexMaintenanceJob]] per index. */
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
    val cur = new Path(versionPath(indexPath, versions.max))
    val next = versions.max + 1
    val target = new Path(root, s"vectors_v$next")
    // per-attempt nonce: concurrent appenders racing to the same version
    // number must never share a staging dir (an interleaved assembly could
    // publish a mixed batch with a valid _SUCCESS — round-8 review
    // finding); the guarded rename is the only contention point, and
    // [[vacuumVersions]] sweeps crashed attempts' orphan dirs
    val staging = new Path(root,
      s".staging_vectors_v${next}_${java.util.UUID.randomUUID().toString.take(8)}")
    // the CURRENT version's codebooks, not blindly the root's: after a
    // [[retrain]] the live geometry lives inside the version dir, and
    // assigning a batch against the superseded root codebook would file
    // vectors into cells no reader probes under the new geometry
    val cb = readCodebookAt(spark, indexPath, cur.toString)
    val pqCbs = readPqCodebookAt(spark, indexPath, cur.toString)
    val e = Similarity.withNorm(spark, batchDir)
    Similarity.assignCells(e, cb)
      .join(Similarity.pqEncode(spark, batchDir, pqCbs), Seq("vec_id"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(staging.toString)
    // carry the current version's cell files forward byte-for-byte; part
    // file names embed a job UUID, so copies never collide with the
    // batch's files in the same cell dir
    fs.listStatus(cur).toSeq
      .filter(_.getPath.getName.startsWith("cell="))
      .foreach { s =>
        val dstCell = new Path(staging, s.getPath.getName)
        fs.mkdirs(dstCell)
        fs.listStatus(s.getPath).toSeq
          .filter(f => f.getPath.getName.startsWith("part-"))
          .foreach(f => FileUtil.copy(fs, f.getPath, fs,
            new Path(dstCell, f.getPath.getName), false, conf))
      }
    // a retrained lineage's codebooks travel WITH every later version:
    // without the copy, resolution would fall back to the stale root pair
    // and serve the wrong geometry for this set
    Seq("_codebook", "_pq_codebook").foreach { d =>
      val src = new Path(cur, d)
      if (fs.exists(src))
        FileUtil.copy(fs, src, fs, new Path(staging, d), false, conf)
    }
    // applied-batch ledger: the union of prior tags + this batch's, riding
    // the version dir so it publishes ATOMICALLY with the data (a marker
    // written after the rename would leave a crash window where a replay
    // double-appends) and survives vacuum (each version carries the full
    // union). The streaming maintenance sink short-circuits on it.
    graft.IndexVersions.writeLedger(fs, staging,
      graft.IndexVersions.readLedger(fs, cur).append(tag))
    val marker = new Path(staging, "_SUCCESS")
    if (!fs.exists(marker)) fs.create(marker).close()
    // guarded atomic publish: never replaces a COMMITTED concurrent winner
    graft.IndexVersions.publish(fs, staging, target,
      t => fs.exists(new Path(t, "_SUCCESS")), fence)
  }

  /** CODEBOOK RETRAIN-AND-CUTOVER in the version chain (round 10 — the
    * lifecycle hole [[cellBalanceReport]] could detect but not remedy):
    * train a FRESH coarse + PQ codebook pair on the index's CURRENT
    * vector set, re-assign and re-encode every stored vector under it,
    * and publish the result as the next version WITH its codebooks
    * inside the version dir (`_codebook`/`_pq_codebook` — underscore
    * dirs, invisible to the cell-dir parquet reader beside them). The
    * version chain — not a fresh root — because everything else about
    * the index's identity survives: the applied-batch ledger copies
    * VERBATIM (a retrain changes geometry, not corpus, so
    * [[graft.IndexPair]] pairing and the maintenance job's exactly-once
    * guard are undisturbed), readers resolve through the same
    * [[currentVectorsPath]], old versions stay for time-travel until
    * [[vacuumVersions]], and the same staging-nonce + guarded-rename
    * publish makes a crashed or raced attempt invisible.
    *
    * EQUIVALENCE (spec'd): training is deterministic Lloyd over the
    * stored (vec_id, v) rows — the same multiset a from-scratch [[write]]
    * over the union corpus trains on — so the retrained version's
    * codebook, assignments, codes, and every served answer at every
    * nprobe are IDENTICAL to a fresh index built with the same
    * parameters. Appends after the cutover assign against the retrained
    * codebooks (and carry them forward), so the frozen-codebook append
    * model resumes exactly, under balanced geometry.
    *
    * COST SHAPE: one training pass (iters × a k×dim-bounded aggregate
    * over the set) plus one re-assign/re-encode write of the full set —
    * the price [[write]] pays, minus the source tokenize. Run it when
    * [[cellBalanceReport]] flags drift (or let
    * [[graft.app.IndexMaintenanceJob]]'s `retrainAtImbalance` trigger it
    * inside the fold loop); between retrains, appends stay incremental.
    * SCALING.md prices retrain against the serving degradation it
    * repairs.
    *
    * `k`/`pqM`/`pqK` ≤ 0 (the defaults) INFER the current index's own
    * geometry from its persisted codebooks — the maintenance trigger
    * retrains "the same index, rebalanced" without carrying parameters. */
  def retrain(spark: SparkSession, indexPath: String, k: Int = -1,
      iters: Int = 3, pqM: Int = -1, pqK: Int = -1,
      fence: () => Unit = graft.IndexVersions.NoFence): Unit = {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(indexPath)
    val fs = root.getFileSystem(conf)
    val versions = committedVersions(spark, indexPath)
    require(versions.nonEmpty, s"retrain needs an existing index at $indexPath")
    val cur = new Path(versionPath(indexPath, versions.max))
    val next = versions.max + 1
    val target = new Path(root, s"vectors_v$next")
    val staging = new Path(root,
      s".staging_vectors_v${next}_${java.util.UUID.randomUUID().toString.take(8)}")
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    // the stored set IS the training corpus: v/norm persisted at index
    // time, so no source re-read, no re-normalize. Checkpointed — the
    // Lloyd rounds and the re-assign below iterate over it.
    val stored = spark.read.parquet(cur.toString)
      .select(col("vec_id"), col("v"), col("norm")).localCheckpoint()
    // geometry inference: the retrained index keeps ITS OWN shape unless
    // the caller overrides — cell count from the coarse codebook, (m, k)
    // from the persisted per-subspace PQ codebooks
    val kUse = if (k > 0) k else readCodebookAt(spark, indexPath, cur.toString).size
    val curPq = readPqCodebookAt(spark, indexPath, cur.toString)
    val pqMUse = if (pqM > 0) pqM else curPq.size
    val pqKUse = if (pqK > 0) pqK else curPq.head.size
    val cb = Similarity.trainIvfCodebook(stored, kUse, iters)
    val pqCbs = Similarity.pqTrainOn(stored, m = pqMUse, k = pqKUse)
    // re-assign + re-encode under the new geometry; the partitioned write
    // lands first (it creates staging and its _SUCCESS — invisible until
    // the rename), codebooks and ledger follow inside it
    Similarity.assignCells(stored, cb)
      .join(Similarity.pqEncodeOn(stored, pqCbs), Seq("vec_id"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(staging.toString)
    cb.toDF("cell", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(new Path(staging, "_codebook").toString)
    pqCbs.zipWithIndex.flatMap { case (sub, s) =>
        sub.zipWithIndex.map { case (centroid, code) => (s, code, centroid) }
      }.toDF("s", "code", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(new Path(staging, "_pq_codebook").toString)
    graft.Checkpoints.release(sc, graft.Checkpoints.pinnedSince(sc, before))
    // ledger copies verbatim: same corpus state, new geometry
    graft.IndexVersions.writeLedger(fs, staging,
      graft.IndexVersions.readLedger(fs, cur))
    graft.IndexVersions.publish(fs, staging, target,
      t => fs.exists(new Path(t, "_SUCCESS")), fence)
  }

  /** Every committed version with its vector-set path and applied-batch
    * LEDGER (tag set + untagged-append count), oldest first — the input
    * to cross-index consistent resolution
    * ([[graft.IndexPair.consistentRoots]]). */
  def versionsWithTags(spark: SparkSession,
      indexPath: String): Seq[(Long, String, graft.IndexVersions.Ledger)] = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    committedVersions(spark, indexPath).map { v =>
      val p = versionPath(indexPath, v)
      // immutable once committed (see TextIndex.versionsWithTags) —
      // session-memoized per version path
      (v, p, graft.SessionMemos.getOrComputeScalar(spark, "vledger", p)(
        graft.IndexVersions.readLedger(fs, new Path(p))))
    }
  }

  /** Batch tags already folded into the current committed version — the
    * exactly-once guard for at-least-once streaming maintenance: a
    * replayed batch whose tag is present must be skipped, not re-appended. */
  def appliedTags(spark: SparkSession, indexPath: String): Set[String] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.IndexVersions.readTags(fs, new Path(currentVectorsPath(spark, indexPath)))
  }

  /** Drop committed vector-set versions beyond the newest `keepLast`
    * (floored at one — the current set is never vacuumed). Returns the
    * dirs removed. The base `vectors/` counts as version 0 and is
    * vacuumable like any other once newer versions exist.
    *
    * READ-DURATION CONTRACT: a reader that resolved a version via
    * [[currentVectorsPath]] holds no lease — a vacuum completing mid-scan
    * can delete the directory under it. `keepLast >= 2` bounds the window
    * (two whole append+vacuum cycles must complete inside one scan);
    * `graceMs` eliminates it — versions newer than `graceMs` (by dir
    * modification time) are retained regardless of count, so setting it
    * above the longest query duration makes in-flight readers safe.
    * Orphaned `.staging_*` assemblies (crashed attempts — per-attempt
    * nonce dirs are never reused) are swept once older than an hour. */
  def vacuumVersions(spark: SparkSession, indexPath: String,
      keepLast: Int = 2, graceMs: Long = 0L): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.IndexVersions.vacuum(fs, root, committedVersions(spark, indexPath),
      v => Seq(if (v == 0L) "vectors" else s"vectors_v$v"),
      keepLast, graceMs,
      dirOwner = {
        case "vectors" => Some(0L)
        case n if n.startsWith("vectors_v") &&
          n.stripPrefix("vectors_v").nonEmpty &&
          n.stripPrefix("vectors_v").forall(_.isDigit) =>
          Some(n.stripPrefix("vectors_v").toLong)
        case _ => None // codebook/, pq_codebook/, lease files stay
      },
      relist = () => committedVersions(spark, indexPath))
  }

  /** The codebook-pair dirs a given vector-set version was written under:
    * versions published by [[retrain]] carry their OWN codebooks inside
    * the version dir (`_codebook`/`_pq_codebook` — underscore-prefixed,
    * so the parquet reader of the `cell=` dirs beside them never lists
    * them); versions from [[write]]/[[append]] lineages before any
    * retrain share the root-level pair. Codebooks must resolve WITH the
    * vector set they assigned — reading the root codebook against a
    * retrained set would mis-rank probe cells for every query. */
  private def codebookDirs(spark: SparkSession, indexPath: String,
      vectorsPath: String): (String, String) = {
    import org.apache.hadoop.fs.Path
    val vp = new Path(vectorsPath)
    val fs = vp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(vp, "_codebook")))
      (s"$vectorsPath/_codebook", s"$vectorsPath/_pq_codebook")
    else (s"$indexPath/codebook", s"$indexPath/pq_codebook")
  }

  /** Session memo for the k-row codebook collects (round 17 — the
    * TextIndex MetaMemo move on the dense side): q138/q139/q140 each
    * collected the same codebook pair per query. Keyed by the RESOLVED
    * codebook dir — version-local `_codebook` dirs are immutable once
    * published; the root-level pair is rewritten only by [[write]], which
    * evicts. Evicted between bench passes via [[evictMemos]]. */
  private val MetaMemo = "cellindex.meta"

  /** Evict this module's session memos (the TextIndex.evictMemos rule). */
  def evictMemos(spark: SparkSession): Unit =
    graft.SessionMemos.evict(spark, MetaMemo)

  /** The persisted PQ codebooks, subspace-major ([m][k][subDim]). */
  def readPqCodebook(spark: SparkSession, indexPath: String): Seq[Seq[Seq[Double]]] =
    readPqCodebookAt(spark, indexPath, currentVectorsPath(spark, indexPath))

  private def readPqCodebookAt(spark: SparkSession, indexPath: String,
      vectorsPath: String): Seq[Seq[Seq[Double]]] = {
    val dir = codebookDirs(spark, indexPath, vectorsPath)._2
    graft.SessionMemos.getOrComputeScalar(spark, MetaMemo, ("pq", dir)) {
      spark.read.parquet(dir).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map(_._2.sortBy(_._2).map(_._3).toSeq)
    }
  }

  /** The persisted codebook of the CURRENT version, smallest-cell-id
    * first (k×dim — bytes). */
  def readCodebook(spark: SparkSession, indexPath: String): Seq[(Int, Seq[Double])] =
    readCodebookAt(spark, indexPath, currentVectorsPath(spark, indexPath))

  /** The codebook the given vector-set version assigned under — the
    * resolve-once rule extended to codebooks: every reader resolves its
    * vector set FIRST, then reads that set's codebook, so a retrain
    * publishing between the two reads can never mix new geometry with an
    * old set (or vice versa). */
  def readCodebookAt(spark: SparkSession, indexPath: String,
      vectorsPath: String): Seq[(Int, Seq[Double])] = {
    val dir = codebookDirs(spark, indexPath, vectorsPath)._1
    graft.SessionMemos.getOrComputeScalar(spark, MetaMemo, ("cb", dir)) {
      spark.read.parquet(dir).collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    }
  }

  /** Rank the k-row codebook against the probe on the driver, return the
    * `nprobe` highest-cosine cell ids — the coarse-probe step every indexed
    * reader shares. Same sequential-fold arithmetic as DotProduct so
    * probe-cell ranking matches the ad-hoc path bit for bit. */
  private def rankProbeCells(cb: Seq[(Int, Seq[Double])],
      probe: Seq[Double], nprobe: Int): Seq[Int] = {
    val pnorm = math.sqrt(probe.foldLeft(0.0)((a, x) => a + x * x))
    cb.map { case (cid, cv) =>
        val cnorm = math.sqrt(cv.foldLeft(0.0)((a, x) => a + x * x))
        var d = 0.0
        var i = 0
        while (i < cv.length) { d += probe(i) * cv(i); i += 1 }
        (cid, d / (pnorm * cnorm))
      }.sortBy { case (cid, c) => (-c, cid) }.take(nprobe).map(_._1)
  }

  /** ANN against the index: rank the k-row codebook on the driver, scan
    * ONLY the `nprobe` winning cell directories (partition pruning — the
    * plan shows `PartitionFilters: [cell IN …]`, and no exchange ever
    * carries corpus mass), exact cosine + global top-k on the survivors.
    * With the same codebook parameters this returns exactly
    * [[Similarity.annIvf]]'s answer (differential spec) — the index
    * changes where the work happens, not what is computed. */
  def annIvfIndexed(spark: SparkSession, indexPath: String,
      probe: Seq[Double], k: Int = 10, nprobe: Int = 2,
      pinnedVectorsPath: Option[String] = None): DataFrame = {
    VectorExpressions.register(spark)
    // pinned = a caller-resolved version (cross-index consistency,
    // graft.IndexPair); default = the newest committed set. Resolved
    // FIRST so the codebook read below belongs to this exact set.
    val vp = pinnedVectorsPath.getOrElse(currentVectorsPath(spark, indexPath))
    val cb = readCodebookAt(spark, indexPath, vp)
    val pnorm = math.sqrt(probe.foldLeft(0.0)((a, x) => a + x * x))
    val probeCells = rankProbeCells(cb, probe, nprobe)
    // purged docs drop from the dense arm the moment their tombstone
    // commits (round 16 — [[graft.text.Tombstones]]; the filter lands
    // BEFORE the top-k so a purged doc cannot steal a rank slot; no-op
    // for unpurged indexes). Physical removal rides [[retrain]]/rebuild.
    val scored = graft.text.Tombstones.filter(spark, indexPath,
        spark.read.parquet(vp).filter(col("cell").isin(probeCells: _*)),
        idCol = "vec_id")
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
        pround(dot_product(col("v"), lit(probe.toArray)) / (col("norm") * lit(pnorm)), 4)
          .as("cos_sim"))
    Similarity.rankTopK(scored, k)
      .select("rnk", "vec_id", "cell", "cos_sim")
      .orderBy("rnk")
  }

  /** IVF-PQ search — the FAISS serving composition, assembled from the
    * index's three persisted artifacts: (1) coarse probe — rank the
    * k-row cell codebook on the driver, keep `nprobe` cells; (2) ADC —
    * per-subspace distance TABLE from the exact probe (m·k doubles,
    * driver-side), approximate distance = m table lookups per vector,
    * over a PARTITION-PRUNED scan of only the probed cells' codes;
    * (3) exact rerank — true L2 on the `shortlist` ADC survivors only
    * (their vectors ride the same pruned rows — no second fetch).
    * Per-query cost: cell-fraction × table-lookup scan + shortlist exact
    * distances; nothing corpus-sized moves. */
  def ivfPqSearch(spark: SparkSession, indexPath: String,
      probe: Seq[Double], k: Int = 10, nprobe: Int = 2,
      shortlist: Int = 100): DataFrame = {
    VectorExpressions.register(spark)
    val vp = currentVectorsPath(spark, indexPath) // resolve-once
    val cb = readCodebookAt(spark, indexPath, vp)
    val pqCbs = readPqCodebookAt(spark, indexPath, vp)
    val m = pqCbs.length
    val subDim = probe.length / m
    val probeCells = rankProbeCells(cb, probe, nprobe)
    // the ADC table: same zip-square-sum arithmetic as pqAdcScores
    val tables: Seq[Seq[Double]] = pqCbs.zipWithIndex.map { case (sub, s) =>
      val qs = probe.slice(s * subDim, (s + 1) * subDim)
      sub.map(c => qs.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum)
    }
    val pruned = graft.text.Tombstones.filter(spark, indexPath,
      spark.read.parquet(vp).filter(col("cell").isin(probeCells: _*)),
      idCol = "vec_id")
    val short = pruned
      .withColumn("tbl", typedLit(tables))
      .withColumn("approx_d2", expr(
        "aggregate(transform(sequence(0, " + (m - 1) + "), " +
          "s -> element_at(element_at(tbl, s + 1), codes[s] + 1)), " +
          "cast(0.0 as double), (acc, z) -> acc + z)"))
      .orderBy(col("approx_d2").asc, col("vec_id"))
      .limit(shortlist)
    short
      .withColumn("qv", typedLit(probe))
      .withColumn("d2", expr(Similarity.sqDistSql("v", "qv")))
      .orderBy(col("d2").asc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
        pround(col("d2"), 6).as("d2"), pround(col("approx_d2"), 6).as("approx_d2"))
  }

  /** Hybrid retrieval served FROM the index (the indexed form of
    * [[Similarity.hybridSearch]]'s filter-then-ANN): metadata-filter the
    * document corpus (lang), semi-join the PARTITION-PRUNED cell scan on
    * doc_id = vec_id, exact cosine + global top-k on the survivors. The
    * vector side touches only the `nprobe` probed cell directories; the
    * metadata side only the filtered doc ids. With `nprobe` = the cell
    * count this returns exactly the ad-hoc answer (differential spec) —
    * pruning changes where the work happens, not what is computed. */
  def hybridSearchIndexed(spark: SparkSession, dir: String, indexPath: String,
      probe: Seq[Double], lang: String = "en", k: Int = 10,
      nprobe: Int = 2): DataFrame = {
    VectorExpressions.register(spark)
    val vp = currentVectorsPath(spark, indexPath) // resolve-once
    val cb = readCodebookAt(spark, indexPath, vp)
    val pnorm = math.sqrt(probe.foldLeft(0.0)((a, x) => a + x * x))
    val probeCells = rankProbeCells(cb, probe, nprobe)
    val docs = graft.sources.Tables.documents(spark, dir)
      .filter(col("lang") === lang).select(col("doc_id"), col("lang"))
    val scored = graft.text.Tombstones.filter(spark, indexPath,
        spark.read.parquet(vp).filter(col("cell").isin(probeCells: _*)),
        idCol = "vec_id")
      .join(docs, col("vec_id") === col("doc_id"))
      .select(col("vec_id"), col("lang"),
        pround(dot_product(col("v"), lit(probe.toArray)) / (col("norm") * lit(pnorm)), 4)
          .as("cos_sim"))
    Similarity.rankTopK(scored, k)
      .select("rnk", "vec_id", "lang", "cos_sim")
      .orderBy("rnk")
  }

  /** RRF hybrid fusion with the DENSE arm served FROM the index (the
    * indexed form of [[Similarity.rrfFusion]], task "ride retrieval on the
    * index"): dense candidates come from [[annIvfIndexed]]'s partition-
    * pruned cell scan instead of a brute-force corpus cosine pass; the
    * lexical BM25 arm is unchanged (term-keyed, not vector-indexed) and
    * the fusion itself still touches ≤2m rows. With `nprobe` = the cell
    * count the dense list equals [[Similarity.cosineTopK]]'s exactly, so
    * the fused output matches the ad-hoc q134 verbatim (differential
    * spec); smaller `nprobe` trades dense-arm recall for cell-sized IO —
    * the 100 TB serving point. */
  def rrfFusionIndexed(spark: SparkSession, dir: String, indexPath: String,
      probe: Seq[Double], m: Int = 50, kRrf: Int = 60, topN: Int = 20,
      nprobe: Int = 2, textIndexPath: Option[String] = None,
      consistent: Boolean = false): DataFrame = {
    // consistent = resolve ONE (vector, text) version pair with EQUAL
    // applied-batch ledgers before either arm reads (graft.IndexPair):
    // under live maintenance the two indexes publish a batch as two
    // separate renames, and independent "current" resolution can fuse
    // arms computed over different corpus states
    val (pinVec, pinText) =
      if (!consistent) (None, None)
      else {
        val ti = textIndexPath.getOrElse(throw new IllegalArgumentException(
          "consistent pair resolution needs textIndexPath"))
        val (v, t) = graft.IndexPair.consistentRoots(spark, indexPath, ti)
        (Some(v), Some(t))
      }
    val dense = annIvfIndexed(spark, indexPath, probe, k = m, nprobe = nprobe,
        pinnedVectorsPath = pinVec)
      .select(col("vec_id").as("doc_id"), col("rnk").as("dense_rnk"))
    // lexical arm: from the at-rest posting index when one is given (no
    // corpus tokenize at query time — the fully-indexed serving shape),
    // else the ad-hoc corpus pass
    val lex = textIndexPath
      .map(ti => graft.text.TextIndex.bm25Indexed(spark, ti, nq = 5, topN = m,
        pinnedRoot = pinText))
      .getOrElse(graft.text.TextOps.bm25(spark, dir, nq = 5, topN = m))
      .select(col("doc_id"), col("rnk").as("lex_rnk"))
    Similarity.rrfCombine(dense, lex, kRrf, topN)
  }

  /** MMR diversity selection with the candidate POOL served from the index
    * (round 9 — the last retrieval-shaped query whose candidate generation
    * was a brute-force corpus cosine pass, `Similarity.mmrSelect`):
    * relevance-rank only the `nprobe` probed cells' vectors
    * (partition-pruned scan; norms precomputed at write time, so no
    * normalize pass either), collect the top-`poolSize` pool, then run the
    * SAME driver greedy as the ad-hoc form ([[Similarity.mmrGreedy]] — one
    * definition, so equal pools give verbatim-equal selections). At
    * nprobe = cell count the pool is identical to the ad-hoc one and the
    * output is verbatim q73 (differential spec); smaller nprobe trades
    * pool recall for cell-sized IO — the 100 TB serving point, where
    * per-query cost tracks probed-cell mass, not corpus mass. */
  def mmrSelectIndexed(spark: SparkSession, indexPath: String,
      probe: Seq[Double], k: Int = 5, poolSize: Int = 20,
      lambda: Double = 0.7, nprobe: Int = 2): DataFrame = {
    val cands = mmrPoolIndexed(spark, indexPath, probe, poolSize, nprobe)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2),
        r.getDouble(3)))
    Similarity.mmrGreedy(spark, cands, k, lambda)
  }

  /** The distributed half of [[mmrSelectIndexed]] — the pool plan, exposed
    * so specs can pin its shape (partition-pruned cell scan ending in a
    * TakeOrderedAndProject, never a corpus pass). */
  private[graft] def mmrPoolIndexed(spark: SparkSession, indexPath: String,
      probe: Seq[Double], poolSize: Int, nprobe: Int): DataFrame = {
    VectorExpressions.register(spark)
    val vp = currentVectorsPath(spark, indexPath) // resolve-once
    val cb = readCodebookAt(spark, indexPath, vp)
    val pnorm = math.sqrt(probe.foldLeft(0.0)((a, x) => a + x * x))
    val probeCells = rankProbeCells(cb, probe, nprobe)
    graft.text.Tombstones.filter(spark, indexPath,
        spark.read.parquet(vp).filter(col("cell").isin(probeCells: _*)),
        idCol = "vec_id")
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("v"), col("norm"),
        pround(dot_product(col("v"), lit(probe.toArray)) / (col("norm") * lit(pnorm)), 4)
          .as("rel"))
      .orderBy(desc("rel"), col("vec_id"))
      .limit(poolSize)
  }

  /** CELL-BALANCE ADVISOR — the health check for the frozen-codebook
    * append model: [[append]] assigns new batches against the codebook
    * trained on the BASE corpus (cell geometry never moves — that is
    * what makes append-then-query exact), so a drifting ingest
    * distribution concentrates new vectors into few cells and the
    * partition-pruned serving paths degrade toward scanning those hot
    * cells. Per cell: population, corpus share, imbalance vs the uniform
    * ideal (`n·k/N`); plus a `retrain_recommended` flag when the hottest
    * cell exceeds `maxImbalance`. Note the metric is bounded by k (one
    * cell holding everything scores exactly k), so the threshold must sit
    * below the cell count to be reachable — 3.0 means "a cell carrying
    * 3× its uniform share", meaningful from k=4 up. Cost: one count
    * aggregate over the
    * current vector set's `cell` partition column — column-pruned to a
    * partition key, no vector bytes read. The advisor prices the
    * decision; the remedy is [[retrain]] — a versioned codebook cutover
    * in the SAME index (round 10): the new geometry publishes as the
    * next version carrying its own codebooks, the ledger and pairing
    * survive, and appends resume incrementally against the rebalanced
    * cells. */
  def cellBalanceReport(spark: SparkSession, indexPath: String,
      maxImbalance: Double = 3.0): DataFrame = {
    val cells = spark.read.parquet(currentVectorsPath(spark, indexPath))
      .groupBy(col("cell").cast("long").as("cell"))
      .agg(count(lit(1)).as("n_vecs"))
    // hottest-cell flag computed in the SAME tiny aggregate (no window —
    // the flag is a corpus-level property, max(n)·k/N > bound)
    val totals = cells.agg(sum("n_vecs").as("n_total"),
      count(lit(1)).as("k"), max("n_vecs").as("max_n"))
    cells.crossJoin(broadcast(totals)) // k rows × 1 row
      .select(col("cell"), col("n_vecs"),
        (col("n_vecs") * lit(1.0) / col("n_total")).as("share"),
        (col("n_vecs") * col("k") * lit(1.0) / col("n_total")).as("imbalance"),
        (col("max_n") * col("k") * lit(1.0) / col("n_total") > maxImbalance)
          .cast("long").as("retrain_recommended"))
      .orderBy("cell")
  }

  /** Sharded semantic clustering over the index: within-cell banded
    * sign-LSH candidates → exact-cosine edges ≥ `minCos` → connected
    * components. Output contract matches [[Similarity.semanticClusters]]
    * (vec_id, cluster_rep, cluster_size, keep; min-id representative). */
  def semanticClustersIndexed(spark: SparkSession, indexPath: String,
      minCos: Double = 0.4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    VectorExpressions.register(spark)
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val e = spark.read.parquet(currentVectorsPath(spark, indexPath))
    val bands = e.select(col("vec_id"), col("cell"),
      posexplode(VectorExpressions.lsh_bands(col("v"),
        Similarity.NearDupBits, Similarity.NearDupBandSize,
        Similarity.EmbeddingDim)).as(Seq("band_id", "band_val")))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.cell") === col("y.cell") &&
        col("x.band_id") === col("y.band_id") &&
        col("x.band_val") === col("y.band_val") &&
        col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
    val edges = cand
      .join(e.as("a"), col("vec_a") === col("a.vec_id"))
      .join(e.as("b"), col("vec_b") === col("b.vec_id"))
      .filter(dot_product(col("a.v"), col("b.v")) /
        (col("a.norm") * col("b.norm")) >= minCos)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
      .localCheckpoint()
    val mine = graft.Checkpoints.pinnedSince(sc, before)
    val (labels, _) = graft.text.Dedup.connectedComponents(edges)
    graft.Checkpoints.release(sc, mine)
    val wholeCluster = Window.partitionBy("cluster_rep")
    e.select(col("vec_id"))
      .join(labels.withColumnRenamed("doc_id", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("label"), col("vec_id")).as("cluster_rep"))
      .withColumn("cluster_size", count(lit(1)).over(wholeCluster))
      .select(col("vec_id"), col("cluster_rep"), col("cluster_size"),
        (col("vec_id") === col("cluster_rep")).cast("long").as("keep"))
      .orderBy("vec_id")
  }
}
