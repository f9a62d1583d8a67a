package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** AT-REST NEAR-DUP CLUSTER INDEX (round 12 — the round-11 verdict's
  * task #2): the last dedup-family member with no incremental form.
  * q49/q61/q83/q93 recompute connected components over the WHOLE
  * banded-candidate graph per run; at 100 TB that is a corpus-mass
  * signature pass plus a full CC resolution for every batch of new
  * documents. This artifact persists the three tables the incremental
  * fold needs:
  *
  *  - `sigs/`   — (doc_id, sig) MinHash signatures, id-hash-bucketed
  *               (`sb=` dirs): the verify side of new candidate pairs;
  *  - `bands/`  — (doc_id, band_id, band_val), band-hash-bucketed
  *               (`bb=` dirs): the probe side — a batch's bands join
  *               here to find batch↔old candidates;
  *  - `labels/` — (doc_id, label) for the clustered subgraph only (the
  *               [[Dedup]] ccLabels contract: the singleton majority is
  *               re-attached by consumers with one left join).
  *
  * FOLD = CONTRACTED-GRAPH CC, and it is EXACT, not as-of: band
  * matching is pairwise-static (two docs band-match iff their
  * signatures agree on a band — independent of what else is in the
  * corpus), so the union corpus's edge set is exactly {base edges} ∪
  * {batch↔old and batch↔batch edges found per fold} — no old↔old edge
  * can appear later. A fold therefore only needs CC over the CONTRACTED
  * graph whose nodes are batch docs and the OLD LABELS their edges
  * touch: each old label IS the min doc_id of its old cluster, so the
  * contracted min-label fixed point equals the union-corpus min-label
  * fixed point — including the case where one batch doc transitively
  * MERGES two old clusters (every member of the higher-labeled cluster
  * relabels; spec'd). CC cost tracks the BATCH edge set, never the
  * corpus.
  *
  * Sigs/bands are add-only facts (append carries current files forward
  * byte-for-byte, the [[TextIndex.append]] posting rule); labels are
  * the one mutable table and are REWRITTEN per fold — clustered-docs
  * mass, a small fraction of the corpus by the near-dup prior (the
  * dfreq-rewrite trade [[TextIndex.append]] already makes at
  * vocabulary mass). Publishes versioned `v<N>/` dirs under the
  * staging + guarded-rename + applied-tags protocol; `stats/` persists
  * the bucket count AND the minJaccard threshold (both are artifact
  * SEMANTICS: folding under a different threshold would mix edge sets
  * silently) and commits last.
  *
  * Reference behavior covered: the reference's dedup surface is the
  * silver-layer drop-duplicates (`/root/reference/data/lake_writer.py:13-16`);
  * the cluster resolution and its maintenance are the scale-path
  * extension SURVEY §2 U6 claims. */
object ClusterIndex {

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

  def currentRoot(spark: SparkSession, indexPath: String): String = {
    val vs = committedVersions(spark, indexPath)
    require(vs.nonEmpty, s"no committed cluster index under $indexPath")
    versionRoot(indexPath, vs.max)
  }

  /** Batch tags already folded into the current committed version. */
  def appliedTags(spark: SparkSession, indexPath: String): Set[String] = {
    import org.apache.hadoop.fs.Path
    val vs = committedVersions(spark, indexPath)
    if (vs.isEmpty) return Set.empty
    val fs = new Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.IndexVersions.readTags(fs,
      new Path(versionRoot(indexPath, vs.max)))
  }

  private def readStatsAt(spark: SparkSession, root: String): (Int, Double) = {
    val r = spark.read.parquet(s"$root/stats")
      .select(col("buckets"), col("min_jaccard")).collect().head
    (r.getLong(0).toInt, r.getDouble(1))
  }

  /** Build the base index: one signature pass feeds sigs + bands; the
    * label table is the full q49 resolution (banded candidates →
    * est-Jaccard edges → min-label CC) — paid ONCE, which is the point. */
  def write(spark: SparkSession, dir: String, indexPath: String,
      minJaccard: Double = 0.5, buckets: Int = 16): Unit = {
    import spark.implicits._
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val sigArr = Dedup.sigTable(spark, dir).localCheckpoint()
    sigArr
      .withColumn("sb", pmod(hash(col("doc_id")), lit(buckets)))
      .repartition(col("sb"))
      .sortWithinPartitions("doc_id") // row-group stats prune by id
      .write.mode("overwrite").partitionBy("sb")
      .parquet(s"$indexPath/sigs")
    Dedup.bandsOf(sigArr)
      .withColumn("bb", pmod(hash(col("band_val")), lit(buckets)))
      .repartition(col("bb"))
      .sortWithinPartitions("band_val")
      .write.mode("overwrite").partitionBy("bb")
      .parquet(s"$indexPath/bands")
    val edges = Dedup.minhashPairsUnsorted(spark, dir)
      .filter(col("est_jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint()
    val (labels, _) = Dedup.connectedComponents(edges)
    labels.write.mode("overwrite").parquet(s"$indexPath/labels")
    Seq((buckets.toLong, minJaccard)).toDF("buckets", "min_jaccard")
      .coalesce(1) // 1 row — layout + semantics scalars
      .write.mode("overwrite").parquet(s"$indexPath/stats")
    graft.Checkpoints.release(sc, graft.Checkpoints.pinnedSince(sc, before))
  }

  /** Fold one batch (`batchDir/documents.parquet`; doc_ids must be NEW —
    * the store/index append contract): compute the batch's signatures
    * and bands, find batch↔old candidates against the at-rest bands and
    * batch↔batch candidates within the batch, verify both with the
    * SHARED est-Jaccard rule against at-rest + batch signatures, run CC
    * on the CONTRACTED graph (old endpoints collapse to their current
    * label), and publish `v<N>` with updated labels, carried-forward +
    * batch sig/band files, and the applied-tags ledger. Exact — spec'd
    * append ≡ rebuild, including old-cluster merges. */
  def append(spark: SparkSession, batchDir: String, indexPath: String,
      tag: Option[String] = None,
      fence: () => Unit = graft.IndexVersions.NoFence): Unit = {
    graft.IndexVersions.requireValidTag(tag)
    import org.apache.hadoop.fs.{FileUtil, Path}
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(indexPath)
    val fs = root.getFileSystem(conf)
    val versions = committedVersions(spark, indexPath)
    require(versions.nonEmpty, s"append needs an existing index at $indexPath")
    val cur = versionRoot(indexPath, versions.max)
    val next = versions.max + 1
    val target = new Path(root, s"v$next")
    val staging = new Path(root,
      s".staging_v${next}_${java.util.UUID.randomUUID().toString.take(8)}")
    // layout + semantics come from the INDEX, never from parameters: a
    // different bucket count would mis-prune carried files; a different
    // threshold would silently mix edge sets (the TextIndex bucket rule)
    val (buckets, minJaccard) = readStatsAt(spark, cur)
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val batchSig = Dedup.sigTable(spark, batchDir).localCheckpoint()
    val batchBands = Dedup.bandsOf(batchSig)
      .localCheckpoint() // feeds the old-probe join AND the batch write
    // batch↔old candidates: the batch's bands probe the at-rest band
    // table — broadcast the batch side (micro-batch-bounded by the
    // maintenance contract), so the at-rest side is ONE scan, no shuffle
    val oldBands = spark.read.parquet(s"$cur/bands")
    val candOld = oldBands.join(
        broadcast(batchBands.select(col("band_id"), col("band_val"),
          col("doc_id").as("b_doc"))),
        Seq("band_id", "band_val"))
      .select(col("b_doc"), col("doc_id").as("o_doc"))
      .distinct()
    // batch↔batch candidates: the in-query builder's self-join shape,
    // batch-bounded
    val candNew = batchBands.as("x").join(batchBands.as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.band_val") === col("y.band_val") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    // verify with the SHARED rule; old signatures fetched by candidate id
    // (candidate-bounded, id-keyed against the sorted sig buckets)
    val oldSigs = spark.read.parquet(s"$cur/sigs")
      .join(broadcast(candOld.select(col("o_doc").as("doc_id")).distinct()),
        Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("sig"))
    val edgesOld = candOld
      .join(batchSig.as("b"), col("b_doc") === col("b.doc_id"))
      .join(oldSigs.as("o"), col("o_doc") === col("o.doc_id"))
      .filter(Dedup.estJaccard(col("b.sig"), col("o.sig")) >= minJaccard)
      .select(col("b_doc").as("doc_a"), col("o_doc").as("doc_b"))
    val edgesNew = candNew
      .join(batchSig.as("a"), col("doc_a") === col("a.doc_id"))
      .join(batchSig.as("b2"), col("doc_b") === col("b2.doc_id"))
      .filter(Dedup.estJaccard(col("a.sig"), col("b2.sig")) >= minJaccard)
      .select(col("doc_a"), col("doc_b"))
    // CONTRACT old endpoints to their current label (an unclustered old
    // doc contracts to itself); batch endpoints stay themselves. Each
    // old label is the min doc_id of its cluster, so min-label CC over
    // this graph equals min-label CC over the union corpus — merges of
    // two old clusters included (the transitive case a batch doc bridges)
    val oldLabels = spark.read.parquet(s"$cur/labels")
    val contracted = edgesOld
      .join(oldLabels.withColumnRenamed("doc_id", "o_id"),
        col("doc_b") === col("o_id"), "left")
      .select(col("doc_a"), coalesce(col("label"), col("doc_b")).as("doc_b"))
      .unionByName(edgesNew)
      .localCheckpoint() // the CC loop re-reads edges every round
    val (rootMap0, _) = Dedup.connectedComponents(contracted)
    val rootMap = rootMap0.toDF("node", "root").localCheckpoint()
    // new label table: members of re-rooted old clusters update via a
    // label-keyed join; contracted nodes absent from the old table (batch
    // docs, newly-clustered old singletons) append as fresh rows
    val updatedOld = oldLabels
      .join(rootMap, col("label") === col("node"), "left")
      .select(col("doc_id"), coalesce(col("root"), col("label")).as("label"))
    val newRows = rootMap
      .join(oldLabels.select("doc_id"), col("node") === col("doc_id"),
        "left_anti")
      .select(col("node").as("doc_id"), col("root").as("label"))
    updatedOld.unionByName(newRows)
      .write.mode("overwrite").parquet(new Path(staging, "labels").toString)
    // batch sigs/bands land bucketed; current files then copy in beside
    // them (the TextIndex.append carry-forward — part names embed job
    // UUIDs, no collisions)
    batchSig
      .withColumn("sb", pmod(hash(col("doc_id")), lit(buckets)))
      .repartition(col("sb"))
      .sortWithinPartitions("doc_id")
      .write.mode("overwrite").partitionBy("sb")
      .parquet(new Path(staging, "sigs").toString)
    batchBands
      .withColumn("bb", pmod(hash(col("band_val")), lit(buckets)))
      .repartition(col("bb"))
      .sortWithinPartitions("band_val")
      .write.mode("overwrite").partitionBy("bb")
      .parquet(new Path(staging, "bands").toString)
    for ((art, pref) <- Seq(("sigs", "sb="), ("bands", "bb="))) {
      fs.listStatus(new Path(cur, art)).toSeq
        .filter(_.getPath.getName.startsWith(pref))
        .foreach { s =>
          val dstB = new Path(new Path(staging, art), s.getPath.getName)
          fs.mkdirs(dstB)
          fs.listStatus(s.getPath).toSeq
            .filter(f => f.getPath.getName.startsWith("part-"))
            .foreach(f => FileUtil.copy(fs, f.getPath, fs,
              new Path(dstB, f.getPath.getName), false, conf))
        }
    }
    // scalars carry forward verbatim; stats is written LAST — its
    // _SUCCESS is the version's commit marker
    Seq((buckets.toLong, minJaccard)).toDF("buckets", "min_jaccard")
      .coalesce(1)
      .write.mode("overwrite").parquet(new Path(staging, "stats").toString)
    graft.Checkpoints.release(sc, graft.Checkpoints.pinnedSince(sc, before))
    graft.IndexVersions.writeLedger(fs, staging,
      graft.IndexVersions.readLedger(fs, new Path(cur)).append(tag))
    graft.IndexVersions.publish(fs, staging, target,
      t => fs.exists(new Path(t, "stats/_SUCCESS")), fence)
  }

  /** The served label table (newest committed version) — (doc_id, label)
    * for clustered docs; consumers re-attach singletons with a left join
    * (the ccLabels contract). */
  def labels(spark: SparkSession, indexPath: String): DataFrame =
    spark.read.parquet(s"${currentRoot(spark, indexPath)}/labels")

  /** Q160 — q49's (doc_id, cluster_rep, keep) resolution SERVED from the
    * maintained artifact: the corpus table contributes only the doc-id
    * spine (every doc, clustered or not); signatures, candidates and CC
    * never recompute. Exact vs the full q49 recompute by the contracted
    * fold argument — the row shares q49's oracle verbatim. */
  def nearDupClustersServed(spark: SparkSession, dir: String,
      indexPath: String): DataFrame =
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(labels(spark, indexPath), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster_rep"),
        (col("doc_id") === coalesce(col("label"), col("doc_id")))
          .cast("long").as("keep"))
      .orderBy("doc_id")

  /** Shared version vacuum (the [[TextIndex.vacuumVersions]] contract:
    * keepLast floor of one, grace for in-flight readers, stranded-dir
    * sweep via the owner map). */
  def vacuumVersions(spark: SparkSession, indexPath: String,
      keepLast: Int = 3, graceMs: Long = 0L): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dirsOf(v: Long): Seq[String] =
      if (v == 0L) Seq("stats", "labels", "sigs", "bands")
      else Seq(s"v$v")
    def owner(name: String): Option[Long] = name match {
      case "stats" | "labels" | "sigs" | "bands" => Some(0L)
      case n if n.startsWith("v") && n.stripPrefix("v").nonEmpty &&
        n.stripPrefix("v").forall(_.isDigit) => Some(n.stripPrefix("v").toLong)
      case _ => None
    }
    graft.IndexVersions.vacuum(fs, root,
      committedVersions(spark, indexPath), dirsOf, keepLast, graceMs, owner,
      () => committedVersions(spark, indexPath))
  }
}
