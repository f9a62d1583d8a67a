package graft

import org.apache.spark.sql.functions._
import graft.vector.{CellIndex, Similarity}

/** Round-10 codebook lifecycle contract: a drifted index retrains INSIDE
  * its version chain — the advisor's flag gets a remedy whose output is
  * indistinguishable from a from-scratch index, and whose ledger/pairing
  * identity survives the cutover. */
class CellIndexRetrainSpec extends SparkSpec {

  private val Cells = 4

  /** A DRIFTED ingest batch: the base corpus's vectors pushed hard toward
    * vec_id 1's direction (deterministic; cosine assignment then piles
    * them into few cells of the base-trained codebook, while keeping
    * enough diversity that a retrain CAN rebalance them — identical
    * vectors could never split across cells). */
  private def skewBatchDir(offset: Long): String = {
    val dir = java.nio.file.Files.createTempDirectory("retrain_skew").toString
    val anchor = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter(col("vec_id") === 1).select(col("embedding").as("anchor"))
    spark.read.parquet(s"$sf0001/embeddings.parquet")
      .crossJoin(broadcast(anchor))
      .select((col("vec_id") + offset).as("vec_id"),
        expr("zip_with(embedding, anchor, (x, y) -> x + 3.0F * y)").as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def maxImbalance(idx: String): Double =
    CellIndex.cellBalanceReport(spark, idx).agg(max("imbalance"))
      .head().getDouble(0)

  private def topK(idx: String, probe: Seq[Double], nprobe: Int) =
    CellIndex.annIvfIndexed(spark, idx, probe, k = 10, nprobe = nprobe)
      .collect().map(_.toSeq).toSeq

  test("skew-append → flag → retrain: served answers equal a from-scratch index") {
    val idx = java.nio.file.Files.createTempDirectory("retrain_idx").toString
    CellIndex.write(spark, sf0001, idx, k = Cells, iters = 3)
    val probe = Similarity.probeVector(spark, sf0001)
    val balanced = maxImbalance(idx)
    // drifted ingest concentrates into few cells → the advisor flags
    val b1 = skewBatchDir(100000L)
    CellIndex.append(spark, b1, idx, Some("b1"))
    val drifted = maxImbalance(idx)
    assert(drifted > balanced, s"skew batch must concentrate: $drifted vs $balanced")
    assert(CellIndex.cellBalanceReport(spark, idx, maxImbalance = drifted - 0.01)
      .head().getAs[Long]("retrain_recommended") == 1L)
    // RETRAIN: next version, codebooks inside the version dir
    CellIndex.retrain(spark, idx, k = Cells, iters = 3)
    assert(CellIndex.currentVectorsPath(spark, idx).endsWith("vectors_v2"))
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(idx,
      "vectors_v2/_codebook")), "retrained version must carry its codebook")
    // EQUIVALENCE: a from-scratch index over the union corpus with the
    // same parameters — same deterministic training input (the stored
    // (vec_id, v) multiset equals the union corpus's), so codebook,
    // geometry, and served answers at PARTIAL probe must be identical
    val unionDir = java.nio.file.Files.createTempDirectory("retrain_u").toString
    spark.read.parquet(s"$sf0001/embeddings.parquet")
      .unionByName(spark.read.parquet(s"$b1/embeddings.parquet"))
      .write.mode("overwrite").parquet(s"$unionDir/embeddings.parquet")
    val fresh = java.nio.file.Files.createTempDirectory("retrain_f").toString
    CellIndex.write(spark, unionDir, fresh, k = Cells, iters = 3)
    assert(CellIndex.readCodebook(spark, idx) == CellIndex.readCodebook(spark, fresh),
      "retrained codebook drifted from a from-scratch train on the same corpus")
    assert(topK(idx, probe, nprobe = 2) == topK(fresh, probe, nprobe = 2),
      "partial-probe serving drifted from the from-scratch index")
    assert(CellIndex.ivfPqSearch(spark, idx, probe).collect().map(_.toSeq).toSeq ==
      CellIndex.ivfPqSearch(spark, fresh, probe).collect().map(_.toSeq).toSeq,
      "IVF-PQ serving drifted from the from-scratch index")
    // the rebalance is real: drift repaired to the from-scratch geometry
    assert(maxImbalance(idx) == maxImbalance(fresh))
    assert(maxImbalance(idx) < drifted,
      s"retrain must reduce the hottest cell: ${maxImbalance(idx)} vs $drifted")
  }

  test("appends after the cutover assign under the retrained codebook and stay exact") {
    val idx = java.nio.file.Files.createTempDirectory("retrain_app").toString
    CellIndex.write(spark, sf0001, idx, k = Cells, iters = 3)
    val probe = Similarity.probeVector(spark, sf0001)
    val b1 = skewBatchDir(100000L)
    CellIndex.append(spark, b1, idx, Some("b1"))
    CellIndex.retrain(spark, idx, k = Cells, iters = 3)
    val retrainedCb = CellIndex.readCodebook(spark, idx)
    // append a second batch AFTER the cutover
    val b2 = skewBatchDir(200000L)
    CellIndex.append(spark, b2, idx, Some("b2"))
    assert(CellIndex.currentVectorsPath(spark, idx).endsWith("vectors_v3"))
    // the retrained codebooks traveled with the new version …
    assert(CellIndex.readCodebook(spark, idx) == retrainedCb,
      "append must carry the retrained codebook forward, not fall back to the root's")
    // … and the batch's rows sit in THEIR argmax cells
    val stored = spark.read.parquet(CellIndex.currentVectorsPath(spark, idx))
      .filter(col("vec_id") >= 200000L).select(col("vec_id"), col("cell"))
    val expected = Similarity.assignCells(
        Similarity.withNorm(spark, b2), retrainedCb)
      .select(col("vec_id"), col("cell").as("expected_cell"))
    assert(stored.join(expected, Seq("vec_id"))
      .filter(col("cell") =!= col("expected_cell")).count() == 0)
    // full-probe serving still equals union-corpus exact truth (cells are
    // layout, not approximation, at nprobe = k) — the append-exactness
    // contract survives the cutover
    import graft.functions.Portable.pround
    import graft.functions.VectorExpressions.dot_product
    val pnorm = math.sqrt(probe.foldLeft(0.0)((a, x) => a + x * x))
    val union = Seq(sf0001, b1, b2).map(Similarity.withNorm(spark, _))
      .reduce(_ unionByName _)
    val want = union.select(col("vec_id"),
        pround(dot_product(col("v"), lit(probe.toArray)) / (col("norm") * lit(pnorm)), 4)
          .as("cos_sim"))
      .orderBy(desc("cos_sim"), col("vec_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = CellIndex.annIvfIndexed(spark, idx, probe, k = 10, nprobe = Cells)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toSeq
    assert(got == want, "post-cutover append drifted from union-corpus truth")
    // vacuum to the newest only: pre-retrain geometry goes, serving holds
    CellIndex.vacuumVersions(spark, idx, keepLast = 1)
    assert(CellIndex.annIvfIndexed(spark, idx, probe, k = 10, nprobe = Cells)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toSeq == want)
  }

  test("maintenance auto-retrain: a flagged fold cuts over inside the loop, pairing intact") {
    import org.apache.spark.sql.functions.{col => c}
    val work = java.nio.file.Files.createTempDirectory("auto_retrain").toString
    val vecIdx = s"$work/vec"
    val textIdx = s"$work/text"
    CellIndex.write(spark, sf0001, vecIdx, k = Cells, iters = 1)
    graft.text.TextIndex.write(spark, sf0001, textIdx)
    // a maintenance batch whose embeddings are heavily drifted (the skew
    // construction) — with a low threshold the fold must flag and retrain
    val b = skewBatchDir(100000L)
    val batch = spark.read.parquet(s"$sf0001/documents.parquet")
      .orderBy("doc_id").limit(500)
      .withColumn("doc_id", c("doc_id") + 100000L)
      .join(spark.read.parquet(s"$b/embeddings.parquet"),
        c("doc_id") === c("vec_id"))
      .select(c("doc_id"), c("text"), c("lang"), c("source"), c("n_chars"),
        c("embedding"), c("label"))
      .localCheckpoint()
    val (vecDid, _) = graft.app.IndexMaintenanceJob.applyBatch(
      spark, batch, 0L, s"$work/batches", vecIdx, textIdx,
      retrainAtImbalance = Some(1.2))
    assert(vecDid)
    // fold published v1, the triggered retrain published v2 with its own
    // codebooks, and the ledger still pairs with the text index's
    assert(CellIndex.currentVectorsPath(spark, vecIdx).endsWith("vectors_v2"))
    val fs = new org.apache.hadoop.fs.Path(vecIdx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(vecIdx,
      "vectors_v2/_codebook")))
    val (v, t) = IndexPair.consistentRoots(spark, vecIdx, textIdx)
    assert(v.endsWith("vectors_v2") && t.endsWith("v1"),
      s"auto-retrain must stay invisible to pairing, got ($v, $t)")
    // the inferred geometry kept the index's own cell count
    assert(CellIndex.readCodebook(spark, vecIdx).size == Cells)
    // replay short-circuits on the tag — no re-fold, no second retrain
    val (again, _) = graft.app.IndexMaintenanceJob.applyBatch(
      spark, batch, 0L, s"$work/batches", vecIdx, textIdx,
      retrainAtImbalance = Some(1.2))
    assert(!again)
    assert(CellIndex.currentVectorsPath(spark, vecIdx).endsWith("vectors_v2"))
  }

  test("retrain under live traffic: a polling reader always serves a committed version across fold → cutover → fold") {
    import org.apache.spark.sql.functions.{col => c}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.app.IndexMaintenanceJob
    import graft.app.IndexMaintenanceJob.IndexedDoc
    val work = java.nio.file.Files.createTempDirectory("live_retrain").toString
    val vecIdx = s"$work/vec"
    val textIdx = s"$work/text"
    CellIndex.write(spark, sf0001, vecIdx, k = Cells, iters = 1)
    graft.text.TextIndex.write(spark, sf0001, textIdx)
    val probe = Similarity.probeVector(spark, sf0001)
    def mkDocs(embDir: String, offset: Long, n: Int): Seq[IndexedDoc] =
      spark.read.parquet(s"$sf0001/documents.parquet")
        .orderBy("doc_id").limit(n)
        .withColumn("doc_id", c("doc_id") + offset)
        .join(spark.read.parquet(s"$embDir/embeddings.parquet"),
          c("doc_id") === c("vec_id"))
        .select(c("doc_id"), c("text"), c("lang"), c("source"), c("n_chars"),
          c("embedding"), c("label"))
        .as[IndexedDoc].collect().toSeq
    // a READER polls the serving path the whole time the stream runs —
    // the concurrency the sequential specs never exercised: folds and
    // the advisor-triggered retrain-cutover publish versions while a
    // query is resolving
    val answers = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Long]]()
    @volatile var stopPolling = false
    @volatile var readerErr: Throwable = null
    val reader = new Thread(() => {
      try while (!stopPolling) {
        answers.add(CellIndex.annIvfIndexed(spark, vecIdx, probe,
          k = 10, nprobe = 2).collect().map(_.getLong(1)).toSeq)
      } catch { case t: Throwable => readerErr = t }
    }, "live-retrain-reader")
    val in = MemoryStream[IndexedDoc]
    // retention high enough that every version published during the run
    // survives for the post-hoc corresponds-to-a-committed-version check
    val q = IndexMaintenanceJob.sink(in.toDS(), s"$work/batches",
      vecIdx, textIdx, s"$work/ckpt", retainVersions = 10,
      retrainAtImbalance = Some(1.2))
    reader.start()
    try {
      // fold 1: the skew batch — flags, folds v1, cuts over to v2
      in.addData(mkDocs(skewBatchDir(100000L), 100000L, 500): _*)
      q.processAllAvailable()
      // fold 2: post-cutover — must assign under the RETRAINED codebooks
      val plainDir = java.nio.file.Files.createTempDirectory("live_plain").toString
      spark.read.parquet(s"$sf0001/embeddings.parquet")
        .withColumn("vec_id", c("vec_id") + 700000L)
        .write.mode("overwrite").parquet(s"$plainDir/embeddings.parquet")
      in.addData(mkDocs(plainDir, 700000L, 40): _*)
      q.processAllAvailable()
    } finally {
      q.stop()
      stopPolling = true
      reader.join(30000)
    }
    assert(readerErr == null, s"reader failed mid-cutover: $readerErr")
    assert(!answers.isEmpty, "the reader must have served during the run")
    // the stream published at least: fold v1, retrain v2, fold v3 (a
    // second advisor-triggered retrain after fold 2 may add v4 — the
    // threshold is deliberately low; the loop re-pricing is by design)
    val curV = CellIndex.currentVectorsPath(spark, vecIdx)
      .split("vectors_v").last.toLong
    assert(curV >= 3L, s"expected fold+retrain+fold to publish ≥3 versions, at v$curV")
    // EVERY polled answer corresponds to SOME committed version: compute
    // the expected top-k per retained version (resolve-once pins vector
    // set + codebook together, so per-version answers are well-defined)
    val fs = new org.apache.hadoop.fs.Path(vecIdx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versionPaths = fs.listStatus(new org.apache.hadoop.fs.Path(vecIdx))
      .map(_.getPath.getName).filter(_.startsWith("vectors")).toSeq.sorted
      .filter(n => fs.exists(new org.apache.hadoop.fs.Path(vecIdx, s"$n/_SUCCESS")))
      .map(n => s"$vecIdx/$n")
    val legal: Set[Seq[Long]] = versionPaths.map { vp =>
      CellIndex.annIvfIndexed(spark, vecIdx, probe, k = 10, nprobe = 2,
        pinnedVectorsPath = Some(vp)).collect().map(_.getLong(1)).toSeq
    }.toSet
    val polled = answers.toArray(Array.empty[Seq[Long]]).toSeq
    val illegal = polled.filterNot(legal)
    assert(illegal.isEmpty,
      s"${illegal.size}/${polled.size} polled answers match no committed version " +
        s"(versions: $versionPaths): ${illegal.headOption}")
    // the post-cutover fold's rows sit in their argmax cells under the
    // retrained codebook (CellIndex.append's carry-forward claim, now
    // exercised through the live stream rather than sequentially)
    val cb = CellIndex.readCodebook(spark, vecIdx)
    val stored = spark.read.parquet(CellIndex.currentVectorsPath(spark, vecIdx))
      .filter(c("vec_id") >= 700000L).select(c("vec_id"), c("cell"))
    assert(stored.count() == 40)
    val expected = Similarity.assignCells(
        Similarity.withNorm(spark, s"$work/batches/batch_1"), cb)
      .select(c("vec_id"), c("cell").as("expected_cell"))
    assert(stored.join(expected, Seq("vec_id"))
      .filter(c("cell") =!= c("expected_cell")).count() == 0,
      "post-cutover fold must assign under the retrained codebooks")
  }

  test("retrain copies the ledger verbatim — cross-index pairing survives the cutover") {
    val work = java.nio.file.Files.createTempDirectory("retrain_pair").toString
    val vecIdx = s"$work/vec"
    val textIdx = s"$work/text"
    CellIndex.write(spark, sf0001, vecIdx, k = Cells, iters = 1)
    graft.text.TextIndex.write(spark, sf0001, textIdx)
    // one tagged batch folded into BOTH indexes
    val dir = java.nio.file.Files.createTempDirectory("retrain_pb").toString
    spark.read.parquet(s"$sf0001/documents.parquet").orderBy("doc_id").limit(20)
      .withColumn("doc_id", col("doc_id") + 100000L)
      .write.parquet(s"$dir/documents.parquet")
    spark.read.parquet(s"$sf0001/embeddings.parquet").orderBy("vec_id").limit(20)
      .withColumn("vec_id", col("vec_id") + 100000L)
      .write.parquet(s"$dir/embeddings.parquet")
    CellIndex.append(spark, dir, vecIdx, Some("b1"))
    graft.text.TextIndex.append(spark, dir, textIdx, tag = Some("b1"))
    // cutover on the vector side only: same corpus, new geometry — the
    // pair must advance to the RETRAINED vector version (equal ledgers)
    CellIndex.retrain(spark, vecIdx, k = Cells, iters = 1)
    val (v, t) = IndexPair.consistentRoots(spark, vecIdx, textIdx)
    assert(v.endsWith("vectors_v2") && t.endsWith("v1"),
      s"pairing must resolve the retrained version, got ($v, $t)")
  }
}
