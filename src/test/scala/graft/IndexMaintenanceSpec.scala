package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.app.IndexMaintenanceJob
import graft.app.IndexMaintenanceJob.IndexedDoc
import graft.text.TextIndex
import graft.vector.{CellIndex, Similarity}

/** The streaming freshness wire over both append protocols: micro-batches
  * of new docs+embeddings fold into the at-rest indexes exactly once, and
  * the served answers equal a from-scratch rebuild over everything seen. */
class IndexMaintenanceSpec extends SparkSpec {

  private def mkBatch(offset: Long, n: Int): Seq[IndexedDoc] =
    spark.read.parquet(s"$sf0001/documents.parquet")
      .join(spark.read.parquet(s"$sf0001/embeddings.parquet"),
        col("doc_id") === col("vec_id"))
      .orderBy("doc_id").limit(n).collect().map { r =>
        IndexedDoc(r.getAs[Long]("doc_id") + offset,
          r.getAs[String]("text"), r.getAs[String]("lang"),
          r.getAs[String]("source"), r.getAs[Long]("n_chars"),
          r.getAs[Seq[Float]]("embedding").reverse.toList, r.getAs[Int]("label"))
      }.toSeq

  test("streaming maintenance folds batches exactly once into both indexes") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val work = java.nio.file.Files.createTempDirectory("idxmaint").toString
    val vecIdx = s"$work/vec"
    val textIdx = s"$work/text"
    CellIndex.write(spark, sf0001, vecIdx, k = 4, iters = 3)
    TextIndex.write(spark, sf0001, textIdx)
    val in = MemoryStream[IndexedDoc]
    // retainVersions = 2: after the second batch the base version must be
    // vacuumed (bounded storage) while the tag ledger carries forward
    val q = IndexMaintenanceJob.sink(in.toDS(), s"$work/batches",
      vecIdx, textIdx, s"$work/ckpt", retainVersions = 2)
    try {
      in.addData(mkBatch(100000L, 40): _*)
      q.processAllAvailable()
      in.addData(mkBatch(200000L, 25): _*)
      q.processAllAvailable()
    } finally q.stop()
    // both indexes carry both batch tags and advanced two versions
    assert(CellIndex.appliedTags(spark, vecIdx) == Set("batch_0", "batch_1"))
    assert(TextIndex.appliedTags(spark, textIdx) == Set("batch_0", "batch_1"))
    assert(CellIndex.currentVectorsPath(spark, vecIdx).endsWith("vectors_v2"))
    assert(TextIndex.currentRoot(spark, textIdx).endsWith("v2"))
    // streaming retention: the base version set was vacuumed, v1+v2 remain
    val vfs = new org.apache.hadoop.fs.Path(vecIdx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!vfs.exists(new org.apache.hadoop.fs.Path(vecIdx, "vectors")),
      "retention must vacuum the base vector set after two appends")
    assert(!vfs.exists(new org.apache.hadoop.fs.Path(textIdx, "stats")),
      "retention must vacuum the base text-index triple after two appends")
    // the indexed corpus is base + both batches, rows intact
    val vecs = spark.read.parquet(CellIndex.currentVectorsPath(spark, vecIdx))
    assert(vecs.count() == 500 + 40 + 25)
    // served BM25 equals a from-scratch rebuild over everything ingested
    val unionDir = java.nio.file.Files.createTempDirectory("idxmaint_u").toString
    val b0 = spark.read.parquet(s"$work/batches/batch_0/documents.parquet")
    val b1 = spark.read.parquet(s"$work/batches/batch_1/documents.parquet")
    spark.read.parquet(s"$sf0001/documents.parquet")
      .unionByName(b0).unionByName(b1)
      .write.mode("overwrite").parquet(s"$unionDir/documents.parquet")
    val rebuilt = java.nio.file.Files.createTempDirectory("idxmaint_rb").toString
    TextIndex.write(spark, unionDir, rebuilt)
    assert(TextIndex.bm25Indexed(spark, textIdx).collect().map(_.toSeq).toSeq ==
      TextIndex.bm25Indexed(spark, rebuilt).collect().map(_.toSeq).toSeq,
      "streaming-maintained text index drifted from a full rebuild")
    // REPLAY (at-least-once delivery): re-applying an already-folded batch
    // must short-circuit on the tag — no new version, no duplicate rows
    val replay = spark.read.parquet(s"$work/batches/batch_1/documents.parquet")
      .join(spark.read.parquet(s"$work/batches/batch_1/embeddings.parquet"),
        col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"), col("embedding"), col("label"))
      // materialized: applyBatch overwrites the very files this plan reads
      .localCheckpoint()
    val (vecDid, txtDid) = IndexMaintenanceJob.applyBatch(
      spark, replay, 1L, s"$work/batches", vecIdx, textIdx)
    assert(!vecDid && !txtDid, "replayed batch must not re-append")
    assert(CellIndex.currentVectorsPath(spark, vecIdx).endsWith("vectors_v2"))
    assert(spark.read.parquet(CellIndex.currentVectorsPath(spark, vecIdx))
      .count() == 565)
  }
}
