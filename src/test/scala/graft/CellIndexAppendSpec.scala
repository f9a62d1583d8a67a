package graft

import org.apache.spark.sql.functions._
import graft.vector.{CellIndex, Similarity}

/** Round-8 incremental-maintenance contract for the partition-by-cell
  * vector index: appending a batch against the PERSISTED codebooks must be
  * indistinguishable to readers from having indexed the union corpus under
  * the same codebooks, published atomically, with old versions vacuumable. */
class CellIndexAppendSpec extends SparkSpec {

  /** A derived batch corpus: sf0.001's embeddings with offset ids and
    * reversed vectors (deterministic, disjoint id space, different cell
    * geometry than the originals). */
  private def batchDir(offset: Long): String = {
    val dir = java.nio.file.Files.createTempDirectory("cellidx_batch").toString
    spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select((col("vec_id") + offset).as("vec_id"),
        reverse(col("embedding")).as("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  /** Exact cosine ranking over a union of corpora — the reader-visible
    * truth appended indexes are held to (same dot/norm/pround expressions
    * as the index scan, so equality is bit-for-bit). */
  private def exactTopK(dirs: Seq[String], probe: Seq[Double], k: Int) = {
    import graft.functions.Portable.pround
    import graft.functions.VectorExpressions.dot_product
    val pnorm = math.sqrt(probe.foldLeft(0.0)((a, x) => a + x * x))
    val union = dirs.map(Similarity.withNorm(spark, _)).reduce(_ unionByName _)
    val scored = union.select(col("vec_id"),
      pround(dot_product(col("v"), lit(probe.toArray)) / (col("norm") * lit(pnorm)), 4)
        .as("cos_sim"))
    scored.orderBy(desc("cos_sim"), col("vec_id")).limit(k)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
  }

  test("append-then-query equals union-corpus truth; atomic publish; vacuum") {
    val cells = 4
    val idx = java.nio.file.Files.createTempDirectory("cellidx_app").toString
    CellIndex.write(spark, sf0001, idx, k = cells, iters = 3)
    val probe = Similarity.probeVector(spark, sf0001)
    val b1 = batchDir(100000L)
    CellIndex.append(spark, b1, idx)
    assert(CellIndex.currentVectorsPath(spark, idx).endsWith("vectors_v1"))
    // full probe ⇒ the indexed answer must be EXACTLY the union-corpus
    // exact ranking (cells are layout, not approximation, at nprobe=k)
    val got1 = CellIndex.annIvfIndexed(spark, idx, probe, k = 10, nprobe = cells)
      .collect().map(r => (r.getLong(1), r.getDouble(3)))
    assert(got1.toSeq == exactTopK(Seq(sf0001, b1), probe, 10).toSeq,
      "appended index drifted from union-corpus ranking")
    // append on append: v2 carries v1's carried files forward again
    val b2 = batchDir(200000L)
    CellIndex.append(spark, b2, idx)
    assert(CellIndex.currentVectorsPath(spark, idx).endsWith("vectors_v2"))
    val got2 = CellIndex.annIvfIndexed(spark, idx, probe, k = 10, nprobe = cells)
      .collect().map(r => (r.getLong(1), r.getDouble(3)))
    assert(got2.toSeq == exactTopK(Seq(sf0001, b1, b2), probe, 10).toSeq)
    // assignment honesty: every appended row sits in the argmax-cosine
    // cell of the PERSISTED codebook (no retraining drift)
    val cb = CellIndex.readCodebook(spark, idx)
    val stored = spark.read.parquet(CellIndex.currentVectorsPath(spark, idx))
      .select(col("vec_id"), col("cell"))
    val expected = Similarity.assignCells(
        Similarity.withNorm(spark, sf0001)
          .unionByName(Similarity.withNorm(spark, b1))
          .unionByName(Similarity.withNorm(spark, b2)), cb)
      .select(col("vec_id"), col("cell").as("expected_cell"))
    assert(stored.join(expected, Seq("vec_id"))
      .filter(col("cell") =!= col("expected_cell")).count() == 0)
    assert(stored.count() == 1500)
    // an uncommitted version dir (crashed attempt: no _SUCCESS) is
    // invisible to readers
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(idx, "vectors_v99"))
    assert(CellIndex.currentVectorsPath(spark, idx).endsWith("vectors_v2"))
    fs.delete(new org.apache.hadoop.fs.Path(idx, "vectors_v99"), true)
    // vacuum to the newest version only: the base and v1 go, readers
    // still serve the identical answer from v2
    val dropped = CellIndex.vacuumVersions(spark, idx, keepLast = 1)
    assert(dropped.size == 2 &&
      dropped.exists(_.endsWith("vectors")) && dropped.exists(_.endsWith("vectors_v1")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(idx, "vectors")))
    val got3 = CellIndex.annIvfIndexed(spark, idx, probe, k = 10, nprobe = cells)
      .collect().map(r => (r.getLong(1), r.getDouble(3)))
    assert(got3.toSeq == got2.toSeq, "vacuum changed the served answer")
  }

  test("cell-balance advisor flags a skew-concentrating append, not the base corpus") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("cellidx_bal").toString
    CellIndex.write(spark, sf0001, idx, k = 4, iters = 3)
    val base = CellIndex.cellBalanceReport(spark, idx).collect()
    assert(base.map(_.getLong(1)).sum == 500L)
    assert(math.abs(base.map(_.getDouble(2)).sum - 1.0) < 1e-9)
    val baseFlag = base.head.getLong(4)
    // a batch of 2000 near-identical vectors (one existing vector repeated
    // with fresh ids) all assign to ONE cell: imbalance explodes past any
    // sane bound and the flag must flip
    val one = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .orderBy("vec_id").limit(1).collect().head
    val v = one.getAs[Seq[Float]]("embedding").toList
    val dir = java.nio.file.Files.createTempDirectory("cellidx_skew").toString
    (0 until 2000).map(i => (900000L + i, v, 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    CellIndex.append(spark, dir, idx, Some("skew"))
    val after = CellIndex.cellBalanceReport(spark, idx).collect()
    assert(after.map(_.getLong(1)).sum == 2500L)
    assert(after.forall(_.getLong(4) == 1L),
      s"skewed append must recommend retrain: ${after.toSeq}")
    assert(baseFlag == 0L || after.exists(_.getDouble(3) >
      base.map(_.getDouble(3)).max),
      "imbalance must have worsened")
  }
}
