package graft

import org.apache.spark.sql.functions._
import graft.text.TextIndex

/** Round-8 incremental-maintenance contract for the posting index. A text
  * index carries no trained state, so the bar is higher than CellIndex's:
  * append-then-read must equal a full rebuild over the union corpus
  * EXACTLY — same postings, same merged df table, same scalars, same
  * served BM25 answer. */
class TextIndexAppendSpec extends SparkSpec {

  /** A derived batch corpus over sf0.001's documents: offset ids, text
    * reused verbatim — every term's df doubles on merge, the hardest path
    * for the keyed df sum (all-new vocabulary would never exercise it). */
  private def docsDirFrom(offset: Long): String = {
    val dir = java.nio.file.Files.createTempDirectory("textidx_batch").toString
    spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("doc_id", col("doc_id") + offset)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def unionDir(dirs: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("textidx_union").toString
    dirs.map(d => spark.read.parquet(s"$d/documents.parquet"))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("append equals a full rebuild over the union corpus, exactly") {
    val idx = java.nio.file.Files.createTempDirectory("textidx_app").toString
    TextIndex.write(spark, sf0001, idx)
    val batch = docsDirFrom(500000L)
    TextIndex.append(spark, batch, idx)
    assert(TextIndex.currentRoot(spark, idx).endsWith("v1"))
    val rebuilt = java.nio.file.Files.createTempDirectory("textidx_rb").toString
    TextIndex.write(spark, unionDir(Seq(sf0001, batch)), rebuilt)
    // served answer identical
    val got = TextIndex.bm25Indexed(spark, idx).collect().map(_.toSeq)
    val want = TextIndex.bm25Indexed(spark, rebuilt).collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq, "appended index answer drifted from rebuild")
    // artifact-level equality: postings row set and merged df table
    def postings(p: String) = spark.read
      .parquet(s"${TextIndex.currentRoot(spark, p)}/postings")
      .select("tok", "doc_id", "tf", "dl", "tb")
      .collect().map(_.toSeq).toSet
    assert(postings(idx) == postings(rebuilt), "postings row sets differ")
    def dfreq(p: String) = spark.read
      .parquet(s"${TextIndex.currentRoot(spark, p)}/dfreq")
      .select("tok", "df", "tb").collect().map(_.toSeq).toSet
    assert(dfreq(idx) == dfreq(rebuilt), "merged df table differs from rebuild")
    assert(TextIndex.readStats(spark, idx) == TextIndex.readStats(spark, rebuilt))
    // a crashed attempt (no stats/_SUCCESS) is invisible to readers
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(idx, "v99/postings"))
    assert(TextIndex.currentRoot(spark, idx).endsWith("v1"))
    fs.delete(new org.apache.hadoop.fs.Path(idx, "v99"), true)
    // vacuum to the newest version: the base triple goes, v1 still serves
    val dropped = TextIndex.vacuumVersions(spark, idx, keepLast = 1)
    assert(dropped.size == 3 && !fs.exists(new org.apache.hadoop.fs.Path(idx, "stats")))
    val after = TextIndex.bm25Indexed(spark, idx).collect().map(_.toSeq)
    assert(after.toSeq == got.toSeq, "vacuum changed the served answer")
  }

  test("append reuses the persisted bucket count, never a caller parameter") {
    // an index written with a NON-default bucket count must keep it across
    // appends — a caller-supplied count differing from the layout's would
    // silently exclude carried-forward postings from pruned scans
    val idx = java.nio.file.Files.createTempDirectory("textidx_b8").toString
    TextIndex.write(spark, sf0001, idx, buckets = 8)
    val batch = docsDirFrom(700000L)
    TextIndex.append(spark, batch, idx)
    val rebuilt = java.nio.file.Files.createTempDirectory("textidx_b8rb").toString
    TextIndex.write(spark, unionDir(Seq(sf0001, batch)), rebuilt, buckets = 8)
    assert(TextIndex.bm25Indexed(spark, idx).collect().map(_.toSeq).toSeq ==
      TextIndex.bm25Indexed(spark, rebuilt).collect().map(_.toSeq).toSeq,
      "8-bucket appended index drifted from an 8-bucket rebuild")
  }
}
