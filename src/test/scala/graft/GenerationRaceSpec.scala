package graft

import org.apache.spark.sql.functions._
import graft.text.{ClusterIndex, Dedup, DocStore}
import graft.analytics.Relational

/** Round-14 contract for the RESOLVE-ONCE generation combinator
  * ([[graft.IndexVersions.withGeneration]]): the round-13 TOCTOU class —
  * a multi-step read resolving the current generation more than once, so
  * a concurrent in-chain compaction flips the generation mid-read and the
  * reader mixes the old base with the new generation's (empty) delta
  * set — must stay dead STRUCTURALLY. Each test drives a real compaction
  * through the [[graft.IndexVersions.onGenerationResolved]] seam at the
  * exact resolved→read boundary (the worst legal interleaving: the
  * compaction commits after the reader pinned its generation and before
  * it read a single byte) and asserts the read serves ONE consistent
  * generation — byte-identical to the no-race answer. Old generations
  * persist until vacuum's grace passes (the version-chain contract), so
  * the pinned generation stays readable throughout. */
class GenerationRaceSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def docsDirFrom(offset: Long): String = {
    val dir = java.nio.file.Files.createTempDirectory("race_batch").toString
    spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("doc_id", col("doc_id") + lit(offset))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def cmp(r: org.apache.spark.sql.Row): Seq[Any] =
    r.toSeq.map {
      case a: Array[Byte] => a.toSeq
      case x => x
    }

  /** Run `read` with a hook that lands `compaction` at the FIRST
    * generation resolution (the seam fires inside the compaction's own
    * resolutions too — the `fired` latch keeps those from recursing). */
  private def withRace[T](compaction: => Unit)(read: => T): T = {
    var fired = false
    graft.IndexVersions.onGenerationResolved = _ => {
      if (!fired) { fired = true; compaction }
    }
    try {
      val out = read
      assert(fired, "the race hook never fired — the read path is not " +
        "going through IndexVersions.withGeneration")
      out
    } finally graft.IndexVersions.onGenerationResolved = _ => ()
  }

  test("doc store: a compaction landing mid-fetch cannot drop batch rows from the page") {
    val store = tmp("race_store")
    DocStore.write(spark, sf0001, store)
    assert(DocStore.append(spark, docsDirFrom(500000L), store, "b1"))
    val ids = Seq(1L, 42L, 500001L, 500042L)
    val want = DocStore.fetchPage(spark, store, ids)
      .orderBy("doc_id").collect().map(cmp).toSeq
    val got = withRace(DocStore.compact(spark, store)) {
      DocStore.fetchPage(spark, store, ids)
        .orderBy("doc_id").collect().map(cmp).toSeq
    }
    assert(got == want,
      "a mid-fetch compaction made the reader mix generations")
    // the compaction really happened — the next read resolves _g1
    assert(DocStore.liveBatchCount(spark, store) == 0)
    assert(DocStore.fetchPage(spark, store, ids)
      .orderBy("doc_id").collect().map(cmp).toSeq == want)
  }

  test("gram ledger: a compaction landing mid-rewrite cannot lose delta grams from the merge") {
    def parityDir(parity: Int): String = {
      val dir = java.nio.file.Files.createTempDirectory(s"race_gp$parity").toString
      spark.read.parquet(s"$sf0001/documents.parquet")
        .filter(col("doc_id") % 2 === parity)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    val odds = parityDir(1)
    val ledger = tmp("race_gl")
    Dedup.writeGramLedger(spark, parityDir(0), ledger, n = 5)
    assert(Dedup.appendGramLedger(spark, odds, ledger, "fold_odd"))
    val want = Dedup.rewriteBatchAgainstLedger(spark, odds, ledger)
      .collect().map(cmp).toSeq
    val got = withRace(Dedup.compactGramLedgerInChain(spark, ledger)) {
      Dedup.rewriteBatchAgainstLedger(spark, odds, ledger)
        .collect().map(cmp).toSeq
    }
    assert(got == want,
      "a mid-rewrite compaction dropped the old generation's delta grams")
    assert(Dedup.gramLedgerLiveBatchCount(spark, ledger) == 0)
  }

  test("freq table: a compaction landing mid-estimate cannot undercount (CMS est >= exact)") {
    def evDir(off: Long): String = {
      val dir = java.nio.file.Files.createTempDirectory("race_ev").toString
      spark.read.parquet(s"$sf0001/events.parquet")
        .withColumn("event_id", col("event_id") + lit(off))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    val tbl = tmp("race_freq")
    Relational.writeFreqSketches(spark, sf0001, tbl)
    assert(Relational.appendFreqSketches(spark, evDir(1000000L), tbl, "f1"))
    val keys = Seq(1L, 2L, 3L, 5L, 8L)
    val want = Relational.freqEstimatesFromSketches(spark, tbl, keys)
      .collect().map(cmp).toSeq
    val got = withRace(Relational.compactFreqSketches(spark, tbl)) {
      Relational.freqEstimatesFromSketches(spark, tbl, keys)
        .collect().map(cmp).toSeq
    }
    assert(got == want,
      "a mid-read compaction changed the merged CMS estimates")
    assert(Relational.freqLiveBatchCount(spark, tbl) == 0)
  }

  test("cluster index: a compaction landing mid-serve cannot change the served resolution") {
    val idx = tmp("race_cidx")
    ClusterIndex.write(spark, sf0001, idx)
    ClusterIndex.append(spark, docsDirFrom(300000L), idx, Some("fold_b"))
    val want = ClusterIndex.nearDupClustersServed(spark, sf0001, idx)
      .collect().map(cmp).toSeq
    val got = withRace(ClusterIndex.compact(spark, idx)) {
      ClusterIndex.nearDupClustersServed(spark, sf0001, idx)
        .collect().map(cmp).toSeq
    }
    assert(got == want,
      "a mid-serve compaction changed the cluster resolution")
    assert(ClusterIndex.liveBatchCount(spark, idx) == 0)
  }
}
