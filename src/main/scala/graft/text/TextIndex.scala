package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** At-rest INVERTED POSTING layout for lexical retrieval — the text
  * analogue of [[graft.vector.CellIndex]] (round 8; the follow-up named by
  * SCALING.md's hybrid-bottleneck finding: every BM25 query was paying a
  * full corpus tokenize/aggregate pass).
  *
  * [[write]] pays the tokenize ONCE: postings land as
  * `(tok, doc_id, tf, dl)` rows — doc length DENORMALIZED onto each
  * posting, the impact-file trick that makes scoring join-free —
  * parquet-partitioned by a murmur3 term bucket (`tb=k/` dirs), with the
  * document-frequency table partitioned the same way and the two corpus
  * scalars (doc count, token count) persisted beside them. Readers then
  * score a query by scanning ONLY the buckets its terms hash into
  * (PartitionFilters pruning — per-query IO tracks posting-list mass, not
  * corpus mass) and never touch `documents` at all.
  *
  * Partitioning by hash bucket rather than by raw term keeps the
  * directory count fixed (a 100 TB corpus has billions of distinct terms
  * — one dir per term is a metadata explosion; term-hash buckets are how
  * a distributed index shards its dictionary), while still pruning the
  * scan to |query| buckets of `buckets`. Inside a bucket, postings for
  * one term are contiguous enough for row-group statistics to prune
  * further (`tok` min/max per row group). */
object TextIndex {

  /** Build the index: one tokenize pass shared by postings/df/stats (the
    * q132 ReuseExchange shape), then three writes. Deterministic in the
    * corpus — rebuilding is idempotent. */
  def write(spark: SparkSession, dir: String, indexPath: String,
      buckets: Int = 16): Unit = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
    val dt = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dl = dt.groupBy("doc_id").agg(sum("tf").as("dl"))
    val tb = pmod(hash(col("tok")), lit(buckets))
    dt.join(dl, Seq("doc_id"))
      .withColumn("tb", tb)
      .repartition(col("tb"))
      .sortWithinPartitions("tok", "doc_id") // row-group stats prune by term
      .write.mode("overwrite").partitionBy("tb")
      .parquet(s"$indexPath/postings")
    dt.groupBy("tok").agg(count(lit(1)).as("df"))
      .withColumn("tb", tb)
      .repartition(col("tb"))
      .write.mode("overwrite").partitionBy("tb")
      .parquet(s"$indexPath/dfreq")
    dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("n_toks"))
      .coalesce(1) // 1 row — corpus scalars, not data
      .write.mode("overwrite").parquet(s"$indexPath/stats")
  }

  /** The corpus scalars persisted by [[write]]. */
  def readStats(spark: SparkSession, indexPath: String): (Long, Long) = {
    val r = spark.read.parquet(s"$indexPath/stats").collect().head
    (r.getLong(0), r.getLong(1))
  }

  /** The q132 deterministic query derivation served FROM the index's df
    * table (a vocabulary-sized scan — no corpus pass): the `nq` highest-df
    * non-ubiquitous terms, with each term's partition bucket so the
    * posting scan can prune. Driver-side nq rows. */
  def deriveQueryTerms(spark: SparkSession, indexPath: String,
      nq: Int = 5): Seq[(String, Long, Int)] = {
    val (nDocs, _) = readStats(spark, indexPath)
    spark.read.parquet(s"$indexPath/dfreq")
      .filter(col("df") * 2 < nDocs)
      .orderBy(desc("df"), col("tok")).limit(nq)
      .select(col("tok"), col("df"), col("tb").cast("int"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
  }

  /** BM25 served FROM the index (the indexed form of [[TextOps.bm25]]):
    * resolve query terms against the df table, scan ONLY their hash
    * buckets' postings (PartitionFilters pruning; dl rides the posting
    * row, so scoring is join-free beyond the nq-row broadcast), score
    * with the SAME shared Okapi expression, rank with the same integer-s6
    * tail. With the same (nq, topN) this returns exactly the ad-hoc
    * q132 answer (differential spec) — the index changes where the work
    * happens, not what is computed. Per-query cost tracks the query
    * terms' posting mass; the corpus is never tokenized at query time. */
  def bm25Indexed(spark: SparkSession, indexPath: String, nq: Int = 5,
      topN: Int = 20): DataFrame = {
    import spark.implicits._
    val (nDocs, nToks) = readStats(spark, indexPath)
    val qts = deriveQueryTerms(spark, indexPath, nq)
    val qterms = qts.map { case (t, df, _) => (t, df) }.toDF("tok", "df")
    val scored = spark.read.parquet(s"$indexPath/postings")
      .filter(col("tb").isin(qts.map(_._3): _*))
      .join(broadcast(qterms), Seq("tok"))
      .withColumn("n_docs", lit(nDocs))
      .withColumn("n_toks", lit(nToks))
    TextOps.bm25RankTail(TextOps.bm25S6(scored), topN)
  }
}
