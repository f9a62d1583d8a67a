package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Deduplication operators (SURVEY U6 + silver-layer dedup,
  * lake_writer.py:13-16; "Duplicate event_ids = producer retry bug",
  * expectations.py:239): exact hash dedup, MinHash+LSH near-dup, n-gram
  * Jaccard, and SimHash.
  *
  * Scale design: every near-dup path is blocked — candidate pairs come from
  * an equi-join on a bucket key (LSH band / group key), never from a cross
  * join, so at 100 TB the shuffle is keyed by bucket and the pair count is
  * bounded by bucket sizes. MinHash signatures are computed per-row with
  * higher-order functions (no explode of shingles through a shuffle).
  */
object Dedup {

  private val NumHashes = 8
  private val BandSize = 2 // 4 bands of 2 → candidates need a full 2-hash band match

  /** Per-seed MinHash value: lexicographic min of md5("seed:" ++ shingle).
    * md5-hex min is engine-portable (pure string comparison), unlike
    * murmur3/xxhash which differ across engines. */
  private def minhash(grams: Column, seed: Int): Column =
    array_min(transform(grams, g => md5(concat(lit(s"$seed:"), g))))

  /** Q21 — exact dedup by content hash: every doc with its md5 fingerprint
    * and a keep/dup flag (first doc_id per fingerprint is kept) — the
    * relational form of `dropDuplicates("event_id")`. */
  def exactDedup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("fp").orderBy("doc_id")
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .withColumn("is_dup", (row_number().over(w) > 1).cast("long"))
      .select("doc_id", "fp", "is_dup")
      .orderBy("doc_id")
  }

  /** MinHash signatures: doc_id + 8 minhash columns (word-trigram shingles).
    * One pass, no shuffle. */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), TextOps.wordNgrams(toks).as("grams"))
    (0 until NumHashes).foldLeft(base) { (df, s) =>
      df.withColumn(s"mh$s", minhash(col("grams"), s))
    }.drop("grams").orderBy("doc_id")
  }

  /** MinHash+LSH candidate pairs: band the signature (4 bands of 2), bucket
    * by (band_id, band value), equi-join buckets, then estimate Jaccard as
    * the fraction of agreeing minhashes. Only the banded equi-join
    * shuffles — the classic shingle→minhash→band→bucket-join pipeline. */
  def minhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sigs = minhashSignatures(spark, dir)
    val sigArr = sigs.withColumn("sig",
      array((0 until NumHashes).map(s => col(s"mh$s")): _*))
      .select("doc_id", "sig")
    val bands = sigArr.select(
        col("doc_id"), posexplode(
          transform(sequence(lit(0), lit(NumHashes / BandSize - 1)), b =>
            concat_ws("|", (0 until BandSize).map(k =>
              element_at(col("sig"), b * BandSize + k + 1)): _*))))
      .withColumnRenamed("pos", "band_id").withColumnRenamed("col", "band_val")
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.band_val") === col("y.band_val") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    cand.join(sigArr.as("a"), col("doc_a") === col("a.doc_id"))
      .join(sigArr.as("b"), col("doc_b") === col("b.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (size(filter(zip_with(col("a.sig"), col("b.sig"), (x, y) => x === y),
          v => v)) * lit(1.0) / NumHashes).as("est_jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** n-gram Jaccard (exact) within (lang, source) blocks: blocked self-join
    * on the group key — pair count bounded per block, never all-pairs. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        array_distinct(TextOps.wordNgrams(TextOps.tokens(col("text")))).as("grams"))
    d.as("a").join(d.as("b"),
        col("a.lang") === col("b.lang") && col("a.source") === col("b.source") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.lang").as("lang"), col("a.source").as("source"),
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (size(array_intersect(col("a.grams"), col("b.grams"))) * lit(1.0) /
          size(array_union(col("a.grams"), col("b.grams")))).as("jaccard"))
      .orderBy("lang", "source", "doc_a", "doc_b")
  }

  /** SimHash (16-bit, md5-derived per-token hashes): per token-hash bit,
    * sum +1/-1 across the document's tokens; the sign vector packs into a
    * 16-bit fingerprint. Grouped by doc — one shuffle on doc_id (the
    * explode is local to the map side). */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 4), 16, 10).cast("long"))
      .select(col("doc_id"), col("h"),
        explode(sequence(lit(0), lit(15))).as("bit"))
      .withColumn("sign",
        when(expr("(h div cast(pow(2, bit) as bigint)) % 2") === 1, 1).otherwise(-1))
      .groupBy("doc_id", "bit")
      .agg(sum("sign").as("s"))
      .groupBy("doc_id")
      .agg(sum(when(col("s") > 0, expr("cast(pow(2, bit) as bigint)")).otherwise(0L))
        .as("simhash16"))
      .orderBy("doc_id")
  }
}
