package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Portable.pround
import graft.sources.Tables

/** Text-analysis operators over the `documents` table (SURVEY U8 + the
  * training-data-pipeline north star): token counting, language-ID,
  * quality scoring, fingerprinting.
  *
  * All operators are pure column expressions (no UDFs): whole-stage codegen
  * applies end-to-end, and every plan is embarrassingly parallel — per-row
  * work with at most one final aggregate, so a 100 TB document corpus scales
  * linearly with executors, no shuffle before the aggregate's partial phase.
  */
object TextOps {

  /** Whitespace tokens of the text column. */
  def tokens(c: Column): Column = split(c, " ")

  /** Word n-grams (default 3) over the token array, as a single
    * higher-order expression — no explode, no shuffle. Empty array when the
    * document is shorter than n tokens. */
  def wordNgrams(toks: Column, n: Int = 3): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n), i =>
        concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Q22 — per-language corpus stats: doc count, total whitespace tokens,
    * mean char length. */
  def q22(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), col("n_chars"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        avg("n_chars").as("avg_chars"))
      .orderBy("lang")

  /** Token counting (north star): whitespace tokens, regex word tokens, and
    * a BPE-ish subword proxy (vowel-group count — a stable stand-in for a
    * real tokenizer's merge count). */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(tokens(col("text"))).cast("long").as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).cast("long").as("word_tokens"),
        size(regexp_extract_all(col("text"), lit("[aeiou]+"), lit(0))).cast("long").as("subword_tokens"))
      .orderBy("doc_id")

  /** Language-ID (north star): n-gram/stopword-profile heuristic. The
    * profiles are deterministic marker-token sets (the corpus is synthetic,
    * so profile content is arbitrary; the operator shape — score per
    * language, argmax with alphabetical tie-break — is the real thing). */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val profiles = Seq( // lang -> marker tokens
      "de" -> Seq("table", "row"),
      "en" -> Seq("key", "value"),
      "es" -> Seq("scan", "merge"),
      "fr" -> Seq("join", "query"),
      "zh" -> Seq("spark", "batch"))
    val toks = tokens(col("text"))
    val withScores = profiles.foldLeft(
      Tables.documents(spark, dir).select(col("doc_id"), col("lang"), toks.as("toks"))) {
      case (df, (lang, markers)) =>
        df.withColumn(s"s_$lang",
          size(filter(col("toks"), t => t.isin(markers: _*))).cast("long"))
    }
    val best = greatest(profiles.map { case (l, _) => col(s"s_$l") }: _*)
    // first max in alphabetical lang order wins (deterministic tie-break)
    val pred = profiles.foldRight(lit("und")) { case ((lang, _), els) =>
      when(col(s"s_$lang") === best && best > 0, lang).otherwise(els)
    }
    withScores
      .withColumn("pred_lang", pred)
      .withColumn("correct", (col("pred_lang") === col("lang")).cast("long"))
      .select("doc_id", "lang", "pred_lang", "correct")
      .orderBy("doc_id")
  }

  /** Quality scoring (north star): length / stopword-ratio heuristics →
    * a [0,1] score, the text-corpus analog of the reference's per-event
    * `quality_score = max(0, 1 - k·violations)` (expectations.py:94). */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(filter(toks, t => t === "a")).cast("long").as("stop_hits"),
        length(col("text")).cast("long").as("n_chars_m"))
      .withColumn("stop_ratio", col("stop_hits") * lit(1.0) / col("n_tokens"))
      .withColumn("quality_score",
        pround(least(lit(1.0), greatest(lit(0.0),
          lit(0.25) * log10(col("n_tokens") + 1) + lit(0.5) - lit(0.8) * col("stop_ratio"))), 4))
      .select("doc_id", "n_tokens", "n_chars_m", "stop_ratio", "quality_score")
      .orderBy("doc_id")
  }

  /** Document fingerprinting (north star): content hash, order-insensitive
    * (sorted-token) hash, and a winnowing-style min-shingle hash. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    // min-shingle via the flat exploded path (codegen'd md5 + map-side
    // combined min) instead of an interpreted per-row lambda fold
    val minShingle = Dedup.explodedGrams(spark, dir)
      .groupBy("doc_id").agg(min(md5(col("gram"))).as("fp_min_shingle"))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        md5(col("text")).as("fp_exact"),
        md5(concat_ws(" ", sort_array(toks))).as("fp_sorted"))
      .join(minShingle, Seq("doc_id"), "left")
      .orderBy("doc_id")
  }
}
