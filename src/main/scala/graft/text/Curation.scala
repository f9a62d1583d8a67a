package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Training-corpus curation operators (the north-star LLM-pipeline surface
  * beyond dedup/similarity: BASELINE.json "text analysis" + the operations a
  * 100 TB pretraining pipeline runs between raw crawl and tokenizer).
  *
  * All operators are per-row column expressions plus at most one keyed
  * aggregate — embarrassingly parallel, no driver-side data movement:
  * - [[contamination]] — benchmark n-gram overlap screening (decontamination
  *   before training); candidate grams meet the benchmark set in a keyed
  *   equi-join on the gram, the same blocked shape as the dedup family.
  * - [[repetition]] — Gopher-style repetition quality signals (duplicate
  *   token fraction, dominant token/trigram fraction).
  * - [[chunk]] — fixed-size token-window chunking with stride (sequence
  *   packing for training): one generate per doc, no shuffle at all.
  * - [[domainMix]] — per-source corpus shares + uniform-target resampling
  *   weights (data-mix balancing).
  * - [[piiRedact]] — PII-pattern counts (email/phone regex) + lexicon-term
  *   masking with the redacted-content fingerprint.
  */
object Curation {

  /** The benchmark/holdout membership rule (the deterministic eval-suite
    * stand-in): ONE definition shared by the contamination screens
    * (q50/q129) and `SelectionJob`'s admission — mirrored by the oracles'
    * `doc_id % 20 = 0`. A drift between admission and screening would
    * silently re-admit benchmark docs, so there is exactly one seam. */
  def isBenchmark(id: Column): Column = id % 20 === 0

  /** Q50 — benchmark-contamination screen: the fraction of each candidate
    * doc's distinct trigrams that also occur in the BENCHMARK set (here the
    * deterministic holdout doc_id % 20 == 0, standing in for an eval suite).
    * Pipeline shape: distinct grams per doc (one keyed aggregate), benchmark
    * gram set (broadcast-sized at eval-suite scale), equi-join on gram —
    * never a cross join. `contaminated` = overlap ≥ 0.5. */
  def contamination(spark: SparkSession, dir: String,
      threshold: Double = 0.5): DataFrame = {
    val grams = Dedup.explodedGrams(spark, dir, distinctPerDoc = true)
      .select(col("doc_id"), col("gram"))
      .localCheckpoint()
    val benchGrams = grams.filter(isBenchmark(col("doc_id")))
      .select(col("gram")).distinct()
    val candGrams = grams.filter(!isBenchmark(col("doc_id")))
    val shared = candGrams.join(benchGrams, Seq("gram"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    val sizes = candGrams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    Tables.documents(spark, dir).select(col("doc_id"))
      .filter(!isBenchmark(col("doc_id")))
      .join(sizes, Seq("doc_id"), "left")
      .join(shared, Seq("doc_id"), "left")
      .withColumn("n_grams", coalesce(col("n_grams"), lit(0L)))
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .withColumn("overlap",
        when(col("n_grams") > 0, col("n_shared") * lit(1.0) / col("n_grams"))
          .otherwise(lit(0.0)))
      .withColumn("contaminated", (col("overlap") >= threshold).cast("long"))
      .select("doc_id", "n_grams", "n_shared", "overlap", "contaminated")
      .orderBy("doc_id")
  }

  /** Q129 — SPAN-LEVEL DECONTAMINATION: [[contamination]] (q50) flags
    * whole docs; real pipelines LOCALIZE the overlap and excise spans
    * (the n-gram-collision removal the GPT-3 appendix describes) so a
    * long doc with one quoted benchmark line loses a sentence, not its
    * place in the corpus. Per non-benchmark doc: the count of token
    * POSITIONS covered by any benchmark-colliding trigram (each hit at
    * start i covers i..i+2; overlapping hits de-duplicate by position)
    * and the flagged fraction — exactly what the excision step consumes.
    *
    * Shape: positional grams explode once, the hit join is gram-keyed
    * (benchmark side is eval-suite-sized), and the covered-position
    * explode is bounded by 3× hit count, not corpus mass. CurationSpec
    * cross-checks against q50: a doc has flagged positions iff q50
    * counts a shared distinct gram. */
  def contaminationSpans(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.TextExpressions.register(spark)
    val docs = Tables.documents(spark, dir)
    val posGrams = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      // the compiled gram expression (bit-identical to the HOF form by
      // the differential property spec) — posexplode keeps start indexes
      .select(col("doc_id"), posexplode(
        graft.functions.TextExpressions.word_ngrams(col("toks"), 3, distinct = false)))
      .toDF("doc_id", "i", "gram")
    val bench = posGrams.filter(isBenchmark(col("doc_id")))
      .select("gram").distinct()
    val hits = posGrams.filter(!isBenchmark(col("doc_id")))
      .join(bench, Seq("gram"))
      .select(col("doc_id"), col("i"))
    val covered = hits
      .select(col("doc_id"), explode(sequence(col("i"), col("i") + 2)).as("p"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n_flagged"))
    docs.filter(!isBenchmark(col("doc_id")))
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      .join(covered, Seq("doc_id"), "left")
      .withColumn("n_flagged", coalesce(col("n_flagged"), lit(0L)))
      .withColumn("flagged_ratio",
        col("n_flagged") * lit(1.0) / col("n_tokens"))
      .select("doc_id", "n_tokens", "n_flagged", "flagged_ratio")
      .orderBy("doc_id")
  }

  /** Q51 — repetition quality signals (the Gopher repetition filters'
    * shape): duplicate-token fraction, dominant-token fraction, and
    * dominant-trigram fraction per doc. Two keyed aggregates (token level,
    * gram level), map-side combined. */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    val tokCounts = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max("c").as("top_tok"))
    val gramCounts = Dedup.explodedGrams(spark, dir)
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("n_grams"),
        max("c").as("top_gram"))
    tokCounts.join(gramCounts, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_tokens"),
        (lit(1.0) - col("n_distinct") * lit(1.0) / col("n_tokens")).as("dup_tok_frac"),
        (col("top_tok") * lit(1.0) / col("n_tokens")).as("top_tok_frac"),
        when(col("n_grams").isNotNull,
          col("top_gram") * lit(1.0) / col("n_grams"))
          .otherwise(lit(0.0)).as("top_gram_frac"))
      .orderBy("doc_id")
  }

  /** Q52 — token-window chunking with stride (sequence packing): each doc
    * splits into windows of `size` tokens starting every `stride` tokens;
    * emits per-chunk length + content fingerprint. One generate + map per
    * row — the plan a 100 TB corpus wants: no shuffle, no state, output
    * partitioning inherited from the scan. */
  def chunk(spark: SparkSession, dir: String, width: Int = 32,
      stride: Int = 24): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val win = slice(col("toks"), col("chunk_id") * stride + 1, lit(width))
    Tables.documents(spark, dir)
      .select(col("doc_id"), toks.as("toks"))
      // guard the empty edge: Spark's div truncates toward zero where the
      // oracle's // floors, so size=0 would emit one phantom chunk here and
      // none in DuckDB. Unreachable with the current tokenizer (split never
      // returns [] for non-null text) — pinned so a tokenizer change can't
      // silently diverge the engines.
      .filter(size(col("toks")) > 0)
      .withColumn("last_chunk", expr(s"(size(toks) - 1) div $stride"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), col("last_chunk"))).as("chunk_id"))
      .select(
        col("doc_id"),
        col("chunk_id").cast("long").as("chunk_id"),
        size(win).cast("long").as("chunk_len"),
        md5(concat_ws(" ", win)).as("chunk_hash"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Q53 — domain-mix shares + resampling weights: per source, its doc and
    * token share of the corpus and the weight that would rebalance sampling
    * to a uniform per-source target — the data-mix step before training.
    * One aggregate + a broadcast 1-row totals scalar (same in-plan-scalar
    * pattern as tfidf's N). */
  def domainMix(spark: SparkSession, dir: String): DataFrame = {
    val perSource = Tables.documents(spark, dir)
      .select(col("source"), size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
    val totals = perSource.agg(
      sum("n_docs").cast("double").as("tot_docs"),
      sum("n_tokens").cast("double").as("tot_tokens"),
      count(lit(1)).cast("double").as("n_sources"))
    perSource.crossJoin(broadcast(totals))
      .select(
        col("source"), col("n_docs"), col("n_tokens"),
        (col("n_docs") / col("tot_docs")).as("doc_share"),
        (col("n_tokens") / col("tot_tokens")).as("token_share"),
        ((lit(1.0) / col("n_sources")) / (col("n_docs") / col("tot_docs")))
          .as("uniform_weight"))
      .orderBy("source")
  }

  /** Q59 — sequence packing (concatenate-and-chunk): every doc gets its
    * global token offset in doc_id order, from which pack_id (which
    * `budget`-token training sequence it lands in) and pack_offset follow.
    * The global prefix sum is the two-level distributed form: per-block
    * running totals under a KEYED window (block = doc_id div blockSize),
    * plus a block-offset table whose own cumsum runs over the tiny
    * block-totals frame (single partition by construction, ranked with the
    * same bounded spark_partition_id window the top-k rank uses) — no
    * unbounded partitionless window anywhere, the pattern a 100 TB corpus
    * needs for any global ordering. */
  def docPacking(spark: SparkSession, dir: String, budget: Int = 256,
      blockSize: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("block", expr(s"doc_id div $blockSize"))
    // per-block running total (keyed window — scales with blocks)
    val wBlock = Window.partitionBy("block").orderBy("doc_id")
    val inBlock = docs.withColumn("cum_in_block",
      sum("n_tokens").over(wBlock) - col("n_tokens"))
    // block totals are |corpus|/blockSize rows: coalesce(1) + constant-
    // partition window gives their exclusive prefix sum without an
    // unbounded partitionless WindowExec
    val wBlocks = Window.partitionBy(spark_partition_id()).orderBy("block")
    val blockOffsets = docs.groupBy("block").agg(sum("n_tokens").as("btot"))
      .coalesce(1)
      .withColumn("block_offset", sum("btot").over(wBlocks) - col("btot"))
      .select("block", "block_offset")
    // no broadcast hint: |blocks| = |corpus|/blockSize is unbounded at
    // scale — size-based planning broadcasts when the offset table fits
    inBlock.join(blockOffsets, Seq("block"))
      .withColumn("global_offset", col("block_offset") + col("cum_in_block"))
      .select(col("doc_id"), col("n_tokens"), col("global_offset"),
        expr(s"global_offset div $budget").as("pack_id"),
        (col("global_offset") % budget).as("pack_offset"))
      .orderBy("doc_id")
  }

  /** Q58 — collocation mining by pointwise mutual information: adjacent
    * token pairs scored by ln(p(ab)/(p(a)p(b))), min support `minCount`,
    * top `k` — the phrase-detection pass that seeds multi-word entries in
    * a tokenizer vocabulary. Two keyed aggregates + broadcast totals; the
    * PMI arithmetic keeps exact integer counts in-plan and spends exactly
    * one ln + one divide per surviving pair (pround(4) presentation). */
  def collocations(spark: SparkSession, dir: String, minCount: Int = 5,
      k: Int = 50): DataFrame = {
    import graft.functions.Portable.pround
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "tok")))
    val bigrams = toks
      .withColumn("t1", lead(col("tok"), 1).over(byDoc))
      .filter(col("t1").isNotNull)
    val uni = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val bi = bigrams.groupBy(col("tok").as("w1"), col("t1").as("w2"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val totals = uni.agg(sum("c").as("n_uni"))
      .crossJoin(bigrams.agg(count(lit(1)).as("n_bi")))
    // exact-integer counts cast to double in a FIXED association order
    // (((a·b)·c) / ((d·e)·f)) so any engine lands on identical doubles
    val num = col("c_ab").cast("double") *
      col("n_uni").cast("double") * col("n_uni").cast("double")
    val den = col("n_bi").cast("double") *
      col("c_a").cast("double") * col("c_b").cast("double")
    bi.join(uni.as("ua"), col("w1") === col("ua.tok"))
      .join(uni.as("ub"), col("w2") === col("ub.tok"))
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("c_ab"),
        col("ua.c").as("c_a"), col("ub.c").as("c_b"), col("n_uni"), col("n_bi"))
      .withColumn("pmi", pround(log(num / den), 4))
      .select("w1", "w2", "c_ab", "c_a", "c_b", "pmi")
      .orderBy(desc("pmi"), col("w1"), col("w2"))
      .limit(k)
  }

  /** Terms masked by [[piiRedact]]'s lexicon pass (entity names stand in
    * for a real PII dictionary on the synthetic corpus). */
  val RedactLexicon: Seq[String] = Seq("customer", "user")

  /** Q54 — PII-style redaction: regex counts for email/phone shapes (the
    * real patterns — zero hits on this synthetic corpus, their parity is
    * what's verified) plus lexicon-term masking with the redacted content
    * fingerprint. Patterns stay inside the Java∩RE2 regex subset so any
    * engine computes identical matches. Pure per-row expressions. */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phone = "\\+?[0-9][0-9() -]{7,}[0-9]"
    val lex = RedactLexicon.mkString("\\b(", "|", ")\\b")
    // counts follow the REDACTION CASCADE (each stage counts on the
    // previous stage's output), so n_email/n_phone/n_lexicon describe
    // exactly the replacements present in redacted_fp — counting every
    // pattern on the raw text would double-report overlapping matches
    // (a digit run inside an email is not also a phone number)
    val afterEmail = regexp_replace(col("text"), email, "[EMAIL]")
    val afterPhone = regexp_replace(afterEmail, phone, "[PHONE]")
    val afterLex = regexp_replace(afterPhone, lex, "[REDACTED]")
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(email), lit(0)))
          .cast("long").as("n_email"),
        size(regexp_extract_all(afterEmail, lit(phone), lit(0)))
          .cast("long").as("n_phone"),
        size(regexp_extract_all(afterPhone, lit(lex), lit(0)))
          .cast("long").as("n_lexicon"),
        md5(afterLex).as("redacted_fp"))
      .orderBy("doc_id")
  }

  /** The q62 per-doc rule predicates (p1..p5) — ONE definition shared by
    * the funnel report and the q93 manifest so the rule set can't drift. */
  private def funnelFlags(docs: DataFrame): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    docs
      .select(col("doc_id"),
        size(toks).cast("long").as("nt"),
        length(translate(col("text"), " ", "")).cast("long").as("nl"),
        size(array_distinct(toks)).cast("long").as("nd"),
        (array_contains(toks, "the") || array_contains(toks, "a")).as("has_stop"))
      .select(col("doc_id"),
        (col("nt") >= 20).as("p1"),
        (col("nt") <= 80).as("p2"),
        (col("nl") >= col("nt") * 4 && col("nl") <= col("nt") * 6).as("p3"),
        col("has_stop").as("p4"),
        (col("nd") * 10 >= col("nt") * 4).as("p5"))
  }

  /** Q62 — quality-filter FUNNEL (the C4/RefinedWeb cascade report): five
    * document-level rules applied in order, with per-rule in/dropped/out
    * counts — the artifact a curation run publishes so reviewers see where
    * the corpus went. Rules are integer/boolean-exact (mean-word-length is
    * the cross-multiplied `4·nt ≤ letters ≤ 6·nt`, never a float divide) so
    * any engine lands on identical counts. Plan: one pass over the corpus
    * computing all five predicates, ONE aggregate of the cumulative
    * survival flags (map-side combined), then a 1-row→5-row inline explode
    * — per-rule rescans would read the corpus five times. */
  def filterFunnel(spark: SparkSession, dir: String): DataFrame = {
    val flags = funnelFlags(Tables.documents(spark, dir))
    def surv(ps: Column*): Column =
      sum(when(ps.reduce(_ && _), 1L).otherwise(0L))
    val agg = flags.agg(
      count(lit(1)).as("total"),
      surv(col("p1")).as("o1"),
      surv(col("p1"), col("p2")).as("o2"),
      surv(col("p1"), col("p2"), col("p3")).as("o3"),
      surv(col("p1"), col("p2"), col("p3"), col("p4")).as("o4"),
      surv(col("p1"), col("p2"), col("p3"), col("p4"), col("p5")).as("o5"))
    val rules = Seq("min_tokens", "max_tokens", "word_len", "stopword", "dup_frac")
    val rows = rules.zipWithIndex.map { case (name, i) =>
      val nIn  = if (i == 0) col("total") else col(s"o$i")
      val nOut = col(s"o${i + 1}")
      struct(lit(i + 1L).as("rule_idx"), lit(name).as("rule"),
        nIn.as("n_in"), (nIn - nOut).as("n_dropped"), nOut.as("n_out"))
    }
    agg.select(explode(array(rows: _*)).as("r"))
      .select("r.*")
      .orderBy("rule_idx")
  }

  /** Q63 — deterministic stratified sampling to a uniform per-source
    * target (the data-mix EXECUTION step after [[domainMix]] computes the
    * weights): each doc keeps iff its hash coin lands under its source's
    * rate `min(1, (total/n_sources)/n_docs_source)`. The coin is the first
    * 6 md5 hex digits of doc_id — reproducible across runs, engines, and
    * re-partitions (rand() is none of those), which is what makes a 100 TB
    * sample auditable. The keep decision cross-multiplies EXACTLY
    * (`h·n_sources·n_docs < total·2^24`) so no float boundary can
    * disagree — and the products run in decimal(38,0) (DuckDB: HUGEINT),
    * not BIGINT: at 10^9 docs per source with 10^3 sources the left side
    * reaches ~2·10^19 and would wrap int64; exact 128-bit integers survive
    * any corpus size. The per-source rate table is
    * aggregate-then-broadcast (sources are few), the corpus side is a
    * pure map. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val perSource = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val totals = perSource.agg(
      sum("n_docs").as("tot_docs"), count(lit(1)).as("n_sources"))
    val rates = perSource.crossJoin(broadcast(totals))
    docs
      .withColumn("h",
        conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
          .cast("long"))
      .join(broadcast(rates), Seq("source"))
      .select(col("doc_id"), col("source"), col("h"),
        graft.functions.Portable.pround(
          least(lit(1.0), col("tot_docs").cast("double") /
            (col("n_sources") * col("n_docs")).cast("double")), 6).as("rate"),
        (col("h").cast("decimal(38,0)") * col("n_sources") * col("n_docs") <
          col("tot_docs").cast("decimal(38,0)") * lit(16777216L))
          .cast("long").as("keep"))
      .orderBy("doc_id")
  }

  /** Q88 — domain-mix RESAMPLING execution: materialize the uniform-mix
    * rebalance that q53 weighs and q70 schedules — per doc, the exact copy
    * count (`n_repeats`) the resampled corpus carries: floor(wₛ) base
    * copies plus one extra with probability frac(wₛ), decided by the md5
    * coin (q63's convention; "mix:" salt keeps it independent of q63's
    * keep coin). wₛ = tot/(k·nₛ) stays RATIONAL end-to-end: base =
    * tot div (k·nₛ), extra ⟺ h·k·nₛ < (tot mod (k·nₛ))·2²⁴ — exact
    * integer cross-multiplies, no float boundary to disagree on. In
    * expectation each source contributes tot/k copies: downsampled sources
    * get n_repeats ∈ {0,1}, rare sources get repeat factors > 1. Plan: two
    * tiny broadcast aggregates over a pure map of the corpus. */
  def mixResample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val perSource = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val totals = perSource.agg(
      sum("n_docs").as("tot_docs"), count(lit(1)).as("n_sources"))
    docs
      .withColumn("h",
        conv(substring(md5(concat(lit("mix:"), col("doc_id").cast("string"))), 1, 6),
          16, 10).cast("long"))
      .join(broadcast(perSource), Seq("source"))
      .crossJoin(broadcast(totals))
      .withColumn("den", col("n_sources") * col("n_docs"))
      .select(col("doc_id"), col("source"),
        graft.functions.Portable.pround(
          col("tot_docs").cast("double") / col("den").cast("double"), 6).as("weight"),
        (expr("tot_docs div den") +
          (col("h").cast("decimal(38,0)") * col("den") <
            (col("tot_docs") % col("den")).cast("decimal(38,0)") * lit(16777216L))
            .cast("long")).as("n_repeats"))
      .orderBy("doc_id")
  }

  /** Q93 — the curation MANIFEST: the capstone composition a corpus
    * release actually ships — per doc, the final in/out decision and WHY.
    * Conjunction of the pipeline's stages: q62's rule filters, q49's
    * near-dup cluster keep, q50's benchmark-contamination screen, and
    * q83's cluster-safe split assignment, with a single `reason` column
    * resolving precedence (benchmark > filtered > near_dup > contaminated
    * > kept). A user of the library runs THIS to materialize the training
    * corpus; every ingredient is itself oracle-checked standalone. Plan:
    * each stage keeps its own scale shape (broadcast/banded/CC as
    * documented on the ingredient operators); composition is three
    * doc_id-keyed joins. */
  def curationManifest(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.Dedup
    val flags = funnelFlags(Tables.documents(spark, dir))
      .select(col("doc_id"),
        (col("p1") && col("p2") && col("p3") && col("p4") && col("p5")).as("passed"))
    val clusters = Dedup.nearDupClusters(spark, dir) // doc_id, cluster_rep, keep
    val cont = contamination(spark, dir).select(col("doc_id"), col("contaminated"))
    val isBench = isBenchmark(col("doc_id"))
    clusters
      .join(flags, Seq("doc_id"))
      .join(cont, Seq("doc_id"), "left") // bench docs have no screen row
      .withColumn("cont", coalesce(col("contaminated"), lit(0L)))
      .select(col("doc_id"), col("cluster_rep"),
        Dedup.splitOf(col("cluster_rep")).as("split"),
        col("passed").cast("long").as("passed_filters"),
        col("keep").as("keep_cluster"),
        col("cont").as("contaminated"),
        when(isBench, "benchmark")
          .when(!col("passed"), "filtered")
          .when(col("keep") === 0, "near_dup")
          .when(col("cont") === 1, "contaminated")
          .otherwise("kept").as("reason"),
        (!isBench && col("passed") && col("keep") === 1 && col("cont") === 0)
          .cast("long").as("in_corpus"))
      .orderBy("doc_id")
  }

  /** AT-REST BENCHMARK GRAM SET (round 12 — the contamination screen's
    * maintained artifact; with the cluster index and the gram ledger it
    * completes the trio the incremental manifest folds against): the
    * distinct trigrams of the benchmark/holdout docs, gram-hash-bucketed
    * (`gb=` dirs, the dfreq rule), stats (bucket count) last as the
    * commit marker. Deltas land add-only under `_batches/<tag>/` via the
    * shared tag-committed protocol — and here even a DOUBLED delta is
    * harmless (set union is idempotent; readers screen with a semi-join,
    * which duplicate gram rows cannot inflate), so the ledger is
    * belt-and-braces consistency with the other folds, not a
    * correctness necessity (the appendFreqSketches contrast). */
  def writeBenchGrams(spark: SparkSession, dir: String, path: String,
      buckets: Int = 16): Unit = {
    import spark.implicits._
    Dedup.explodedGrams(spark, dir, distinctPerDoc = true)
      .filter(isBenchmark(col("doc_id")))
      .select(col("gram")).distinct()
      .withColumn("gb", pmod(hash(col("gram")), lit(buckets)))
      .repartition(col("gb"))
      .sortWithinPartitions("gram")
      .write.mode("overwrite").partitionBy("gb")
      .parquet(s"$path/grams")
    Seq(buckets.toLong).toDF("buckets")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Fold one batch's benchmark-doc grams into the at-rest set (add-only;
    * see [[writeBenchGrams]]). A batch with no benchmark docs writes an
    * empty delta — still tag-committed, so a replay short-circuits. */
  def appendBenchGrams(spark: SparkSession, batchDir: String, path: String,
      tag: String,
      fence: () => Unit = graft.IndexVersions.NoFence): Boolean = {
    import org.apache.hadoop.fs.Path
    val batchesRoot = new Path(path, "_batches")
    val fs = batchesRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.IndexVersions.appendTaggedBatch(fs, batchesRoot, tag,
      "stats/_SUCCESS", fence) { staging =>
      import spark.implicits._
      val buckets = spark.read.parquet(s"$path/stats")
        .select(col("buckets")).collect().head.getLong(0).toInt
      Dedup.explodedGrams(spark, batchDir, distinctPerDoc = true)
        .filter(isBenchmark(col("doc_id")))
        .select(col("gram")).distinct()
        .withColumn("gb", pmod(hash(col("gram")), lit(buckets)))
        .repartition(col("gb"))
        .sortWithinPartitions("gram")
        .write.mode("overwrite").partitionBy("gb")
        .parquet(new Path(staging, "grams").toString)
      Seq(buckets.toLong).toDF("buckets")
        .coalesce(1)
        .write.mode("overwrite").parquet(new Path(staging, "stats").toString)
    }
  }

  def benchGramAppliedTags(spark: SparkSession, path: String): Set[String] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path, "_batches")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.IndexVersions.committedBatchTags(fs, root, "stats/_SUCCESS")
  }

  /** The full at-rest benchmark gram rows — base plus committed deltas,
    * possibly with cross-layer duplicates (readers must semi-join, never
    * inner-join-and-count). */
  private def benchGramRows(spark: SparkSession, path: String): DataFrame =
    benchGramRowsPinned(spark, path,
      benchGramAppliedTags(spark, path))

  /** Benchmark gram rows PINNED to an explicit delta-tag set — base plus
    * exactly these committed deltas (round 15: the add-only artifact's
    * snapshot-pinning seam for
    * [[graft.IndexPair.consistentRootsAll]] — an add-only layout can
    * serve any state whose tags are a subset of its committed set by
    * reading base + exactly those deltas, which is how the curation
    * composite read stays synchronized with the cluster-label version it
    * resolved). Requires tags ⊆ committed (a missing delta would
    * silently serve a smaller benchmark set). Delta reads carry the
    * base's data schema EXPLICITLY: a batch with no benchmark docs
    * commits an EMPTY partitioned delta (no data files, nothing to infer
    * from), which is a legitimate corpus state, not an error. */
  def benchGramRowsPinned(spark: SparkSession, path: String,
      tags: Set[String]): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val committed = benchGramAppliedTags(spark, path)
    require(tags.subsetOf(committed),
      s"pinned bench-gram tags ${tags.diff(committed).toSeq.sorted} are " +
        s"not committed under $path — resolve a consistent snapshot " +
        "before pinning (IndexPair.consistentRootsAll)")
    val dataSchema = StructType(Seq(StructField("gram", StringType)))
    tags.toSeq.sorted
      .map(t => spark.read.schema(dataSchema)
        .parquet(s"$path/_batches/$t/grams").select("gram"))
      .foldLeft(spark.read.parquet(s"$path/grams").select("gram"))(
        _ unionByName _)
  }

  /** INCREMENTAL CURATION MANIFEST (round 12 — the round-11 verdict's
    * task #5, the capstone fold): q93's per-doc admit/reject decision
    * for ONE BATCH, screened against the at-rest artifacts instead of
    * recomputing every stage over the whole corpus —
    *  - rule filters: doc-local, computed on the batch;
    *  - near-dup cluster keep + cluster-safe split: the MAINTAINED
    *    [[ClusterIndex]] labels (exact vs full recompute by its
    *    contracted-CC argument — fold the batch into the index first);
    *  - contamination: the batch's candidate grams SEMI-JOIN the at-rest
    *    benchmark gram set unioned with the batch's own benchmark grams
    *    (so fold order cannot change the answer — set union idempotence).
    * EXACTNESS (the q154 convention): equals the full [[curationManifest]]
    * over the union corpus RESTRICTED TO BATCH DOCS row-for-row, spec'd
    * end-to-end. AS-OF CAVEAT (the q64 convention, documented not
    * hidden): a batch can change OLD docs' rows in the full manifest (a
    * merged cluster re-labels them; a new benchmark doc contaminates an
    * old candidate) — those rows are served by the next full run or by
    * re-screening affected docs; this fold's contract is the batch's own
    * rows, which is what an ingest pipeline admits per batch. */
  def curationManifestBatch(spark: SparkSession, batchDir: String,
      clusterIdxPath: String, benchGramsPath: String): DataFrame = {
    import graft.text.Dedup
    // CONSISTENT SNAPSHOT across BOTH screening artifacts (round 15 —
    // the r14 verdict's task #2): the cluster labels and the benchmark
    // gram set are separately-published, so resolving each independently
    // could land mid-publish of a concurrent fold and screen the batch
    // against MIXED corpus states (labels that know batch N, a benchmark
    // set that doesn't — the exact class the q138 pair resolver closed
    // for fusion). One N-artifact resolution pins the newest cluster
    // LABELS version whose ledger the bench-gram deltas cover; the
    // bench-gram read then pins to exactly that ledger's tags.
    val (labelRoots, snapLedger) = graft.IndexPair.consistentRootsAll(
      Seq(ClusterIndex.versionsWithTags(spark, clusterIdxPath)),
      Seq((s"bench grams $benchGramsPath",
        benchGramAppliedTags(spark, benchGramsPath))),
      s"(cluster $clusterIdxPath, bench-grams $benchGramsPath)")
    val docs = Tables.documents(spark, batchDir)
    val flags = funnelFlags(docs)
      .select(col("doc_id"),
        (col("p1") && col("p2") && col("p3") && col("p4") && col("p5")).as("passed"))
    // maintained labels; singletons re-attach with the left join (the
    // ccLabels contract) — keep is first-doc-per-cluster, as in q49
    val clusters = docs.select(col("doc_id"))
      .join(ClusterIndex.labelsAt(spark, clusterIdxPath, labelRoots.head),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster_rep"),
        (col("doc_id") === coalesce(col("label"), col("doc_id")))
          .cast("long").as("keep"))
    // q50's screen restricted to the batch: candidate grams vs the
    // at-rest ∪ batch benchmark set (semi-join — duplicate gram rows
    // across layers cannot inflate the count)
    val batchGrams = Dedup.explodedGrams(spark, batchDir, distinctPerDoc = true)
      .select(col("doc_id"), col("gram"))
      .localCheckpoint() // feeds the bench arm and the candidate arm
    val bench = benchGramRowsPinned(spark, benchGramsPath, snapLedger.tags)
      .unionByName(batchGrams.filter(isBenchmark(col("doc_id")))
        .select("gram"))
    val candGrams = batchGrams.filter(!isBenchmark(col("doc_id")))
    val shared = candGrams.join(bench, Seq("gram"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    val sizes = candGrams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val cont = docs.select(col("doc_id"))
      .filter(!isBenchmark(col("doc_id")))
      .join(sizes, Seq("doc_id"), "left")
      .join(shared, Seq("doc_id"), "left")
      .withColumn("n_grams", coalesce(col("n_grams"), lit(0L)))
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .withColumn("overlap",
        when(col("n_grams") > 0, col("n_shared") * lit(1.0) / col("n_grams"))
          .otherwise(lit(0.0)))
      .select(col("doc_id"),
        (col("overlap") >= lit(0.5)).cast("long").as("contaminated"))
    val isBench = isBenchmark(col("doc_id"))
    clusters
      .join(flags, Seq("doc_id"))
      .join(cont, Seq("doc_id"), "left") // bench docs have no screen row
      .withColumn("cont", coalesce(col("contaminated"), lit(0L)))
      .select(col("doc_id"), col("cluster_rep"),
        Dedup.splitOf(col("cluster_rep")).as("split"),
        col("passed").cast("long").as("passed_filters"),
        col("keep").as("keep_cluster"),
        col("cont").as("contaminated"),
        when(isBench, "benchmark")
          .when(!col("passed"), "filtered")
          .when(col("keep") === 0, "near_dup")
          .when(col("cont") === 1, "contaminated")
          .otherwise("kept").as("reason"),
        (!isBench && col("passed") && col("keep") === 1 && col("cont") === 0)
          .cast("long").as("in_corpus"))
      .orderBy("doc_id")
  }

  /** Q91 — percentile-based length TRIM flags: per-language p01/p99
    * document-length fences, each doc flagged against its language's
    * fences — the outlier-trimming pass that removes truncated fragments
    * and runaway concatenations before training. Exact interpolated
    * percentiles (Spark `percentile` == DuckDB `quantile_cont`, the q45
    * parity); the flag compares the integer n_chars against the RAW shared
    * double, so no rounding crosses the decision boundary. Plan: one tiny
    * per-lang aggregate broadcast back over the corpus map. */
  def lengthTrim(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Portable.pround
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val pct = docs.groupBy("lang").agg(
      expr("percentile(n_chars, 0.99)").as("p99_raw"),
      expr("percentile(n_chars, 0.01)").as("p01_raw"))
    docs.join(broadcast(pct), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        pround(col("p99_raw"), 4).as("p99_chars"),
        (col("n_chars") > col("p99_raw")).cast("long").as("trim_high"),
        (col("n_chars") < col("p01_raw")).cast("long").as("trim_low"))
      .orderBy("doc_id")
  }

  /** Q143 — PER-DOMAIN QUOTA (the CommonCrawl-pipeline cap: without one,
    * a handful of mega-domains dominate the corpus; the fix is a
    * deterministic per-source cap keeping the top-`cap` docs by quality).
    * Ordering is (quality desc, doc_id asc) over the shared fixed-point
    * score ([[TextOps.qualityScoreFix4]] — integer, so the rank boundary
    * is engine-exact), and the output IS the capped corpus: one row per
    * kept doc with its in-domain rank.
    *
    * Scale shape: `row_number ≤ cap` compiles to WindowGroupLimit
    * (PlanSpec-pinned like q07/q72) — each map task keeps at most `cap`
    * rows per source BEFORE the shuffle, so the exchange carries
    * O(sources × cap × tasks) rows, not the corpus; no global sort, no
    * full per-source materialization. A skew-heavy domain costs its
    * partial top-cap per task, nothing more. */
  def domainCap(spark: SparkSession, dir: String, cap: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy(desc("score_i"), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        TextOps.qualityScoreFix4(col("text")).as("score_i"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap) // raw int rank: the cast must come AFTER, or
      // the Filter no longer matches the window attribute and the
      // WindowGroupLimit pushdown is lost (the q07 lesson)
      .select(col("source"), col("rk").cast("long").as("rk"),
        col("doc_id"), col("score_i"))
      .orderBy("source", "rk")
  }

  /** Q65 — power-of-2 length bucketing (the batching layout step before
    * training: sequences padded to their bucket boundary): bucket b holds
    * docs with n_tokens in [2^b, 2^(b+1)), pad target 2^(b+1), and the
    * report carries per-bucket doc/token totals plus the padding waste the
    * layout would cost. Bucket id is `bitlength(n_tokens) - 1` — pure
    * integer, no log2 float (floor(log2(2^k)) is engine-dependent at the
    * boundary). Shape: pure map + one tiny aggregate, the ideal 100 TB
    * plan. An ntile-style equal-population bucketing would need a global
    * sort — the partitionless-window trap; fixed boundaries don't. */
  def lengthBuckets(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(size(TextOps.tokens(col("text"))).cast("long").as("nt"))
      .filter(col("nt") > 0)
      .withColumn("bucket", (length(bin(col("nt"))) - 1).cast("long"))
      // SQL shiftleft takes a column shift amount; the Scala functions
      // overload only takes a literal
      .withColumn("pad",
        expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT) + 1) - nt"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("nt").as("total_tokens"),
        min("nt").as("min_tokens"),
        max("nt").as("max_tokens"),
        sum("pad").as("pad_waste"))
      .select(col("bucket"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))").as("lo"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT) + 1) - 1").as("hi"),
        col("n_docs"), col("total_tokens"), col("min_tokens"),
        col("max_tokens"), col("pad_waste"))
      .orderBy("bucket")
  }

  /** Q68 — per-source quality CALIBRATION: raw quality scores are not
    * comparable across sources (a boilerplate-heavy crawl and a clean book
    * corpus have different score distributions), so production filtering
    * thresholds per source, not globally. Each doc gets its source's
    * quartile thresholds and a tier (top/high/mid/low).
    *
    * Scale shape: scores are a pure map; thresholds are ONE tiny per-source
    * aggregate (exact interpolated percentiles) broadcast back onto the
    * corpus — no global sort, no per-source window over the corpus (the
    * ntile formulation would be exactly the partitionless-window trap).
    *
    * Determinism: percentiles interpolate over the FIXED-POINT score·10⁴
    * integers ([[TextOps.qualityScoreFix4]]) at quarter fractions, so
    * (1−f)·a + f·b is exact in IEEE arithmetic no matter how an engine
    * associates it — thresholds carry zero float drift, and the tier
    * comparison happens in the same integer space. */
  def qualityCalibration(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        TextOps.qualityScoreFix4(col("text")).as("score_i"))
    val thresholds = scored.groupBy("source").agg(
      expr("percentile(score_i, 0.25)").as("p25_i"),
      expr("percentile(score_i, 0.5)").as("p50_i"),
      expr("percentile(score_i, 0.75)").as("p75_i"))
    scored.join(broadcast(thresholds), Seq("source"))
      .select(col("doc_id"), col("source"),
        (col("score_i") / lit(10000.0)).as("quality_score"),
        (col("p25_i") / lit(10000.0)).as("p25"),
        (col("p50_i") / lit(10000.0)).as("p50"),
        (col("p75_i") / lit(10000.0)).as("p75"),
        when(col("score_i") >= col("p75_i"), "top")
          .when(col("score_i") >= col("p50_i"), "high")
          .when(col("score_i") >= col("p25_i"), "mid")
          .otherwise("low").as("tier"))
      .orderBy("doc_id")
  }

  /** Q70 — temperature-based mixture schedule (τ = 0.5): the data-mix step
    * that decides how many tokens each source contributes to a training
    * run. Raw token shares are flattened by √share (the standard
    * multilingual/multi-domain temperature reweighting), renormalized, and
    * turned into per-source token targets + epoch counts (how many passes
    * over a source the schedule implies).
    *
    * Scale shape: one per-source aggregate, then arithmetic over the tiny
    * source table (two broadcast cross-joins for the totals, as q53 does).
    *
    * Determinism: √share is IEEE-correctly-rounded in every engine, and the
    * normalizing denominator is a SUM OF FIXED-POINT BIGINTs (√share·10⁹),
    * so it is order-independent — the one place a float sum could diverge.
    * The remaining ops are single IEEE divisions/multiplications of
    * identical inputs. τ is fixed at 0.5 because sqrt is correctly rounded
    * where pow(x, τ) is not guaranteed to be across libm implementations. */
  def mixSchedule(spark: SparkSession, dir: String): DataFrame = {
    val perSource = Tables.documents(spark, dir)
      .select(col("source"), size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
    val totals = perSource.agg(sum("n_tokens").cast("double").as("tot_tokens"))
    val weighted = perSource.crossJoin(broadcast(totals))
      .withColumn("token_share", col("n_tokens") / col("tot_tokens"))
      .withColumn("w_fix",
        floor(sqrt(col("token_share")) * lit(1000000000.0) + lit(0.5)).cast("long"))
    val denom = weighted.agg(sum("w_fix").cast("double").as("denom"))
    weighted.crossJoin(broadcast(denom))
      .withColumn("mix_weight", col("w_fix") / col("denom"))
      .withColumn("target_tokens",
        floor(col("mix_weight") * col("tot_tokens")).cast("long"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("token_share"),
        col("mix_weight"), col("target_tokens"),
        (col("target_tokens") * lit(1.0) / col("n_tokens")).as("epochs"))
      .orderBy("source")
  }

  /** Q71 — hash-sharding for training-data layout: every doc is assigned to
    * one of `nShards` output shards by a deterministic content-independent
    * hash of its id (so shard membership is stable across runs and engines,
    * unlike round-robin or rand), and the report shows the balance a data
    * loader would see: per-shard doc/token counts and their ratio to the
    * uniform ideal. At 100 TB this IS the write-partitioning step before
    * `write.partitionBy(shard)` — uniform hash keys are what make the
    * output files evenly sized. Shape: pure map + one tiny aggregate +
    * broadcast totals. */
  def shardAssign(spark: SparkSession, dir: String, nShards: Int = 16): DataFrame = {
    val assigned = Tables.documents(spark, dir)
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
      // same md5-prefix integer convention q63/q44 hash-verify:
      // conv(hex, 16, 10) == DuckDB CAST('0x' || hex AS INTEGER)
      .withColumn("shard",
        expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 6), 16, 10) as bigint)")
          % nShards)
    val per = assigned.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
    val totals = per.agg(
      sum("n_docs").cast("double").as("tot_docs"),
      sum("n_tokens").cast("double").as("tot_tokens"))
    per.crossJoin(broadcast(totals))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        (col("n_docs") * lit(nShards.toDouble) / col("tot_docs")).as("doc_balance"),
        (col("n_tokens") * lit(nShards.toDouble) / col("tot_tokens")).as("token_balance"))
      .orderBy("shard")
  }

  /** Q76 — corpus snapshot DRIFT report: compare two corpus snapshots
    * (the even/odd doc_id split stands in for yesterday/today, the same
    * convention as q64's ledger/batch) over (lang × length-bucket) cells,
    * reporting per-cell counts, share deltas, and the chi-square
    * contribution — the distribution-shift monitor a recurring crawl
    * pipeline runs before admitting a new snapshot. Shape: ONE map pass
    * over the corpus, one small keyed aggregate (both snapshot counts come
    * from conditional sums — no outer join of two grouped sides), broadcast
    * totals. Length bucket reuses q65's `bitlength−1` integer trick; the
    * chi-square term `(n_b−e)²/e` is float but both engines evaluate the
    * identical expression tree over exact integer inputs. */
  def driftReport(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Portable.pround
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        (length(bin(col("n_chars"))) - 1).cast("long").as("bucket"))
    val isA = col("doc_id") % 2 === 0
    val cells = d.groupBy("lang", "bucket").agg(
      sum(when(isA, 1L).otherwise(0L)).as("n_a"),
      sum(when(!isA, 1L).otherwise(0L)).as("n_b"))
    // totals re-aggregate the tiny cells frame, sharing its exchange
    // (ReuseExchange) — an independent d.agg would rescan the corpus
    val tot = cells.agg(
      sum("n_a").as("tot_a"),
      sum("n_b").as("tot_b"))
    val shareA = col("n_a") * lit(1.0) / col("tot_a")
    val shareB = col("n_b") * lit(1.0) / col("tot_b")
    // expected count of the cell in B if A's distribution held
    val e = col("n_a") * col("tot_b") / col("tot_a")
    cells.crossJoin(broadcast(tot))
      .select(col("lang"), col("bucket"), col("n_a"), col("n_b"),
        pround(shareA, 6).as("share_a"),
        pround(shareB, 6).as("share_b"),
        pround(shareB - shareA, 6).as("share_delta"),
        when(col("n_a") > 0,
          pround((col("n_b") - e) * (col("n_b") - e) / e, 6)).as("chi2_term"))
      .orderBy("lang", "bucket")
  }

  /** Q77 — content-defined CHUNK dedup (sub-document granularity): split
    * every doc into variable-size chunks at content-defined boundaries (a
    * token closes a chunk when its md5-derived hash ≡ 0 mod 16 — the
    * rolling-hash cut rule of CDC storage dedup, applied to token streams),
    * fingerprint each chunk, and report per doc how many of its chunks also
    * occur elsewhere — catching SHARED PASSAGES (boilerplate, quotations,
    * licence blocks) that whole-document dedup can't see. Content-defined
    * boundaries make chunk identity insertion-stable: editing one sentence
    * shifts only neighbouring chunk boundaries, unlike fixed-width q52
    * windows where one inserted token reflows every downstream chunk.
    * Shape (round-5 scale fix): the whole boundary→group→hash loop runs
    * inside the codegen'd [[graft.functions.CdcChunks]] expression, so
    * chunk-hash arrays come straight off the parquet scan with ZERO
    * shuffle — no token-level explode, no doc-keyed window, no
    * (doc, chunk) collect_list. The only exchanges left are the chunk-hash
    * df aggregate and the final per-doc rollup, both keyed and
    * corpus/16-sized (E[chunk len] = 16 tokens). The window formulation it
    * replaced is kept as [[chunkDedupExploded]] — the differential
    * reference a spec compares bit-for-bit. */
  def chunkDedup(spark: SparkSession, dir: String): DataFrame = {
    // the cut rate is fixed at the registered expression's mod=16 — no
    // parameter pretending otherwise ([[CdcChunks]] itself is generic; a
    // different rate means registering a second function, not a knob here)
    graft.functions.TextExpressions.register(spark)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.TextExpressions.cdc_chunks(TextOps.tokens(col("text"))).as("hs"))
    // duplicate hashes WITHIN a doc stay distinct rows, matching the
    // (doc, chunk_id) granularity of the exploded formulation
    val ex = docs.select(col("doc_id"), explode(col("hs")).as("chunk_hash"))
    val hdf = ex.groupBy("chunk_hash").agg(count(lit(1)).as("cdf"))
    ex.join(hdf, Seq("chunk_hash"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("cdf") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"))
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
        (col("n_dup_chunks") * lit(1.0) / col("n_chunks")).as("dup_ratio"))
      .orderBy("doc_id")
  }

  /** The round-4 exploded/windowed formulation of [[chunkDedup]], retained
    * ONLY as the differential-test reference (CurationSpec's "chunk dedup:
    * codegen'd expression is bit-identical" case): posexplode to token level → doc-keyed
    * boundary-prefix window → (doc, chunk) collect_list — two shuffles of
    * the tokenized corpus that the codegen'd expression eliminates. */
  private[graft] def chunkDedupExploded(spark: SparkSession, dir: String,
      mod: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "tok")))
      .withColumn("boundary",
        (conv(substring(md5(col("tok")), 1, 4), 16, 10).cast("long") % mod === 0)
          .cast("long"))
    val chunks = toks
      // a boundary token ENDS its chunk: the chunk id is the number of
      // boundaries strictly before this row
      .withColumn("chunk_id", coalesce(
        sum(col("boundary")).over(byDoc.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .groupBy("doc_id", "chunk_id")
      .agg(collect_list(struct(col("pos"), col("tok"))).as("pt"))
      // collect_list order is nondeterministic — array_sort on the (pos, tok)
      // struct restores token order before hashing
      .select(col("doc_id"), col("chunk_id"),
        md5(concat_ws(" ",
          transform(array_sort(col("pt")), s => s.getField("tok")))).as("chunk_hash"))
    val hdf = chunks.groupBy("chunk_hash").agg(count(lit(1)).as("cdf"))
    chunks.join(hdf, Seq("chunk_hash"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("cdf") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"))
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
        (col("n_dup_chunks") * lit(1.0) / col("n_chunks")).as("dup_ratio"))
      .orderBy("doc_id")
  }

  /** Q106 — TOKEN-BUDGET APPORTIONMENT by largest remainder (Hamilton's
    * method): split a global training budget across sources proportionally
    * to token mass so the allocations sum EXACTLY to the budget — floor
    * division leaves `budget − Σ base` tokens, handed one each to the
    * largest remainders (ties to source name). All arithmetic stays in
    * exact integers (q63/q88 discipline); the only window ranks the
    * per-source rows, a source-count-sized frame under the q59
    * coalesce(1) + spark_partition_id pattern — corpus token counting is
    * the scan, everything after is dashboard-sized. */
  def tokenBudget(spark: SparkSession, dir: String,
      budget: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = Tables.documents(spark, dir)
      .select(col("source"), size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
      .groupBy("source").agg(sum("n_tok").as("n_tok"))
    val tot = tok.agg(sum("n_tok").as("tot"))
    // the budget·n_tok product runs in decimal(38,0), not Long: one source
    // past ~9.2e12 tokens (plausible at the 100 TB target with the default
    // 1M budget) would silently overflow a BIGINT product — the same scale
    // upgrade momentCorr (q109) documents. `div`/`%` on decimal operands
    // keep exactness; `div` returns BIGINT so base/alloc stay long.
    val based = tok.crossJoin(broadcast(tot))
      .withColumn("base",
        expr(s"(cast($budget as decimal(38,0)) * n_tok) div tot"))
      .withColumn("rem",
        expr(s"(cast($budget as decimal(38,0)) * n_tok) % tot"))
    val leftover = based.agg((lit(budget) - sum("base")).as("leftover"))
    val wRk = Window.partitionBy(spark_partition_id())
      .orderBy(desc("rem"), col("source"))
    based.coalesce(1)
      .withColumn("rk", row_number().over(wRk).cast("long"))
      .crossJoin(broadcast(leftover))
      .select(col("source"), col("n_tok"),
        (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
          .as("alloc_tokens"))
      .orderBy("source")
  }

  /** Q116 — RIGHT-TO-BE-FORGOTTEN PURGE AUDIT: given a tombstone predicate
    * (here the doc_id % 17 stand-in for a deletion list), report per
    * derived ARTIFACT how many rows exist and how many must cascade-delete
    * — the governance sweep a training-data lake runs before certifying a
    * removal request, because deleting the source doc is NOT enough: its
    * chunks (q52), sampled frames (q56), and dedup signatures (q29) all
    * carry the content too. Counts aggregate over the REAL derived
    * artifacts (the same frames the pipeline materializes), while the
    * oracle recomputes them in closed form from the corpus — so this row
    * also cross-checks that artifact generation matches its declared
    * per-doc cardinality rule. Four keyed aggregates, dashboard-sized
    * output; at 100 TB each audit leg is one map-side-combined count over
    * an artifact table. */
  def purgeAudit(spark: SparkSession, dir: String,
      modulus: Long = 17): DataFrame = {
    def audit(name: String, df: DataFrame, idCol: String): DataFrame =
      df.agg(
          count(lit(1)).as("n_rows"),
          coalesce(sum((col(idCol) % modulus === 0).cast("long")), lit(0L))
            .as("n_purged"))
        .select(lit(name).as("artifact"), col("n_rows"), col("n_purged"))
    audit("chunks", chunk(spark, dir), "doc_id")
      .unionByName(audit("documents", Tables.documents(spark, dir), "doc_id"))
      .unionByName(audit("frames",
        graft.multimodal.Multimodal.frameSampleQuery(spark, dir), "asset_id"))
      .unionByName(audit("signatures",
        Dedup.minhashSignatures(spark, dir), "doc_id"))
      .orderBy("artifact")
  }

  /** Q100 — deterministic EPOCH SHUFFLE: the training-order permutation a
    * data loader consumes, reproducible across runs/engines/restarts (the
    * property `rand()` shuffles lack). Each doc hashes to a batch via the
    * q63/q44 md5-prefix convention; order WITHIN a batch is the hash order.
    *
    * Scale contract: there is deliberately NO global row_number — the only
    * window is partitioned by batch, and nBatches is chosen so a batch is
    * loader-shard-sized (corpus/nBatches ≈ 10⁵ docs), so every window
    * partition stays bounded BY CONSTRUCTION as the corpus grows: shuffling
    * 100 TB means more batches, never bigger ones. A different seed
    * re-permutes everything — epoch 2 is `seed = "epoch2"`. */
  def epochShuffle(spark: SparkSession, dir: String,
      nBatches: Int = 16, seed: String = "epoch1"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = conv(substring(
        md5(concat(lit(s"$seed:"), col("doc_id").cast("string"))), 1, 6),
      16, 10).cast("long")
    val byBatch = Window.partitionBy("batch").orderBy("h", "doc_id")
    Tables.documents(spark, dir)
      .select(col("doc_id"), h.as("h"))
      .withColumn("batch", col("h") % nBatches)
      .withColumn("pos_in_batch", row_number().over(byBatch).cast("long"))
      .select("doc_id", "batch", "pos_in_batch")
      .orderBy("batch", "pos_in_batch")
  }
}
