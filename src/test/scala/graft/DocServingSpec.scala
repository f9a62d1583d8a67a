package graft

import org.apache.spark.sql.functions._
import graft.text.{DocStore, TextIndex, TextOps}

/** Round-11 serving-surface contract for boolean retrieval (q155) and
  * the doc-store fetch/snippet page (q156): each answer must equal the
  * corpus-direct formulation computed fresh, and the store's add-only
  * append must be invisible to fetches (append ≡ rebuild). */
class DocServingSpec extends SparkSpec {

  private def docsDirFrom(offset: Long): String = {
    val dir = java.nio.file.Files.createTempDirectory("dsrv_batch").toString
    spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("doc_id", col("doc_id") + offset)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def unionDir(dirs: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("dsrv_union").toString
    dirs.map(d => spark.read.parquet(s"$d/documents.parquet"))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** Corpus-direct boolean truth: tokenize, per-(doc, tok) tf, keep docs
    * hitting every must term and no mustNot term. */
  private def boolTruth(dir: String, must: Seq[String],
      mustNot: Seq[String], minShouldMatch: Int = -1): Set[Seq[Any]] = {
    val k = if (minShouldMatch < 0) must.length else minShouldMatch
    val dt = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dl = dt.groupBy("doc_id").agg(sum("tf").as("dl"))
    val hits = dt.filter(col("tok").isin(must: _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nhit"), min("tf").as("min_tf"),
        max("tf").as("max_tf"))
      .filter(col("nhit") >= k)
    val kept =
      if (mustNot.isEmpty) hits
      else hits.join(
        dt.filter(col("tok").isin(mustNot: _*)).select("doc_id"),
        Seq("doc_id"), "left_anti")
    kept.join(dl, Seq("doc_id"))
      .select("doc_id", "dl", "min_tf", "max_tf")
      .collect().map(_.toSeq).toSet
  }

  test("q155: boolSearch equals the corpus-direct truth; NOT excludes real docs") {
    val idx = java.nio.file.Files.createTempDirectory("bool_idx").toString
    TextIndex.write(spark, sf0001, idx)
    val (must, not) = TextIndex.deriveBoolTerms(spark, idx)
    assert(must.length == 2 && not.length == 1)
    val got = TextIndex.boolSearch(spark, idx, must, not)
      .collect().map(_.toSeq)
    assert(got.nonEmpty, "derived probe must qualify docs at sf0.001")
    assert(got.map(_.head).toSeq ==
      got.map(_.head).sortBy(_.asInstanceOf[Long]).toSeq,
      "output must be doc_id-ordered")
    assert(got.toSet == boolTruth(sf0001, must, not))
    // the exclusion is real: without NOT, strictly more docs qualify
    val noNot = TextIndex.boolSearch(spark, idx, must).collect()
    assert(noNot.length > got.length,
      "the rarest-term exclusion must remove at least one doc at sf0.001")
    assert(noNot.map(_.toSeq).toSet == boolTruth(sf0001, must, Nil))
  }

  test("q155: minShouldMatch dials the same aggregation from AND to OR") {
    val idx = java.nio.file.Files.createTempDirectory("bool_msm").toString
    TextIndex.write(spark, sf0001, idx)
    val (must, not) = TextIndex.deriveBoolTerms(spark, idx)
    def got(k: Int) = TextIndex.boolSearch(spark, idx, must, not,
      minShouldMatch = k).collect().map(_.toSeq).toSet
    // OR (k=1) ⊇ AND (k=2), both equal the corpus-direct truth
    assert(got(1) == boolTruth(sf0001, must, not, 1))
    assert(got(2) == boolTruth(sf0001, must, not, 2))
    assert(got(2).subsetOf(got(1)) && got(1).size > got(2).size,
      "OR must qualify strictly more docs than AND on this corpus")
    // under k < m an OOV term cannot contribute but still counts toward
    // m: 2-of-3 with one unindexable term is NOT silently 2-of-2 — it
    // demands both resolvable terms
    val withOov = TextIndex.boolSearch(spark, idx,
      must :+ "zzz_not_a_token", not, minShouldMatch = 2)
      .collect().map(_.toSeq).toSet
    assert(withOov == boolTruth(sf0001, must, not, 2))
    // ...and a threshold no resolved subset can reach short-circuits empty
    assert(TextIndex.boolSearch(spark, idx,
      Seq(must.head, "zzz_a", "zzz_b"), not, minShouldMatch = 2)
      .count() == 0L)
  }

  test("q155: OOV must short-circuits empty; OOV mustNot excludes nothing") {
    val idx = java.nio.file.Files.createTempDirectory("bool_oov").toString
    TextIndex.write(spark, sf0001, idx)
    val (must, not) = TextIndex.deriveBoolTerms(spark, idx)
    val oovMust = TextIndex.boolSearch(spark, idx,
      must :+ "zzz_not_a_token", not)
    assert(oovMust.count() == 0L)
    assert(oovMust.columns.toSeq == Seq("doc_id", "dl", "min_tf", "max_tf"))
    val oovNot = TextIndex.boolSearch(spark, idx, must,
      Seq("zzz_not_a_token")).collect().map(_.toSeq).toSet
    assert(oovNot == boolTruth(sf0001, must, Nil))
  }

  test("q155: append ≡ rebuild for the boolean answer") {
    val idx = java.nio.file.Files.createTempDirectory("bool_app").toString
    TextIndex.write(spark, sf0001, idx)
    val batch = docsDirFrom(700000L)
    TextIndex.append(spark, batch, idx)
    val rebuilt = java.nio.file.Files.createTempDirectory("bool_rb").toString
    TextIndex.write(spark, unionDir(Seq(sf0001, batch)), rebuilt)
    val root = Some(TextIndex.currentRoot(spark, idx))
    val (must, not) = TextIndex.deriveBoolTerms(spark, idx, pinnedRoot = root)
    val got = TextIndex.boolSearch(spark, idx, must, not, pinnedRoot = root)
      .collect().map(_.toSeq).toSeq
    val want = TextIndex.boolSearch(spark, rebuilt, must, not)
      .collect().map(_.toSeq).toSeq
    assert(got == want, "appended index boolean answer drifted from rebuild")
  }

  test("doc store: fetchPage returns exactly the requested rows; append is invisible to fetches") {
    val store = java.nio.file.Files.createTempDirectory("store").toString
    DocStore.write(spark, sf0001, store)
    val all = spark.read.parquet(s"$sf0001/documents.parquet")
    val wantIds = Seq(1L, 7L, 123L, 499L)
    val got = DocStore.fetchPage(spark, store, wantIds)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .collect().map(_.toSeq).toSet
    val want = all.filter(col("doc_id").isin(wantIds: _*))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .collect().map(_.toSeq).toSet
    assert(got == want && got.size == wantIds.size)
    // append a batch, then fetch across old + new ids: equals a store
    // rebuilt from the union corpus (append ≡ rebuild)
    val batch = docsDirFrom(900000L)
    assert(DocStore.append(spark, batch, store, "batch_1"))
    // a replayed batch short-circuits: committed tag, nothing rewritten
    assert(!DocStore.append(spark, batch, store, "batch_1"))
    assert(DocStore.appliedTags(spark, store) == Set("batch_1"))
    val mixed = Seq(1L, 900007L, 900123L, 499L)
    val rebuilt = java.nio.file.Files.createTempDirectory("store_rb").toString
    DocStore.write(spark, unionDir(Seq(sf0001, batch)), rebuilt)
    def fetched(p: String) = DocStore.fetchPage(spark, p, mixed)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .collect().map(_.toSeq).toSet
    assert(fetched(store) == fetched(rebuilt) && fetched(store).size == 4)
    // page bound is a contract, not advice
    intercept[IllegalArgumentException] {
      DocStore.fetchPage(spark, store, (1L to 1025L).toSeq)
    }
  }

  test("q156: snippets equal the corpus-direct windows, clamped at doc edges") {
    import spark.implicits._
    // controlled corpus: the top trigram "x y z" occurs at position 0
    // (head clamp), mid-doc, at the very end (tail clamp), and twice in
    // one doc (first_pos = the first); a decoy trigram occurs once
    val docs = Seq(
      (1L, "x y z tail one two"),            // head clamp: no left context
      (2L, "a b x y z c d"),                 // full ±2 window
      (3L, "lead in words x y z"),           // tail clamp: no right context
      (4L, "x y z mid gap x y z"),           // twice: first_pos = 0
      (5L, "decoy gram here nothing else")   // no occurrence
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("snip_docs").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pi = java.nio.file.Files.createTempDirectory("snip_pi").toString
    val store = java.nio.file.Files.createTempDirectory("snip_store").toString
    TextIndex.writePhraseIndex(spark, dir, pi)
    DocStore.write(spark, dir, store)
    assert(TextIndex.topPhrase(spark, pi) == Seq("x", "y", "z"))
    val got = DocStore.snippetSearch(spark, pi, store)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    // page order: n_occ desc, doc_id — doc 4 (2 occs) first
    assert(got.toSeq == Seq(
      (1L, 4L, 2L, 0L, "x y z mid gap"),
      (2L, 1L, 1L, 0L, "x y z tail one"),
      (3L, 2L, 1L, 2L, "a b x y z c d"),
      (4L, 3L, 1L, 3L, "in words x y z")))
  }

  test("q156/q162: a phrase-index fold ahead of the store serves the last COVERED version") {
    // round 15 — the r14 verdict's task #2: the page chain reads two
    // separately-published artifacts. An index version published while
    // its batch's store append has not been observed (crashed run, or a
    // caller violating store-before-index) must not be served — the
    // resolver pins the newest version whose ledger the store's batches
    // cover, so the page serves the last synchronized state instead of
    // dying in fetchChecked's coverage guard.
    import spark.implicits._
    def docsOf(rows: Seq[(Long, String)]): String = {
      val dir = java.nio.file.Files.createTempDirectory("cov_docs").toString
      rows.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("t"))
        .withColumn("n_chars", length(col("text")))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    val base = docsOf(Seq(1L -> "x y z one two", 2L -> "a x y z b"))
    // the batch's docs out-rank every base doc (2 occurrences), so an
    // UNSYNCHRONIZED read would page them and crash on the missing store
    // rows — the hazard must be live for the spec to mean anything
    val b2 = docsOf(Seq(11L -> "x y z gap x y z", 12L -> "x y z c x y z"))
    val pi = java.nio.file.Files.createTempDirectory("cov_pi").toString
    val store = java.nio.file.Files.createTempDirectory("cov_st").toString
    TextIndex.writePhraseIndex(spark, base, pi)
    DocStore.write(spark, base, store)
    val want = DocStore.snippetSearch(spark, pi, store)
      .collect().map(_.toSeq).toSeq
    assert(want.map(_(1)).toSet == Set(1L, 2L))
    TextIndex.appendPhraseIndex(spark, b2, pi, Some("b2"))
    val got = DocStore.snippetSearch(spark, pi, store)
      .collect().map(_.toSeq).toSeq
    assert(got == want,
      "an index fold the store has not observed must not serve — pin " +
        "the last covered version")
    val gotMedia = DocStore.mediaSearch(spark, pi, store)
      .collect().map(_.toSeq).toSeq
    assert(gotMedia.map(_(1)).toSet == Set(1L, 2L),
      "the media page must pin the covered version too")
    // the store catching up advances the served state: the new docs page
    assert(DocStore.append(spark, b2, store, "b2"))
    val advanced = DocStore.snippetSearch(spark, pi, store)
      .collect().map(_.toSeq).toSeq
    assert(Set[Any](11L, 12L).subsetOf(advanced.map(_(1)).toSet),
      s"after the store observes the batch, the new version serves: $advanced")
  }

  test("doc store: a fenced append commits nothing and leaves no staging debris") {
    import org.apache.hadoop.fs.Path
    val store = java.nio.file.Files.createTempDirectory("store_fence").toString
    DocStore.write(spark, sf0001, store)
    val batch = docsDirFrom(950000L)
    val demoted = new IllegalStateException("fence: lease superseded")
    val e = intercept[IllegalStateException] {
      DocStore.append(spark, batch, store, "batch_f",
        fence = () => throw demoted)
    }
    assert(e eq demoted)
    val fs = new Path(store).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(store, "batches/batch_f")),
      "a fenced append must not publish")
    val left = fs.listStatus(new Path(store, "batches"))
      .map(_.getPath.getName).filter(_.startsWith(".staging_"))
    assert(left.isEmpty, s"fenced append left staging debris: ${left.toSeq}")
    // invalid tags are rejected with the shared ledger+dir rules before
    // any work: '#' (ledger metadata), '/' (nesting), '.' (tag "."
    // resolves to the batches root — publish would delete every
    // committed batch; ".staging_*" collides with the TTL sweep;
    // "untagged_*" is reserved for nonce deltas — a user tag wearing it
    // would slip ClusterIndex.compact's unfinished-fold guard, round 15)
    for (bad <- Seq("#meta", "a/b", ".", ".staging_x", "untagged_backfill"))
      intercept[IllegalArgumentException] {
        DocStore.append(spark, batch, store, bad)
      }
    // a staging assembly whose Spark write finished (rows/_SUCCESS
    // present) but whose publish never ran must NOT read as committed —
    // listing it would double every doc of the in-flight batch
    val stray = new Path(store, "batches/.staging_orphan_xx/rows")
    fs.mkdirs(stray)
    fs.create(new Path(stray, "_SUCCESS")).close()
    assert(!DocStore.appliedTags(spark, store).exists(_.startsWith(".")),
      "a staging dir must never be listed as a committed batch")
  }

  test("q156: a store that does not cover the index's corpus fails loudly, not short") {
    import spark.implicits._
    // phrase index over TWO docs sharing the top trigram; store over ONE
    val full = Seq((1L, "x y z one"), (2L, "x y z two"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
    val half = full.filter(col("doc_id") === 1L)
    val fullDir = java.nio.file.Files.createTempDirectory("cov_full").toString
    val halfDir = java.nio.file.Files.createTempDirectory("cov_half").toString
    full.write.mode("overwrite").parquet(s"$fullDir/documents.parquet")
    half.write.mode("overwrite").parquet(s"$halfDir/documents.parquet")
    val pi = java.nio.file.Files.createTempDirectory("cov_pi").toString
    val store = java.nio.file.Files.createTempDirectory("cov_store").toString
    TextIndex.writePhraseIndex(spark, fullDir, pi)
    DocStore.write(spark, halfDir, store)
    val e = intercept[IllegalArgumentException] {
      DocStore.snippetSearch(spark, pi, store)
    }
    assert(e.getMessage.contains("missing 1 of"),
      s"expected the coverage guard, got: ${e.getMessage}")
  }

  test("q156: empty phrase result yields an empty page with the contract schema") {
    import spark.implicits._
    // two docs, no trigram repeated — topPhrase still resolves (rank-1 of
    // count-1 grams), so exercise the empty page via a store/index over a
    // one-doc corpus whose phrase the OTHER corpus lacks: simplest honest
    // check is schema stability on a normal corpus with topK = 0 pages
    // being impossible — instead assert the empty-frame branch directly
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("snip_e").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pi = java.nio.file.Files.createTempDirectory("snip_epi").toString
    TextIndex.writePhraseIndex(spark, dir, pi)
    // a 2-token doc has no trigram: the phrases artifact is empty and
    // topPhrase must refuse loudly rather than serve a null phrase —
    // either the require (IllegalArgument) or the empty-artifact read
    // (AnalysisException) fires; what matters is no silent null probe
    val e = intercept[Exception] { TextIndex.topPhrase(spark, pi) }
    assert(e.isInstanceOf[IllegalArgumentException] ||
      e.isInstanceOf[org.apache.spark.sql.AnalysisException])
  }

  test("q162: payload bytes fetch exactly across base + batches; media page rides them") {
    import java.nio.charset.StandardCharsets.UTF_8
    val store = java.nio.file.Files.createTempDirectory("media_store").toString
    DocStore.write(spark, sf0001, store)
    val batch = docsDirFrom(800000L)
    DocStore.append(spark, batch, store, "media_b1")
    // MIXED rows: base ids + appended ids in one page — every payload
    // must be byte-identical to its doc's UTF-8 text (the stand-in rule),
    // whichever layer serves it
    val ids = Seq(1L, 123L, 800001L, 800123L)
    val got = DocStore.fetchPage(spark, store, ids)
      .select("doc_id", "text", "payload").collect()
    assert(got.length == ids.length, s"expected ${ids.length} rows, got ${got.length}")
    got.foreach { r =>
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]](2),
        r.getString(1).getBytes(UTF_8)),
        s"payload drifted from the text bytes for doc ${r.getLong(0)}")
    }
    // the media page equals one computed corpus-direct: snippet is q156's,
    // byte_len/frame0_md5 are functions of the payload bytes
    val pi = java.nio.file.Files.createTempDirectory("media_pi").toString
    TextIndex.writePhraseIndex(spark, sf0001, pi)
    val base = java.nio.file.Files.createTempDirectory("media_base").toString
    DocStore.write(spark, sf0001, base)
    val page = DocStore.mediaSearch(spark, pi, base).collect()
    assert(page.nonEmpty, "fixture must produce a media page")
    val textOf = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    page.foreach { r =>
      val t = textOf(r.getLong(1))
      assert(r.getLong(4) == t.getBytes(UTF_8).length.toLong,
        s"byte_len drifted for doc ${r.getLong(1)}")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes(UTF_8).take(16))
        .map("%02x".format(_)).mkString
      assert(r.getString(5) == md, s"frame0_md5 drifted for doc ${r.getLong(1)}")
    }
    // the empty branch matches the populated schema (the q156 rule)
    val empty = DocStore.mediaSearch(spark, pi, base,
      phraseOverride = Some(Seq("zzz_not", "zzz_a", "zzz_token")))
    assert(empty.count() == 0L)
    assert(empty.schema == DocStore.mediaSearch(spark, pi, base).schema,
      "media empty-page schema drifted from the populated page's")
  }

  test("q156: the empty-page branch itself returns the populated contract schema") {
    // THIS test drives the page.isEmpty branch directly: the phraseOverride
    // hook probes an ABSENT phrase, which the public derivation (topPhrase
    // resolves a phrase its own index contains) can never produce
    val pi = java.nio.file.Files.createTempDirectory("snip_bpi").toString
    val store = java.nio.file.Files.createTempDirectory("snip_bst").toString
    TextIndex.writePhraseIndex(spark, sf0001, pi)
    DocStore.write(spark, sf0001, store)
    val populated = DocStore.snippetSearch(spark, pi, store)
    val empty = DocStore.snippetSearch(spark, pi, store,
      phraseOverride = Some(Seq("zzz_not", "zzz_a", "zzz_token")))
    assert(empty.count() == 0L, "an absent phrase must yield an empty page")
    assert(empty.schema == populated.schema,
      s"empty-page schema drifted from the populated page's:\n" +
        s"  empty:     ${empty.schema.treeString}\n" +
        s"  populated: ${populated.schema.treeString}")
  }
}
