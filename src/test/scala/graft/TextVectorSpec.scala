package graft

import org.apache.spark.sql.functions._
import graft.text.{Dedup, TextOps}
import graft.vector.Similarity
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaAsset

/** U6–U8 north-star operators + multimodal plumbing. */
class TextVectorSpec extends SparkSpec {
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("docs").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("exact dedup flags every copy after the first — U6") {
    val dir = docsDir(Seq(
      (1L, "a b c d e", "en", "s", 9L),
      (2L, "a b c d e", "en", "s", 9L),
      (3L, "x y z w v", "en", "s", 9L)))
    val r = Dedup.exactDedup(spark, dir).collect()
    assert(r.map(x => x.getLong(0) -> x.getLong(2)).toSeq ==
      Seq(1L -> 0L, 2L -> 1L, 3L -> 0L))
  }

  test("minhash: identical docs agree on all 8 hashes; LSH pairs them") {
    val dir = docsDir(Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en", "s", 43L),
      (2L, "the quick brown fox jumps over the lazy dog", "en", "s", 43L),
      (3L, "completely different words appear in this document here", "en", "s", 55L)))
    val pairs = Dedup.minhashPairs(spark, dir).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
    assert(pairs.head.getDouble(2) == 1.0)
  }

  test("near-dup clusters: copies collapse to first-doc-wins components") {
    val dir = docsDir(Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en", "s", 43L),
      (2L, "the quick brown fox jumps over the lazy dog", "en", "s", 43L),
      (5L, "the quick brown fox jumps over the lazy dog", "en", "s", 43L),
      (3L, "completely different words appear in this document here", "en", "s", 55L)))
    val r = Dedup.nearDupClusters(spark, dir).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r(1L) == ((1L, 1L))) // cluster rep keeps itself
    assert(r(2L) == ((1L, 0L))) // dups point at the rep and drop
    assert(r(5L) == ((1L, 0L)))
    assert(r(3L) == ((3L, 1L))) // singleton keeps
  }

  test("canonical docs: richest cluster member wins, exactly one keeper each") {
    val dir = docsDir(Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en", "s", 43L),
      (2L, "the quick brown fox jumps over the lazy dog", "en", "s", 50L), // richest
      (5L, "the quick brown fox jumps over the lazy dog", "en", "s", 43L),
      (3L, "completely different words appear in this document here", "en", "s", 55L)))
    val r = Dedup.canonicalDocs(spark, dir).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))))
      .toMap
    // cluster {1,2,5}: rep = min doc_id = 1, canonical = max n_chars = 2
    assert(r(1L) == ((1L, 3L, 2L, 0L)))
    assert(r(2L) == ((1L, 3L, 2L, 1L)))
    assert(r(5L) == ((1L, 3L, 2L, 0L)))
    assert(r(3L) == ((3L, 1L, 3L, 1L))) // singleton is its own canonical
    // invariant: exactly one keeper per cluster
    val keepers = Dedup.canonicalDocs(spark, dir)
      .groupBy("cluster_rep").agg(sum("keep").as("k")).collect()
    assert(keepers.forall(_.getLong(1) == 1L))
  }

  test("incremental dedup: ledger hit, within-batch claim, and new doc") {
    val sameA = "the quick brown fox jumps over the lazy dog"
    val sameB = "an entirely different sentence with its own tokens here"
    val dir = docsDir(Seq(
      (0L, sameA, "en", "s", 43L),  // ledger (even)
      (1L, sameA, "en", "s", 43L),  // batch, sketch in ledger -> dup_ledger
      (3L, sameB, "en", "s", 55L),  // batch, first claim      -> new
      (5L, sameB, "en", "s", 55L),  // batch, second claim     -> dup_batch
      (7L, "short", "en", "s", 5L)))// <3 tokens: md5 fallback -> new
    val r = Dedup.incrementalDedup(spark, dir).collect()
      .map(x => x.getLong(0) -> x.getString(2)).toMap
    assert(r == Map(1L -> "dup_ledger", 3L -> "new", 5L -> "dup_batch", 7L -> "new"))
  }

  test("ngram jaccard: identical = 1.0, disjoint = 0.0 within a block") {
    val dir = docsDir(Seq(
      (1L, "a b c d e f", "en", "s", 11L),
      (2L, "a b c d e f", "en", "s", 11L),
      (3L, "u v w x y z", "en", "s", 11L)))
    val r = Dedup.ngramJaccard(spark, dir).collect()
      .map(x => (x.getLong(2), x.getLong(3)) -> x.getDouble(4)).toMap
    assert(r((1L, 2L)) == 1.0)
    assert(r((1L, 3L)) == 0.0)
    assert(r((2L, 3L)) == 0.0)
  }

  test("simhash: identical docs share a fingerprint; it stays in 16 bits") {
    val dir = docsDir(Seq(
      (1L, "spark query engine test", "en", "s", 23L),
      (2L, "spark query engine test", "en", "s", 23L)))
    val r = Dedup.simhash(spark, dir).collect().map(_.getLong(1))
    assert(r(0) == r(1))
    assert(r(0) >= 0 && r(0) < 65536)
  }

  test("SimHash16 expression == exploded two-aggregate formulation") {
    // the MinHashHex differential convention: the compiled per-row loop
    // must be byte-identical to the round-1..15 exploded form it replaced
    val dir = sf0001
    val viaExpr = Dedup.simhash(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaExplode = Dedup.simhashExploded(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr == viaExplode)
  }

  test("language-ID predicts by marker-token profile with tie-break — U8") {
    val dir = docsDir(Seq(
      (1L, "table row table something", "de", "s", 24L),  // de markers win
      (2L, "key value key value", "en", "s", 19L),        // en markers win
      (3L, "nothing matches here", "fr", "s", 20L)))      // no markers → und
    val r = TextOps.langId(spark, dir).collect()
      .map(x => x.getLong(0) -> x.getString(2)).toMap
    assert(r(1L) == "de" && r(2L) == "en" && r(3L) == "und")
  }

  test("cosine top-k: self-similarity ranks first at 1.0 — U7") {
    val r = Similarity.cosineTopK(spark, sf0001).collect()
    assert(r.length == 10)
    assert(r.head.getLong(1) == 0L)       // probe itself
    assert(r.head.getDouble(2) == 1.0)
    val sims = r.map(_.getDouble(2)).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("LSH bucket path returns a subset consistent with brute force") {
    val ann = Similarity.annLsh(spark, sf0001).collect()
    assert(ann.nonEmpty && ann.head.getLong(1) == 0L)
    // every ANN hit must carry the probe's bucket
    assert(ann.map(_.getLong(2)).distinct.length == 1)
  }

  test("frame-sample query cuts stride frames with a clamped tail") {
    val text = "a" * 40 // 40 bytes: frames at 0 (16) and 32 (clamped to 8)
    val dir = docsDir(Seq((7L, text, "en", "s", 40L)))
    val r = Multimodal.frameSampleQuery(spark, dir).collect()
    assert(r.length == 2)
    assert(r(0).getLong(1) == 0L && r(0).getLong(2) == 16L)
    assert(r(1).getLong(1) == 1L && r(1).getLong(2) == 8L)
    val exp = org.apache.commons.codec.digest.DigestUtils.md5Hex("a" * 16)
    assert(r(0).getString(3) == exp)
  }

  test("multimodal: real PNG bytes decode to true dims/mean and resample for real") {
    // a real 8×4 PNG, generated in-memory: left half black, right half white
    // → mean Rec.601 luma exactly 127.5
    val img = new java.awt.image.BufferedImage(8, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0x000000 else 0xffffff)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val png = buf.toByteArray
    val assets = Seq(MediaAsset(10L, "image", png)).toDS()
    // the default (real) codec reports the TRUE dimensions, not the fake's
    // length-derived ones, and the exact two-tone mean
    val f = Multimodal.extractFeatures(assets).collect().head
    assert(f.width == 8 && f.height == 4)
    assert(f.mean_intensity == 127.5)
    // resample path: output payload is itself a decodable 2×2 PNG
    val resized = Multimodal.resize(assets, 2, 2).collect().head
    val outBytes = resized.getAs[Array[Byte]]("payload")
    val reread = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(outBytes))
    assert(reread != null && reread.getWidth == 2 && reread.getHeight == 2)
    // non-image bytes under the SAME default codec fall back to the fake —
    // the deterministic stand-in contract the corpus queries rely on
    val fake = Multimodal.extractFeatures(
      Seq(MediaAsset(11L, "audio", "not an image".getBytes("UTF-8"))).toDS())
      .collect().head
    assert(fake.width == 16 + 12 % 64)
  }

  test("multimodal: real WAV bytes parse to true audio metadata; non-WAV falls back") {
    import javax.sound.sampled._
    // 1 s of stereo 44.1 kHz PCM16, every sample = +1000 — written through
    // the JDK's own WAVE writer, so the fixture is a REAL .wav byte stream
    val fmt = new AudioFormat(44100f, 16, 2, true, false) // signed, little-endian
    val pcm = new Array[Byte](44100 * 2 * 2)
    var i = 0
    while (i < pcm.length) { pcm(i) = 0xE8.toByte; pcm(i + 1) = 0x03; i += 2 }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 44100)
    val buf = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, buf)
    val wav = buf.toByteArray
    val feats = Multimodal.extractAudioFeatures(Seq(
        MediaAsset(20L, "audio", wav),
        MediaAsset(21L, "audio", "definitely not audio".getBytes("UTF-8")),
        MediaAsset(22L, "audio", wav.take(30))). // truncated header
      toDS()).collect().sortBy(_.asset_id)
    val w = feats(0)
    assert(w.is_wav && w.channels == 2 && w.sample_rate_hz == 44100 &&
      w.bits_per_sample == 16, s"wav meta: $w")
    assert(w.n_samples == 44100L && w.duration_ms == 1000.0)
    assert(w.mean_abs_amplitude == 1000.0) // constant-amplitude PCM16
    // non-WAV payload: deterministic fallback shape, honestly flagged
    val t = feats(1)
    assert(!t.is_wav && t.channels == 1 && t.sample_rate_hz == 8000 &&
      t.n_samples == t.byte_len)
    // truncated bytes must fall back, never throw a task
    assert(!feats(2).is_wav)
  }

  test("multimodal: stub decode features are deterministic and fixed-shape") {
    val assets = Seq(
      MediaAsset(1L, "image", "some fake image payload bytes".getBytes("UTF-8")),
      MediaAsset(2L, "audio", Array[Byte]())).toDS()
    val f = Multimodal.extractFeatures(assets, Multimodal.FakeCodec)
      .collect().sortBy(_.asset_id)
    assert(f(0).byte_len == 29 && f(0).width == 16 + 29 % 64)
    assert(f(1).byte_len == 0 && f(1).mean_intensity == 0.0)
    val frames = Multimodal.sampleFrames(assets.filter(_.asset_id == 1), 4, 2).collect()
    assert(frames.length == 4) // 29/4 = 7 frames, stride 2 → frames 0,2,4,6
    val resized = Multimodal.resize(assets.filter(_.asset_id == 1), 4, 4).collect()
    assert(resized.length == 1)
    val out = resized.head.getAs[Array[Byte]]("payload")
    assert(out.length > 0 && out.length < 29) // decimated below original
    assert(resized.head.getAs[Int]("out_w") == 4)
  }

  test("IVF trained codebook: probe ranks first; multi-probe search recalls ≥0.8") {
    // sf0.01: the corpus the driver's correctness gate verifies against
    val r = Similarity.annIvf(spark, sf001).collect()
    assert(r.nonEmpty && r.head.getLong(1) == 0L && r.head.getDouble(3) == 1.0)
    assert(r.map(_.getLong(2)).distinct.length <= 2) // nprobe=2 cells searched
    // the trained-codebook ANN must recover ≥80% of the exact top-10
    val exact = Similarity.cosineTopK(spark, sf001).collect().map(_.getLong(1)).toSet
    val ivf = r.map(_.getLong(1)).toSet
    assert((exact & ivf).size >= 8, s"IVF recall ${(exact & ivf).size}/10")
  }

  test("embedding quantization: hand-computed codes, constant-vector guard") {
    val dir = java.nio.file.Files.createTempDirectory("quant").toString
    Seq(
      (1L, Array(0.0f, 1.0f, 0.5f), "x"),
      (2L, Array(3.0f, 3.0f, 3.0f), "x")) // constant: scale 0 -> all-zero codes
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = Similarity.embedQuantize(spark, dir).collect()
      .map(x => x.getLong(0) -> x).toMap
    val v1 = r(1L)
    assert(v1.getDouble(1) == 0.0 && v1.getDouble(2) == 1.0)
    // codes: 0, 255, floor(0.5*255 + 0.5) = 128 -> checksum 383
    assert(v1.getLong(4) == 383L)
    val v2 = r(2L)
    assert(v2.getDouble(3) == 0.0 && v2.getLong(4) == 0L)
  }

  test("IVF without a probe vector degrades to an empty result, not a crash") {
    val dir = java.nio.file.Files.createTempDirectory("noprobe").toString
    val rnd = new scala.util.Random(7)
    (1L to 5L).map(i => (i, Array.fill(64)(rnd.nextFloat()), "x"))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = Similarity.annIvf(spark, dir)
    assert(r.count() == 0)
    assert(r.columns.toSeq == Seq("rnk", "vec_id", "cell", "cos_sim"))
  }

  test("IVF k-means training moves centroids off their init vectors") {
    graft.functions.VectorExpressions.register(spark)
    import graft.functions.VectorExpressions.dot_product
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("norm", sqrt(dot_product(col("v"), col("v"))))
    val trained = Similarity.trainIvfCodebook(e).toMap
    val init = e.filter(col("vec_id").between(1, 4))
      .select(col("vec_id").cast("int"), col("v")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    // after 3 Lloyd rounds every centroid is a cell mean, not a data point
    assert(trained.keySet == Set(1, 2, 3, 4))
    assert(trained.forall { case (cid, cv) => cv != init(cid) })
    // the session memo returns the identical codebook without retraining —
    // the q41/q67/q75 amortization is value-transparent
    val m1 = Similarity.cachedCodebook(spark, sf0001, e)
    val m2 = Similarity.cachedCodebook(spark, sf0001,
      e.limit(0) /* ignored on a cache hit — training must not rerun */ )
    assert(m1.toMap == trained && (m2 eq m1))
  }

  test("near-dup banded LSH: planted near-identical pairs are all recalled") {
    graft.functions.VectorExpressions.register(spark)
    import graft.functions.VectorExpressions.dot_product
    val rnd = new scala.util.Random(42)
    val base = (0 until 40).map(i => (i.toLong, Array.fill(64)(rnd.nextGaussian())))
    // plant 10 near-dups: vec 100+i = vec i + tiny noise (cos ≈ 0.999)
    val dups = (0 until 10).map { i =>
      (100L + i, base(i)._2.map(_ + 0.05 * rnd.nextGaussian()))
    }
    val e = (base ++ dups).map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "v")
      .withColumn("norm", sqrt(dot_product(col("v"), col("v"))))
    // blocking really prunes: candidates well under the 1225 all-pairs
    val nCand = Similarity.bandedCandidates(e).count()
    assert(nCand < 400, s"banding did not prune: $nCand candidate pairs")
    val top = Similarity.nearDupPairsOn(e, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 10).map(i => (i.toLong, 100L + i)).toSet
    assert(top == planted, s"missed planted pairs: ${planted -- top}")
  }

  test("ann recall report: both methods scored, hits bounded by k, exact ratio") {
    val r = Similarity.annRecall(spark, sf001).collect()
    assert(r.map(_.getString(0)).toSeq == Seq("ivf", "lsh"))
    r.foreach { x =>
      assert(x.getLong(1) == 10L)
      assert(x.getLong(2) >= 0L && x.getLong(2) <= 10L)
      assert(x.getDouble(3) == x.getLong(2) / 10.0)
    }
    // both paths always recall the probe itself (vec_id=0, cos 1.0)
    assert(r.forall(_.getLong(2) >= 1L))
  }

  test("semantic clusters: planted duplicate groups collapse, one keeper each") {
    graft.functions.VectorExpressions.register(spark)
    import graft.functions.VectorExpressions.dot_product
    val rnd = new scala.util.Random(7)
    val base = (0 until 30).map(i => (i.toLong, Array.fill(64)(rnd.nextGaussian())))
    // plant two duplicate GROUPS: {0, 100, 200} and {1, 101} (cos ≈ 0.999)
    val dups = Seq(100L -> 0, 200L -> 0, 101L -> 1).map { case (id, src) =>
      (id, base(src)._2.map(_ + 0.02 * rnd.nextGaussian()))
    }
    val e = (base ++ dups).map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "v")
      .withColumn("norm", sqrt(dot_product(col("v"), col("v"))))
    val r = Similarity.semanticClustersOn(e, minCos = 0.9).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(0L) == ((0L, 3L, 1L)) && r(100L) == ((0L, 3L, 0L)) && r(200L) == ((0L, 3L, 0L)))
    assert(r(1L) == ((1L, 2L, 1L)) && r(101L) == ((1L, 2L, 0L)))
    // everything unplanted is its own singleton keeper
    assert(r.filterKeys(k => k >= 2 && k < 30).values.forall(v => v._2 == 1L && v._3 == 1L))
  }

  test("knn graph: planted clones are mutual top neighbors, ranks dense per src") {
    val dir = java.nio.file.Files.createTempDirectory("knn").toString
    val rnd = new scala.util.Random(11)
    val base = Array.fill(64)(rnd.nextGaussian().toFloat)
    val clones = Seq(1L, 2L, 3L).map(id => (id, base.toSeq, "x"))
    val others = (10L until 20L).map(i =>
      (i, Array.fill(64)(rnd.nextGaussian().toFloat).toSeq, "x"))
    (clones ++ others).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = Similarity.knnGraph(spark, dir).collect()
    val bySrc = r.groupBy(_.getLong(0))
    // identical vectors share every band: each clone's top-2 are the other
    // two clones at cos 1.0, ties broken by dst id
    assert(bySrc(1L).take(2).map(x => (x.getLong(2), x.getDouble(3))).toSeq ==
      Seq((2L, 1.0), (3L, 1.0)))
    assert(bySrc(2L).take(2).map(x => (x.getLong(2), x.getDouble(3))).toSeq ==
      Seq((1L, 1.0), (3L, 1.0)))
    bySrc.values.foreach { rows =>
      // ranks are dense from 1 and cos_sim is non-increasing in rank
      assert(rows.map(_.getLong(1)).toSeq == (1L to rows.length).toSeq)
      val sims = rows.map(_.getDouble(3)).toSeq
      assert(sims == sims.sorted.reverse)
      assert(rows.length <= 3)
      // no self-edges, no duplicate neighbors
      assert(!rows.exists(x => x.getLong(2) == x.getLong(0)))
      assert(rows.map(_.getLong(2)).distinct.length == rows.length)
    }
  }

  test("mmr selection: diversity beats a redundant clone of the top hit") {
    val dir = java.nio.file.Files.createTempDirectory("mmr").toString
    def vec(u: Float, w: Float): Seq[Float] = {
      val a = Array.fill(64)(0.0f); a(0) = u; a(1) = w; a.toSeq
    }
    // probe = e0; v1 at cos 0.9 to probe, v2 an exact clone of v1, v3 at
    // cos 0.8 but azimuthally opposite (cos(v1,v3) ≈ 0.46); low-rel fillers.
    // Greedy MMR must pick v1, then v3 (0.7·0.8 − 0.3·0.46 ≈ 0.42 beats the
    // clone's 0.7·0.9 − 0.3·1.0 = 0.33), and only then the clone.
    val rows = Seq(
      (0L, vec(1.0f, 0.0f), "x"),
      (1L, vec(0.9f, 0.43589f), "x"),
      (2L, vec(0.9f, 0.43589f), "x"),
      (3L, vec(0.8f, -0.6f), "x")) ++
      (10L to 13L).map(i => (i, vec(0.2f, 0.9798f), "x"))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = Similarity.mmrSelect(spark, dir).collect()
    assert(r.length == 5)
    assert(r.map(_.getLong(0)).toSeq == (1L to 5L).toSeq)
    assert(r.take(3).map(_.getLong(1)).toSeq == Seq(1L, 3L, 2L))
    // rank 1 carries no diversity penalty; the clone's penalty is sim 1.0
    assert(r(0).getDouble(3) == 0.0)
    assert(r(2).getDouble(3) == 1.0)
    // every score is λ·rel − (1−λ)·max_sim over the row's own columns
    r.foreach { x =>
      assert(x.getDouble(4) == 0.7 * x.getDouble(2) - (1.0 - 0.7) * x.getDouble(3))
    }
    // no duplicate selections
    assert(r.map(_.getLong(1)).distinct.length == 5)
  }

  test("prefiltered jaccard agrees with the exact form on surviving pairs and prunes") {
    val dir = sf0001
    val pre = Dedup.jaccardPrefiltered(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val exact = Dedup.ngramJaccard(spark, dir).collect()
      .map(r => (r.getLong(2), r.getLong(3)) -> r.getDouble(4)).toMap
    assert(pre.nonEmpty, "prefilter left no candidate pairs to verify")
    // every surviving pair's exact jaccard matches the full enumeration
    // (pairs crossing (lang, source) blocks are out of q31's scope)
    pre.foreach { case (k, j) =>
      exact.get(k).foreach(je => assert(je == j, s"pair $k: $j != $je"))
    }
    assert(pre.size < exact.size, "prefilter must prune the pair set")
  }

  test("MinHashHex expression == exploded min-aggregation formulation") {
    val dir = sf0001
    val viaExpr = Dedup.minhashSignatures(spark, dir).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(i => r.getString(i)).toSeq).toMap
    // the round-1 formulation it replaced: flat explode + min(md5) aggregate
    val aggs = (0 until 8).map { s =>
      min(md5(concat(lit(s"$s:"), col("gram")))).as(s"mh$s")
    }
    val sigs = Dedup.explodedGrams(spark, dir).groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    val viaExplode = spark.read.parquet(s"$dir/documents.parquet").select("doc_id")
      .join(sigs, Seq("doc_id"), "left").collect()
      .map(r => r.getLong(0) -> (1 to 8).map(i => r.getString(i)).toSeq).toMap
    assert(viaExpr == viaExplode)
  }

  test("graft_minhash contract: nulls for short docs, SQL route, arity check") {
    graft.functions.TextExpressions.register(spark)
    val r = spark.sql(
      "SELECT graft_minhash(array('a','b')) AS short, graft_minhash(array('a','b','c')) AS ok")
      .head()
    assert(r.isNullAt(0)) // under 3 tokens -> no shingle -> null signature
    val sig = r.getSeq[String](1)
    assert(sig.length == 8 && sig.forall(_.length == 32))
    intercept[IllegalArgumentException] {
      graft.functions.TextExpressions.minhashBuilder(Seq.empty)
    }
  }

  test("containment: a doc embedded in a longer one is flagged one-way") {
    val short = (1 to 10).map(i => s"w$i").mkString(" ")
    val long = short + " " + (11 to 20).map(i => s"w$i").mkString(" ")
    val other = (1 to 12).map(i => s"z$i").mkString(" ")
    val dir = docsDir(Seq(
      (1L, short, "en", "s", short.length.toLong),
      (2L, long, "en", "s", long.length.toLong),
      (3L, other, "en", "s", other.length.toLong)))
    val r = Dedup.containment(spark, dir).collect()
    // doc 1's six 5-grams all occur in doc 2 (df=2 → rare → candidates);
    // the reverse direction fails the ≥½ cut (6 of 16), doc 3 pairs nothing
    assert(r.length == 1)
    assert(r.head.getLong(0) == 1L && r.head.getLong(1) == 2L)
    assert(r.head.getLong(2) == 6L && r.head.getLong(3) == 6L)
    assert(r.head.getDouble(4) == 1.0)
  }

  test("duplicated spans: cross-doc copy and within-doc repeat, exact geometry") {
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val doc1 = "p1 p2 p3 " + shared + " q1 q2 q3"          // S at tokens 3..10
    val doc2 = "r1 r2 " + shared + " t1 t2 t3 t4"          // S at tokens 2..9
    val doc3 = "u1 u2 u3 u4 u5 x1 u1 u2 u3 u4 u5"          // within-doc repeat
    val dir = docsDir(Seq(
      (1L, doc1, "en", "s", doc1.length.toLong),
      (2L, doc2, "en", "s", doc2.length.toLong),
      (3L, doc3, "en", "s", doc3.length.toLong)))
    val r = Dedup.duplicatedSpans(spark, dir).collect()
      .map(x => x.getLong(0) -> x).toMap
    // doc 1: the 8-token shared block yields 4 consecutive duplicated
    // 5-gram positions (3..6) = one span of 8 tokens covering tokens 3..10
    assert(r(1L).getLong(1) == 14L && r(1L).getLong(2) == 4L)
    assert(r(1L).getLong(3) == 1L && r(1L).getLong(4) == 8L)
    assert(r(1L).getLong(5) == 8L)
    assert(math.abs(r(1L).getDouble(6) - 8.0 / 14.0) < 1e-12)
    // doc 3: "u1..u5" occurs at positions 0 and 6 — two 1-gram-long spans,
    // coverage 10 of 11 tokens (x1 at position 5 is the only clean token)
    assert(r(3L).getLong(2) == 2L && r(3L).getLong(3) == 2L)
    assert(r(3L).getLong(4) == 5L && r(3L).getLong(5) == 10L)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("span rewrite: canonical copy survives verbatim, non-canonical copy loses its interior") {
    val run = (1 to 12).map(i => s"s$i").mkString(" ") // 12-token duplicated run
    val doc1 = "u1 u2 " + run + " u3 u4"
    val dir = docsDir(Seq(
      (1L, run, "en", "s", run.length.toLong),
      (2L, doc1, "en", "s", doc1.length.toLong)))
    val r = Dedup.spanRewrite(spark, dir).collect()
      .map(x => x.getLong(0) -> x).toMap
    // doc 1 holds every shared gram's canonical occurrence → untouched
    assert(r(1L).getLong(1) == 12L && r(1L).getLong(2) == 0L)
    assert(r(1L).getString(3) == md5hex(run))
    // doc 2: dup gram starts 2..9; cut = positions with NO canonical/unique
    // cover = [2+4, 9] = tokens s5..s8 (4 removed); n-gram margins survive
    val expected2 = "u1 u2 " + (1 to 4).map(i => s"s$i").mkString(" ") + " " +
      (9 to 12).map(i => s"s$i").mkString(" ") + " u3 u4"
    assert(r(2L).getLong(1) == 16L && r(2L).getLong(2) == 4L)
    assert(r(2L).getString(3) == md5hex(expected2))
  }

  test("span rewrite: within-doc repetition collapses to its first copy's margin; short docs untouched") {
    val rep = Seq.fill(10)("t").mkString(" ") // "t" x10: gram starts 0..5, only 0 canonical
    val short = "a b c"                       // < n tokens: no grams, no cuts
    val dir = docsDir(Seq(
      (1L, rep, "en", "s", rep.length.toLong),
      (2L, short, "en", "s", short.length.toLong)))
    val r = Dedup.spanRewrite(spark, dir).collect()
      .map(x => x.getLong(0) -> x).toMap
    // cut p: covering starts all non-canonical → p in [5, 9]; 5 tokens kept
    assert(r(1L).getLong(1) == 10L && r(1L).getLong(2) == 5L)
    assert(r(1L).getString(3) == md5hex(Seq.fill(5)("t").mkString(" ")))
    assert(r(2L).getLong(2) == 0L && r(2L).getString(3) == md5hex(short))
  }

  test("dedup recall: planted near-dup is truth AND banded hit; disjoint docs are neither") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 29).map(i => s"w$i").mkString(" ") + " zz" // Jaccard ≈ 27/31
    val other = (1 to 30).map(i => s"z$i").mkString(" ")
    val dir = docsDir(Seq(
      (1L, base, "en", "s", base.length.toLong),
      (2L, nearDup, "en", "s", nearDup.length.toLong),
      (3L, other, "en", "s", other.length.toLong)))
    val r = Dedup.dedupPairRecall(spark, dir).head()
    assert(r.getDouble(0) == 0.5)
    // exactly one true pair (1,2); the shared-prefix signature bands must
    // surface it → recall 1.0 on this fixture
    assert(r.getLong(1) == 1L, s"n_true = ${r.getLong(1)}")
    assert(r.getLong(3) == 1L && r.getDouble(4) == 1.0)
    assert(r.getLong(2) >= r.getLong(3), "hits are a subset of candidates")
  }

  test("IVF-PQ: full probe + full shortlist equals brute force; pruned probe stays exact per row") {
    import graft.vector.CellIndex
    val dir = sf0001
    val idx = java.nio.file.Files.createTempDirectory("ivfpq").toString
    CellIndex.write(spark, dir, idx, k = 4, iters = 1)
    val probe = Similarity.probeVector(spark, dir)
    // ground truth: exact L2 over the whole corpus, driver-side
    val all = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
    def d2(v: Seq[Double]): Double =
      v.zip(probe).map { case (x, y) => (x - y) * (x - y) }.sum
    val exact = all.map { case (id, v) => (id, d2(v)) }
      .sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSeq
    // nprobe = every cell, shortlist >= corpus: the composition must
    // reproduce brute force exactly (ADC only ORDERS the shortlist cut,
    // and here nothing is cut)
    val full = CellIndex.ivfPqSearch(spark, idx, probe,
      k = 5, nprobe = 4, shortlist = all.length)
    assert(full.collect().map(_.getLong(0)).toSeq == exact,
      "full-probe IVF-PQ must equal exact top-k")
    // pruned serving shape: every returned row's exact distance is right
    // (the rerank is honest), and distances ascend
    val pruned = CellIndex.ivfPqSearch(spark, idx, probe,
      k = 5, nprobe = 2, shortlist = 20).collect()
    assert(pruned.length == 5)
    val ds = pruned.map(_.getDouble(2)).toSeq
    assert(ds == ds.sorted)
    val byId = all.toMap
    pruned.foreach { r =>
      val expected = math.floor(d2(byId(r.getLong(0))) * 1e6 + 0.5) / 1e6
      assert(r.getDouble(2) == expected, s"rerank distance drifted for ${r.getLong(0)}")
    }
  }

  test("token entropy: repeated-token doc scores 0, all-distinct scores ln(n)") {
    val dir = docsDir(Seq(
      (1L, "a a a a", "en", "s", 7L),
      (2L, "a b c d", "en", "s", 7L)))
    val r = TextOps.tokenEntropy(spark, dir).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(1L) == ((4L, 1L, 0.0)))
    val ln4 = math.floor(math.log(4) * 1000000.0 + 0.5) / 1000000.0
    assert(r(2L) == ((4L, 4L, ln4)))
  }

  test("cluster balance: populations partition the corpus, weights invert shares") {
    val r = Similarity.clusterBalance(spark, sf0001).collect()
    assert(r.nonEmpty && r.length <= 4)
    val tot = r.head.getLong(2)
    assert(r.forall(_.getLong(2) == tot))
    assert(r.map(_.getLong(1)).sum == tot)
    r.foreach { x =>
      val n = x.getLong(1)
      assert(math.abs(x.getDouble(3) - n.toDouble / tot) < 1e-12)
      assert(math.abs(x.getDouble(4) - tot.toDouble / (4 * n)) < 1e-12)
      assert(x.getLong(5) == (tot + 4 * n - 1) / (4 * n)) // exact int ceiling
    }
  }

  test("principal direction: recovers a planted dominant axis, flags the outlier") {
    val dir = java.nio.file.Files.createTempDirectory("pdir").toString
    val rnd = new scala.util.Random(5)
    // spread a1..a20 along axis 0 (plus tiny noise), one far outlier at 100
    def vec(a: Float): Seq[Float] = {
      val v = Array.fill(64)((0.01 * rnd.nextGaussian()).toFloat); v(0) = a; v.toSeq
    }
    val rows = (1 to 20).map(i => (i.toLong, vec(i.toFloat), "x")) :+
      ((99L, vec(100.0f), "x"))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = Similarity.principalDirection(spark, dir).collect()
    assert(r.length == 21)
    val byId = r.map(x => x.getLong(0) -> ((x.getDouble(1), x.getLong(2)))).toMap
    // only the planted outlier exceeds the 2·√λ cut
    assert(byId(99L)._2 == 1L, s"outlier not flagged: ${byId(99L)}")
    assert((1 to 20).forall(i => byId(i.toLong)._2 == 0L))
    // projections along the recovered axis are monotone in the planted a_i
    // (up to the global sign ambiguity of power iteration)
    val projs = (1 to 20).map(i => byId(i.toLong)._1)
    assert(projs == projs.sorted || projs == projs.sorted.reverse,
      s"projections not monotone in the planted axis: $projs")
    // mean-centering: projections sum to ~0 over the corpus
    val total = r.map(_.getDouble(1)).sum
    assert(math.abs(total) < 1e-3, s"centered projections must sum to ~0: $total")
  }

  test("centroid drift: identical snapshots drift 0/cos 1, orthogonal drift √2, single-parity nulls") {
    // parity split: even vec_id = base snapshot, odd = current
    val rows = Seq(
      // label 1: both snapshots centered on e0 → no drift
      (0L, 1, Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, 1, Seq(1.0, 0.0, 0.0, 0.0)),
      // label 2: base on e0, current on e1 → l2 √2, cos 0
      (2L, 2, Seq(1.0, 0.0, 0.0, 0.0)),
      (3L, 2, Seq(0.0, 1.0, 0.0, 0.0)),
      // label 3: base snapshot only → drift undefined
      (4L, 3, Seq(1.0, 1.0, 0.0, 0.0)))
    val e = rows.toDF("vec_id", "label", "v")
    val r = Similarity.centroidDriftOn(e).collect()
    assert(r.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    val byLabel = r.map(x => x.getInt(0) -> x).toMap
    assert(byLabel(1).getDouble(3) == 0.0 && byLabel(1).getDouble(4) == 1.0)
    assert(math.abs(byLabel(2).getDouble(3) - math.sqrt(2.0)) < 1e-5)
    assert(byLabel(2).getDouble(4) == 0.0)
    assert((byLabel(3).getLong(1), byLabel(3).getLong(2)) == ((1L, 0L)))
    assert(byLabel(3).isNullAt(3) && byLabel(3).isNullAt(4))
  }

  test("centroid drift: zero-norm centroid leaves cosine null, not 0/0") {
    val rows = Seq(
      (0L, 1, Seq(0.0, 0.0)), // base snapshot: the zero vector
      (1L, 1, Seq(1.0, 0.0)))
    val r = Similarity.centroidDriftOn(rows.toDF("vec_id", "label", "v")).collect()
    assert(r.length == 1)
    assert(r.head.getDouble(3) == 1.0, s"l2 drift ${r.head}") // |0 − e0| = 1
    assert(r.head.isNullAt(4), s"cosine must be NULL on a zero-norm centroid: ${r.head}")
  }

  test("split leakage: clone pairs land in the md5-coin grid cells") {
    import org.apache.commons.codec.digest.DigestUtils
    // three clone PAIRS at hand-picked ids; each pair is a near-dup edge
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "an entirely different sentence with its own tokens here",
      "yet another unrelated document body for the third pair")
    val ids = Seq(1L -> 2L, 3L -> 4L, 5L -> 6L)
    val rows = ids.zip(texts).flatMap { case ((a, b), t) =>
      Seq((a, t, "en", "s", t.length.toLong), (b, t, "en", "s", t.length.toLong))
    }
    val dir = docsDir(rows)
    def split(id: Long): String = {
      val coin = java.lang.Long.parseLong(
        DigestUtils.md5Hex(s"split:$id").substring(0, 6), 16) % 10
      if (coin < 8) "train" else if (coin == 8) "val" else "test"
    }
    val expected = ids.map { case (a, b) =>
      val (x, y) = (split(a), split(b))
      (if (x <= y) x else y, if (x <= y) y else x)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val r = Dedup.splitLeakage(spark, dir).collect()
    val got = r.map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    assert(got == expected, s"grid $got != expected $expected")
    r.foreach(x => assert(x.getLong(3) ==
      (if (x.getString(0) != x.getString(1)) 1L else 0L)))
  }

  test("cluster-safe split: clones collapse onto the rep's split, moved flags the repair") {
    import org.apache.commons.codec.digest.DigestUtils
    def split(id: Long): String = {
      val coin = java.lang.Long.parseLong(
        DigestUtils.md5Hex(s"split:$id").substring(0, 6), 16) % 10
      if (coin < 8) "train" else if (coin == 8) "val" else "test"
    }
    // find a clone pair whose SOLO splits disagree — the case the operator fixes
    val a = 1L
    val b = (2L to 60L).find(split(_) != split(a)).get
    val solo = (2L to 60L).find(i => i != b && split(i) == split(a)).get
    val clone = "the quick brown fox jumps over the lazy dog"
    val other = "an entirely different sentence with its own tokens here"
    val dir = docsDir(Seq(
      (a, clone, "en", "s", clone.length.toLong),
      (b, clone, "en", "s", clone.length.toLong),
      (solo, other, "en", "s", other.length.toLong)))
    val r = Dedup.clusterSafeSplit(spark, dir).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getString(2), x.getString(3), x.getLong(4))))
      .toMap
    // both clones take the representative's (= min doc_id's) split
    assert(r(a) == ((a, split(a), split(a), 0L)))
    assert(r(b) == ((a, split(a), split(b), 1L)), s"clone must move: ${r(b)}")
    // the singleton keeps its own coin
    assert(r(solo) == ((solo, split(solo), split(solo), 0L)))
  }

  test("oov rate: truncated vocab counts out-of-vocab occurrences per doc") {
    val dir = docsDir(Seq(
      (1L, "a a b", "en", "s", 5L),
      (2L, "c d", "en", "s", 3L)))
    // K=2 vocab by (cf desc, tok): {a(2), b(1)} — ties broken by token
    val r = TextOps.oovRate(spark, dir, vocabSize = 2).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(1L) == ((3L, 0L, 0.0)))
    assert(r(2L) == ((2L, 2L, 1.0)))
  }

  test("dim stats: per-dimension moments and extremes are exact") {
    val dir = java.nio.file.Files.createTempDirectory("dstats").toString
    Seq((1L, Seq(0.0f, 1.0f), 0), (2L, Seq(0.0f, 3.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = Similarity.dimStats(spark, dir).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2), x.getDouble(3),
        x.getDouble(4), x.getDouble(5)))).toMap
    assert(r(0L) == ((2L, 0.0, 0.0, 0.0, 0.0)))
    assert(r(1L) == ((2L, 2.0, 1.0, 1.0, 3.0)))
  }

  test("zipf fit: hand-computed spectrum regression matches") {
    // cf: a=4 b=2 c=1 d=1 → spectrum (1,2) (2,1) (4,1) → 3 bins
    val dir = docsDir(Seq((1L, "a a a a b b c d", "en", "s", 15L)))
    val r = TextOps.zipfFit(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((8L, 4L, 3L)))
    // least squares over {(0, ln2), (ln2, 0), (ln4, 0)}: slope −0.5
    assert(math.abs(row.getDouble(3) - (-0.5)) < 1e-3, s"slope ${row.getDouble(3)}")
    assert(math.abs(row.getDouble(4) - 0.57765) < 1e-3, s"intercept ${row.getDouble(4)}")
  }

  test("vocab growth: first-occurrence deciles accumulate") {
    val dir = docsDir(Seq(
      (0L, "a b", "en", "s", 3L),
      (5L, "a c", "en", "s", 3L),
      (9L, "d", "en", "s", 1L)))
    val r = TextOps.vocabGrowth(spark, dir).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    assert(r == Seq((0L, 2L, 2L), (5L, 1L, 3L), (9L, 1L, 4L)))
  }

  test("mix resample: repeat counts follow the exact rational weights") {
    import org.apache.commons.codec.digest.DigestUtils
    // source a: 4 docs (w = 5/8 → 0 or 1 copy); source b: 1 doc (w = 5/2 → 2 or 3)
    val rows = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"), (5L, "b"))
    val dir = docsDir(rows.map { case (id, s) => (id, s"text $id", "en", s, 7L) })
    def h(id: Long): Long = java.lang.Long.parseLong(
      DigestUtils.md5Hex(s"mix:$id").substring(0, 6), 16)
    def expected(id: Long, den: Long): Long =
      5L / den + (if (BigInt(h(id)) * den < BigInt(5 % den) * 16777216L) 1L else 0L)
    val r = graft.text.Curation.mixResample(spark, dir).collect()
      .map(x => x.getLong(0) -> x.getLong(3)).toMap
    rows.foreach { case (id, s) =>
      val den = if (s == "a") 8L else 2L
      assert(r(id) == expected(id, den), s"doc $id: ${r(id)} != ${expected(id, den)}")
    }
    // upweighted source always gets at least its floor
    assert(r(5L) >= 2L)
  }

  test("normalized dedup catches case/punct/space variants raw md5 misses") {
    val dir = docsDir(Seq(
      (1L, "Hello, World!", "en", "s", 13L),
      (2L, "hello world", "en", "s", 11L),
      (3L, "hello  world ", "en", "s", 13L),
      (4L, "different", "en", "s", 9L)))
    val r = Dedup.normalizedDedup(spark, dir).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(1L) == ((1L, 0L, 0L)))
    assert(r(2L) == ((1L, 1L, 0L))) // norm-dup of 1, but not a raw dup
    assert(r(3L) == ((1L, 1L, 0L)))
    assert(r(4L) == ((4L, 0L, 0L)))
  }

  test("whitening: z-codes standardize dims, dead dims code to zero") {
    val dir = java.nio.file.Files.createTempDirectory("wh").toString
    // dim0 is constant at 1.49e-6: fixed-point rounding drives its raw
    // variance to ≈ −1e-12 — the clamp must yield a clean σ=0 dead dim
    // (pre-clamp this was NaN in Spark and a hard error in DuckDB)
    Seq((1L, Seq(1.49e-6f, 1.0f), 0), (2L, Seq(1.49e-6f, 3.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // dim0: σ=0 → code 0; dim1: μ=2 σ=1 → z = ∓1 → codes ∓10⁶
    val r = Similarity.whiten(spark, dir).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) == -1000000L && r(2L) == 1000000L, s"checksums $r")
    val st = Similarity.dimStats(spark, dir).collect()
      .map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(st(0L) == 0.0, s"clamped dead dim must report σ=0: $st")
  }

  test("length trim: per-lang percentile fences flag both tails") {
    val dir = docsDir(Seq(
      (1L, "t", "en", "s", 10L),
      (2L, "t", "en", "s", 20L),
      (3L, "t", "en", "s", 30L),
      (4L, "t", "en", "s", 40L),
      (5L, "t", "en", "s", 1000L)))
    // p99 = 40 + 0.96·960 = 961.6, p01 = 10 + 0.04·10 = 10.4
    val r = graft.text.Curation.lengthTrim(spark, dir).collect()
      .map(x => x.getLong(0) -> ((x.getDouble(3), x.getLong(4), x.getLong(5)))).toMap
    assert(r(5L) == ((961.6, 1L, 0L)), s"upper-tail doc: ${r(5L)}")
    assert(r(1L) == ((961.6, 0L, 1L)), s"lower-tail doc: ${r(1L)}")
    assert(r(3L) == ((961.6, 0L, 0L)))
  }

  test("lang consistency: mislabeled feed shows up as its source's mismatch rate") {
    val dir = docsDir(Seq(
      (1L, "key value key value", "en", "good", 19L),  // profiler agrees
      (2L, "key value key value", "fr", "mislabeled", 19L), // says en, tagged fr
      (3L, "join query join", "fr", "mislabeled", 15L))) // profiler agrees
    val r = TextOps.langConsistency(spark, dir).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getLong(3), x.getDouble(4)))).toMap
    assert(r(("good", "en")) == ((1L, 0L, 0.0)))
    assert(r(("mislabeled", "fr")) == ((2L, 1L, 0.5)))
  }

  test("unigram logprob: hand-computed fixed-point means match") {
    val dir = docsDir(Seq(
      (1L, "a a", "en", "s", 3L),
      (2L, "a b", "en", "s", 3L)))
    // corpus: a×3, b×1, N=4
    def fix(x: Double): Long = math.floor(x * 1000000.0 + 0.5).toLong
    def pr6(x: Double): Double = math.floor(x * 1000000.0 + 0.5) / 1000000.0
    val s1 = fix(2 * math.log(3.0 / 4))              // doc1: c(a)=2
    val s2 = fix(1 * math.log(3.0 / 4)) + fix(1 * math.log(1.0 / 4))
    val r = TextOps.unigramLogprob(spark, dir).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    assert(r(1L) == ((2L, pr6(s1.toDouble / (2 * 1000000.0)))))
    assert(r(2L) == ((2L, pr6(s2.toDouble / (2 * 1000000.0)))))
    // boilerplate-vocabulary doc scores closer to zero than the rarer one
    assert(r(1L)._2 > r(2L)._2)
  }

  test("wordNgrams (array form) and explodedGrams (flat form) agree") {
    import org.apache.spark.sql.functions._
    val dir = docsDir(Seq(
      (1L, "a b c d e", "en", "s", 9L),
      (2L, "x y", "en", "s", 3L),        // too short: no trigrams
      (3L, "p q r", "en", "s", 5L)))
    val viaArray = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), explode(TextOps.wordNgrams(TextOps.tokens(col("text")))).as("gram"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val viaFlat = graft.text.Dedup.explodedGrams(spark, dir)
      .select("doc_id", "gram")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaArray == viaFlat)
    assert(viaArray == Set((1L, "a b c"), (1L, "b c d"), (1L, "c d e"), (3L, "p q r")))
  }

  test("bpe pairs: corpus-weighted adjacent-char counts; 1-char words contribute nothing") {
    val dir = docsDir(Seq(
      (1L, "ab ab ba a", "en", "s", 10L),
      (2L, "abc", "en", "s", 3L)))
    // words: ab×2, ba×1, a×1, abc×1 → pairs: ab = 2 (word ab) + 1 (abc),
    // ba = 1, bc = 1; "a" has no pairs; tie ba/bc breaks on pair asc
    val r = TextOps.bpePairs(spark, dir).collect()
      .map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(r == Seq(("ab", 3L), ("ba", 1L), ("bc", 1L)))
  }

  test("bpe trainer: merge ranks follow argmax pair counts on the classic corpus") {
    val dir = docsDir(Seq(
      (1L, "low lower lowest low low", "en", "s", 24L)))
    // words: low×3, lower×1, lowest×1. Round 1: (l,o)=5 ties (o,w)=5,
    // breaks to (l,o) → "lo". Round 2: (lo,w)=5 → "low". Round 3:
    // (low,e)=2 → "lowe". Greedy fold re-segments between rounds.
    val r = TextOps.bpeTrain(spark, dir, nMerges = 3).collect()
      .map(x => (x.getInt(0), x.getString(1), x.getString(2), x.getLong(3))).toSeq
    assert(r == Seq((1, "l", "o", 5L), (2, "lo", "w", 5L), (3, "low", "e", 2L)))
  }

  test("bpe trainer round 1 agrees with q117's pair counts; merges exhaust") {
    val dir = docsDir(Seq(
      (1L, "ab ab ba a", "en", "s", 10L),
      (2L, "abc", "en", "s", 3L)))
    val first = TextOps.bpeTrain(spark, dir, nMerges = 1).collect().head
    val top117 = TextOps.bpePairs(spark, dir).collect().head
    assert(first.getString(1) + first.getString(2) == top117.getString(0))
    assert(first.getLong(3) == top117.getLong(1))
    // every word fuses to a single symbol in ≤3 merges; the trainer then
    // stops early instead of fabricating a 4th merge
    val all = TextOps.bpeTrain(spark, dir, nMerges = 10).collect()
    assert(all.length <= 4 && all.map(_.getInt(0)).toSeq == (1 to all.length))
  }

  test("bpe segmentation: learned merges compress the classic corpus; zero merges = chars") {
    val dir = docsDir(Seq(
      (1L, "low lower lowest low low", "en", "s", 24L)))
    // 2 merges (lo, low): low=[low]×3, lower=[low,e,r], lowest=[low,e,s,t]
    val r = TextOps.bpeSegment(spark, dir, nMerges = 2).collect().head
    assert((r.getString(0), r.getLong(1), r.getLong(2)) == (("s", 5L, 10L)))
    assert(r.getDouble(3) == 2.0 && r.getDouble(4) == 2.0)
    // untrained tokenizer degenerates to character segmentation
    val r0 = TextOps.bpeSegment(spark, dir, nMerges = 0).collect().head
    assert(r0.getLong(2) == 20L && r0.getDouble(4) == 1.0)
  }

  test("source overlap: near-dup edges aggregate to an unordered source matrix") {
    val t = "the quick brown fox jumps over the lazy dog"
    val dir = docsDir(Seq(
      (1L, t, "en", "s1", 43L),
      (2L, t, "en", "s2", 43L),
      (3L, t, "en", "s1", 43L),
      (4L, "completely different words appear in this document here", "en", "s3", 55L)))
    // edges (1,2),(1,3),(2,3): (s1,s1) ← (1,3) [docs 1,3];
    // (s1,s2) ← (1,2),(2,3) [docs 1,2,3]; s3 pairs with nothing
    val r = Dedup.sourceOverlap(spark, dir).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getLong(3))).toSeq
    assert(r == Seq(("s1", "s1", 1L, 2L), ("s1", "s2", 2L, 3L)))
  }

  test("vocab coverage: integer thresholds pick exact k per lang") {
    val dir = docsDir(Seq(
      (1L, "a a a a a a a a a b", "en", "s", 19L),
      (2L, "x y z w", "de", "s", 7L)))
    // en: a=9 b=1, tot=10 → cum(a)·100=900 ≥ 900 ⇒ k90=1; 900 < 950 ⇒
    // k95=2; k99=2. de: uniform 4 → k90=4 (cum 3·100=300 < 360), k95=4,
    // k99=4
    val r = TextOps.vocabCoverage(spark, dir).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r("en") == ((1L, 2L, 2L, 2L)))
    assert(r("de") == ((4L, 4L, 4L, 4L)))
  }

  test("cluster purity: cross-lang cross-source cluster shows in the histogram") {
    val t = "the quick brown fox jumps over the lazy dog"
    val dir = docsDir(Seq(
      (1L, t, "en", "s1", 43L),
      (2L, t, "en", "s2", 43L),
      (3L, t, "de", "s1", 43L),
      (4L, "completely different words appear in this document here", "en", "s3", 55L)))
    // one cluster {1,2,3}: size 3, 2 langs, 2 sources; the singleton is
    // filtered out
    val r = Dedup.clusterPurity(spark, dir).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSeq
    assert(r == Seq((3L, 2L, 2L, 1L)))
  }

  test("embed outliers: exact integer distances, flag at 4x mean dist2") {
    val dir = java.nio.file.Files.createTempDirectory("outl").toString
    // 9 vectors at the origin + 1 at (1,0): centroid (0.1, 0);
    // dist2 = 0.01 for the cluster, 0.81 for the far point;
    // n_vec·d2 > 4·Σd2 ⇔ 10·0.81 > 4·0.9 — only the far point flags
    ((1L to 9L).map(i => (i, Array(0.0f, 0.0f), "x")) :+
      ((10L, Array(1.0f, 0.0f), "x")))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = Similarity.embedOutliers(spark, dir).collect()
      .map(x => x.getLong(0) -> ((x.getDouble(1), x.getLong(2)))).toMap
    assert(r(10L) == ((0.81, 1L)))
    (1L to 9L).foreach(i => assert(r(i) == ((0.01, 0L))))
  }

  test("q127 importance weights match a local DSIR recompute for every doc") {
    // split(" ", -1) mirrors Spark's split(c, " ") (limit -1: trailing
    // empties kept) and DuckDB's string_split
    def toksOf(t: String): Seq[String] = t.split(" ", -1).toSeq
    val rows = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "source", "text").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2)))
    val np = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val nt = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    rows.foreach { case (_, src, text) =>
      toksOf(text).foreach { w =>
        np(w) += 1
        if (src == "src0") nt(w) += 1
      }
    }
    val (npTot, v, ntTot) = (np.values.sum, np.size.toLong, nt.values.sum)
    val expect = rows.map { case (id, _, text) =>
      val toks = toksOf(text)
      val s6 = toks.groupBy(identity).map { case (w, ws) =>
        // the engine's exact op sequence — Spark's log() executes
        // StrictMath.log (not Math.log, whose HotSpot intrinsic is
        // licensed to differ by 1 ulp), so the recompute must too
        math.floor(ws.size.toLong *
          (StrictMath.log((nt(w) + 1).toDouble / (ntTot + v)) -
           StrictMath.log((np(w) + 1).toDouble / (npTot + v))) * 1e6 + 0.5).toLong
      }.sum
      id -> ((toks.size.toLong, math.floor(s6 / 1e6 * 1e6 + 0.5) / 1e6))
    }.toMap
    val got = TextOps.importanceWeights(spark, sf0001).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (id, out) =>
      assert(out == expect(id), s"doc $id: $out vs ${expect(id)}")
    }
    // the DSIR direction check: target-slice docs score above the rest on
    // average (their tokens are relatively overrepresented in the target LM)
    val bySrc = rows.map { case (id, src, _) => src -> got(id)._2 }
    val tgt = bySrc.collect { case ("src0", w) => w }
    val rest = bySrc.collect { case (s, w) if s != "src0" => w }
    assert(tgt.sum / tgt.length > rest.sum / rest.length,
      "target docs must carry higher importance on average")
  }

  test("q128 resample: deterministic Gumbel-top-k, biased toward high importance") {
    val w = TextOps.importanceWeights(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val sel = TextOps.importanceResample(spark, sf0001).collect()
    assert(sel.length == 100)
    val ids = sel.map(_.getLong(0))
    assert(ids.distinct.length == 100) // without replacement by construction
    // exact recompute of every selected score: 48-bit md5 coin → u ∈ (0,1)
    // exclusive → Gumbel. Spark's log() is StrictMath.log — platform-pinned
    // by spec, unlike Math.log's 1-ulp-licensed intrinsic — so recomputing
    // with StrictMath makes the equality exact on every JVM (the oracle's
    // libm-ln 1-ulp wiggle is separately absorbed by pround-6)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    sel.foreach { r =>
      val id = r.getLong(0)
      val x = java.lang.Long.parseLong(md5hex(s"gumbel:$id").take(12), 16)
      val u = (x + 1).toDouble / 281474976710657.0
      val score = w(id) - StrictMath.log(-StrictMath.log(u))
      assert(r.getDouble(1) == w(id), s"doc $id importance")
      assert(r.getDouble(2) == math.floor(score * 1e6 + 0.5) / 1e6,
        s"doc $id score")
    }
    // sampling ∝ exp(importance) tilts the selection upward vs the corpus
    val selMean = ids.map(w).sum / ids.length
    val allMean = w.values.sum / w.size
    assert(selMean > allMean, s"sample mean $selMean vs corpus $allMean")
  }

  test("product quantization: codes valid, ADC exact to the tables, useful recall") {
    val m = 8; val k = 16
    val subDim = Similarity.EmbeddingDim / m
    val cbs = Similarity.pqTrain(spark, sf0001, m, k)
    assert(cbs.length == m && cbs.forall(_.length == k) &&
      cbs.forall(_.forall(_.length == subDim)))
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    // encode: every vector, m codes, each in [0, k); codes really are the
    // L2-nearest sub-centroids (ties to lowest id)
    val codes = Similarity.pqEncode(spark, sf0001, cbs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.size == vecs.size)
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    codes.foreach { case (id, cs) =>
      assert(cs.length == m && cs.forall(c => c >= 0 && c < k), s"vec $id")
      (0 until m).foreach { s =>
        val sub = vecs(id).slice(s * subDim, (s + 1) * subDim).toSeq
        val dists = cbs(s).map(c => d2(sub, c))
        val best = dists.zipWithIndex.minBy { case (d, cid) => (d, cid) }._2
        assert(cs(s) == best, s"vec $id subspace $s: ${cs(s)} vs $best")
      }
    }
    // ADC search over the PRECOMPUTED index (the serving shape — the
    // corpus is encoded once, not per query); distances recompute
    // exactly from the codes + tables
    val index = Similarity.pqEncode(spark, sf0001, cbs)
    val got = Similarity.pqSearch(spark, sf0001, cbs, queryVecId = 0,
      codes = Some(index)).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.length == 10)
    val q = vecs(0L)
    got.foreach { case (id, ad) =>
      val expect = (0 until m).map { s =>
        d2(q.slice(s * subDim, (s + 1) * subDim).toSeq, cbs(s)(codes(id)(s)))
      }.sum
      assert(ad == math.floor(expect * 1e6 + 0.5) / 1e6, s"vec $id")
    }
    // on this distance-concentrated fixture raw ADC ordering is noise
    // (neighbor gaps below quantization error) — the production shape is
    // shortlist + exact rerank, which must recover the true neighborhood
    val exact = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (d2(q.toSeq, v.toSeq), id) }
      .sorted.take(10).map(_._2)
    val adcRecall = got.map(_._1).count(exact.toSet) / 10.0
    val reranked = Similarity.pqSearchRerank(spark, sf0001, cbs,
      queryVecId = 0, topK = 10, shortlist = 100, codes = Some(index))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(reranked.length == 10)
    // exact distances really are exact (and ascending)
    reranked.foreach { case (id, dd) =>
      assert(dd == math.floor(d2(q.toSeq, vecs(id).toSeq) * 1e6 + 0.5) / 1e6)
    }
    val rerankRecall = reranked.map(_._1).count(exact.toSet) / 10.0
    assert(rerankRecall >= 0.6, s"rerank recall@10 $rerankRecall (ADC alone: $adcRecall)")
    assert(rerankRecall > adcRecall, "rerank must beat raw ADC here")
    // missing probe degrades to an empty contract-schema result
    assert(Similarity.pqSearch(spark, sf0001, cbs, queryVecId = -1,
      codes = Some(index)).isEmpty)
    assert(Similarity.pqSearchRerank(spark, sf0001, cbs, queryVecId = -1,
      codes = Some(index)).isEmpty)
    // m must divide the dimension — a remainder would silently drop dims
    intercept[IllegalArgumentException] {
      Similarity.pqTrain(spark, sf0001, m = 3)
    }
  }

  test("RRF fusion equals a driver-side recomputation from its two arms") {
    val dir = sf0001
    val dense = Similarity.cosineTopK(spark, dir, k = 50).collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap           // vec_id -> rank
    val lex = graft.text.TextOps.bm25(spark, dir, nq = 5, topN = 50).collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap           // doc_id -> rank
    def contrib(rnk: Long): Long =
      if (rnk > 0) math.floor(1e6 / (60 + rnk) + 0.5).toLong else 0L
    val expected = (dense.keySet ++ lex.keySet).toSeq
      .map { id =>
        val d = dense.getOrElse(id, 0L); val l = lex.getOrElse(id, 0L)
        (id, d, l, contrib(d) + contrib(l))
      }
      .sortBy { case (id, _, _, s6) => (-s6, id) }.take(20)
    val got = Similarity.rrfFusion(spark, dir).collect()
    assert(got.length == 20)
    got.zip(expected).zipWithIndex.foreach { case ((row, (id, d, l, s6)), i) =>
      assert(row.getLong(0) == i + 1L, "rnk must be dense 1..20")
      assert(row.getLong(1) == id && row.getLong(2) == d && row.getLong(3) == l)
      assert(row.getDouble(4) == s6 * 1.0 / 1e6, s"score drift at rank ${i + 1}")
    }
    // both retrievers must actually contribute to the fused head
    assert(got.exists(_.getLong(2) > 0) && got.exists(_.getLong(3) > 0))
  }
}
