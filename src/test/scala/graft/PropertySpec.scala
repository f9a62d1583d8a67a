package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.model.Schemas.OrderItem
import graft.quality.WeightedScore

/** Property-based invariants (SURVEY §5.2) with generators mirroring the
  * producer's distributions (event_producer.py:120-132,176-189). */
class PropertySpec extends SparkSpec {

  /** Deterministic forAll: 100 seeded samples per property (the scalatest-
    * scalacheck bridge isn't in the offline cache; direct sampling keeps
    * runs reproducible). */
  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    (1 to 100).foreach { i => f(g.pureApply(Gen.Parameters.default, Seed(i.toLong))) }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (1 to 100).foreach { i =>
      f(ga.pureApply(Gen.Parameters.default, Seed(i.toLong)),
        gb.pureApply(Gen.Parameters.default, Seed(i.toLong + 1000)))
    }

  private val itemGen: Gen[OrderItem] = for {
    pid   <- Gen.choose(1, 8).map(i => s"P00$i")            // 8-product catalog
    qty   <- Gen.choose(1, 3)                                // quantity 1-3
    price <- Gen.choose(599, 129999).map(_ / 100.0)          // money, 2-dec
    disc  <- Gen.oneOf(0.0, 5.0, 10.0, 15.0, 20.0)           // discount_pct
  } yield OrderItem(pid, s"name-$pid", "cat", qty, price, disc)

  test("line_total is nonnegative and ≤ qty·price — events.py:142-144") {
    forAll(itemGen) { item =>
      assert(item.lineTotal >= 0.0)
      assert(item.lineTotal <= item.quantity * item.unit_price + 1e-9)
    }
  }

  test("order built from its items always satisfies the ±0.01 invariant") {
    forAll(Gen.nonEmptyListOf(itemGen).map(_.take(3))) { items => // cart [:3]
      val total = math.rint(items.map(_.lineTotal).sum * 100) / 100 // round(,2)
      assert(math.abs(total - items.map(_.lineTotal).sum) <= 0.01 + 1e-9)
    }
  }

  test("quality score is monotone in violations and clamped to [0,1]") {
    forAll(Gen.choose(0, 20), Gen.oneOf(0.2, 0.25, 0.3)) { (v, k) =>
      val s = math.max(0.0, 1.0 - k * v)
      val s2 = math.max(0.0, 1.0 - k * (v + 1))
      assert(s >= s2)
      assert(s >= 0.0 && s <= 1.0)
    }
  }

  test("WeightedScore aggregator matches the per-row mean for any group") {
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, 10L))) { violations =>
      val agg = new WeightedScore(0.2)
      val buf = violations.foldLeft(agg.zero)(agg.reduce)
      val expected = violations.map(v => math.max(0.0, 1.0 - 0.2 * v)).sum / violations.size
      assert(math.abs(agg.finish(buf) - expected) < 1e-12)
    }
  }

  test("WeightedScore merge is associative-compatible with reduce (partial agg)") {
    forAll(Gen.listOf(Gen.choose(0L, 10L)), Gen.listOf(Gen.choose(0L, 10L))) { (a, b) =>
      val agg = new WeightedScore(0.25)
      val whole = (a ++ b).foldLeft(agg.zero)(agg.reduce)
      val parts = agg.merge(a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      assert(math.abs(agg.finish(whole) - agg.finish(parts)) < 1e-12)
    }
  }

  test("chunking covers every token exactly, tails clamp, overlaps match stride") {
    import spark.implicits._
    // boundary sweep: single token, one-below/at/above each stride and
    // width boundary, and long tails
    Seq(1, 2, 23, 24, 25, 31, 32, 33, 48, 49, 56, 57, 100).foreach { nTok =>
      val width = 32
      val stride = 24
      val text = (1 to nTok).map(i => s"t$i").mkString(" ")
      val dir = java.nio.file.Files.createTempDirectory("chunkp").toString
      Seq((1L, text, "en", "s", text.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val chunks = graft.text.Curation.chunk(spark, dir, width, stride).collect()
      val expected = (nTok - 1) / stride + 1
      assert(chunks.length == expected, s"nTok=$nTok")
      // every chunk covers [id*stride, min(id*stride+width, nTok))
      chunks.foreach { c =>
        val start = c.getLong(1) * stride
        assert(c.getLong(2) == math.min(width.toLong, nTok - start), s"nTok=$nTok chunk=$c")
      }
      // union of chunk spans covers 0..nTok-1 with no gaps (stride < width)
      val covered = chunks.map(c => (c.getLong(1) * stride, c.getLong(1) * stride + c.getLong(2)))
        .sortBy(_._1)
      assert(covered.head._1 == 0 && covered.last._2 == nTok)
      covered.sliding(2).foreach {
        case Array((_, e1), (s2, _)) => assert(s2 <= e1, s"gap at $s2, nTok=$nTok")
        case _ => ()
      }
    }
  }

  test("quantization reconstructs every coordinate within half a step") {
    forAll(Gen.listOfN(16, Gen.choose(-1000000, 1000000).map(_ / 1000.0))) { xs =>
      val vmin = xs.min
      val vmax = xs.max
      val scale = (vmax - vmin) / 255.0
      xs.foreach { x =>
        val code = if (scale == 0.0) 0L else math.floor((x - vmin) / scale + 0.5).toLong
        assert(code >= 0 && code <= 255)
        if (scale > 0) {
          val recon = vmin + code * scale
          assert(math.abs(recon - x) <= scale / 2 + 1e-9,
            s"x=$x recon=$recon scale=$scale")
        }
      }
    }
  }

  test("gram ledger merge is associative and equals the union-corpus rebuild — q154 append ≡ rebuild") {
    import graft.text.{Dedup, TextOps}
    import org.apache.spark.sql.functions._
    graft.functions.TextExpressions.register(spark)
    def posGrams(cond: org.apache.spark.sql.Column) =
      graft.sources.Tables.documents(spark, sf0001).filter(cond)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .select(col("doc_id"), posexplode(
          graft.functions.TextExpressions.word_ngrams(col("toks"), 5, distinct = false)))
        .toDF("doc_id", "i", "gram")
    // three disjoint snapshots (base, b1, b2) and the union
    val parts = Seq(col("doc_id") % 3 === 0, col("doc_id") % 3 === 1,
      col("doc_id") % 3 === 2).map(c => Dedup.gramLedgerOf(posGrams(c)))
    val rebuilt = Dedup.gramLedgerOf(posGrams(lit(true)))
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq).toSet
    // left fold (streaming append order) == rebuild
    assert(rows(parts.reduce(Dedup.mergeGramLedgers)) == rows(rebuilt),
      "folded ledger must equal the union-corpus ledger row-for-row")
    // any grouping: (base ⊕ (b1 ⊕ b2)) — min-struct and sum are semigroups
    assert(rows(Dedup.mergeGramLedgers(parts(0),
      Dedup.mergeGramLedgers(parts(1), parts(2)))) == rows(rebuilt),
      "ledger merge must be associative")
  }

  test("dedup is idempotent: dropDuplicates twice == once") {
    import spark.implicits._
    (1 to 5).map(i => Gen.listOfN(40, Gen.choose(1, 12))
        .pureApply(Gen.Parameters.default, Seed(i.toLong))).foreach { ids =>
      val df = ids.map(i => (s"e$i", i)).toDF("event_id", "v")
      val once = df.dropDuplicates("event_id")
      val twice = once.dropDuplicates("event_id")
      assert(once.count() == twice.count())
      assert(once.select("event_id").distinct().count() == once.count())
    }
  }

  test("CMS estimates never undercount and are exact for unique keys — q104 guarantee") {
    import spark.implicits._
    import graft.functions.SketchExpressions
    SketchExpressions.register(spark)
    (1 to 5).foreach { i =>
      // skewed multiset: a few hot keys, a tail of singletons
      val keys = Gen.listOfN(300, Gen.frequency(
        (3, Gen.choose(0L, 4L)), (1, Gen.choose(100L, 2000L))))
        .pureApply(Gen.Parameters.default, Seed(i.toLong))
      val df = keys.toDF("k")
      val sketch = df
        .agg(org.apache.spark.sql.functions.expr("count_min_sketch(k, 0.001d, 0.99d, 42)"))
        .head.getAs[Array[Byte]](0)
      val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val est = df.distinct()
        .withColumn("est", SketchExpressions.cms_estimate(
          org.apache.spark.sql.functions.lit(sketch), org.apache.spark.sql.functions.col("k")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      est.foreach { case (k, e) =>
        assert(e >= exact(k), s"CMS undercounted key $k: $e < ${exact(k)}")
      }
    }
    // non-foldable sketch must fail analysis, not crash a task at runtime
    import graft.functions.CmsEstimate
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Literal}
    import org.apache.spark.sql.types.{BinaryType, LongType}
    val attr = AttributeReference("b", BinaryType)()
    assert(!CmsEstimate(attr, Literal(1L)).checkInputDataTypes().isSuccess)
    assert(CmsEstimate(Literal(Array[Byte](1, 2)), Literal(1L))
      .checkInputDataTypes().isSuccess)
    // a foldable NULL sketch must also fail analysis cleanly — not NPE out
    // of CountMinSketch.readFrom(null) when the lazy sketch is forced
    assert(!CmsEstimate(Literal(null, BinaryType), Literal(1L))
      .checkInputDataTypes().isSuccess)
  }

  test("bounded_collect: exact under the cap, truncated-not-wrong past it; " +
      "q74's in-array candidate build ≡ the join form") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.SketchExpressions
    SketchExpressions.register(spark)
    (1 to 5).foreach { i =>
      // (gram-id, doc-id) pairs, distinct per group — some groups under
      // the cap, some far over it (the hot-gram shape the bound exists for)
      val pairs = Gen.listOfN(400, for {
        g <- Gen.frequency((3, Gen.choose(0L, 30L)), (1, Gen.choose(0L, 2L)))
        d <- Gen.choose(0L, 60L)
      } yield (g, d)).pureApply(Gen.Parameters.default, Seed(i.toLong))
        .distinct
      val df = pairs.toDF("gram", "doc_id").repartition(7)
      val cap = 10
      val got = df.groupBy("gram")
        .agg(count(lit(1)).as("df"),
          SketchExpressions.bounded_collect(col("doc_id"), cap + 1).as("ids"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Long](2)))).toMap
      val exact = pairs.groupBy(_._1).view
        .mapValues(_.map(_._2).sorted).toMap
      got.foreach { case (g, (dfN, ids)) =>
        assert(dfN == exact(g).length)
        if (dfN <= cap)
          // groups under the df cap collect EXACTLY (sorted = set-determined)
          assert(ids == exact(g), s"group $g under cap collected wrong ids")
        else
          // overfull groups truncate at cap+1 — enough for the df gate to
          // exclude them, never trusted for contents
          assert(ids.length == cap + 1 && ids.toSet.subsetOf(exact(g).toSet))
      }
      // the q74 candidate build: in-array ordered-pair expansion over the
      // df-gated collected ids ≡ the old corpus-join + self-join form
      val rare = df.groupBy("gram")
        .agg(count(lit(1)).as("df"),
          SketchExpressions.bounded_collect(col("doc_id"), cap + 1).as("ids"))
        .filter(col("df").between(2, cap)).select("gram", "ids")
      val newCand = rare
        .select(explode(col("ids")).as("doc_a"), col("ids"))
        .select(col("doc_a"), explode(col("ids")).as("doc_b"))
        .filter(col("doc_a") =!= col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_rare"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val dfreq = df.groupBy("gram").agg(count(lit(1)).as("df"))
      val rareJoin = df.join(
        dfreq.filter(col("df").between(2, cap)).select("gram"), Seq("gram"))
      val oldCand = rareJoin.as("x").join(rareJoin.as("y"),
          col("x.gram") === col("y.gram") && col("x.doc_id") =!= col("y.doc_id"))
        .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_rare"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(newCand == oldCand, s"candidate multiset diverged on seed $i")
    }
  }

  test("compiled word ngrams are bit-identical to the HOF form, both distinct modes") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.TextExpressions
    TextExpressions.register(spark)
    // token lists over a SMALL alphabet (forces duplicate grams so the
    // distinct path is exercised), with occasional nulls (concat_ws skips
    // them) and lengths straddling the n=3 boundary (empty-array edge)
    val tokGen = Gen.choose(0, 9).flatMap(len =>
      Gen.listOfN(len, Gen.frequency(
        (9, Gen.oneOf("a", "b", "c").map(Option(_))),
        (1, Gen.const(Option.empty[String])))))
    (1 to 25).foreach { seed =>
      val rows = Gen.listOfN(60, tokGen)
        .pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val df = rows.map(ts => Tuple1(ts.map(_.orNull))).toDF("toks")
      Seq(false, true).foreach { distinct =>
        val fused = df.select(
            TextExpressions.word_ngrams(col("toks"), 3, distinct).as("g"))
          .collect().map(_.getSeq[String](0))
        val hofArr = graft.text.TextOps.wordNgrams(col("toks"), 3)
        val ref = df.select(
            (if (distinct) array_distinct(hofArr) else hofArr).as("g"))
          .collect().map(_.getSeq[String](0))
        assert(fused.toSeq == ref.toSeq, s"distinct=$distinct seed=$seed")
      }
    }
    // null token-array → null out, both forms
    val n0 = Seq(Tuple1(null: Seq[String])).toDF("toks")
      .select(TextExpressions.word_ngrams(col("toks"), 3, distinct = false))
      .collect()
    assert(n0.head.isNullAt(0))
  }

  test("bottom-k md5 sketch is bit-identical to the sorted-aggregate form") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.TextExpressions
    TextExpressions.register(spark)
    // small alphabet forces duplicate grams (the in-buffer dedup path);
    // lengths straddle the n boundary (empty-sketch edge); k smaller than
    // the gram count exercises the bounded-eviction path
    val tokGen = Gen.choose(0, 30).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d")))
    (1 to 25).foreach { seed =>
      val rows = Gen.listOfN(40, tokGen)
        .pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val df = rows.map(Tuple1(_)).toDF("toks")
      Seq(1, 4, 32).foreach { k =>
        val fused = df.select(
            TextExpressions.bottomk_md5(col("toks"), 5, k).as("sk"))
          .collect().map(_.getSeq[String](0))
        // the replaced formulation: md5 every per-doc-DISTINCT gram, sort
        // ascending, take the first k (what collect_list+sort_array+slice
        // aggregated per doc before round 8)
        val ref = df.select(slice(array_sort(transform(
            TextExpressions.word_ngrams(col("toks"), 5, distinct = true),
            g => md5(g))), 1, k).as("sk"))
          .collect().map(_.getSeq[String](0))
        assert(fused.toSeq == ref.toSeq, s"k=$k seed=$seed")
      }
    }
    // shape-arg validation mirrors the other compiled text expressions
    intercept[IllegalArgumentException] {
      graft.functions.TextExpressions.bottomKBuilder(Seq.empty)
    }
  }

  test("fused LSH banding is bit-identical to the composed per-hyperplane form") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.VectorExpressions
    import graft.functions.VectorExpressions.dot_product
    VectorExpressions.register(spark)
    val (nbits, bandSize, dim) = (16, 4, 8)
    val signs = VectorExpressions.signMatrix(nbits, dim)
    // vectors incl. negatives, zeros (sign boundary), and a SHORT vector
    // (the min(len, dim) bound both forms share)
    val vecGen = Gen.choose(3, dim).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-1000000, 1000000).map(_ / 1000.0)))
    (1 to 25).foreach { seed =>
      val vecs = Gen.listOfN(40, vecGen)
        .pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val df = vecs.toDF("v")
      val fused = df.select(
          VectorExpressions.lsh_bands(col("v"), nbits, bandSize, dim).as("b"))
        .collect().map(_.getSeq[Long](0))
      // the composed reference: nbits dot products against sign literals,
      // strict > 0, Σ bit·2^k packing — exactly the pre-round-6 band build
      val bits = (0 until nbits).map { j =>
        when(dot_product(col("v"), lit(signs(j))) > 0, 1L).otherwise(0L)
      }
      val bandVals = (0 until nbits / bandSize).map { b =>
        (0 until bandSize).map(k => bits(b * bandSize + k) * (1L << k)).reduce(_ + _)
      }
      val composed = df.select(array(bandVals: _*).as("b"))
        .collect().map(_.getSeq[Long](0))
      assert(fused.toSeq == composed.toSeq)
    }
    // null vector → null bands (both forms)
    val nulls = Seq((1L, null: Seq[Double])).toDF("id", "v")
      .select(VectorExpressions.lsh_bands(col("v"), nbits, bandSize, dim))
      .collect()
    assert(nulls.head.isNullAt(0))
  }

  test("bloom probe admits every member for any key set — q98 guarantee") {
    import spark.implicits._
    import graft.functions.BloomExpressions
    BloomExpressions.register(spark)
    (1 to 5).foreach { i =>
      val keys = Gen.listOfN(200, Gen.choose(Long.MinValue, Long.MaxValue))
        .pureApply(Gen.Parameters.default, Seed(i.toLong)).distinct
      val df = keys.toDF("k")
      val sketch = df.agg(BloomExpressions.bloom_agg(
          org.apache.spark.sql.functions.col("k"),
          org.apache.spark.sql.functions.lit(10000L),
          org.apache.spark.sql.functions.lit(80000L)))
        .head.getAs[Array[Byte]](0)
      val misses = df.withColumn("hit", BloomExpressions.bloom_contains(
          org.apache.spark.sql.functions.lit(sketch),
          org.apache.spark.sql.functions.col("k")))
        .filter(!org.apache.spark.sql.functions.col("hit")).count()
      assert(misses == 0, s"bloom false negative on sample $i")
    }
  }

  test("wordNgrams matches the brute-force sliding window for any token list") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    val tokGen = Gen.listOf(Gen.oneOf("a", "bb", "ccc", "d", "e"))
    (1 to 50).foreach { i =>
      val toks = tokGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val expected = toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
      val got = Seq(toks.mkString(" ")).toDF("text")
        .select(graft.text.TextOps.wordNgrams(
          graft.text.TextOps.tokens(col("text"))).as("g"))
        .head.getSeq[String](0)
      // split(" ") of "" yields [""], whose trigram set is empty either way
      val exp = if (toks.isEmpty) Seq.empty else expected
      assert(got == exp, s"sample $i: $toks")
    }
  }

  test("stratified sample is invariant to partitioning and shuffle-partition count") {
    // THE property that makes hash-coin sampling auditable at 100 TB: the
    // keep set depends only on data, never on layout. rand()-based sampling
    // fails this — its draws change with partitioning and task retries.
    import graft.text.Curation
    val base = Curation.stratifiedSample(spark, sf001)
      .select("doc_id", "keep").collect().toSeq.sortBy(_.getLong(0))
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val reshaped = Curation.stratifiedSample(spark, sf001)
        .select("doc_id", "keep").collect().toSeq.sortBy(_.getLong(0))
      assert(reshaped == base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("BPE merge fold: matches reference greedy, preserves concat, kills the pair") {
    import spark.implicits._
    import graft.text.TextOps
    def refMerge(syms: List[String], l: String, r: String): List[String] =
      syms.foldLeft(List.empty[String]) { (acc, s) =>
        if (acc.nonEmpty && acc.last == l && s == r) acc.init :+ (l + r)
        else acc :+ s
      }
    val symGen = Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "ab", "ba")))
    val rows = (1 to 100).map(i =>
      symGen.pureApply(Gen.Parameters.default, Seed(i.toLong))).toVector
    val df = rows.map(Tuple1(_)).toDF("syms")
    val toks = Seq("a", "b", "ab", "ba")
    for (l <- toks; r <- toks) {
      val out = df.select(TextOps.mergePairExpr("syms", l, r)).collect()
        .map(_.getSeq[String](0).toList)
      out.zip(rows).foreach { case (got, in) =>
        assert(got == refMerge(in, l, r), s"pair ($l,$r) on $in")
        assert(got.mkString == in.mkString)            // segmentation, not edit
        assert(got.forall(_.nonEmpty))
        assert(!got.iterator.sliding(2).withPartial(false)
          .exists(w => w.head == l && w(1) == r),      // greedy pass is complete
          s"surviving ($l,$r) adjacency in $got")
      }
    }
  }

  test("mergeEvolved matches a scalar reference merge for any base/changes") {
    import graft.sources.Catalog
    import spark.implicits._
    // base carries (v, src); changes carry (v, lang) — both evolution
    // directions live in every sample, like q113
    val baseGen = Gen.someOf(0L to 30L).map(_.toList.map(id => (id, id * 7 + 1, s"s$id")))
    val chGen = Gen.someOf(0L to 30L).flatMap { ids =>
      Gen.listOfN(ids.size, Gen.oneOf("upsert", "delete"))
        .map(ops => ids.toList.zip(ops).map { case (id, op) =>
          (id, id * 13 + 2, s"l$id", op)
        })
    }
    (1 to 25).foreach { i =>
      val baseRows = baseGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val chRows = chGen.pureApply(Gen.Parameters.default, Seed(i.toLong + 500))
      val base = baseRows.toDF("doc_id", "v", "src")
      val changes = chRows.toDF("doc_id", "v", "lang", "op")
      val got = Catalog.mergeEvolved(base, changes).collect()
        .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.getString(2)), Option(r.getString(3)), r.getString(4)))
        .sortBy(_._1)
      // scalar reference: upserts update/insert, deletes drop, kept rows
      // null-fill the change-only column, inserts null-fill the base-only
      val baseMap = baseRows.map(t => t._1 -> t).toMap
      val chMap = chRows.map(t => t._1 -> t).toMap
      val keys = (baseMap.keySet ++ chMap.filter(_._2._4 == "upsert").keySet)
        .filterNot(k => chMap.get(k).exists(_._4 == "delete"))
      val expect = keys.toSeq.sorted.map { k =>
        (baseMap.get(k), chMap.get(k)) match {
          case (Some(b), Some(c)) => // matched upsert: change value wins,
            // base-only src survives, change-only lang fills
            (k, Some(c._2), Some(b._3), Some(c._3), "updated")
          case (None, Some(c)) =>
            (k, Some(c._2), None, Some(c._3), "inserted")
          case (Some(b), None) =>
            (k, Some(b._2), Some(b._3), None, "kept")
          case (None, None) => fail(s"impossible key $k")
        }
      }
      assert(got.toSeq == expect, s"seed $i")
    }
  }

  test("binPack matches the scalar quantized-packing fold for any manifest") {
    import graft.sources.Catalog
    import spark.implicits._
    val target = 10000L
    // sizes straddle the target so large-file exclusion is exercised;
    // two langs prove partition independence
    val manifestGen = for {
      n <- Gen.choose(1, 40)
      sizes <- Gen.listOfN(n, Gen.choose(1L, 15000L))
      langs <- Gen.listOfN(n, Gen.oneOf("en", "de"))
    } yield langs.zip(sizes)
    // 25 seeded samples: each runs a real Spark window+agg job
    (1 to 25).foreach { i =>
      val manifest = manifestGen
        .pureApply(Gen.Parameters.default, Seed(i.toLong))
        .zipWithIndex.map { case ((l, b), id) => (l, id.toLong, b) }
      val got = Catalog.binPack(manifest.toDF("lang", "file_id", "bytes"), target)
        .collect()
        .map(r => (r.getAs[String]("lang"), r.getAs[Long]("bin_id"),
          r.getAs[Long]("n_files"), r.getAs[Long]("bin_bytes"),
          r.getAs[Long]("first_file"), r.getAs[Long]("last_file")))
        .toSeq
      // scalar reference: per lang, cumsum in file order, bin = (cum-1)/T
      val expect = manifest.filter(_._3 < target).groupBy(_._1).toSeq
        .flatMap { case (lang, fs) =>
          var cum = 0L
          fs.sortBy(_._2)
            .map { case (_, id, b) => cum += b; ((cum - 1) / target, id, b) }
            .groupBy(_._1).toSeq
            .map { case (bin, g) =>
              (lang, bin, g.size.toLong, g.map(_._3).sum,
                g.map(_._2).min, g.map(_._2).max)
            }
        }
        .sortBy(t => (t._1, t._2))
      assert(got == expect, s"seed $i")
      // the documented quantization bound holds for every bin
      got.foreach { case (_, _, _, bytes, _, _) =>
        assert(bytes < 2 * target)
      }
    }
  }

  /** Independent driver-side reference of q141's span-rewrite semantics
    * (canonical = globally-first gram occurrence; a position is cut iff
    * covered only by non-canonical occurrences) — deliberately the naive
    * O(occurrences × positions) formulation, nothing shared with the
    * distributed plan. */
  private def spanRewriteRef(docs: Seq[(Long, Array[String])],
      n: Int): Map[Long, (Long, Long, String)] = {
    case class Occ(doc: Long, i: Int)
    val occ: Seq[(String, Occ)] = for {
      (id, toks) <- docs
      i <- 0 to toks.length - n
    } yield (toks.slice(i, i + n).mkString(" "), Occ(id, i))
    val first = occ.groupBy(_._1).map { case (g, os) =>
      g -> os.map(_._2).minBy(o => (o.doc, o.i)) }
    docs.map { case (id, toks) =>
      val mine = occ.filter(_._2.doc == id)
      val cut = (0 until toks.length).filter { p =>
        val covering = mine.filter { case (_, o) => o.i <= p && p < o.i + n }
        covering.nonEmpty && covering.forall { case (g, o) => first(g) != o }
      }.toSet
      val kept = toks.zipWithIndex.collect { case (t, p) if !cut(p) => t }
      id -> ((toks.length.toLong, cut.size.toLong, kept.mkString(" ")))
    }.toMap
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("span rewrite equals the naive reference on random gram-colliding corpora") {
    import spark.implicits._
    // 3-symbol alphabet: 243 possible 5-grams, so ~200 gram draws per
    // corpus collide heavily — the regime where canonical selection and
    // coverage resolution actually interact (plus empty/short docs)
    val tokGen = Gen.oneOf("x", "y", "z")
    val docGen = Gen.choose(0, 14).flatMap(len => Gen.listOfN(len, tokGen))
    val corpusGen = Gen.listOfN(25, docGen)
    (1 to 5).foreach { seed =>
      val corpus = corpusGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
        .zipWithIndex.map { case (toks, i) => (i.toLong, toks.toArray) }
      val dir = java.nio.file.Files.createTempDirectory("srprop").toString
      corpus.map { case (id, toks) =>
        (id, toks.mkString(" "), "en", "s", toks.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      // NOTE: split("", " ") yields [""], so an empty text is ONE empty
      // token to the engine — mirror that in the reference input
      val refIn = corpus.map { case (id, toks) =>
        (id, if (toks.isEmpty) Array("") else toks) }
      val expect = spanRewriteRef(refIn, 5)
      val got = text.Dedup.spanRewrite(spark, dir).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      expect.foreach { case (id, (nt, nr, txt)) =>
        assert(got(id) == ((nt, nr, md5hex(txt))),
          s"seed $seed doc $id: got ${got(id)}, want ($nt, $nr, md5('$txt'))")
      }
    }
  }

  test("phrase search equals a naive sliding-window reference on random corpora") {
    import spark.implicits._
    // 2-symbol alphabet: dense phrase repetition, overlapping occurrences
    val tokGen = Gen.oneOf("p", "q")
    val docGen = Gen.choose(0, 12).flatMap(len => Gen.listOfN(len, tokGen))
    val corpusGen = Gen.listOfN(20, docGen)
    val phraseGen = Gen.choose(2, 4).flatMap(m => Gen.listOfN(m, tokGen))
    (1 to 4).foreach { seed =>
      val corpus = corpusGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
        .zipWithIndex.map { case (toks, i) => (i.toLong, toks) }
      val phrase = phraseGen.pureApply(Gen.Parameters.default, Seed(seed + 500L))
      val dir = java.nio.file.Files.createTempDirectory("psprop").toString
      corpus.map { case (id, toks) =>
        (id, toks.mkString(" "), "en", "s", toks.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val idx = java.nio.file.Files.createTempDirectory("psprop_idx").toString
      text.TextIndex.writePhraseIndex(spark, dir, idx)
      // naive reference: every sliding window compared to the phrase
      // (split("", " ") = [""], mirror the engine's empty-text token)
      val expect = corpus.map { case (id, toks0) =>
        val toks = if (toks0.isEmpty) List("") else toks0
        val occ = (0 to toks.length - phrase.length)
          .filter(p => toks.slice(p, p + phrase.length) == phrase)
        id -> occ
      }.filter(_._2.nonEmpty).toMap
      val got = text.TextIndex.phraseSearch(spark, idx, phrase).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got.keySet == expect.keySet,
        s"seed $seed phrase $phrase: docs ${got.keySet} vs ${expect.keySet}")
      expect.foreach { case (id, occ) =>
        assert(got(id) == ((occ.size.toLong, occ.min.toLong)),
          s"seed $seed doc $id phrase $phrase: ${got(id)} vs $occ")
      }
    }
  }

  test("proximity search equals a naive all-pairs reference on random corpora") {
    import spark.implicits._
    // 3-symbol alphabet: both probe terms repeat densely within docs, so
    // the banded join's exactly-once-per-pair claim is exercised across
    // band boundaries, multi-occurrence docs, and unordered windows
    val tokGen = Gen.oneOf("a", "b", "x")
    val docGen = Gen.choose(0, 14).flatMap(len => Gen.listOfN(len, tokGen))
    val corpusGen = Gen.listOfN(20, docGen)
    (1 to 4).foreach { seed =>
      val corpus = corpusGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
        .zipWithIndex.map { case (toks, i) => (i.toLong, toks) }
      val slop = 1 + (seed % 3) // 1..3 — includes the tightest window
      val dir = java.nio.file.Files.createTempDirectory("pxprop").toString
      corpus.map { case (id, toks) =>
        (id, toks.mkString(" "), "en", "s", toks.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val idx = java.nio.file.Files.createTempDirectory("pxprop_idx").toString
      text.TextIndex.writePhraseIndex(spark, dir, idx)
      // naive reference: all (i_a, i_b) position pairs within slop
      val expect = corpus.map { case (id, toks0) =>
        val toks = if (toks0.isEmpty) List("") else toks0
        val as = toks.zipWithIndex.collect { case ("a", i) => i }
        val bs = toks.zipWithIndex.collect { case ("b", i) => i }
        val pairs = for { ia <- as; ib <- bs
          if math.abs(ia - ib) <= slop } yield math.abs(ia - ib)
        id -> pairs
      }.filter(_._2.nonEmpty).toMap
      val got = text.TextIndex.proximitySearch(spark, idx, "a", "b", slop)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got.keySet == expect.keySet,
        s"seed $seed slop $slop: docs ${got.keySet} vs ${expect.keySet}")
      expect.foreach { case (id, pairs) =>
        assert(got(id) == ((pairs.size.toLong, pairs.min.toLong)),
          s"seed $seed slop $slop doc $id: ${got(id)} vs $pairs")
      }
    }
  }

  test("theta estimates beyond k are identical under any partitioning (min-k determinism)") {
    import graft.functions.ThetaExpressions
    import org.apache.spark.sql.functions.col
    ThetaExpressions.register(spark)
    // 50k distinct keys — far past the 4096 retained entries, so the
    // sketch is genuinely sampling; min-k retention makes the retained
    // set (hence the estimate) a pure function of the key SET
    def est(parts: Int): Long = spark.range(0, 50000).repartition(parts)
      .select(ThetaExpressions.theta_sketch_agg(col("id")).as("sk"))
      .select(ThetaExpressions.theta_intersect_estimate(col("sk"), col("sk")))
      .head.getLong(0)
    val e8 = est(8)
    assert(e8 == est(3) && e8 == est(17),
      "theta estimate must not depend on partitioning")
    // and the estimate is within the family's error bound at this k
    assert(math.abs(e8 - 50000L) < 50000L * 0.05, s"estimate $e8")
  }

  test("a project/aggregate-carried localCheckpoint chain never compounds plan statistics (the bpeTrain shape)") {
    // round-14 checkpoint-stats audit: the CC loops needed freshCheckpoint
    // because their bodies JOIN the carried frame with itself (size
    // estimates multiply → square per round). bpeTrain's loop only
    // projects and aggregates the carried frame, so plain localCheckpoint
    // is safe there — this property pins the distinction: ten rounds of
    // the bpeTrain shape (posexplode → groupBy on the side, same-schema
    // project carried forward) keep the carried sizeInBytes estimate
    // BOUNDED, where a self-join chain doubles its bit-length per round
    // (ConnectedComponentsSpec's freshCheckpoint property).
    import spark.implicits._
    import org.apache.spark.sql.functions._
    var words = (1L to 200L)
      .map(i => (Seq("a", "b", "c", "d").take(1 + (i % 4).toInt), i))
      .toDF("syms", "wc")
      .localCheckpoint()
    val bits0 = words.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
    for (_ <- 1 to 10) {
      // the per-round argmax (aggregate + collect) reads the carried frame
      words
        .select(col("wc"), posexplode(col("syms")).as(Seq("i", "l")))
        .groupBy("l").agg(sum("wc").as("c"))
        .orderBy(desc("c")).limit(1).collect()
      // the carried re-segment is a same-schema project
      words = words
        .select(concat(col("syms"), array(lit("x"))).as("syms"), col("wc"))
        .localCheckpoint()
    }
    val bits = words.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
    assert(bits <= bits0 + 16,
      s"project-carried chain compounded stats: $bits0 -> $bits bits — " +
        "the bpeTrain loop would need freshCheckpoint after all")
    graft.Checkpoints.sweepExceptRetained(spark.sparkContext)
  }
}
