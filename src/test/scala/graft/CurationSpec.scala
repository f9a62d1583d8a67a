package graft

import graft.text.Curation

/** Corpus-curation north-star operators (contamination screen, repetition
  * quality, chunking/packing, domain mix, PII redaction). */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("cur").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("contamination: candidate sharing the benchmark's grams is flagged") {
    val dir = docsDir(Seq(
      (0L, "alpha beta gamma delta epsilon", "en", "s", 30L), // benchmark (id%20==0)
      (1L, "alpha beta gamma delta epsilon", "en", "s", 30L), // fully contaminated
      (2L, "one two three four five six", "en", "s", 27L)))   // clean
    val r = Curation.contamination(spark, dir).collect()
      .map(x => x.getLong(0) -> ((x.getDouble(3), x.getLong(4)))).toMap
    assert(r(1L) == ((1.0, 1L)))
    assert(r(2L) == ((0.0, 0L)))
    assert(!r.contains(0L)) // benchmark docs are not judged
  }

  test("repetition: dominant and duplicate tokens drive the fractions") {
    val dir = docsDir(Seq((1L, "a a a a b", "en", "s", 9L)))
    val r = Curation.repetition(spark, dir).head()
    assert(r.getLong(1) == 5)               // n_tokens
    assert(r.getDouble(2) == 1.0 - 2.0 / 5) // dup_tok_frac: 2 distinct of 5
    assert(r.getDouble(3) == 4.0 / 5)       // top_tok_frac: "a" ×4
    assert(r.getDouble(4) == 2.0 / 3)       // trigram "a a a" ×2 of 3
  }

  test("chunking: stride windows cover all tokens, lengths clamp at the tail") {
    val text = (1 to 40).map(i => s"t$i").mkString(" ")
    val dir = docsDir(Seq((1L, text, "en", "s", text.length.toLong)))
    val r = Curation.chunk(spark, dir).collect() // width 32, stride 24
    assert(r.length == 2)
    assert(r(0).getLong(2) == 32) // tokens 1-32
    assert(r(1).getLong(2) == 16) // tokens 25-40 (clamped)
    val expected0 = org.apache.commons.codec.digest.DigestUtils.md5Hex(
      (1 to 32).map(i => s"t$i").mkString(" "))
    assert(r(0).getString(3) == expected0)
  }

  test("domain mix: uniform weights invert per-source doc shares") {
    val dir = docsDir(Seq(
      (1L, "x y", "en", "sa", 3L),
      (2L, "x y", "en", "sb", 3L), (3L, "x y", "en", "sb", 3L),
      (4L, "x y", "en", "sb", 3L)))
    val r = Curation.domainMix(spark, dir).collect()
      .map(x => x.getString(0) -> ((x.getDouble(3), x.getDouble(5)))).toMap
    assert(r("sa") == ((0.25, 2.0)))        // 1/4 of docs → weight (1/2)/(1/4)
    assert(r("sb")._1 == 0.75)
    assert(math.abs(r("sb")._2 - 2.0 / 3) < 1e-12)
  }

  test("collocations: an always-adjacent pair outranks independent co-occurrence") {
    // "x y" only ever adjacent; "a"/"b" frequent but independent
    val rows = (1L to 10L).map(i => (i, "a b x y b a", "en", "s", 11L))
    val dir = docsDir(rows)
    val r = Curation.collocations(spark, dir, minCount = 5, k = 10).collect()
    assert(r.nonEmpty)
    val top = r.head
    assert((top.getString(0), top.getString(1)) == (("x", "y")))
    assert(top.getDouble(5) > 0.0) // positive PMI: genuinely associated
  }

  test("doc packing: offsets are the exact contiguous prefix sum across blocks") {
    // 2500 docs span multiple blocks (blockSize 1000) — exercises the
    // two-level distributed cumsum, not just the within-block window
    val rows = (0L until 2500L).map { i =>
      val text = (0 to (i % 7).toInt).map(k => s"w$k").mkString(" ")
      (i, text, "en", "s", text.length.toLong)
    }
    val dir = docsDir(rows)
    val r = graft.text.Curation.docPacking(spark, dir, budget = 64).collect()
    assert(r.length == 2500)
    var expected = 0L
    r.foreach { row =>
      assert(row.getLong(2) == expected, s"doc ${row.getLong(0)}")
      assert(row.getLong(3) == expected / 64 && row.getLong(4) == expected % 64)
      expected += row.getLong(1)
    }
  }

  test("pii redaction: lexicon and pattern hits are masked and counted") {
    val dir = docsDir(Seq(
      (1L, "customer wrote to test@example.com from +1 (555) 123-4567 as user", "en", "s", 60L)))
    val r = Curation.piiRedact(spark, dir).head()
    assert(r.getLong(1) == 1) // email
    assert(r.getLong(2) == 1) // phone
    assert(r.getLong(3) == 2) // customer + user
    val expected = org.apache.commons.codec.digest.DigestUtils.md5Hex(
      "[REDACTED] wrote to [EMAIL] from [PHONE] as [REDACTED]")
    assert(r.getString(4) == expected)
  }
}
