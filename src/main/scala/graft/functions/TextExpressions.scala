package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The per-row shingle→MinHash loop, callable from generated code: word
  * `ngram`-grams over the token array, and for each seed s ∈ [0, numHashes)
  * the lexicographic min of md5Hex("s:" ++ gram) — exactly the value the
  * exploded formulation aggregates, and exactly DuckDB's
  * `list_min(list_transform(grams, g -> md5(s || ':' || g)))`, so results
  * stay oracle-identical. Null when the doc is shorter than `ngram` tokens
  * (no shingles ⇒ no signature, matching the left-join-null contract). */
object MinHashHelper {

  // "0:", "1:", … seed prefixes as bytes, computed once per JVM — the md5
  // input is the UTF-8 of (s + ":" + gram) and these are its first bytes
  private def seedPrefixBytes(s: Int): Array[Byte] =
    (s.toString + ":").getBytes(java.nio.charset.StandardCharsets.UTF_8)
  private val CachedPrefixes: Array[Array[Byte]] = Array.tabulate(16)(seedPrefixBytes)

  def compute(tokens: ArrayData, numHashes: Int, ngram: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < ngram) return null
    val prefixes =
      if (numHashes <= CachedPrefixes.length) CachedPrefixes
      else Array.tabulate(numHashes)(seedPrefixBytes)
    // Hot-path layout (profiled round 3; semantics byte-identical to
    // DigestUtils.md5Hex(s + ":" + gram) per seed×gram):
    //  - ONE MessageDigest reused for every seed×gram of the row (md5Hex
    //    allocated a fresh instance per call);
    //  - gram bytes are streamed into the digest straight from the tokens'
    //    UTF-8 (no per-seed String concat / re-encode) — UTF-8 of the
    //    joined gram IS the tokens' UTF-8 joined by 0x20;
    //  - mins are compared as UNSIGNED DIGEST BYTES: lowercase-hex
    //    lexicographic order equals unsigned byte order, so hex encoding
    //    happens only for the 8 winners at the end, not per seed×gram.
    val md = java.security.MessageDigest.getInstance("MD5")
    val scratch = new Array[Byte](16)
    val mins = new Array[Array[Byte]](numHashes)
    // token UTF-8 extracted once (the sliding window reuses each ngram times)
    val tokBytes = new Array[Array[Byte]](n)
    var t = 0
    while (t < n) {
      val tok = tokens.getUTF8String(t)
      tokBytes(t) = if (tok == null) null else tok.getBytes
      t += 1
    }
    var i = 0
    while (i <= n - ngram) {
      // a gram touching a null token contributes nothing (DuckDB's
      // null-propagating concat + null-skipping list_min behave the same)
      var hasNull = false
      var k = 0
      while (k < ngram) {
        if (tokBytes(i + k) == null) hasNull = true
        k += 1
      }
      if (!hasNull) {
        var s = 0
        while (s < numHashes) {
          md.update(prefixes(s))
          k = 0
          while (k < ngram) {
            if (k > 0) md.update(' '.toByte)
            md.update(tokBytes(i + k))
            k += 1
          }
          md.digest(scratch, 0, 16) // fills scratch and resets the digest
          if (mins(s) == null) mins(s) = scratch.clone()
          else if (java.util.Arrays.compareUnsigned(scratch, mins(s)) < 0)
            System.arraycopy(scratch, 0, mins(s), 0, 16)
          s += 1
        }
      }
      i += 1
    }
    if (mins(0) == null) return null // every gram touched a null token
    new GenericArrayData(mins.map(b => UTF8String.fromString(
      org.apache.commons.codec.binary.Hex.encodeHexString(b))))
  }
}

/** MinHash signature as ONE map-side expression (SURVEY U6; the scale fix
  * for the round-1 shingle pipeline): the exploded formulation shuffles
  * every token row by doc_id for the trigram window and again for the
  * signature aggregate — at 100 TB that is two shuffles of the tokenized
  * corpus. This expression keeps the whole shingle→minhash loop inside the
  * row, so signatures come out of the parquet scan with NO shuffle at all;
  * codegen emits a single static call per row (the loop runs compiled,
  * whole-stage codegen span stays intact). */
case class MinHashHex(child: Expression, numHashes: Int = 8, ngram: Int = 3)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true // short docs yield null signatures
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.catalogString}")
    }
  }

  override def nullSafeEval(t: Any): Any =
    MinHashHelper.compute(t.asInstanceOf[ArrayData], numHashes, ngram)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinHashHelper.compute($c, $numHashes, $ngram);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashHex =
    copy(child = newChild)
}

/** The per-row content-defined-chunking loop, callable from generated code:
  * stream the token array once, cutting a chunk AFTER every token whose
  * md5's first two bytes (= first 4 hex chars, as an unsigned int) are
  * ≡ 0 mod `mod` — the rolling-hash cut rule of CDC storage dedup applied
  * to token streams — and emit md5Hex of each chunk's space-joined tokens.
  * Byte-identical to the exploded window formulation it replaces
  * ([[graft.text.Curation.chunkDedupExploded]], kept as the differential
  * reference): the chunk text is the tokens joined by 0x20 with null
  * tokens skipped (concat_ws semantics), the boundary value equals
  * `conv(substring(md5(tok),1,4),16,10)`, and a trailing run of tokens
  * (even all-null/empty) still closes a final chunk because chunk
  * membership is positional. */
object CdcChunkHelper {

  def compute(tokens: ArrayData, mod: Int): ArrayData = {
    val n = tokens.numElements()
    // one digest instance per concern, both reused across the row: tokMd
    // one-shots each token (boundary test), chunkMd streams the joined
    // chunk text (digest() resets it at each cut)
    val chunkMd = java.security.MessageDigest.getInstance("MD5")
    val tokMd = java.security.MessageDigest.getInstance("MD5")
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var inChunk = 0   // positions since the last cut (null positions count)
    var wrote = false // a non-null token was streamed (separator rule)
    var t = 0
    while (t < n) {
      var boundary = false
      if (!tokens.isNullAt(t)) {
        val b = tokens.getUTF8String(t).getBytes
        if (wrote) chunkMd.update(' '.toByte)
        chunkMd.update(b)
        wrote = true
        val d = tokMd.digest(b)
        boundary = (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % mod == 0
      }
      inChunk += 1
      if (boundary) {
        out += UTF8String.fromString(
          org.apache.commons.codec.binary.Hex.encodeHexString(chunkMd.digest()))
        inChunk = 0
        wrote = false
      }
      t += 1
    }
    if (inChunk > 0)
      out += UTF8String.fromString(
        org.apache.commons.codec.binary.Hex.encodeHexString(chunkMd.digest()))
    new GenericArrayData(out.toArray[Any])
  }
}

/** Content-defined chunk hashes as ONE map-side expression (the q77 scale
  * fix, same move that took the MinHash signature zero-shuffle): the
  * exploded formulation shuffles every token row by doc_id for the
  * boundary-prefix window and again for the (doc, chunk) aggregate — at
  * 100 TB that is two shuffles of the tokenized corpus. This expression
  * keeps the whole boundary→join→hash loop inside the row, so chunk-hash
  * arrays come straight off the parquet scan with NO shuffle; the only
  * remaining exchanges are the chunk-hash df aggregate and the final
  * per-doc rollup, both keyed and corpus/16-sized. */
case class CdcChunks(child: Expression, mod: Int = 16)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.catalogString}")
    }
  }

  override def nullSafeEval(t: Any): Any =
    CdcChunkHelper.compute(t.asInstanceOf[ArrayData], mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.CdcChunkHelper.compute($c, $mod);"
    })

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

/** The per-row word-ngram loop, callable from generated code: the sliding
  * window of `n` tokens joined by a single space, optionally first-
  * occurrence-deduplicated — bit-identical to the HOF form it replaces
  * (`transform(sequence(...), i -> concat_ws(" ", ...))`, optionally under
  * `array_distinct`): concat_ws SKIPS null tokens (they vanish from the
  * join, they don't null the gram), a doc shorter than `n` tokens yields
  * an EMPTY array (not null), and `array_distinct` keeps first-occurrence
  * order — all three behaviors reproduced here and pinned by a
  * differential property spec. */
object WordNgramHelper {
  private[functions] val Space = UTF8String.fromString(" ")

  def compute(tokens: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val window = new Array[UTF8String](n)
    if (!distinct) {
      val out = new Array[Any](len - n + 1)
      var i = 0
      while (i <= len - n) {
        var k = 0
        while (k < n) {
          window(k) = if (tokens.isNullAt(i + k)) null
            else tokens.getUTF8String(i + k)
          k += 1
        }
        out(i) = UTF8String.concatWs(Space, window: _*)
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var i = 0
      while (i <= len - n) {
        var k = 0
        while (k < n) {
          window(k) = if (tokens.isNullAt(i + k)) null
            else tokens.getUTF8String(i + k)
          k += 1
        }
        seen.add(UTF8String.concatWs(Space, window: _*))
        i += 1
      }
      new GenericArrayData(seen.toArray(Array.empty[AnyRef]).asInstanceOf[Array[Any]])
    }
  }
}

/** The per-row bottom-k sketch loop, callable from generated code: slide the
  * `n`-token window (concat_ws semantics, same rule as [[WordNgramHelper]]),
  * md5 each gram, and keep only the `k` lexicographically smallest DISTINCT
  * digests in a sorted k-slot buffer — Cohen & Kaplan's bottom-k sketch
  * (the asymmetric-containment estimator q74 prefilters with), computed in
  * one compiled pass with per-row state capped at k 16-byte digests plus
  * one scratch digest. Equality (same gram seen again) is detected at the
  * insertion point, so no per-row gram set is materialized — a 10⁶-token
  * document costs the same buffer as a 10-token one. Result is the
  * ascending lowercase-hex array — byte-identical to the aggregate form it
  * replaces (`slice(sort_array(collect_list(md5(gram))), 1, k)` over
  * per-doc-distinct grams) and to DuckDB's
  * `list_slice(list_sort(list(md5(gram))), 1, k)` over the same rows:
  * lowercase-hex lexicographic order equals unsigned digest-byte order.
  * (Two DISTINCT grams colliding to one md5 would appear twice in the
  * aggregate forms but once here; a full-md5 collision between two 5-gram
  * strings has never been exhibited and is vanishing at any corpus size.) */
object BottomKHelper {

  def compute(tokens: ArrayData, n: Int, k: Int): ArrayData = {
    val len = tokens.numElements()
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = new Array[Array[Byte]](k) // sorted ascending, sz live slots
    var sz = 0
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) {
        window(j) = if (tokens.isNullAt(i + j)) null else tokens.getUTF8String(i + j)
        j += 1
      }
      val gram = UTF8String.concatWs(WordNgramHelper.Space, window: _*)
      val d = md.digest(gram.getBytes)
      // admit only if it beats the current k-th smallest (or buffer has room)
      if (sz < k || java.util.Arrays.compareUnsigned(d, buf(sz - 1)) < 0) {
        // binary search: first slot whose digest sorts strictly above d
        var lo = 0
        var hi = sz
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (java.util.Arrays.compareUnsigned(buf(mid), d) <= 0) lo = mid + 1
          else hi = mid
        }
        // duplicate gram ⇒ identical digest sits just left of the slot
        val dup = lo > 0 && java.util.Arrays.compareUnsigned(buf(lo - 1), d) == 0
        if (!dup) {
          val newSz = math.min(sz + 1, k)
          var p = newSz - 1
          while (p > lo) { buf(p) = buf(p - 1); p -= 1 }
          buf(lo) = d
          sz = newSz
        }
      }
      i += 1
    }
    new GenericArrayData(Array.tabulate[Any](sz)(ix => UTF8String.fromString(
      org.apache.commons.codec.binary.Hex.encodeHexString(buf(ix)))))
  }
}

/** Bottom-k md5 sketch of a token-array column's word `n`-grams as ONE
  * map-side expression (the q74 scale fix, round 8): the aggregate form
  * buffered EVERY gram hash of a document in `collect_list` and sorted
  * after aggregation — unbounded per-doc state, a genuine long-document
  * OOM hazard at 100 TB, plus a corpus-mass doc_id shuffle. This keeps the
  * whole shingle→md5→bottom-k loop inside the row (state = k digests), so
  * sketches come straight off the parquet scan with NO shuffle — the same
  * move that made [[MinHashHex]]/[[CdcChunks]] zero-shuffle. Short docs
  * (< n tokens) yield an EMPTY array, mirroring the aggregate form's
  * no-gram-rows ⇒ no-sketch-row (such docs never reach a sketch consumer:
  * candidate pairs require shared grams). */
case class BottomKMd5(child: Expression, n: Int = 5, k: Int = 32)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bottomk_md5"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StringType, _) if n > 0 && k > 0 => TypeCheckResult.TypeCheckSuccess
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires n > 0 and k > 0")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.catalogString}")
    }
  }

  override def nullSafeEval(t: Any): Any =
    BottomKHelper.compute(t.asInstanceOf[ArrayData], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.BottomKHelper.compute($c, $n, $k);"
    })

  override protected def withNewChildInternal(newChild: Expression): BottomKMd5 =
    copy(child = newChild)
}

/** Word n-grams as ONE codegen'd expression — the substrate under every
  * gram-based query (q31/q50/q51/q55/q69/q74/q80/q93...). The HOF form
  * (`transform` + `concat_ws` lambda) evaluates interpretively per element;
  * this keeps the whole sliding-window join (and the per-doc distinct,
  * when asked) in a compiled loop inside whole-stage codegen. */
case class WordNgrams(child: Expression, n: Int = 3, distinct: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_ngrams"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires n > 0")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.catalogString}")
    }
  }

  override def nullSafeEval(t: Any): Any =
    WordNgramHelper.compute(t.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.WordNgramHelper.compute($c, $n, $distinct);"
    })

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object TextExpressions {

  /** Shared builder (registry + extensions): 1 arg, fixed 8×trigram shape —
    * the Dedup contract. */
  val minhashBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1,
      s"graft_minhash requires exactly 1 argument, got ${exprs.length}")
    MinHashHex(exprs.head)
  }

  /** 1 arg, fixed mod=16 cut rate — the Curation.chunkDedup contract. */
  val cdcChunksBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1,
      s"graft_cdc_chunks requires exactly 1 argument, got ${exprs.length}")
    CdcChunks(exprs.head)
  }

  /** graft_word_ngrams(toks, n, distinct) — shape args must be literals
    * (they parameterize the generated loop). */
  val wordNgramsBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3,
      s"graft_word_ngrams requires (toks, n, distinct), got ${exprs.length} args")
    def evalLit(e: Expression, name: String): Any = {
      require(e.foldable, s"graft_word_ngrams: $name must be a literal")
      e.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
    }
    WordNgrams(exprs(0),
      evalLit(exprs(1), "n").asInstanceOf[Number].intValue(),
      evalLit(exprs(2), "distinct").asInstanceOf[Boolean])
  }

  /** graft_bottomk_md5(toks, n, k) — shape args must be literals (they
    * parameterize the generated loop). */
  val bottomKBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3,
      s"graft_bottomk_md5 requires (toks, n, k), got ${exprs.length} args")
    def evalLit(e: Expression, name: String): Any = {
      require(e.foldable, s"graft_bottomk_md5: $name must be a literal")
      e.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
    }
    BottomKMd5(exprs(0),
      evalLit(exprs(1), "n").asInstanceOf[Number].intValue(),
      evalLit(exprs(2), "k").asInstanceOf[Number].intValue())
  }

  /** 1 arg — the Dedup.simhash contract (round 16). */
  val simhashBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1,
      s"graft_simhash16 requires exactly 1 argument, got ${exprs.length}")
    SimHash16(exprs.head)
  }

  /** Register `graft_minhash` + `graft_cdc_chunks` + `graft_word_ngrams` +
    * `graft_bottomk_md5` + `graft_simhash16` on the session (idempotent;
    * public-API route, same rationale as [[VectorExpressions.register]]). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash16", simhashBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash", minhashBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cdc_chunks", cdcChunksBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_word_ngrams", wordNgramsBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bottomk_md5", bottomKBuilder, "built-in")
  }

  /** 8-hash trigram MinHash signature of a token-array column (null when
    * under 3 tokens). Callers must [[register]] first. */
  def minhash_hex(tokens: Column): Column = call_function("graft_minhash", tokens)

  /** Content-defined chunk md5s of a token-array column (empty array for
    * empty docs). Callers must [[register]] first. */
  def cdc_chunks(tokens: Column): Column = call_function("graft_cdc_chunks", tokens)

  /** Compiled word n-grams over a token-array column (empty array when
    * under `n` tokens; optional first-occurrence dedup). Callers must
    * [[register]] first. */
  def word_ngrams(tokens: Column, n: Int = 3, distinct: Boolean = false): Column =
    call_function("graft_word_ngrams", tokens,
      org.apache.spark.sql.functions.lit(n),
      org.apache.spark.sql.functions.lit(distinct))

  /** Bottom-k md5 sketch over a token-array column's distinct word n-grams
    * (ascending hex; empty array when under `n` tokens). Per-row state is
    * capped at k digests. Callers must [[register]] first. */
  def bottomk_md5(tokens: Column, n: Int = 5, k: Int = 32): Column =
    call_function("graft_bottomk_md5", tokens,
      org.apache.spark.sql.functions.lit(n),
      org.apache.spark.sql.functions.lit(k))

  /** 16-bit SimHash of a token-array column (null only for a null array).
    * Callers must [[register]] first. */
  def simhash16(tokens: Column): Column = call_function("graft_simhash16", tokens)
}

/** The per-row 16-bit SimHash loop, callable from generated code:
  * per token, h = the md5 digest's FIRST TWO BYTES as a big-endian
  * unsigned 16-bit value (= `conv(substring(md5(tok), 1, 4), 16, 10)` —
  * the exploded formulation's per-token hash, and DuckDB's identically);
  * each of h's 16 bits votes +1 when set, −1 when clear; the fingerprint
  * sets bit k iff its vote sum is strictly positive. A NULL token votes
  * −1 on every bit — exactly the exploded form's `when(NULL ≡ 1)
  * .otherwise(-1)` null-comparison semantics (split() tokens are never
  * null in practice; pinned for byte-parity anyway). Exact integer
  * votes, so the fold is order-independent — byte-identical to the
  * exploded two-aggregate formulation it replaces. */
object SimHashHelper {
  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val votes = new Array[Int](16)
    val md = java.security.MessageDigest.getInstance("MD5")
    val scratch = new Array[Byte](16)
    var t = 0
    while (t < n) {
      val tok = tokens.getUTF8String(t)
      if (tok == null) {
        var b = 0
        while (b < 16) { votes(b) -= 1; b += 1 }
      } else {
        md.update(tok.getBytes)
        md.digest(scratch, 0, 16) // fills scratch and resets the digest
        val h = ((scratch(0) & 0xff) << 8) | (scratch(1) & 0xff)
        var b = 0
        while (b < 16) {
          if (((h >> b) & 1) == 1) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 16) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** 16-bit SimHash as ONE map-side expression (round 16, guide §2.3/§4 —
  * the MinHashHex move applied to q32): the exploded formulation
  * shuffles corpus-tokens × 16 bit-rows through two keyed aggregates;
  * this keeps the whole token→votes→fingerprint loop inside the row, so
  * fingerprints come straight off the scan with no shuffle at all.
  * Kept byte-identical to the exploded form (differential-spec'd like
  * MinHashHex/CdcChunks). */
case class SimHash16(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.LongType

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_simhash16"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.catalogString}")
    }
  }

  override def nullSafeEval(t: Any): Any =
    SimHashHelper.compute(t.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashHelper.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}
