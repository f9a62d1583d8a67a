package graft.vector

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Portable.pround
import graft.functions.VectorExpressions
import graft.functions.VectorExpressions.dot_product
import graft.sources.Tables

/** Vector-similarity operators over the `embeddings` table (SURVEY U7 +
  * similarity-search north star): brute-force cosine top-k as the exact
  * baseline, sign-LSH bucketed and IVF coarse-quantized variants as the
  * scale paths, and banded-LSH embedding near-dup.
  *
  * Scale design: the probe vector is a 1-row broadcast, so brute-force is a
  * single map-side pass; global top-k everywhere is `orderBy(...).limit(k)`
  * — planned as TakeOrderedAndProject (per-partition top-k, driver merges
  * k×partitions rows) — and the rank column is derived by a window over the
  * ALREADY-LIMITED k rows only (partitioned on a constant, so no
  * partitionless WindowExec ever sees the corpus). The LSH/IVF paths prune
  * by bucket/cell equality before any distance math; near-dup candidates
  * come from a banded equi-join, never a cross join. Norms are computed
  * ONCE per vector (cos(a,b) = dot(a,b)/(norm_a*norm_b)), and the dot
  * product itself is the codegen'd [[graft.functions.DotProduct]]
  * expression.
  */
object Similarity {

  /** Dimensionality of the `embeddings.embedding` column in the test data. */
  val EmbeddingDim = 64

  /** Cast a float embedding to double for engine-portable arithmetic. */
  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Cosine similarity between two double arrays (unnormalized inputs). */
  def cosine(a: Column, b: Column): Column =
    dot_product(a, b) / (sqrt(dot_product(a, a)) * sqrt(dot_product(b, b)))

  /** Corpus with per-vector norm precomputed (one pass, no shuffle). */
  private[graft] def withNorm(spark: SparkSession, dir: String): DataFrame = {
    VectorExpressions.register(spark)
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("norm", sqrt(dot_product(col("v"), col("v"))))
  }

  /** The vec_id=0 probe embedding as driver doubles (one bounded 1-row
    * collect — the serving-side probe shape [[CellIndex.annIvfIndexed]]
    * takes; a real deployment receives the probe from the caller). */
  def probeVector(spark: SparkSession, dir: String): Seq[Double] =
    withNorm(spark, dir).filter(col("vec_id") === 0)
      .select("v").limit(1).collect().headOption
      .map(_.getSeq[Double](0)).getOrElse(Seq.empty)

  /** Global top-k of `scored` by (cos_sim desc, vec_id) with a 1-based
    * `rnk` column — WITHOUT ranking the full corpus through a partitionless
    * window. `orderBy().limit(k)` plans as TakeOrderedAndProject
    * (per-partition top-k, driver merge of k×partitions rows); only the k
    * survivors pass through the rank window, which is partitioned on a
    * constant so the single-partition stage is bounded at k rows. */
  private[vector] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val order = Seq(desc("cos_sim"), col("vec_id"))
    // partition key: TakeOrderedAndProject emits SinglePartition, so
    // spark_partition_id() is the constant 0 — a global rank — while being
    // non-foldable (a lit(0) key would be optimized away, reintroducing the
    // partitionless WindowExec this formulation exists to avoid)
    val w = Window.partitionBy(spark_partition_id()).orderBy(order: _*)
    scored.orderBy(order: _*).limit(k)
      .withColumn("rnk", row_number().over(w).cast("long"))
  }

  /** Q23 — brute-force cosine top-10 against vec_id=0's embedding: one
    * map-side pass over the corpus + TakeOrdered, no shuffle. */
  def cosineTopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val e = withNorm(spark, dir)
    val probe = e.filter(col("vec_id") === 0)
      .select(col("v").as("pv"), col("norm").as("pnorm"))
    val scored = e.crossJoin(broadcast(probe))
      .select(col("vec_id"),
        pround(dot_product(col("v"), col("pv")) / (col("norm") * col("pnorm")), 4)
          .as("cos_sim"))
    rankTopK(scored, k)
      .select("rnk", "vec_id", "cos_sim")
      .orderBy("rnk")
  }

  /** Sign-LSH bucket id: 8 deterministic "hyperplanes", each the sign of a
    * fixed coordinate difference (x[4j+1] - x[4j+2]) — engine-portable (no
    * RNG) while keeping the real LSH shape: bucket equality => candidate. */
  def lshBucket(v: Column): Column =
    (0 until 8).map { j =>
      when(element_at(v, 4 * j + 1) > element_at(v, 4 * j + 2), 1L << j).otherwise(0L)
    }.reduce(_ + _)

  /** ANN via LSH buckets: restrict the corpus to the probe's bucket, then
    * exact cosine top-10 within it. */
  def annLsh(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val e = withNorm(spark, dir).withColumn("bucket", lshBucket(col("v")))
    val probe = e.filter(col("vec_id") === 0)
      .select(col("v").as("pv"), col("norm").as("pnorm"), col("bucket").as("pbucket"))
    val scored = e.crossJoin(broadcast(probe))
      .filter(col("bucket") === col("pbucket"))
      .select(col("vec_id"), col("bucket"),
        pround(dot_product(col("v"), col("pv")) / (col("norm") * col("pnorm")), 4)
          .as("cos_sim"))
    rankTopK(scored, k)
      .select("rnk", "vec_id", "bucket", "cos_sim")
      .orderBy("rnk")
  }

  // ---- IVF: trained coarse quantization ------------------------------------

  /** Assign each (vec_id, v, norm, …) row to its max-cosine centroid from a
    * driver-held codebook — one broadcast-literal map-side pass, no join, no
    * window. Ties break to the lowest centroid id. */
  private[graft] def assignCells(e: DataFrame,
      cb: Seq[(Int, Seq[Double])]): DataFrame = {
    val withCos = cb.foldLeft(e) { case (df, (cid, cv)) =>
      // sequential fold == list_dot_product / DotProduct evaluation order
      val cnorm = math.sqrt(cv.foldLeft(0.0)((acc, x) => acc + x * x))
      // zero-norm vector or centroid ⇒ NaN cosine. In Spark SQL, NaN = NaN
      // evaluates TRUE and NaN sorts GREATER than any double — so an
      // unguarded NaN would win greatest() and claim the cell, not drop the
      // row. Pin NaN below any real cosine so it resolves to the lowest
      // centroid id, the same place the oracle's ORDER BY puts it.
      df.withColumn(s"c_cos_$cid",
        nanvl(dot_product(col("v"), lit(cv.toArray)) / (col("norm") * lit(cnorm)),
          lit(-2.0)))
    }
    val best = greatest(cb.map { case (cid, _) => col(s"c_cos_$cid") }: _*)
    val cell = cb.sortBy(_._1).foldRight(lit(-1)) { case ((cid, _), els) =>
      when(col(s"c_cos_$cid") === best, lit(cid)).otherwise(els)
    }
    withCos.withColumn("cell", cell)
      .select(e.columns.map(col) :+ col("cell"): _*)
  }

  /** Deterministic Lloyd k-means over the corpus: init = the vectors with
    * vec_id 1..k (fixed, seedless), `iters` assign/update rounds, cosine
    * assignment, and FIXED-POINT mean updates — per-dimension sums are taken
    * over `floor(x·10⁶ + 0.5)` BIGINTs so the update is order-independent
    * and bit-identical in any engine (IEEE division of exact integers), the
    * same rule that makes the money aggregates portable. Empty cells keep
    * their previous centroid. Centroids are k×dim tiny, so the per-round
    * driver collect is the standard distributed-k-means shape (assignment
    * itself never leaves the executors). */
  /** Session-scoped memo for [[trainIvfCodebook]]: the training is fully
    * deterministic in (corpus dir, k, iters) — fixed seedless init,
    * fixed-point order-independent updates — so q41/q67/q75 sharing one
    * session (the bench, the verify run, a user notebook) train ONCE
    * instead of three times. Keyed weakly by the session reference; the
    * values are k×dim driver-side floats (bytes, never corpus-sized) that
    * reference no session, so a dropped session's entry IS collectable on
    * its own — the property the DataFrame memos gained in round 8 via
    * [[graft.SessionMemos]]. Assumes a dir's parquet is immutable within a
    * session (the repo's testdata contract). */
  private val codebookCache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[(String, Int, Int), Seq[(Int, Seq[Double])]]]()

  private[graft] def cachedCodebook(spark: SparkSession, dir: String,
      e: DataFrame, k: Int = 4, iters: Int = 3): Seq[(Int, Seq[Double])] = {
    val perSession = codebookCache.synchronized {
      codebookCache.computeIfAbsent(spark,
        _ => scala.collection.concurrent.TrieMap.empty)
    }
    // synchronized: getOrElseUpdate is not atomic on TrieMap; a racing
    // double-train only wastes work here (driver-side value), but the
    // serialization keeps all four memos on one discipline
    perSession.synchronized {
      perSession.getOrElseUpdate((dir, k, iters), trainIvfCodebook(e, k, iters))
    }
  }

  private[graft] def trainIvfCodebook(e: DataFrame, k: Int = 4,
      iters: Int = 3): Seq[(Int, Seq[Double])] = {
    var cb: Seq[(Int, Seq[Double])] = e.filter(col("vec_id").between(1, k))
      .select(col("vec_id").cast("int"), col("v"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_._1).toSeq
    for (_ <- 0 until iters) {
      val sums = assignCells(e, cb)
        .select(col("cell"), posexplode(col("v")).as(Seq("i", "x")))
        .groupBy("cell", "i")
        .agg(sum(floor(col("x") * lit(1000000.0) + lit(0.5))).as("s"),
          count(lit(1)).as("cnt"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      val byCell = sums.groupBy(_._1)
      cb = cb.map { case (cid, prev) =>
        byCell.get(cid) match {
          case Some(rows) =>
            val byDim = rows.map(t => t._2 -> (t._3, t._4)).toMap
            (cid, prev.indices.map { i =>
              val (s, n) = byDim(i)
              fixedMean(s, n)
            })
          case None => (cid, prev)
        }
      }
    }
    cb
  }

  /** ANN via IVF cells with a TRAINED codebook: deterministic k-means
    * ([[trainIvfCodebook]]: fixed init, fixed-point updates) replaces the
    * round-1 stand-in centroids; each vector is assigned to its max-cosine
    * centroid in one broadcast-literal map pass, and the probe searches its
    * `nprobe` closest cells (multi-probe — the standard IVF recall lever).
    * The probe-cell choice is a k-row driver computation over the codebook;
    * the corpus-side work is one cell-pruned map pass — the
    * coarse-quantization shape that at 100 TB becomes partition-by-cell
    * layout with per-cell scans. */
  def annIvf(spark: SparkSession, dir: String, k: Int = 10,
      nprobe: Int = 2): DataFrame = {
    val e = withNorm(spark, dir).localCheckpoint()
    val cb = cachedCodebook(spark, dir, e)
    val assigned = assignCells(e, cb)
      .select(col("vec_id"), col("v"), col("norm"), col("cell").cast("long").as("cell"))
    val probeRows = e.filter(col("vec_id") === 0).select(col("v"), col("norm"))
      .limit(1).collect()
    if (probeRows.isEmpty) {
      // no probe vector in the corpus: empty result with the contract schema
      // (the round-1 broadcast formulation degraded the same way)
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("rnk", LongType),
        StructField("vec_id", e.schema("vec_id").dataType),
        StructField("cell", LongType),
        StructField("cos_sim", DoubleType)))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
    val pv = probeRows.head.getSeq[Double](0)
    val pnorm = probeRows.head.getDouble(1)
    // same sequential-fold arithmetic as DotProduct/list_dot_product, so
    // the oracle's SQL probe-cell ranking lands on identical doubles
    val probeCells = cb.map { case (cid, cv) =>
        val cnorm = math.sqrt(cv.foldLeft(0.0)((a, x) => a + x * x))
        var d = 0.0
        var i = 0
        while (i < cv.length) { d += pv(i) * cv(i); i += 1 }
        (cid, d / (pnorm * cnorm))
      }.sortBy { case (cid, c) => (-c, cid) }.take(nprobe).map(_._1.toLong)
    val scored = assigned
      .filter(col("cell").isin(probeCells: _*))
      .select(col("vec_id"), col("cell"),
        pround(dot_product(col("v"), lit(pv.toArray)) / (col("norm") * lit(pnorm)), 4)
          .as("cos_sim"))
    rankTopK(scored, k)
      .select("rnk", "vec_id", "cell", "cos_sim")
      .orderBy("rnk")
  }

  /** Q75 — embedding-space CLUSTER BALANCE + inverse-propensity resample
    * weights: assign every vector to its trained IVF cell
    * ([[trainIvfCodebook]] — the SAME codebook q41 searches with), then
    * report per-cell population, corpus share, and the inverse-frequency
    * weight `N/(k·n_cell)` a balanced sampler would apply — the
    * embedding-space analogue of q53's domain-mix reweighting, used to keep
    * over-crawled semantic regions from dominating a training mix. Plan
    * shape: one broadcast-literal map pass (cell assignment), one tiny
    * k-row aggregate joined back by broadcast — the corpus is scanned once
    * and nothing wider than k rows ever reaches the driver besides the
    * codebook training itself. `epochs` (how many passes of a cell fill the
    * uniform quota) is an exact integer ceiling, so the only floats are
    * single divisions of exact integers. */
  def clusterBalance(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(spark, dir).localCheckpoint()
    val k = 4
    val cb = cachedCodebook(spark, dir, e, k = k)
    val assigned = assignCells(e, cb)
      .select(col("vec_id"), col("cell").cast("long").as("cell"))
    val tot = assigned.agg(count(lit(1)).as("n_total"))
    assigned.groupBy("cell")
      .agg(count(lit(1)).as("n_vecs"))
      .crossJoin(broadcast(tot))
      .select(col("cell"), col("n_vecs"), col("n_total"),
        (col("n_vecs") * lit(1.0) / col("n_total")).as("share"),
        (col("n_total") * lit(1.0) / (lit(k) * col("n_vecs"))).as("weight"),
        expr(s"(n_total + $k * n_vecs - 1) div ($k * n_vecs)").as("epochs"))
      .orderBy("cell")
  }

  /** Hybrid retrieval (multimodal join): filter the document corpus by a
    * metadata predicate (lang), join to the embedding store on
    * doc_id = vec_id, then exact cosine top-k against the probe — the
    * filter-then-ANN shape of production RAG retrieval. The metadata filter
    * prunes before any vector math; at scale the join is co-partitioned on
    * the shared id. */
  def hybridSearch(spark: SparkSession, dir: String, lang: String = "en",
      k: Int = 10): DataFrame = {
    val e = withNorm(spark, dir)
    val docs = Tables.documents(spark, dir)
      .filter(col("lang") === lang).select(col("doc_id"), col("lang"))
    val probe = e.filter(col("vec_id") === 0)
      .select(col("v").as("pv"), col("norm").as("pnorm"))
    val scored = e.join(docs, e("vec_id") === docs("doc_id"))
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), col("lang"),
        pround(dot_product(col("v"), col("pv")) / (col("norm") * col("pnorm")), 4)
          .as("cos_sim"))
    rankTopK(scored, k)
      .select("rnk", "vec_id", "lang", "cos_sim")
      .orderBy("rnk")
  }

  /** Q79 — dominant PRINCIPAL DIRECTION of the embedding corpus by
    * distributed power iteration, plus per-vector projections and outlier
    * flags: the "all-but-the-top" / dominant-axis diagnostic a curation
    * pipeline runs on an embedding store (a single direction soaking up
    * variance usually marks a batch effect, an encoder artifact, or an
    * outlier cluster worth inspecting before similarity search trusts the
    * space).
    *
    * Each Lloyd-style round is ONE corpus pass — the matvec `Σᵢ dᵢ·xᵢ`
    * per dimension and the scalar `Σᵢ dᵢ` ride the same keyed aggregate
    * (any dimension group sums every vector's d exactly once) — with only
    * dim-sized results reaching the driver — the same distributed-linear-algebra
    * shape as [[trainIvfCodebook]], and at 100 TB the same story: executors
    * do the O(n·dim) work, the driver folds a 64-float vector. Centering
    * is applied by LINEARITY ((x−m)·w = x·w − m·w), so the centered corpus
    * is never materialized and the hot path stays one codegen'd dot per
    * row.
    *
    * Determinism: the corpus mean and every per-round accumulation go
    * through fixed-point `floor(·10⁶+0.5)` BIGINTs (order-independent — the
    * k-means rule); the init vector [0.125]⁶⁴ is exactly representable and
    * exactly unit-norm; all remaining float ops are single IEEE
    * mul/div/sqrt folds the DuckDB oracle replicates tree-for-tree in
    * unrolled round CTEs. The outlier cut `|d| > 2·√λ` (λ = the Rayleigh
    * mean Σd²/n, fixed-point) compares identically-derived doubles. */
  def principalDirection(spark: SparkSession, dir: String,
      iters: Int = 3): DataFrame = {
    val dim = EmbeddingDim
    val e = withNorm(spark, dir).select(col("vec_id"), col("v")).localCheckpoint()
    val fix = lit(1000000.0)
    val meanRows = e.select(posexplode(col("v")).as(Seq("i", "x")))
      .groupBy("i")
      .agg(sum(floor(col("x") * fix + lit(0.5))).as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val mean = Array.tabulate(dim) { j =>
      val row = meanRows.find(_._1 == j).get
      row._2.toDouble / (row._3.toDouble * 1000000.0)
    }
    // sequential fold == list_dot_product evaluation order (oracle parity)
    def seqDot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var j = 0
      while (j < a.length) { acc += a(j) * b(j); j += 1 }
      acc
    }
    var w = Array.fill(dim)(0.125)
    for (_ <- 0 until iters) {
      val mw = seqDot(mean, w)
      val d = dot_product(col("v"), lit(w)) - lit(mw)
      // ONE corpus action per round (round-5: was matvec + a separate
      // scalar-t job): every exploded group i holds each vector exactly
      // once, so Σ floor(d·fix+0.5) within ANY group equals the global t —
      // the scalar rides along in the same keyed aggregate, same
      // fixed-point order-independent sum, identical value.
      val rows = e.select(d.as("d"), posexplode(col("v")).as(Seq("i", "x")))
        .groupBy("i")
        .agg(sum(floor(col("d") * col("x") * fix + lit(0.5))).as("s"),
          sum(floor(col("d") * fix + lit(0.5))).as("t"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      val sRows = rows.map(r => r._1 -> r._2).toMap
      // t is identical in every group ONLY under the fixed-dim contract
      // (each vector appears in each group exactly once) — assert it, so a
      // ragged corpus fails loudly instead of silently skewing w via
      // whichever group collect() happened to order first
      val ts = rows.map(_._3).distinct
      require(ts.length == 1,
        s"ragged embedding dims: per-group scalar t differs across ${ts.length} values")
      val t = ts.head
      val u = Array.tabulate(dim) { j =>
        sRows(j).toDouble / 1000000.0 - mean(j) * (t.toDouble / 1000000.0)
      }
      val norm = math.sqrt(seqDot(u, u))
      w = u.map(_ / norm)
    }
    val dCol = dot_product(col("v"), lit(w)) - lit(seqDot(mean, w))
    val lam = e.agg(
      sum(floor(dCol * dCol * fix + lit(0.5))).as("l2"),
      count(lit(1)).as("cnt"))
    e.crossJoin(broadcast(lam))
      .select(col("vec_id"), pround(dCol, 6).as("proj"),
        (abs(dCol) > lit(2.0) *
          sqrt(col("l2").cast("double") / (col("cnt").cast("double") * fix)))
          .cast("long").as("is_outlier"))
      .orderBy("vec_id")
  }

  // ---- Banded sign-LSH near-dup --------------------------------------------

  /** Random-hyperplane count / band width for near-dup blocking: 8 bands of
    * 8 bits. A pair at cosine ≥0.95 agrees per-bit with p ≈ 0.9, so it
    * collides in ≥1 band with p ≈ 0.99, while an unrelated pair (cos ≈ 0)
    * survives banding with p ≈ 1-(1-2⁻⁸)⁸ ≈ 3% — real pruning in the
    * regime near-dup detection targets. */
  val NearDupBits = 64
  val NearDupBandSize = 8

  /** Deterministic ±1 hyperplane signs: sign(j,i) = +1 iff the first hex
    * nibble of md5("h<j>:<i>") is even — seedless and reproducible in any
    * engine (the oracle embeds the same literals). One rule, owned by
    * [[VectorExpressions.signMatrix]] so the fused expression and any
    * composed-form consumer can never drift. */
  def signHyperplanes(nbits: Int, dim: Int): Array[Array[Double]] =
    VectorExpressions.signMatrix(nbits, dim)

  /** Banded sign-LSH candidate pairs over a (vec_id, v, …) frame: project
    * each vector onto `nbits` fixed hyperplanes, pack sign bits into
    * nbits/bandSize band values, equi-join on (band_id, band_val) — the
    * shuffle is keyed by band bucket, the pair count is bounded by bucket
    * sizes, and no cross join ever materializes. The whole nbits×dim
    * multiply-add grid + bit packing is ONE codegen'd expression
    * ([[graft.functions.LshBands]], bit-identical to the former composed
    * `graft_dot`-per-hyperplane form — its scaladoc carries the proof
    * obligations; a differential spec pins them). */
  def bandedCandidates(e: DataFrame, nbits: Int = NearDupBits,
      bandSize: Int = NearDupBandSize, dim: Int = EmbeddingDim): DataFrame = {
    VectorExpressions.register(e.sparkSession)
    val bands = e.select(col("vec_id"),
      posexplode(VectorExpressions.lsh_bands(col("v"), nbits, bandSize, dim))
        .as(Seq("band_id", "band_val")))
    bands.as("x").join(bands.as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.band_val") === col("y.band_val") &&
        col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
  }

  /** Session-scoped memo for the SCORED banded candidate pairs — the shape
    * q34 (near-dup top-k), q66 (semantic clusters), and q72 (kNN graph)
    * all start from: `bandedCandidates` over the corpus, both vector sides
    * joined back, one RAW-double cosine per pair. Deterministic in the
    * corpus dir (seedless md5 hyperplanes, fixed bands), so one session
    * computes it once — the ccLabels/pairs/codebook lifecycle: the
    * (vec_a, vec_b, cos_raw) table re-checkpoints onto retained blocks
    * (bounded by band collisions, never corpus mass) and the corpus-vector
    * intermediate is released once it materializes. Consumers derive their
    * own views: q34/q72 apply `pround(cos_raw, 4)` (bit-identical to
    * rounding inline), q66 thresholds the raw double. */
  private val ScoredPairsMemo = "vector.scoredPairs"

  /** Drop this session's memo entries (scored pairs + codebooks) — the
    * cache-map half of an EXPLICIT eviction (harnesses re-measuring cold
    * paths); pair with [[graft.Checkpoints.evictSessionMemos]] to free
    * retained blocks. Dropped sessions no longer need this: the scored-
    * pairs carrier is session-free ([[graft.SessionMemos]]) and the
    * codebook values are driver-side floats, so both registries'
    * weak keys clear on GC. */
  def evictMemos(spark: SparkSession): Unit = {
    graft.SessionMemos.evict(spark, ScoredPairsMemo)
    codebookCache.synchronized { codebookCache.remove(spark) }
  }

  /** Memoized via [[graft.SessionMemos]] (round 8 — session-free carrier,
    * so a dropped session's entry is actually collectable). */
  private[vector] def scoredBandedPairs(spark: SparkSession,
      dir: String): DataFrame =
    graft.SessionMemos.getOrBuild(spark, ScoredPairsMemo, dir) {
      val sc = spark.sparkContext
      val before = sc.getPersistentRDDs.keySet
      val scored0 = computeScoredBandedPairs(spark, dir)
      val preFinal = sc.getPersistentRDDs.keySet
      val scored = scored0.localCheckpoint()
      graft.Checkpoints.retainFor(spark, graft.Checkpoints.pinnedSince(sc, preFinal))
      graft.Checkpoints.release(sc, (preFinal.toSet -- before))
      scored
    }

  // private[graft] so PlanSpec pins the banded-join shape on the builder —
  // consumer plans only show the memoized scored-pair table
  private[graft] def computeScoredBandedPairs(spark: SparkSession,
      dir: String): DataFrame = {
    val e = withNorm(spark, dir).localCheckpoint()
    bandedCandidates(e)
      .join(e.as("a"), col("vec_a") === col("a.vec_id"))
      .join(e.as("b"), col("vec_b") === col("b.vec_id"))
      .select(col("vec_a"), col("vec_b"),
        (dot_product(col("a.v"), col("b.v")) /
          (col("a.norm") * col("b.norm"))).as("cos_raw"))
  }

  /** Embedding near-dup, LSH-blocked (the 100 TB-shaped pipeline): banded
    * candidates → exact cosine verification → top-k pairs, reading the
    * session-memoized [[scoredBandedPairs]]. The exact quadratic form
    * survives as [[nearDupPairsExact]] for small-corpus reference and the
    * recall spec. */
  def nearDupPairs(spark: SparkSession, dir: String, k: Int = 20): DataFrame =
    scoredBandedPairs(spark, dir)
      .select(col("vec_a"), col("vec_b"),
        pround(col("cos_raw"), 4).as("cos_sim"))
      .orderBy(desc("cos_sim"), col("vec_a"), col("vec_b"))
      .limit(k)

  /** [[nearDupPairs]] over an arbitrary (vec_id, v, norm) frame — reused by
    * the planted-near-dup recall spec. */
  def nearDupPairsOn(e: DataFrame, k: Int,
      dim: Int = EmbeddingDim): DataFrame = {
    val cand = bandedCandidates(e, dim = dim)
    cand.join(e.as("a"), col("vec_a") === col("a.vec_id"))
      .join(e.as("b"), col("vec_b") === col("b.vec_id"))
      .select(col("vec_a"), col("vec_b"),
        pround(dot_product(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm")), 4)
          .as("cos_sim"))
      .orderBy(desc("cos_sim"), col("vec_a"), col("vec_b"))
      .limit(k)
  }

  /** Q67 — retrieval-quality evaluation (measure, don't guess): recall@k
    * of each ANN path against the brute-force ground truth, computed
    * in-plan — the report a pipeline publishes before trusting an index at
    * scale. Each method's top-k (already tiny: k rows each) semi-joins the
    * exact top-k; the counts and the k-denominator division are exact, so
    * the score is engine-deterministic. Cost is the three underlying
    * searches — the evaluation itself adds two k-row joins. */
  def annRecall(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    // materialize the k-row ground truth ONCE, as a driver-side id list:
    // embedded lazily it would re-run the brute-force corpus scan in both
    // union branches, and a localCheckpoint would pin blocks the operator
    // never gets a safe point to release (the result is lazy). k ids are
    // bytes — the membership check becomes a map-side IN filter, no join.
    val truthIds = cosineTopK(spark, dir, k).select(col("vec_id"))
      .collect().map(_.getLong(0)).toSeq
    val inTruth =
      if (truthIds.isEmpty) lit(false) else col("vec_id").isin(truthIds: _*)
    def score(method: String, got: DataFrame): DataFrame =
      got.select(col("vec_id")).filter(inTruth)
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(method).as("method"), lit(k.toLong).as("k"),
          col("n_hits"), (col("n_hits") / lit(k.toDouble)).as("recall"))
    score("ivf", annIvf(spark, dir, k))
      .unionByName(score("lsh", annLsh(spark, dir, k)))
      .orderBy("method")
  }

  /** Q66 — semantic dedup cluster RESOLUTION (the SemDeDup-style action
    * step on embeddings, completing the symmetry with the text side's
    * q49/q61): banded sign-LSH candidates are verified by exact cosine
    * against `minCos`, surviving pairs become edges, and
    * [[graft.text.Dedup.connectedComponents]] (pointer doubling, O(log
    * diameter) rounds) resolves clusters — every vector gets
    * (cluster_rep, cluster_size, keep), min-vec_id-wins. The cosine
    * threshold compares the RAW double (identical association order in
    * both engines — the same expression q34 hash-verifies), so the edge
    * set is engine-exact. `minCos` defaults low for this synthetic corpus
    * (random vectors top out near 0.47; production semantic dedup sits at
    * ~0.95) — the plan shape, not the threshold, is the operator. */
  def semanticClusters(spark: SparkSession, dir: String,
      minCos: Double = 0.4): DataFrame = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    // edges from the session-memoized scored candidates: the banded join +
    // per-pair cosine is shared with q34/q72; only the threshold filter,
    // the CC resolution, and the label windows are this query's own work
    val edges = scoredBandedPairs(spark, dir)
      .filter(col("cos_raw") >= minCos)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
      .localCheckpoint()
    val mine = graft.Checkpoints.pinnedSince(sc, before)
    val (labels, _) = graft.text.Dedup.connectedComponents(edges)
    graft.Checkpoints.release(sc, mine)
    val nodes = Tables.embeddings(spark, dir).select(col("vec_id"))
    val wholeCluster = Window.partitionBy("cluster_rep")
    nodes
      .join(labels.withColumnRenamed("doc_id", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("label"), col("vec_id")).as("cluster_rep"))
      .withColumn("cluster_size", count(lit(1)).over(wholeCluster))
      .select(col("vec_id"), col("cluster_rep"), col("cluster_size"),
        (col("vec_id") === col("cluster_rep")).cast("long").as("keep"))
      .orderBy("vec_id")
  }

  /** [[semanticClusters]] over an arbitrary (vec_id, v, norm) frame —
    * reused by the planted-duplicate cluster spec. `nodes` overrides where
    * the output's vector-id universe is read from (defaults to `e`). */
  def semanticClustersOn(e: DataFrame, minCos: Double,
      dim: Int = EmbeddingDim, nodes: Option[DataFrame] = None): DataFrame = {
    val sc = e.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val edges = bandedCandidates(e, dim = dim)
      .join(e.as("a"), col("vec_a") === col("a.vec_id"))
      .join(e.as("b"), col("vec_b") === col("b.vec_id"))
      .filter(dot_product(col("a.v"), col("b.v")) /
        (col("a.norm") * col("b.norm")) >= minCos)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
      .localCheckpoint()
    // the edge list is an intermediate: dead once CC's labels materialize
    val mine = graft.Checkpoints.pinnedSince(sc, before)
    val (labels, _) = graft.text.Dedup.connectedComponents(edges)
    graft.Checkpoints.release(sc, mine)
    val wholeCluster = Window.partitionBy("cluster_rep")
    nodes.getOrElse(e.select(col("vec_id")))
      .select(col("vec_id"))
      .join(labels.withColumnRenamed("doc_id", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("label"), col("vec_id")).as("cluster_rep"))
      .withColumn("cluster_size", count(lit(1)).over(wholeCluster))
      .select(col("vec_id"), col("cluster_rep"), col("cluster_size"),
        (col("vec_id") === col("cluster_rep")).cast("long").as("keep"))
      .orderBy("vec_id")
  }

  /** Q72 — approximate kNN GRAPH construction: each vector's top-k
    * neighbors among its banded sign-LSH candidates — the all-vectors form
    * of ANN (the probe queries q23/q33/q41 answer for ONE vector), and the
    * substrate semantic clustering, graph-based index builds (HNSW-style),
    * and diversity sampling all start from.
    *
    * Scale shape: candidates come from the same (band_id, band_val)
    * equi-join as q34 — never all-pairs; the per-vector top-k is a rank
    * window KEYED by the source vector (partition sizes bounded by band
    * collision counts, not corpus size), which Spark plans with a
    * WindowGroupLimit pushdown so only k survivors per vector cross the
    * final shuffle. Vectors with no band-mates have no neighbors and are
    * absent, as in any LSH-bucketed kNN build. */
  def knnGraph(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    // each undirected pair is scored ONCE (cosine is symmetric) by the
    // session-memoized scored-candidates table, then mirrored — half the
    // join probes of scoring both directions, and the memo's checkpoint is
    // what keeps the union from re-executing the joins per branch
    val scoredPairs = scoredBandedPairs(spark, dir)
      .select(col("vec_a"), col("vec_b"),
        pround(col("cos_raw"), 4).as("cos_sim"))
    val sym = scoredPairs
      .select(col("vec_a").as("src"), col("vec_b").as("dst"), col("cos_sim"))
      .union(scoredPairs
        .select(col("vec_b").as("src"), col("vec_a").as("dst"), col("cos_sim")))
    val w = Window.partitionBy("src").orderBy(desc("cos_sim"), col("dst"))
    sym.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("src", "rnk", "dst", "cos_sim")
      .orderBy("src", "rnk")
  }

  /** Q73 — MMR (maximal marginal relevance) diversity-aware selection: from
    * the probe's top-`poolSize` candidates, greedily pick `k` results
    * maximizing `λ·relevance − (1−λ)·max-similarity-to-already-selected` —
    * the rerank step RAG retrieval and few-shot example selection run so the
    * result set isn't k near-copies of the best hit.
    *
    * Scale shape: candidate generation is the distributed part (one
    * map-side scored pass + TakeOrderedAndProject, exactly q23's plan) and
    * is where 100 TB lives; the greedy rerank runs on the driver over the
    * collected `poolSize` rows — the standard production shape (rerankers
    * run on the query node over a bounded candidate set), the same
    * bounded-driver-step pattern as the IVF trainer's k×dim collect. The
    * greedy loop is O(k·poolSize) driver flops on tens of rows.
    *
    * Determinism: relevance is the Spark-computed pr4 cosine; pairwise
    * similarities replay the same sequential-fold dot product and pr4 rule
    * in driver Scala (bit-identical to `list_dot_product`); each score is
    * two IEEE multiplies and a subtraction of identical doubles, ties break
    * to the lowest vec_id — so the oracle's unrolled step-CTEs land on the
    * same selections. */
  def mmrSelect(spark: SparkSession, dir: String, k: Int = 5,
      poolSize: Int = 20, lambda: Double = 0.7): DataFrame = {
    val e = withNorm(spark, dir)
    val probe = e.filter(col("vec_id") === 0)
      .select(col("v").as("pv"), col("norm").as("pnorm"))
    val cands = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(probe))
      .select(col("vec_id"), col("v"), col("norm"),
        pround(dot_product(col("v"), col("pv")) / (col("norm") * col("pnorm")), 4)
          .as("rel"))
      .orderBy(desc("rel"), col("vec_id"))
      .limit(poolSize)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2),
        r.getDouble(3)))
    mmrGreedy(spark, cands, k, lambda)
  }

  /** The greedy MMR rerank over a collected candidate pool — ONE
    * definition shared by the ad-hoc q73 and
    * [[graft.vector.CellIndex.mmrSelectIndexed]], so equal pools give
    * verbatim-equal selections by construction. Driver-side O(k·poolSize)
    * flops over tens of rows (the production reranker shape — see
    * [[mmrSelect]]'s scaladoc). Pool tuples: (vec_id, vector, norm,
    * pr4 relevance). */
  private[vector] def mmrGreedy(spark: SparkSession,
      cands: Array[(Long, Array[Double], Double, Double)], k: Int,
      lambda: Double): DataFrame = {
    def pr4d(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0
    def cos(a: (Long, Array[Double], Double, Double),
        b: (Long, Array[Double], Double, Double)): Double = {
      // sequential fold == DotProduct / list_dot_product evaluation order
      var d = 0.0
      var i = 0
      while (i < a._2.length) { d += a._2(i) * b._2(i); i += 1 }
      pr4d(d / (a._3 * b._3))
    }
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Double, Double)]
    var remaining = cands.toList
    while (selected.length < k && remaining.nonEmpty) {
      val picked = remaining.map { c =>
        val maxSim =
          if (selected.isEmpty) 0.0
          else selected.map(s => cos(c, cands.find(_._1 == s._2).get)).max
        (c, maxSim, lambda * c._4 - (1.0 - lambda) * maxSim)
      }.minBy { case (c, _, score) => (-score, c._1) }
      selected += ((selected.length + 1L, picked._1._1, picked._1._4,
        picked._2, picked._3))
      remaining = remaining.filterNot(_._1 == picked._1._1)
    }
    val s = spark
    import s.implicits._
    selected.toSeq
      .toDF("sel_rank", "vec_id", "relevance", "max_sim", "mmr_score")
      .orderBy("sel_rank")
  }

  /** Q57 — int8 embedding quantization (the storage-compression step a
    * vector store runs before indexing: min/max range per vector, 255-level
    * codes): emits the quantization params and a deterministic fingerprint
    * + order-independent checksum of the codes. Pure per-row expressions —
    * the 100 TB plan is a map over the scan. Codes use the portable
    * `floor(x·k + 0.5)` rule so any engine reproduces them bit-exactly;
    * constant vectors (range 0) code to all-zeros. */
  def embedQuantize(spark: SparkSession, dir: String): DataFrame = {
    VectorExpressions.register(spark)
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("vmin", array_min(col("v")))
      .withColumn("vmax", array_max(col("v")))
      .withColumn("scale", (col("vmax") - col("vmin")) / lit(255.0))
    val codes = transform(col("v"), x =>
      when(col("scale") === 0.0, lit(0L))
        .otherwise(floor((x - col("vmin")) / col("scale") + lit(0.5))))
    e.withColumn("q", codes)
      .select(
        col("vec_id"), col("vmin"), col("vmax"), col("scale"),
        expr("aggregate(q, 0L, (acc, x) -> acc + x)").as("q_checksum"),
        md5(concat_ws(",", transform(col("q"), _.cast("string")))).as("q_fp"))
      .orderBy("vec_id")
  }

  /** q82: per-label embedding centroid drift between two corpus snapshots
    * (vec_id parity split — the same snapshot convention as q64/q76). The
    * embedding-space drift monitor a training pipeline runs between data
    * refreshes: for each label, the L2 distance and cosine between the
    * base-snapshot and current-snapshot centroids, flagging labels whose
    * semantic center moved.
    *
    * Determinism (engine parity): per-component sums go through the
    * fixed-point 10⁻⁶ rule — integer adds commute, so shuffle order can't
    * perturb a centroid. The cross-snapshot difference is kept as the
    * EXACT integer sₐ·n_b − s_b·nₐ (common-denominator form — no double
    * subtraction of two roundings), and every Σ-of-products runs as a
    * sequential fold over an i-ordered array via [[graft.functions.DotProduct]]
    * — the same left-to-right association as the oracle's list_dot_product.
    * Cosine is computed directly on the fixed-point sums (scale-invariant).
    *
    * Scale: one shuffle to (label, i) with map-side combine — partial
    * state is labels×dims integer cells regardless of corpus size — then a
    * per-label reshape of those tiny aggregates. At 100 TB the cost is the
    * corpus scan; the reduce side is ~640 rows.
    *
    * Reference: data/quality/expectations.py's distribution-drift checks,
    * lifted to embedding space. */
  def centroidDrift(spark: SparkSession, dir: String): DataFrame = {
    VectorExpressions.register(spark)
    centroidDriftOn(
      Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v")))
  }

  /** Seam for [[centroidDrift]]: input needs (vec_id, label, v: array<double>). */
  private[graft] def centroidDriftOn(e: DataFrame): DataFrame = {
    VectorExpressions.register(e.sparkSession)
    val fix = 1000000.0
    val comp = e
      .select(col("label"), (col("vec_id") % 2).as("snap"),
        posexplode(col("v")).as(Seq("i", "x")))
      .groupBy("label", "i")
      .agg(
        sum(when(col("snap") === 0, floor(col("x") * fix + lit(0.5)))
          .otherwise(lit(0L))).as("sa"),
        sum(when(col("snap") === 1, floor(col("x") * fix + lit(0.5)))
          .otherwise(lit(0L))).as("sb"),
        sum(when(col("snap") === 0, lit(1L)).otherwise(lit(0L))).as("na"),
        sum(when(col("snap") === 1, lit(1L)).otherwise(lit(0L))).as("nb"))
    val per = comp
      .groupBy("label")
      .agg(
        sort_array(collect_list(struct(col("i"), col("sa"), col("sb")))).as("arr"),
        max(col("na")).as("n_base"), max(col("nb")).as("n_cur"))
      .withColumn("la", expr("transform(arr, t -> CAST(t.sa AS DOUBLE))"))
      .withColumn("lb", expr("transform(arr, t -> CAST(t.sb AS DOUBLE))"))
      .withColumn("lnum",
        expr("transform(arr, t -> CAST(t.sa * n_cur - t.sb * n_base AS DOUBLE))"))
    val populated = col("n_base") > 0 && col("n_cur") > 0
    // an all-zero centroid (padding vectors) makes the cosine 0/0: Spark
    // would fold the NaN to 0.0 under pround while DuckDB's /0 yields NULL
    // — guard both engines to NULL on zero-norm centroids
    val cosDefined = populated &&
      dot_product(col("la"), col("la")) > 0.0 &&
      dot_product(col("lb"), col("lb")) > 0.0
    per.select(
      col("label"), col("n_base"), col("n_cur"),
      when(populated,
        pround(sqrt(dot_product(col("lnum"), col("lnum"))) /
          (col("n_base") * col("n_cur") * lit(fix)), 6)).as("l2_drift"),
      when(cosDefined,
        pround(dot_product(col("la"), col("lb")) /
          (sqrt(dot_product(col("la"), col("la"))) *
            sqrt(dot_product(col("lb"), col("lb")))), 6)).as("cos_centroid"))
      .orderBy("label")
  }

  /** Q85 — per-dimension embedding feature profile: mean / population-std /
    * min / max per coordinate — the embedding-QA pass that catches dead
    * dimensions (std ≈ 0), saturated ones (extreme min/max), and
    * mean-offset drift before vectors feed ANN indexing or training.
    * Fixed-point 10⁻⁶ first and second moments (order-free integer adds);
    * the variance is assembled from the two integer sums with the SAME
    * expression shape as the oracle, so the doubles agree bit-for-bit.
    * Plan shape: one map-side-combined aggregate keyed by dimension —
    * reduce state is `dim` cells regardless of corpus size. */
  /** Shared q85/q90 per-dimension fixed-point moments: (i, n, s1, s2, mn,
    * mx, mean_raw, std_raw). ONE definition so the oracle-parity expression
    * shape can never drift between the two consumers. The variance is
    * clamped at 0 before the sqrt: fixed-point rounding can push a
    * constant dimension's `s2/(n·10⁶) − mean²` to ≈ −10⁻¹², where Spark's
    * sqrt returns NaN but DuckDB's ABORTS the query — the clamp (mirrored
    * as GREATEST in the oracle) makes dead dims a clean σ = 0 everywhere. */
  private def perDimMoments(e: DataFrame): DataFrame = {
    val fix = 1000000.0
    e.select(posexplode(col("v")).as(Seq("i", "x")))
      .groupBy("i")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("x") * fix + lit(0.5))).as("s1"),
        sum(floor(col("x") * col("x") * fix + lit(0.5))).as("s2"),
        min(col("x")).as("mn"), max(col("x")).as("mx"))
      .withColumn("mean_raw", col("s1") / (col("n") * lit(fix)))
      .withColumn("std_raw", sqrt(greatest(
        col("s2") / (col("n") * lit(fix)) - col("mean_raw") * col("mean_raw"),
        lit(0.0))))
  }

  def dimStats(spark: SparkSession, dir: String): DataFrame =
    perDimMoments(
      Tables.embeddings(spark, dir).select(asDouble(col("embedding")).as("v")))
      .select(col("i").cast("long").as("dim"), col("n"),
        pround(col("mean_raw"), 6).as("mean"),
        pround(col("std_raw"), 6).as("std"),
        pround(col("mn"), 6).as("dim_min"),
        pround(col("mx"), 6).as("dim_max"))
      .orderBy("dim")

  /** Q90 — embedding WHITENING (per-dimension standardization): z =
    * (x − μᵢ)/σᵢ — the preprocessing that equalizes dimension scales
    * before cosine ANN or clustering. The per-dim stats come from the same
    * fixed-point moments as [[dimStats]] and stay IN-PLAN: packed into one
    * i-ordered array row and broadcast, so the transform is a pure map
    * over the corpus (no driver action — two scans total: moments, then
    * codes). Emitted as the
    * q57 pattern: fixed-point 10⁻⁶ z-codes behind an order-free integer
    * checksum + an md5 fingerprint of the i-ordered code string — exact
    * cross-engine equality without float-formatting hazards. Dead
    * dimensions (σ = 0) code to 0 by definition. */
  def whiten(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val stats = perDimMoments(e)
    val packed = stats.agg(
      sort_array(collect_list(struct(col("i"), col("mean_raw"), col("std_raw"))))
        .as("ms"))
    e.crossJoin(broadcast(packed))
      .withColumn("codes", expr(
        """transform(v, (x, j) ->
          |  CASE WHEN ms[j].std_raw = 0D THEN 0L
          |       ELSE floor((x - ms[j].mean_raw) / ms[j].std_raw * 1000000.0 + 0.5)
          |  END)""".stripMargin))
      .select(col("vec_id"),
        expr("aggregate(codes, 0L, (acc, c) -> acc + c)").as("z_checksum"),
        md5(concat_ws(",", expr("transform(codes, c -> CAST(c AS STRING))")))
          .as("z_fp"))
      .orderBy("vec_id")
  }

  /** Q119 — EMBEDDING OUTLIER FLAGS: per-vector squared L2 distance to the
    * corpus centroid, with an outlier bit at dist² > 4·mean(dist²) (2× the
    * RMS radius) — the curation pass that catches mis-embedded or
    * out-of-domain vectors before they poison ANN cells or k-means
    * codebooks. Exactness discipline: coordinates quantize to 10⁻⁶
    * fixed-point longs q_j (the q57/q90 pattern); the centroid division
    * never happens — distances are computed as Σ(n·q_j − s_j)² in
    * decimal(38,0), exact integers multiplied through by n², and the
    * outlier comparison n_vec·d2 > 4·Σd2 is again exact-integer, so the
    * flag is bit-identical cross-engine with zero float ops. The only
    * float is the presentation column (one decimal→double cast + one
    * divide, IEEE-deterministic, pround 6; the n² divisor is computed in
    * double — exact for any n below 2²⁶ — so no long product can wrap).
    * Headroom: the binding term is the GRAND TOTAL and the n_vec·d2
    * comparison, ~n³·q²·dims ≤ 10³⁸ ⇒ exact to ~10⁸ vectors per
    * partition-of-analysis; past that, rescale the fixed point (10⁻³
    * coordinates buy 10² more corpus) or shard the audit per cell — the
    * q106/q109 documented-upgrade discipline. Plan shape: one per-dim
    * moment aggregate packed + broadcast (the q90 idiom), then the
    * distance map runs TWICE — once under the grand-total aggregate, once
    * for the output — three column-pruned corpus passes total. Measured
    * choice, not an oversight: checkpointing the narrow (vec_id, n, d2)
    * intermediate to share it was 65% slower at sf0.1 AND at 10× (block
    * write+read beats re-running a fused codegen map only when the scan
    * dominates — at 100 TB with a wide embedding column, flip to
    * persisting the intermediate). */
  def embedOutliers(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val packed = perDimMoments(e).agg(
      sort_array(collect_list(struct(col("i"), col("s1")))).as("ss"),
      max(col("n")).as("n"))
    val d2 = e
      .withColumn("q", expr("transform(v, x -> floor(x * 1000000.0 + 0.5))"))
      .crossJoin(broadcast(packed))
      .select(col("vec_id"), col("n"),
        expr("""aggregate(
          |  transform(q, (x, j) ->
          |    CAST(n * x - ss[j].s1 AS DECIMAL(19,0)) *
          |    CAST(n * x - ss[j].s1 AS DECIMAL(19,0))),
          |  CAST(0 AS DECIMAL(38,0)), (acc, t) -> acc + t)""".stripMargin)
          .as("d2"))
    val tot = d2.agg(sum(col("d2")).as("sum_d2"), count(lit(1)).as("n_vec"))
    d2.crossJoin(broadcast(tot))
      .select(col("vec_id"),
        pround(col("d2").cast("double") /
          (col("n").cast("double") * col("n") * lit(1e12)), 6).as("dist2"),
        (col("n_vec") * col("d2") > lit(4) * col("sum_d2"))
          .cast("long").as("is_outlier"))
      .orderBy("vec_id")
  }

  /** Exact embedding near-dup: all-pairs top-k — O(n²), intentionally only
    * the small-corpus ground truth the blocked path is measured against. */
  def nearDupPairsExact(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val e = withNorm(spark, dir)
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        pround(dot_product(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm")), 4)
          .as("cos_sim"))
      .orderBy(desc("cos_sim"), col("vec_a"), col("vec_b"))
      .limit(k)
  }

  // ---- Product quantization (Jégou, Douze, Schmid — TPAMI 2011) ----------

  /** PQ assignment: per (vector, subspace), the nearest sub-centroid by
    * squared L2, ties to the lowest centroid id (min-struct ordering).
    * Centroids broadcast as a literal m×k table; the candidate explode is
    * n·m·k rows of SUBVECTOR arithmetic — the standard PQ encode cost,
    * map-side after the broadcast, reduced by one (vec_id, s) keyed
    * min-aggregate. */
  /** Squared-L2 between two double-array columns, as the one SQL string
    * every PQ distance shares (assignment, rerank) — the fold order is
    * part of the determinism contract, so it lives in one place. */
  private[vector] def sqDistSql(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), " +
      "cast(0.0 as double), (acc, z) -> acc + z)"

  /** The shared fixed-point 10⁻⁶ mean (the trainIvfCodebook convention). */
  private def fixedMean(s: Long, n: Long): Double =
    s.toDouble / (n.toDouble * 1000000.0)

  private def pqAssign(e: DataFrame,
      codebooks: Seq[Seq[Seq[Double]]]): DataFrame = {
    val m = codebooks.length
    val subDim = codebooks.head.head.length
    val cents = codebooks.zipWithIndex.flatMap { case (cb, s) =>
      cb.zipWithIndex.map { case (c, cid) => (s, cid, c) }
    }
    val centDf = broadcast(
      e.sparkSession.createDataFrame(cents).toDF("s", "cid", "c"))
    val subs = e.select(col("vec_id"),
        explode(expr(s"transform(sequence(0, ${m - 1}), " +
          s"s -> struct(s as s, slice(v, s * $subDim + 1, $subDim) as sub))"))
          .as("e"))
      .select(col("vec_id"), col("e.s").as("s"), col("e.sub").as("sub"))
    subs.join(centDf, Seq("s"))
      .withColumn("d2", expr(sqDistSql("sub", "c")))
      .groupBy("vec_id", "s")
      .agg(min(struct(col("d2"), col("cid"))).as("best"))
      .select(col("vec_id"), col("s"), col("best.cid").as("code"),
        col("best.d2").as("d2"))
  }

  /** Deterministic PQ training: per subspace, k L2 sub-centroids — init
    * from vec_ids 1..k's subvectors (the [[trainIvfCodebook]] convention),
    * then `iters` Lloyd rounds with fixed-point 10⁻⁶ means. Codebook size
    * m·k·(dim/m) doubles (1 KB-class) — a bounded driver value, like the
    * IVF codebook. */
  def pqTrain(spark: SparkSession, dir: String, m: Int = 4, k: Int = 16,
      iters: Int = 2): Seq[Seq[Seq[Double]]] =
    pqTrainOn(withNorm(spark, dir).select(col("vec_id"), col("v")), m, k, iters)

  /** [[pqTrain]] over an explicit (vec_id, v) frame — the entry point
    * [[CellIndex.retrain]] feeds the STORED vector set (the index is its
    * own training corpus at retrain time; same deterministic Lloyd, so
    * equal inputs give bit-equal codebooks). */
  def pqTrainOn(e0: DataFrame, m: Int = 4, k: Int = 16,
      iters: Int = 2): Seq[Seq[Seq[Double]]] = {
    require(EmbeddingDim % m == 0,
      s"m=$m must divide dim=$EmbeddingDim — a remainder would silently " +
        "drop trailing dimensions from codes while the exact rerank keeps them")
    val e = e0.select(col("vec_id"), col("v"))
    val subDim = EmbeddingDim / m
    var cbs: Seq[Seq[Seq[Double]]] = {
      val init = e.filter(col("vec_id").between(1, k))
        .select(col("vec_id").cast("int"), col("v")).collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
      (0 until m).map(s => init.map(_._2.slice(s * subDim, (s + 1) * subDim)).toSeq)
    }
    for (_ <- 0 until iters) {
      val sums = pqAssign(e, cbs)
        .join(e, Seq("vec_id"))
        .select(col("s"), col("code"),
          posexplode(expr(s"slice(v, s * $subDim + 1, $subDim)")).as(Seq("i", "x")))
        .groupBy("s", "code", "i")
        .agg(sum(floor(col("x") * lit(1000000.0) + lit(0.5))).as("sm"),
          count(lit(1)).as("cnt"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1)), (r.getInt(2), r.getLong(3), r.getLong(4))))
        .groupBy(_._1)
      cbs = cbs.zipWithIndex.map { case (cb, s) =>
        cb.zipWithIndex.map { case (prev, cid) =>
          sums.get((s, cid)) match {
            case Some(rows) =>
              val byDim = rows.map(_._2).map(t => t._1 -> (t._2, t._3)).toMap
              prev.indices.map { i =>
                val (sm, n) = byDim(i)
                fixedMean(sm, n)
              }
            case None => prev // empty cell keeps its centroid (IVF rule)
          }
        }
      }
    }
    cbs
  }

  /** PQ encode: vec_id → m byte-sized codes (64 floats → m codes, a 64×
    * compression at m=4). One [[pqAssign]] pass reduced to a code array
    * ordered by subspace. */
  def pqEncode(spark: SparkSession, dir: String,
      codebooks: Seq[Seq[Seq[Double]]]): DataFrame =
    pqEncodeOn(withNorm(spark, dir).select(col("vec_id"), col("v")), codebooks)

  /** [[pqEncode]] over an explicit (vec_id, v) frame (the retrain path). */
  def pqEncodeOn(e0: DataFrame,
      codebooks: Seq[Seq[Seq[Double]]]): DataFrame = {
    val e = e0.select(col("vec_id"), col("v"))
    pqAssign(e, codebooks)
      .groupBy("vec_id")
      .agg(expr("transform(array_sort(collect_list(struct(s, code))), p -> p.code)")
        .as("codes"))
      .orderBy("vec_id")
  }

  /** PQ ADC search: asymmetric distance computation — the query stays
    * exact, the corpus is its codes. The per-subspace distance TABLE
    * (m·k doubles) is computed driver-side from the collected query (a
    * 1-row collect) and enters the plan as a literal; per vector the
    * approximate distance is m table lookups + a sum, no vector
    * arithmetic at all — the reason PQ serves billion-vector corpora
    * from RAM. Top-k via TakeOrderedAndProject (distance asc). */
  /** The collected query vector, or None when `queryVecId` is absent —
    * the annIvf missing-probe convention: degrade to an empty
    * contract-schema result, never a NoSuchElementException. */
  private def pqQuery(spark: SparkSession, dir: String,
      queryVecId: Long): Option[Seq[Double]] =
    withNorm(spark, dir).filter(col("vec_id") === queryVecId)
      .select(col("v")).collect().headOption.map(_.getSeq[Double](0))

  private def pqEmpty(spark: SparkSession, cols: (String, String)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(cols.map { case (n, t) =>
        org.apache.spark.sql.types.StructField(n, t match {
          case "long" => org.apache.spark.sql.types.LongType
          case _ => org.apache.spark.sql.types.DoubleType
        })
      }))

  def pqSearch(spark: SparkSession, dir: String,
      codebooks: Seq[Seq[Seq[Double]]], queryVecId: Long = 0,
      topK: Int = 10, codes: Option[DataFrame] = None): DataFrame =
    pqQuery(spark, dir, queryVecId) match {
      case None => pqEmpty(spark, "vec_id" -> "long", "approx_d2" -> "double")
      case Some(q) =>
        pqAdcScores(spark, dir, codebooks, queryVecId, q, codes)
          .orderBy(col("approx_d2").asc, col("vec_id"))
          .limit(topK)
          .select(col("vec_id"), pround(col("approx_d2"), 6).as("approx_d2"))
    }

  /** The ADC score pass shared by [[pqSearch]] and [[pqSearchRerank]]:
    * every corpus vector's approximate distance to the collected query,
    * m table lookups each. Pass a precomputed [[pqEncode]] result as
    * `codes` when serving multiple queries — re-encoding the corpus per
    * query is exactly the cost PQ pays once at INDEX time. */
  private def pqAdcScores(spark: SparkSession, dir: String,
      codebooks: Seq[Seq[Seq[Double]]], queryVecId: Long,
      q: Seq[Double], codes: Option[DataFrame]): DataFrame = {
    val m = codebooks.length
    val subDim = EmbeddingDim / m
    val tables: Seq[Seq[Double]] = codebooks.zipWithIndex.map { case (cb, s) =>
      val qs = q.slice(s * subDim, (s + 1) * subDim)
      cb.map(c => qs.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum)
    }
    codes.getOrElse(pqEncode(spark, dir, codebooks))
      .filter(col("vec_id") =!= queryVecId)
      .withColumn("tbl", typedLit(tables))
      .withColumn("approx_d2", expr(
        "aggregate(transform(sequence(0, " + (m - 1) + "), " +
          "s -> element_at(element_at(tbl, s + 1), codes[s] + 1)), " +
          "cast(0.0 as double), (acc, z) -> acc + z)"))
      .select(col("vec_id"), col("approx_d2"))
  }

  /** PQ with EXACT RERANK — the production PQ serving shape: the lossy
    * codes cut the corpus to an ADC shortlist (cheap: table lookups),
    * then the true vectors of ONLY the shortlist are fetched and ranked
    * by exact L2. On distance-concentrated embeddings (this fixture:
    * 10th-neighbor d² 1.66 vs median 1.98) raw ADC ordering is noise —
    * recall@10 ≈ 0.2 — because quantization error exceeds the
    * neighbor gaps; the shortlist+rerank recovers the true neighborhood
    * while touching `shortlist` exact vectors instead of the corpus.
    * The rerank join is vec_id-keyed and shortlist-bounded. */
  def pqSearchRerank(spark: SparkSession, dir: String,
      codebooks: Seq[Seq[Seq[Double]]], queryVecId: Long = 0,
      topK: Int = 10, shortlist: Int = 100,
      codes: Option[DataFrame] = None): DataFrame =
    pqQuery(spark, dir, queryVecId) match {
      case None => pqEmpty(spark, "vec_id" -> "long",
        "d2" -> "double", "approx_d2" -> "double")
      case Some(q) =>
        val short = pqAdcScores(spark, dir, codebooks, queryVecId, q, codes)
          .orderBy(col("approx_d2").asc, col("vec_id"))
          .limit(shortlist)
        short
          .join(withNorm(spark, dir).select(col("vec_id"), col("v")),
            Seq("vec_id"))
          .withColumn("qv", typedLit(q))
          .withColumn("d2", expr(sqDistSql("v", "qv")))
          .orderBy(col("d2").asc, col("vec_id"))
          .limit(topK)
          .select(col("vec_id"), pround(col("d2"), 6).as("d2"),
            pround(col("approx_d2"), 6).as("approx_d2"))
    }

  /** Q134 — RECIPROCAL RANK FUSION (Cormack, Clarke & Buettcher 2009,
    * "Reciprocal Rank Fusion outperforms Condorcet…"): fuse the DENSE
    * retrieval list ([[cosineTopK]] against the vec_id=0 probe) with the
    * LEXICAL list ([[graft.text.TextOps.bm25]]) by
    * `score(d) = Σ_lists 1/(k + rank_d)` with the canonical k=60 — the
    * standard hybrid-retrieval combiner (dense + BM25 RRF is the default
    * in production RAG stacks precisely because it needs no score
    * calibration, only ranks).
    *
    * Scale shape: both candidate lists are already global top-`m`
    * (TakeOrderedAndProject — k×partitions rows at the driver merge), so
    * the fusion join, scoring, and final rank all run over ≤2m rows; the
    * corpus is touched exactly twice (once per retriever), never by the
    * fusion itself. Determinism: each reciprocal-rank contribution is
    * `floor(10⁶/(60+rank)+0.5)` — one IEEE division of exact longs
    * (identical bits in both engines, the q43 standing caveat) — and the
    * fused sort key is the INTEGER s6 sum, so no float boundary can
    * reorder the fused ranks; docs missing from a list contribute 0 (the
    * standard RRF convention), surfaced as rank 0 in the output. */
  def rrfFusion(spark: SparkSession, dir: String, m: Int = 50,
      kRrf: Int = 60, topN: Int = 20): DataFrame = {
    val dense = cosineTopK(spark, dir, m)
      .select(col("vec_id").as("doc_id"), col("rnk").as("dense_rnk"))
    val lex = graft.text.TextOps.bm25(spark, dir, nq = 5, topN = m)
      .select(col("doc_id"), col("rnk").as("lex_rnk"))
    rrfCombine(dense, lex, kRrf, topN)
  }

  /** The RRF combiner shared by the ad-hoc ([[rrfFusion]]) and indexed
    * ([[CellIndex.rrfFusionIndexed]]) arms: fuse a (doc_id, dense_rnk)
    * list with a (doc_id, lex_rnk) list by the integer-s6 reciprocal-rank
    * sum. Both inputs are already global top-m, so everything here runs
    * over ≤2m rows. */
  private[vector] def rrfCombine(dense: DataFrame, lex: DataFrame,
      kRrf: Int, topN: Int): DataFrame = {
    def contrib(rnk: Column): Column =
      when(rnk > 0, floor(lit(1000000.0) / (lit(kRrf) + rnk) + lit(0.5))
        .cast("long")).otherwise(lit(0L))
    val fused = dense.join(lex, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("dense_rnk"), lit(0L)).as("dense_rnk"),
        coalesce(col("lex_rnk"), lit(0L)).as("lex_rnk"))
      .withColumn("s6", contrib(col("dense_rnk")) + contrib(col("lex_rnk")))
    // ≤2m fused rows: TakeOrdered + constant-partition rank (the rankTopK
    // convention, with the fused-score order)
    val order = Seq(desc("s6"), col("doc_id"))
    val w = Window.partitionBy(spark_partition_id()).orderBy(order: _*)
    fused.orderBy(order: _*).limit(topN)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("rnk"), col("doc_id"), col("dense_rnk"), col("lex_rnk"),
        (col("s6") * lit(1.0) / lit(1000000.0)).as("rrf_score"))
      .orderBy("rnk")
  }
}
