package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Local scale-rehearsal generator: derives a `factor`× documents/embeddings
  * slice from an existing SF dir (the driver's testdata is read-only, so
  * the output goes to a workspace dir, never committed).
  *
  * The scale-up must NOT manufacture quadratic near-dup structure — naive
  * replication makes every copy a near-dup of its source, so candidate
  * pairs (and any banded-LSH bench on them) would grow ~factor² and measure
  * the FIXTURE, not the operator. Instead:
  *
  *  - documents: replica 0 is the original corpus byte-for-byte (its real
  *    dup/near-dup structure carries over 1:1); replicas k≥1 salt the text
  *    with a replica-specific token inserted every 3 tokens, which breaks
  *    ≥2/3 of word 3-grams — est-Jaccard vs the original (and vs any other
  *    replica) lands well under the 0.5 clustering threshold, so the new
  *    mass is near-dup-singleton, exactly how a real corpus grows.
  *  - embeddings: replicas k≥1 cyclically shift the vector by 7k dims —
  *    norms and per-dim distributions survive, autocorrelation at lag 7k is
  *    noise for these vectors, so shifted copies don't collide in sign-LSH
  *    bands the way an ε-perturbation would.
  *  - events: replicas offset BOTH event_id and user_id — each key keeps
  *    its exact per-key count (the skew profile q123 measures survives
  *    1:1) while the key population and total mass grow ×factor, which is
  *    how real event traffic scales (more users, not deeper history).
  *    ts/value/props are carried unchanged.
  *
  * ID spacing: originals keep their ids; replica k offsets by k·stride,
  * where the stride is the next power of 10 above every id the SOURCE
  * carries (floor 10⁷) — source-derived so CHAINED generations
  * (100× → 1000×) stay collision-free (round 11b: a fixed stride
  * duplicated doc_ids across replica levels).
  *
  * VOCABULARY MODES (round 13 — the round-12 verdict's task #3): the
  * default replica salt is COLLISION-FREE (one `zqsalt<rep>` token per
  * replica) — right for the near-dup fixtures, but it keeps every term's
  * df share corpus-proportional, the regime the df-gated positional
  * family exists to refuse; its 1000× tier could therefore only show a
  * constant-factor gain. The opt-in `zipf` mode instead draws each
  * inserted salt from a HEAVY-TAILED rank distribution
  * (rank = floor(1/u), u a per-(doc,pos,rep) hash uniform →
  * P(rank r) = 1/(r(r+1)) ≈ r⁻²): the hot ranks stay
  * corpus-proportional while the tail's ABSOLUTE df stays ~constant as
  * the corpus grows — a vocabulary that grows with the corpus, the
  * Zipf-tail shape real text has. Gram-breaking is unchanged (a salt
  * every 3 tokens breaks ≥2/3 of 3-grams whatever its value), but
  * cross-replica salts can now coincide (expected shared-gram mass
  * bounds est-Jaccard well under the 0.5 threshold, yet NOT zero) — so
  * near-dup tiers keep the default mode and the positional-family tiers
  * use `zipf`; SCALING.md records which fixture each row used.
  *
  * Usage: ScaleGen <srcSfDir> <dstDir> [factor=10] [default|zipf|dup]
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: ScaleGen <srcSfDir> <dstDir> [factor] [default|zipf]")
      sys.exit(2)
    }
    val Array(src, dst) = args.take(2)
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val mode = args.lift(3).getOrElse("default")
    // "dup" (round 16): replicas k>=1 carry the source text BYTE-
    // IDENTICAL — factor-sized exact-duplicate groups, the shape whose
    // collision mass concentrates in exact classes (round 15 measured it
    // from an ad-hoc fixture; the advisor-routing thresholds rest on it,
    // so its generation is now reproducible). Usually docs-only: the
    // pair-mass/cluster meters read nothing else.
    require(mode == "default" || mode == "zipf" || mode == "dup",
      s"mode must be 'default', 'zipf' or 'dup' (got '$mode')")
    // partial generation (5th arg): "docs" — the positional-family tiers
    // read nothing but documents.parquet, and a full-table 100×+ zipf
    // fixture would spend tens of GB the measurements never touch;
    // "emb" (round 15 — the r14 verdict's task #5) — embeddings ONLY,
    // back-filling a docs-only fixture so the fused q138 family can run
    // its dense arm at the heavy-tail tiers. The stride derivation scans
    // the SOURCE's tables either way, so an emb back-fill of a fixture
    // whose docs came from the same source lands replicas on the SAME
    // stride — vec_id/doc_id pairing survives by construction.
    val docsOnly = args.lift(4).contains("docs")
    val embOnly = args.lift(4).contains("emb")
    // the replica embedding transforms (rotation × optional reverse) are
    // distinct only through 2 × the 64-dim vector length — beyond that
    // replicas would silently duplicate vectors and weaken the very
    // scaling measurements the fixture exists for
    require(factor <= 128,
      s"ScaleGen supports factor <= 128 (got $factor): replica embedding " +
        "transforms exhaust at 2x the vector dimension")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkTuning.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts has shipped under different physical types across driver
      // data generations (see Tables.normalizeTs); read nanos as raw longs
      // and pass ts through unchanged so Tables.events normalizes the
      // scaled copy exactly as it does the source
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val reps = spark.range(factor).select(col("id").cast("long").as("rep"))

    // Replica id stride: the next power of 10 ABOVE every id the source
    // carries (floor 10^7, the original fixed stride). A fixed stride
    // silently COLLIDES when the source is itself a scaled fixture —
    // chained 100x → 1000x generation starts from ids already past 10^7,
    // and colliding replicas produce duplicate doc_ids carrying different
    // text (the round-11b doc-store coverage guard caught exactly that
    // on the chained tmp/sf100). One max() scan per id-bearing table.
    val srcMaxId = Seq(
      "documents.parquet" -> "doc_id", "embeddings.parquet" -> "vec_id",
      "orders.parquet" -> "o_orderkey", "lineitem.parquet" -> "l_orderkey",
      "part.parquet" -> "p_partkey", "customer.parquet" -> "c_custkey",
      "supplier.parquet" -> "s_suppkey", "events.parquet" -> "event_id",
      "events.parquet" -> "user_id").flatMap { case (t, c) =>
        // empty-table/NULL-max safe (round-11 ADVICE: a bare getLong(0)
        // NPEs opaquely on an empty source); the cast also accepts a
        // non-long id column instead of ClassCastException-ing. Missing
        // tables are skipped — a docs-only source (chained zipf tiers)
        // carries documents.parquet alone.
        scala.util.Try(
          spark.read.parquet(s"$src/$t")
            .agg(coalesce(max(col(c)).cast("long"), lit(0L)))
            .head().getLong(0)).toOption
      }.max
    var strideV = 10000000L
    while (strideV <= srcMaxId) strideV *= 10
    val off = lit(strideV)
    println(s"[scalegen] replica id stride $strideV (source max id $srcMaxId)")

    if (!embOnly) {
    val docs = spark.read.parquet(s"$src/documents.parquet")
    // the inserted-salt VALUE per mode (insertion cadence is shared —
    // every 3rd token, breaking ≥2/3 of word 3-grams either way):
    //  - default: one token per replica — collision-free across replicas,
    //    df share corpus-proportional (the near-dup fixture);
    //  - zipf: rank = floor(1/u) of a per-(doc,pos,rep) uniform hash —
    //    P(rank r) ≈ r⁻², so tail ranks keep ~constant ABSOLUTE df as
    //    the corpus grows (the positional-family fixture; see object doc)
    // the 10^12 denominator keeps ~2·10^6 DISTINCT representable ranks
    // (floor(D/(h+1)) has ~2·sqrt(D) values): distinct ranks drawn grow
    // ~sqrt(token positions), so the vocabulary never saturates at any
    // rehearsal tier and the rarest rank's ABSOLUTE df stays ~1 as the
    // corpus grows — the regime's defining property (a 10^6 denominator
    // capped the vocabulary at ~2000 and the tail df grew linearly past
    // the 100× tier, measured before widening)
    val saltSql =
      if (mode == "zipf")
        """concat('zqz', cast(cast(floor(1000000000000.0 /
          |  (pmod(xxhash64(doc_id, cast(i as long), rep), 1000000000000) + 1))
          |  as bigint) as string))""".stripMargin
      else "concat('zqsalt', rep)"
    val replicaText =
      if (mode == "dup") col("text") // exact-duplicate groups of `factor`
      else when(col("rep") === 0, col("text")).otherwise(
        expr(s"""array_join(flatten(transform(split(text, ' '),
               (t, i) -> CASE WHEN i % 3 = 2
                 THEN array(t, $saltSql)
                 ELSE array(t) END)), ' ')"""))
    docs.crossJoin(broadcast(reps))
      .select(
        (col("doc_id") + col("rep") * off).as("doc_id"),
        replicaText.as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    if (docsOnly) {
      println(s"[scalegen] wrote ${factor}x documents (docs-only) to $dst (mode=$mode)")
      spark.stop()
      return
    }
    }
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    emb.crossJoin(broadcast(reps))
      .select(
        (col("vec_id") + col("rep") * off).as("vec_id"),
        when(col("rep") === 0, col("embedding")).otherwise(
          // rotation offset MOD the dimension: at factor > 9 the raw
          // rep*7 exceeds the 64-dim vector and slice's length went
          // negative (latent until the first 100x generation). Rotations
          // repeat with period dim (gcd(7, 64) = 1 cycles all offsets),
          // so replicas ≥ dim REVERSE the rotated vector — a transform
          // outside the rotation group — keeping every replica's vectors
          // distinct through factor 2·dim = 128 (require()d below; a
          // third transform would be needed beyond that, not silence)
          expr("""CASE WHEN rep >= size(embedding) THEN reverse(
                    concat(slice(embedding, cast((rep*7) % size(embedding) as int) + 1,
                                 size(embedding) - cast((rep*7) % size(embedding) as int)),
                           slice(embedding, 1, cast((rep*7) % size(embedding) as int))))
                  ELSE
                    concat(slice(embedding, cast((rep*7) % size(embedding) as int) + 1,
                                 size(embedding) - cast((rep*7) % size(embedding) as int)),
                           slice(embedding, 1, cast((rep*7) % size(embedding) as int)))
                  END"""))
          .as("embedding"),
        col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    if (embOnly) {
      println(s"[scalegen] wrote ${factor}x embeddings (emb-only) to $dst")
      spark.stop()
      return
    }

    // TPC-H relational tables (round 8 — the full-suite 10× tier needs
    // every query's inputs): replicas offset every FACT key (orderkey,
    // custkey, suppkey, partkey) by the same replica stride, so referential
    // integrity holds within each replica — joins fan exactly as the
    // original's, per-key row counts are preserved, and key populations
    // grow ×factor (the dbgen convention: bigger SF = more keys, same
    // per-key shape). nation/region are fixed-cardinality dims shared by
    // all replicas and are copied once, unscaled.
    Seq("region", "nation").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .coalesce(1).write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    def scaled(t: String, keys: Seq[String]): Unit = {
      val df = spark.read.parquet(s"$src/$t.parquet")
      keys.foldLeft(df.crossJoin(broadcast(reps))) { (d, k) =>
          d.withColumn(k, col(k) + col("rep") * off)
        }
        .drop("rep")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    scaled("customer", Seq("c_custkey"))
    scaled("supplier", Seq("s_suppkey"))
    scaled("part", Seq("p_partkey"))
    scaled("orders", Seq("o_orderkey", "o_custkey"))
    scaled("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))

    // events: replicas shift both ids by the replica offset — per-key
    // counts (and so the skew profile q123 measures) are preserved while
    // the key population and total mass grow ×factor, which is how real
    // event traffic scales (more users, not deeper per-user history)
    val ev = spark.read.parquet(s"$src/events.parquet")
    ev.crossJoin(broadcast(reps))
      .select(
        (col("event_id") + col("rep") * off).as("event_id"),
        col("ts"),
        (col("user_id") + col("rep") * off).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/events.parquet")

    println(s"[scalegen] wrote ${factor}x documents+embeddings+events to $dst (mode=$mode)")
    spark.stop()
  }
}

/** Run a named subset of SparkEntry.queries against any dir (the scale
  * rehearsal's meter — same noop-sink materialization and inter-query
  * sweep as graft.Bench, same JSON line shape). `all` runs the whole
  * inventory (the full-suite 10× tier).
  *
  * Since round 8 this is the COLD median-of-3 protocol Bench runs —
  * `SPARK_GRAFT_PASSES` (default 3) full passes with full memo eviction
  * (cache maps + retained blocks) between them — so SCALING.md exponents
  * and the driver's bench medians are the same protocol; the round-7 q74
  * re-measure was warm-session and did not reproduce under Bench's
  * eviction, which is exactly the drift this alignment removes.
  *
  * Usage: ScaleBench <sfDir> <q1,q2,...|all>
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: ScaleBench <sfDir> <q1,q2,...|all>")
      sys.exit(2)
    }
    val dir = args(0)
    val names =
      if (args(1) == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else args(1).split(",").toSeq
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // the production scaling lever: shuffle partitions grow with data so
    // per-partition bytes stay bounded (at 100 TB nobody runs 32)
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = graft.SparkTuning.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: footers + codegen/JIT paths, mirroring Bench
    Seq("documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$dir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    // the indexed oracle rows serve from per-process cached indexes; build
    // them OUTSIDE the timed region (the at-rest premise — Bench's pass 1
    // amortizes this out of medians, a single-pass tier must not time a
    // one-off build inside whichever query touches the cache first; build
    // costs are CellIndexBench's index_build/text_index_build rows)
    // selective since round 12: build only the artifacts the requested
    // queries serve from (warming all nine at a ≥100× tier is a disk
    // hazard the probe queries never needed)
    try graft.SparkEntry.warmIndexesFor(spark, dir, names)
    catch { case e: Throwable =>
      System.err.println(s"[scalebench] index warmup failed: ${e.getMessage}") }
    val runs: Seq[Seq[(String, Double, Boolean)]] = (1 to passes).map { _ =>
      val pass = names.map { name =>
        val t0 = System.nanoTime()
        val failed =
          try {
            graft.SparkEntry.queries(name)(spark, dir)
              .write.format("noop").mode("overwrite").save(); false
          } catch { case e: Throwable =>
            System.err.println(s"[scalebench] $name failed: ${e.getMessage}"); true
          }
        val elapsed = (System.nanoTime() - t0) / 1e9
        graft.Checkpoints.sweepExceptRetained(spark.sparkContext)
        spark.catalog.clearCache()
        System.gc()
        (name, elapsed, failed)
      }
      // between passes: full memo eviction, so every pass replays the same
      // cold build-then-ride shape (the Bench protocol)
      graft.text.Dedup.evictMemos(spark)
      graft.vector.Similarity.evictMemos(spark)
      graft.text.TextIndex.evictMemos(spark)
      graft.Checkpoints.evictSessionMemos(spark)
      graft.Checkpoints.sweepExceptRetained(spark.sparkContext)
      System.gc()
      pass
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val results = names.zipWithIndex.map { case (name, i) =>
      val samples = runs.map(_(i)._2)
      (name, med(samples), samples.min, samples.max, runs.exists(_(i)._3))
    }
    val qs = results.map { case (k, m, _, _, _) => "\"" + k + f"""":$m%.3f""" }
      .mkString("{", ",", "}")
    val spread = results.map { case (k, _, mn, mx, _) =>
      "\"" + k + f"""":{"min":$mn%.3f,"max":$mx%.3f}""" }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, _, true) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // the sf>=1 tier's split: known-linear auditor forms (tagged in
    // SparkEntry.auditQueries) report beside, not inside, the serving
    // total — the suite number production would see
    val auditTotal = results
      .filter(r => graft.SparkEntry.auditQueries(r._1)).map(_._2).sum
    val servingTotal = total - auditTotal
    println(f"""{"metric":"scalebench","total":$total%.3f,"serving_total":$servingTotal%.3f,"audit_total":$auditTotal%.3f,"queries":$qs,"errors":$errs,"dir":"$dir","protocol":"cold-median-of-$passes","spread":$spread}""")
    spark.stop()
  }
}
