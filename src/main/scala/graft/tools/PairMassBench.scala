package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCALING.md meter for the round-15 PAIR-MASS ADVISOR
  * ([[graft.text.Dedup.pairMassAdvisor]] / q167): does one keyed
  * aggregate actually price the banded self-join before it is paid, and
  * how far apart are the advisor's comparison mass and the join's
  * realized masses on each fixture SHAPE? Reports, per run:
  *
  *  - `advise_s` + `predicted_pairs` (Σ over bands of per-bucket
  *    C(n,2) — the self-join's comparison mass) + `max_bucket`;
  *  - `measure_s` + `cand_pairs` (DISTINCT candidate pairs — the
  *    builder's dedup'd join output; ≤ predicted by construction) +
  *    `edges` (est-Jaccard ≥ 0.5 verified pairs — the mass CC pays);
  *  - their ratio — the advisor's headroom on this corpus shape.
  *
  * The round-14 lesson this quantifies: build cost is pair-mass-bound
  * and fixture-shape-dependent (replica-salted vs exact-duplicate
  * corpora of equal byte mass differ ×1.7 in build time); the advisor
  * lets an operator see which shape they have for the price of a
  * signature pass.
  *
  * Usage: PairMassBench <sfDir> [adviseOnly|sharded=N] [workDir]
  * (single pass; the pair join at a ≥100× tier is deliberately run
  * once — it IS the expensive thing being priced. `adviseOnly` skips
  * the measured join: on the exact-duplicate 5M-doc shape the RAW
  * join's spill exceeds this box's free scratch — the advisor's
  * warning is the measurement there. `sharded=N` (round 16 — the r15
  * verdict's task #8: the tight-bound claim must be verified AT the
  * tier the routing thresholds govern) measures the DISTINCT candidate
  * count with the writeSharded decomposition instead of the one-shot
  * join: bands materialize once partitioned by band-val shard, each
  * shard self-joins and writes its per-shard-distinct pairs to scratch
  * under `workDir`, and ONE global distinct over the union (candidate
  * mass, not join-spill mass) counts — so predicted-vs-measured is
  * computable exactly where the raw join DNFs.) */
object PairMassBench {
  def main(args: Array[String]): Unit = {
    if (args.length < 1) {
      System.err.println(
        "usage: PairMassBench <sfDir> [adviseOnly|sharded=N] [workDir]")
      sys.exit(2)
    }
    val dir = args(0)
    val adviseOnly = args.lift(1).contains("adviseOnly")
    val shards = args.lift(1).filter(_.startsWith("sharded="))
      .map(_.stripPrefix("sharded=").toInt).getOrElse(0)
    val work = args.lift(2).getOrElse(dir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkTuning.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](body: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }
    // warmup outside the timed region: footers + the codegen'd minhash
    // path on a 1k-doc slice, so advise_s (which runs first in a cold
    // JVM) is not charged the JIT the join would then ride for free
    graft.functions.TextExpressions.register(spark)
    spark.read.parquet(s"$dir/documents.parquet")
      .limit(1000)
      .select(graft.functions.TextExpressions.minhash_hex(
        graft.text.TextOps.tokens(col("text"))))
      .write.format("noop").mode("overwrite").save()
    val (tAdv, adv) = time {
      graft.text.Dedup.pairMassAdvisor(spark, dir).collect()
    }
    val predicted = adv.map(_.getLong(3)).sum
    val maxBucket = adv.map(_.getLong(4)).max
    val banded = adv.map(_.getLong(2)).max // docs appear in every band
    if (adviseOnly) {
      println(f"""{"metric":"pairmassbench","dir":"$dir","n_banded_docs":$banded,"advise_s":$tAdv%.3f,"predicted_pairs":$predicted,"max_bucket":$maxBucket,"measure_s":-1.0,"cand_pairs":-1,"edges":-1,"pred_over_cand":-1.0}""")
      spark.stop()
      return
    }
    spark.catalog.clearCache()
    graft.Checkpoints.sweepExceptRetained(spark.sparkContext)
    System.gc()
    if (shards > 0) {
      import org.apache.hadoop.fs.Path
      val scratch = new Path(work,
        s".pairmass_scratch_${ProcessHandle.current().pid()}")
      val fs = scratch.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(scratch, true)
      val (tMeas, cand) = time {
        // bands once, partitioned by band-val shard (band mass — docs ×
        // 4 rows, never pair mass); each shard's self-join is bounded
        // like writeSharded's, and per-shard DISTINCT bounds the
        // written pairs before the one global distinct
        graft.text.Dedup.bandsOf(graft.text.Dedup.sigTable(spark, dir))
          .withColumn("sh", pmod(hash(col("band_val")), lit(shards)))
          .repartition(col("sh"))
          .write.mode("overwrite").partitionBy("sh")
          .parquet(new Path(scratch, "bands").toString)
        for (s <- 0 until shards) {
          val b = spark.read.parquet(new Path(scratch, "bands").toString)
            .filter(col("sh") === s)
            .select("doc_id", "band_id", "band_val")
          b.as("x").join(b.as("y"),
              col("x.band_id") === col("y.band_id") &&
              col("x.band_val") === col("y.band_val") &&
              col("x.doc_id") < col("y.doc_id"))
            .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
            .distinct()
            .write.mode("overwrite")
            .parquet(new Path(scratch, s"pairs_$s").toString)
          System.gc() // drop the finished shard's shuffle files
        }
        // cross-shard duplicates exist (one pair can match in several
        // BANDS, which shard independently) — the global distinct is
        // over candidate mass, not join-spill mass
        (0 until shards)
          .map(s => spark.read.parquet(new Path(scratch, s"pairs_$s").toString))
          .reduce(_ unionByName _)
          .distinct().count()
      }
      fs.delete(scratch, true)
      require(cand <= predicted,
        s"measured distinct candidates $cand exceed predicted comparison " +
          s"mass $predicted — the advisor's bound is broken, investigate")
      println(f"""{"metric":"pairmassbench","dir":"$dir","n_banded_docs":$banded,"advise_s":$tAdv%.3f,"predicted_pairs":$predicted,"max_bucket":$maxBucket,"measure_s":$tMeas%.3f,"measure_mode":"sharded$shards","cand_pairs":$cand,"edges":-1,"pred_over_cand":${predicted.toDouble / math.max(1L, cand)}%.3f}""")
      spark.stop()
      return
    }
    val (tMeas, (cand, edges)) = time {
      val pairs = graft.text.Dedup.minhashPairsUnsorted(spark, dir)
      (pairs.count(), pairs.filter(col("est_jaccard") >= 0.5).count())
    }
    require(cand <= predicted,
      s"measured distinct candidates $cand exceed predicted comparison " +
        s"mass $predicted — the advisor's bound is broken, investigate")
    println(f"""{"metric":"pairmassbench","dir":"$dir","n_banded_docs":$banded,"advise_s":$tAdv%.3f,"predicted_pairs":$predicted,"max_bucket":$maxBucket,"measure_s":$tMeas%.3f,"cand_pairs":$cand,"edges":$edges,"pred_over_cand":${predicted.toDouble / math.max(1L, cand)}%.3f}""")
    spark.stop()
  }
}
