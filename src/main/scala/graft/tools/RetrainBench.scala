package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCALING.md meter for the codebook retrain-and-cutover (round 10):
  * prices `CellIndex.retrain` against the serving degradation it
  * repairs. Builds the index, appends a DRIFTED batch (every vector
  * pushed toward one direction — the advisor-flagging shape), then
  * measures pruned ANN serving on the drifted geometry, the retrain
  * itself, and serving after the cutover. The claim under test: drift
  * concentrates corpus mass into the probed hot cells (pruned serving
  * degrades toward hot-cell scans), and one retrain — a bounded,
  * amortizable maintenance action — restores cell-sized probes.
  *
  * Usage: RetrainBench <sfDir> <workDir> [k=16] [batchPct=100] */
object RetrainBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val work = args(1)
    val k = args.lift(2).map(_.toInt).getOrElse(16)
    val batchPct = args.lift(3).map(_.toInt).getOrElse(100)
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
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
    import graft.vector.{CellIndex, Similarity}
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      graft.Checkpoints.sweepExceptRetained(spark.sparkContext)
      spark.catalog.clearCache(); System.gc()
      (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)

    val idx = s"$work/idx"
    val buildSec = time { CellIndex.write(spark, dir, idx, k = k) }
    val probe = Similarity.probeVector(spark, dir)
    def serve() = CellIndex.annIvfIndexed(spark, idx, probe, k = 10, nprobe = 2)
    val balanced = (1 to passes).map(_ => time(noop(serve())))
    // drifted batch: the corpus's vectors pushed toward the probe's own
    // direction — new mass lands exactly in the cells every probe scans,
    // the worst drift for pruned serving
    val batch = s"$work/skew_batch"
    spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(pmod(col("vec_id"), lit(100)) < batchPct)
      .select((col("vec_id") + 10000000L).as("vec_id"),
        expr(s"zip_with(embedding, array(${probe.mkString(",")}), " +
          "(x, y) -> x + 3.0D * CAST(y AS FLOAT))").as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(s"$batch/embeddings.parquet")
    val appendSec = time { CellIndex.append(spark, batch, idx, Some("skew")) }
    val driftedImb = CellIndex.cellBalanceReport(spark, idx)
      .agg(max("imbalance")).head().getDouble(0)
    val drifted = (1 to passes).map(_ => time(noop(serve())))
    val retrainSec = time { CellIndex.retrain(spark, idx, k = k) }
    val repairedImb = CellIndex.cellBalanceReport(spark, idx)
      .agg(max("imbalance")).head().getDouble(0)
    val repaired = (1 to passes).map(_ => time(noop(serve())))
    println(
      f"""{"metric":"retrain_price","dir":"$dir","k":$k,"index_build_sec":$buildSec%.3f,"append_sec":$appendSec%.3f,"retrain_sec":$retrainSec%.3f,"serve_balanced_sec":${med(balanced)}%.3f,"serve_drifted_sec":${med(drifted)}%.3f,"serve_retrained_sec":${med(repaired)}%.3f,"imbalance_drifted":$driftedImb%.2f,"imbalance_retrained":$repairedImb%.2f}""")
    spark.stop()
  }
}
