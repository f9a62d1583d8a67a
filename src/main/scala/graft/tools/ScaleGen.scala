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
  * ID spacing: originals keep their ids; replica k offsets by k·10⁷,
  * far above any SF's id range.
  *
  * Usage: ScaleGen <srcSfDir> <dstDir> [factor=10]
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: ScaleGen <srcSfDir> <dstDir> [factor]")
      sys.exit(2)
    }
    val Array(src, dst) = args.take(2)
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet stores TIMESTAMP(NANOS); read it as raw long nanos
      // and write it back unchanged so Tables.events normalizes either way
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val reps = spark.range(factor).select(col("id").cast("long").as("rep"))

    val docs = spark.read.parquet(s"$src/documents.parquet")
    docs.crossJoin(broadcast(reps))
      .select(
        (col("doc_id") + col("rep") * 10000000L).as("doc_id"),
        when(col("rep") === 0, col("text")).otherwise(
          expr("""array_join(flatten(transform(split(text, ' '),
                 (t, i) -> CASE WHEN i % 3 = 2
                   THEN array(t, concat('zqsalt', rep))
                   ELSE array(t) END)), ' ')""")).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    emb.crossJoin(broadcast(reps))
      .select(
        (col("vec_id") + col("rep") * 10000000L).as("vec_id"),
        when(col("rep") === 0, col("embedding")).otherwise(
          expr("""concat(slice(embedding, cast(rep*7+1 as int),
                               size(embedding) - cast(rep*7 as int)),
                         slice(embedding, 1, cast(rep*7 as int)))"""))
          .as("embedding"),
        col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    // events: replicas shift both ids by the replica offset — per-key
    // counts (and so the skew profile q123 measures) are preserved while
    // the key population and total mass grow ×factor, which is how real
    // event traffic scales (more users, not deeper per-user history)
    val ev = spark.read.parquet(s"$src/events.parquet")
    ev.crossJoin(broadcast(reps))
      .select(
        (col("event_id") + col("rep") * 10000000L).as("event_id"),
        col("ts"),
        (col("user_id") + col("rep") * 10000000L).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/events.parquet")

    println(s"[scalegen] wrote ${factor}x documents+embeddings+events to $dst")
    spark.stop()
  }
}

/** Run a named subset of SparkEntry.queries against any dir (the scale
  * rehearsal's meter — same noop-sink materialization and inter-query
  * sweep as graft.Bench, same JSON line shape).
  *
  * Usage: ScaleBench <sfDir> <q1,q2,...>
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: ScaleBench <sfDir> <q1,q2,...>")
      sys.exit(2)
    }
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // the production scaling lever: shuffle partitions grow with data so
    // per-partition bytes stay bounded (at 100 TB nobody runs 32)
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
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
    val results = names.map { name =>
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
    val qs = results.map { case (k, v, _) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, true) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    println(f"""{"metric":"scalebench","queries":$qs,"errors":$errs,"dir":"$dir"}""")
    spark.stop()
  }
}
