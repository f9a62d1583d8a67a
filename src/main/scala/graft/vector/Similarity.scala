package graft.vector

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Portable.pround
import graft.sources.Tables

/** Vector-similarity operators over the `embeddings` table (SURVEY U7 +
  * similarity-search north star): brute-force cosine top-k as the exact
  * baseline, a sign-LSH bucketed variant as the scale path, and
  * embedding-cosine near-dup pairs.
  *
  * Scale design: the probe vector is a 1-row broadcast, so brute-force is a
  * single map-side pass + TakeOrdered (no shuffle of the corpus). The LSH
  * path prunes the corpus by bucket equality before any distance math —
  * at 100 TB the bucket key becomes the partition key and only the probe's
  * bucket is scanned (partition pruning on a bucket-partitioned layout).
  */
object Similarity {

  /** Cast a float embedding to double for engine-portable arithmetic. */
  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity between two double arrays. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Q23 — brute-force cosine top-10 against vec_id=0's embedding. */
  def cosineTopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val probe = e.filter(col("vec_id") === 0).select(col("v").as("pv"))
    val w = Window.orderBy(desc("cos_sim"), col("vec_id"))
    e.crossJoin(broadcast(probe))
      .select(col("vec_id"), pround(cosine(col("v"), col("pv")), 4).as("cos_sim"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("rnk", "vec_id", "cos_sim")
      .orderBy("rnk")
  }

  /** Sign-LSH bucket id: 8 deterministic "hyperplanes", each the sign of a
    * fixed coordinate difference (x[4j+1] − x[4j+2]) — engine-portable (no
    * RNG) while keeping the real LSH shape: bucket equality ⇒ candidate. */
  def lshBucket(v: Column): Column =
    (0 until 8).map { j =>
      when(element_at(v, 4 * j + 1) > element_at(v, 4 * j + 2), 1L << j).otherwise(0L)
    }.reduce(_ + _)

  /** ANN via LSH buckets: restrict the corpus to the probe's bucket, then
    * exact cosine top-10 within it. */
  def annLsh(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("bucket", lshBucket(col("v")))
    val probe = e.filter(col("vec_id") === 0)
      .select(col("v").as("pv"), col("bucket").as("pbucket"))
    val w = Window.orderBy(desc("cos_sim"), col("vec_id"))
    e.crossJoin(broadcast(probe))
      .filter(col("bucket") === col("pbucket"))
      .select(col("vec_id"), col("bucket"),
        pround(cosine(col("v"), col("pv")), 4).as("cos_sim"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("rnk", "vec_id", "bucket", "cos_sim")
      .orderBy("rnk")
  }

  /** Embedding-cosine near-dup: top-20 most-similar distinct pairs. The
    * all-pairs form is exact for the fixed 500-row corpus; the scale path
    * is the LSH-blocked variant (join on bucket instead of cross join). */
  def nearDupPairs(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        pround(cosine(col("a.v"), col("b.v")), 4).as("cos_sim"))
      .orderBy(desc("cos_sim"), col("vec_a"), col("vec_b"))
      .limit(k)
  }
}
