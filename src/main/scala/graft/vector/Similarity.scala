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
  * baseline, a sign-LSH bucketed variant as the scale path, and
  * embedding-cosine near-dup pairs.
  *
  * Scale design: the probe vector is a 1-row broadcast, so brute-force is a
  * single map-side pass + TakeOrdered (no shuffle of the corpus). The LSH
  * path prunes the corpus by bucket equality before any distance math —
  * at 100 TB the bucket key becomes the partition key and only the probe's
  * bucket is scanned. Norms are computed ONCE per vector before any join
  * (cos(a,b) = dot(a,b)/(norm_a*norm_b)), and the dot product itself is the
  * codegen'd [[graft.functions.DotProduct]] expression — the near-dup
  * all-pairs sweep does one tight-loop dot per pair, nothing else.
  */
object Similarity {

  /** Cast a float embedding to double for engine-portable arithmetic. */
  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Cosine similarity between two double arrays (unnormalized inputs). */
  def cosine(a: Column, b: Column): Column =
    dot_product(a, b) / (sqrt(dot_product(a, a)) * sqrt(dot_product(b, b)))

  /** Corpus with per-vector norm precomputed (one pass, no shuffle). */
  private def withNorm(spark: SparkSession, dir: String): DataFrame = {
    VectorExpressions.register(spark)
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("norm", sqrt(dot_product(col("v"), col("v"))))
  }

  /** Q23 — brute-force cosine top-10 against vec_id=0's embedding. */
  def cosineTopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val e = withNorm(spark, dir)
    val probe = e.filter(col("vec_id") === 0)
      .select(col("v").as("pv"), col("norm").as("pnorm"))
    val w = Window.orderBy(desc("cos_sim"), col("vec_id"))
    e.crossJoin(broadcast(probe))
      .select(col("vec_id"),
        pround(dot_product(col("v"), col("pv")) / (col("norm") * col("pnorm")), 4)
          .as("cos_sim"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
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
    val w = Window.orderBy(desc("cos_sim"), col("vec_id"))
    e.crossJoin(broadcast(probe))
      .filter(col("bucket") === col("pbucket"))
      .select(col("vec_id"), col("bucket"),
        pround(dot_product(col("v"), col("pv")) / (col("norm") * col("pnorm")), 4)
          .as("cos_sim"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("rnk", "vec_id", "bucket", "cos_sim")
      .orderBy("rnk")
  }

  /** ANN via IVF cells: a deterministic 4-centroid codebook (vec_ids 1-4 —
    * a stand-in for trained k-means centroids), each vector assigned to its
    * max-cosine centroid, probe searches only its own cell. The codebook is
    * broadcast; assignment is one map-side pass + a 4-row window — the
    * standard coarse-quantization shape that at 100 TB becomes
    * partition-by-cell layout with per-cell scans. */
  def annIvf(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val e = withNorm(spark, dir)
    val cb = e.filter(col("vec_id").between(1, 4))
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("norm").as("cnorm"))
    val wAssign = Window.partitionBy("vec_id").orderBy(desc("c_cos"), col("c_id"))
    val assigned = e.crossJoin(broadcast(cb))
      .withColumn("c_cos", dot_product(col("v"), col("cv")) / (col("norm") * col("cnorm")))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("norm"), col("c_id").as("cell"))
    val probe = assigned.filter(col("vec_id") === 0)
      .select(col("v").as("pv"), col("norm").as("pnorm"), col("cell").as("pcell"))
    val wRank = Window.orderBy(desc("cos_sim"), col("vec_id"))
    assigned.crossJoin(broadcast(probe))
      .filter(col("cell") === col("pcell"))
      .select(col("vec_id"), col("cell"),
        pround(dot_product(col("v"), col("pv")) / (col("norm") * col("pnorm")), 4)
          .as("cos_sim"))
      .withColumn("rnk", row_number().over(wRank).cast("long"))
      .filter(col("rnk") <= k)
      .select("rnk", "vec_id", "cell", "cos_sim")
      .orderBy("rnk")
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
    val w = Window.orderBy(desc("cos_sim"), col("vec_id"))
    e.join(docs, e("vec_id") === docs("doc_id"))
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), col("lang"),
        pround(dot_product(col("v"), col("pv")) / (col("norm") * col("pnorm")), 4)
          .as("cos_sim"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("rnk", "vec_id", "lang", "cos_sim")
      .orderBy("rnk")
  }

  /** Embedding-cosine near-dup: top-k most-similar distinct pairs. The
    * all-pairs form is exact for the small test corpus; the scale path is
    * the LSH-blocked variant (join on bucket instead of cross join). The
    * TakeOrdered limit keeps only k rows per partition in flight. */
  def nearDupPairs(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val e = withNorm(spark, dir)
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        pround(dot_product(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm")), 4)
          .as("cos_sim"))
      .orderBy(desc("cos_sim"), col("vec_a"), col("vec_b"))
      .limit(k)
  }
}
