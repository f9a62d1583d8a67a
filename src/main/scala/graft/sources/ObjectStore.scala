package graft.sources

import org.apache.spark.sql.SparkSession

/** S9 — object-store client configuration (SURVEY S9): the Hadoop-S3A
  * equivalent of the reference's MinIO boto3 client
  * (`/root/reference/data/lake_writer.py:62-82`): endpoint override,
  * path-style access, adaptive retries ×3, 5 s connect / 30 s read
  * timeouts. Infra-level — call once per session before reading `s3a://`
  * paths; no effect on local file: paths.
  */
object ObjectStore {
  def configureS3a(spark: SparkSession, endpoint: String,
      accessKey: String, secretKey: String): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.s3a.endpoint", endpoint)
    hc.set("fs.s3a.access.key", accessKey)
    hc.set("fs.s3a.secret.key", secretKey)
    hc.set("fs.s3a.path.style.access", "true")           // MinIO-compatible
    hc.set("fs.s3a.attempts.maximum", "3")               // adaptive retries x3
    hc.set("fs.s3a.connection.establish.timeout", "5000")  // 5 s connect
    hc.set("fs.s3a.connection.timeout", "30000")           // 30 s read
    hc.set("fs.s3a.retry.mode", "adaptive")
  }
}
