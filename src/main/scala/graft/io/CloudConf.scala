package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession

/** Object-store (s3a) configuration plumbing — the analog of the
  * reference's boto3-client-from-environment setup
  * (`prefect_flows.py:30-72`: credentials + endpoint from env/config,
  * `aws_config.yaml:4-5`: bucket/region). The engine itself is
  * Hadoop-FS-generic: every Sources/Sinks/Incremental path works the same
  * on `file://`, `hdfs://`, or `s3a://bucket/prefix` once these settings
  * are on the Hadoop configuration.
  *
  * Usage: `CloudConf.applyS3a(spark)` once after session construction,
  * then pass `s3a://bucket/raw`-style paths to TaxiJob/Incremental/Sinks.
  *
  * Layout notes for object stores (no atomic rename):
  *   - the processed-files tracker is an append-only directory of parquet
  *     objects (one PUT per run, never rename/delete of live state) —
  *     see Incremental.appendTracker;
  *   - the watermark is a single-key overwrite (PUT is atomic per object);
  *   - for parquet/CSV sinks prefer the cloud-native committers
  *     ("magic" committer: `fs.s3a.committer.name=magic`) over the default
  *     rename-based FileOutputCommitter.
  */
object CloudConf {

  /** Standard AWS environment variables → fs.s3a.* settings. Settings are
    * only written when the variable is present, so local runs are no-ops.
    * `env` is injectable for tests. */
  def s3aSettings(env: Map[String, String] = sys.env): Map[String, String] = {
    val b = Map.newBuilder[String, String]
    env.get("AWS_ACCESS_KEY_ID").foreach(b += "fs.s3a.access.key" -> _)
    env.get("AWS_SECRET_ACCESS_KEY").foreach(b += "fs.s3a.secret.key" -> _)
    env.get("AWS_SESSION_TOKEN").foreach { t =>
      b += "fs.s3a.session.token" -> t
      b += "fs.s3a.aws.credentials.provider" ->
        "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider"
    }
    // custom endpoint (minio/localstack/r2): path-style addressing required
    env.get("AWS_ENDPOINT_URL_S3").orElse(env.get("AWS_ENDPOINT_URL")).foreach { e =>
      b += "fs.s3a.endpoint" -> e
      b += "fs.s3a.path.style.access" -> "true"
    }
    env.get("AWS_REGION").foreach(b += "fs.s3a.endpoint.region" -> _)
    b.result()
  }

  def applyS3a(conf: Configuration, env: Map[String, String]): Configuration = {
    s3aSettings(env).foreach { case (k, v) => conf.set(k, v) }
    conf
  }

  def applyS3a(spark: SparkSession, env: Map[String, String] = sys.env): Unit =
    applyS3a(spark.sparkContext.hadoopConfiguration, env)
}
