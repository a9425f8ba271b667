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

  /** Cloud-native committer settings, always applied: S3A's "magic"
    * committer writes task output as in-flight multipart uploads completed
    * at job commit — zero copy-rename of committed data, the committer the
    * layout notes above assume. Consumed by S3AFileSystem when hadoop-aws
    * is on the classpath; inert strings otherwise, so local runs are
    * unaffected. */
  val committerSettings: Map[String, String] = Map(
    "fs.s3a.committer.name" -> "magic",
    "fs.s3a.committer.magic.enabled" -> "true",
    "mapreduce.outputcommitter.factory.scheme.s3a" ->
      "org.apache.hadoop.fs.s3a.commit.S3ACommitterFactory")

  /** Spark-side binding for the S3A committers (spark-hadoop-cloud module).
    * Set only when the classes are deployable — this container ships
    * neither hadoop-aws nor spark-hadoop-cloud, so the call is a recorded
    * no-op here and activates on a real cluster. Returns whether it bound. */
  def applySparkCommitterProtocol(spark: SparkSession): Boolean = {
    val protocol = "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
    val binding = "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
    val loadable =
      try { Class.forName(protocol); Class.forName(binding); true }
      catch { case _: ClassNotFoundException => false }
    if (loadable) {
      spark.conf.set("spark.sql.sources.commitProtocolClass", protocol)
      spark.conf.set("spark.sql.parquet.output.committer.class", binding)
    }
    loadable
  }

  /** Standard AWS environment variables → fs.s3a.* settings. Env-derived
    * settings are only written when the variable is present, so local runs
    * are no-ops; committer settings are unconditional (inert without s3a).
    * `env` is injectable for tests. */
  def s3aSettings(env: Map[String, String] = sys.env): Map[String, String] = {
    val b = Map.newBuilder[String, String]
    b ++= committerSettings
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

  def applyS3a(spark: SparkSession, env: Map[String, String] = sys.env): Unit = {
    applyS3a(spark.sparkContext.hadoopConfiguration, env)
    applySparkCommitterProtocol(spark)
  }
}
