package graft.io

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

/** s3a configuration plumbing (the prefect_flows.py:30-72 analog):
  * env vars → fs.s3a.* settings, no-op when absent. Pure config — no
  * object store required. */
class CloudConfSpec extends AnyFunSuite {

  test("standard AWS env vars map onto fs.s3a settings") {
    val conf = CloudConf.applyS3a(new Configuration(false), Map(
      "AWS_ACCESS_KEY_ID" -> "AKIA123",
      "AWS_SECRET_ACCESS_KEY" -> "secret",
      "AWS_SESSION_TOKEN" -> "tok",
      "AWS_ENDPOINT_URL" -> "http://localhost:9000",
      "AWS_REGION" -> "us-east-1"))
    assert(conf.get("fs.s3a.access.key") === "AKIA123")
    assert(conf.get("fs.s3a.secret.key") === "secret")
    assert(conf.get("fs.s3a.session.token") === "tok")
    assert(conf.get("fs.s3a.aws.credentials.provider")
      === "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider")
    assert(conf.get("fs.s3a.endpoint") === "http://localhost:9000")
    assert(conf.get("fs.s3a.path.style.access") === "true")
    assert(conf.get("fs.s3a.endpoint.region") === "us-east-1")
  }

  test("AWS_ENDPOINT_URL_S3 takes precedence over AWS_ENDPOINT_URL") {
    val s = CloudConf.s3aSettings(Map(
      "AWS_ENDPOINT_URL" -> "http://general",
      "AWS_ENDPOINT_URL_S3" -> "http://s3-specific"))
    assert(s("fs.s3a.endpoint") === "http://s3-specific")
  }

  test("no AWS env → only the inert committer settings (local runs unaffected)") {
    // the magic-committer keys are unconditional (consumed only when an
    // S3AFileSystem is instantiated); nothing env-derived appears
    assert(CloudConf.s3aSettings(Map.empty) === CloudConf.committerSettings)
    assert(CloudConf.committerSettings("fs.s3a.committer.name") === "magic")
    // static credentials without a session token must not force the
    // temporary-credentials provider
    val s = CloudConf.s3aSettings(Map(
      "AWS_ACCESS_KEY_ID" -> "k", "AWS_SECRET_ACCESS_KEY" -> "s"))
    assert(!s.contains("fs.s3a.aws.credentials.provider"))
  }
}
