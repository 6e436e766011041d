package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CloudFs

/** Mirrors the reference's fs dispatch tier (`tests/unit/test_fs.py:7-28`):
  * cloud-path predicate, alias rewriting, anon-iff-public-endpoint.
  */
class CloudFsSpec extends AnyFunSuite {

  test("cloud-path predicate (fs.py:16-31)") {
    assert(CloudFs.isCloudPath("gs://bucket/ds"))
    assert(CloudFs.isCloudPath("s3://bucket/ds"))
    assert(CloudFs.isCloudPath("https://storage.googleapis.com/bucket/ds"))
    assert(CloudFs.isCloudPath("https://s3.amazonaws.com/bucket/ds"))
    assert(!CloudFs.isCloudPath("/local/path"))
    assert(!CloudFs.isCloudPath("file:///local/path"))
    assert(!CloudFs.isCloudPath("https://example.com/bucket"))
  }

  test("alias rewriting to Hadoop-native schemes (fs.py:69,75)") {
    assert(CloudFs.normalizeUrl("https://storage.googleapis.com/b/p") == "gs://b/p")
    assert(CloudFs.normalizeUrl("https://s3.amazonaws.com/b/p") == "s3a://b/p")
    assert(CloudFs.normalizeUrl("s3://b/p") == "s3a://b/p")
    assert(CloudFs.normalizeUrl("gs://b/p") == "gs://b/p")
    assert(CloudFs.normalizeUrl("/local/p") == "/local/p")
  }

  test("anonymous iff the path is the public endpoint (fs.py:67)") {
    assert(CloudFs.isAnonymous("gs://pinecone-datasets-dev"))
    // the HTTPS alias of the endpoint is the same location
    assert(CloudFs.isAnonymous("https://storage.googleapis.com/pinecone-datasets-dev"))
    assert(!CloudFs.isAnonymous("gs://pinecone-datasets-dev/some-ds"))
    assert(!CloudFs.isAnonymous("gs://private-bucket"))
    // custom endpoint (env-overridden catalogs)
    assert(CloudFs.isAnonymous("s3://my-public", endpoint = "s3://my-public"))
  }

  test("anon access maps to the connectors' unauthenticated modes") {
    assert(CloudFs.hadoopConfFor("gs://pinecone-datasets-dev") ==
      Map("fs.gs.auth.type" -> "UNAUTHENTICATED"))
    // s3a scopes per-bucket, so the anon override can't leak across buckets
    assert(CloudFs.hadoopConfFor("s3://pub", endpoint = "s3://pub") ==
      Map("fs.s3a.bucket.pub.aws.credentials.provider" ->
        "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"))
    // authenticated paths leave the ambient credential chain untouched
    assert(CloudFs.hadoopConfFor("gs://private/ds").isEmpty)
    assert(CloudFs.hadoopConfFor("/local/ds").isEmpty)
  }

  test("configure is last-wins, never sticky-anon") {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    // anon endpoint first: sets the gs unauthenticated mode
    CloudFs.configure(conf, "gs://pinecone-datasets-dev", CloudFs.PublicEndpoint)
    assert(conf.get("fs.gs.auth.type") == "UNAUTHENTICATED")
    // a later authenticated gs path clears it (the sticky-anon regression)
    CloudFs.configure(conf, "gs://private-bucket/ds", CloudFs.PublicEndpoint)
    assert(conf.get("fs.gs.auth.type") == null)
    // s3a anon is per-bucket: anonymizing one bucket leaves others alone
    CloudFs.configure(conf, "s3://pub", "s3://pub")
    assert(conf.get("fs.s3a.bucket.pub.aws.credentials.provider") != null)
    assert(conf.get("fs.s3a.bucket.other.aws.credentials.provider") == null)
    CloudFs.configure(conf, "s3://pub/sub", "s3://pub")
    assert(conf.get("fs.s3a.bucket.pub.aws.credentials.provider") == null,
      "non-endpoint path under the same bucket restores ambient creds")
  }

  test("configure restores cluster-provided auth config instead of deleting it") {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    // cluster core-site.xml equivalent: an admin-provided auth mode
    conf.set("fs.gs.auth.type", "SERVICE_ACCOUNT_JSON_KEYFILE")
    // a non-anonymous path must NOT touch config configure() never set
    CloudFs.configure(conf, "gs://private-a/ds", CloudFs.PublicEndpoint)
    assert(conf.get("fs.gs.auth.type") == "SERVICE_ACCOUNT_JSON_KEYFILE")
    // anon endpoint displaces it; the next authenticated path RESTORES the
    // admin value rather than unsetting the key
    CloudFs.configure(conf, "gs://pinecone-datasets-dev", CloudFs.PublicEndpoint)
    assert(conf.get("fs.gs.auth.type") == "UNAUTHENTICATED")
    CloudFs.configure(conf, "gs://private-a/ds", CloudFs.PublicEndpoint)
    assert(conf.get("fs.gs.auth.type") == "SERVICE_ACCOUNT_JSON_KEYFILE")
  }
}
