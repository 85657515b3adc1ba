package graft

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

/** In-JVM S3-stand-in Hadoop FileSystem for the blob-seam contract
  * test: scheme `mock-s3`, objects stored on the local disk (the path
  * part of the URI is the local path), and the Configuration handed to
  * `initialize` recorded — so a test can assert that the PER-STORE
  * endpoint/region overrides actually reach the filesystem client, the
  * exact seam real `s3a` credentials travel through. */
class MockS3FileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mock-s3"
  override def getUri: java.net.URI =
    java.net.URI.create("mock-s3://bucket/")
  override def initialize(uri: java.net.URI,
                          conf: org.apache.hadoop.conf.Configuration): Unit = {
    super.initialize(uri, conf)
    MockS3FileSystem.inits.incrementAndGet()
    MockS3FileSystem.lastEndpoint.set(conf.get("fs.mock-s3.endpoint"))
    MockS3FileSystem.lastRegion.set(conf.get("fs.mock-s3.region"))
  }
}

object MockS3FileSystem {
  val inits = new AtomicLong
  val lastEndpoint = new AtomicReference[String]()
  val lastRegion = new AtomicReference[String]()
}
