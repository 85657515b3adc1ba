package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Urls

class UrlsSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("url").select(Urls.canonicalUrl(col("url"))).collect()
      .map(_.getString(0)).toSeq
  }

  test("canonicalUrl: case, www, default ports, fragments, utm_ " +
      "params and param order all normalize away") {
    assert(canon(
      "HTTPS://WWW.Site.COM:443/p?b=2&a=1",
      "https://site.com/p?a=1&b=2#frag",
      "https://Site.com/p?a=1&utm_source=feed&b=2",
      "http://WWW.site.com:80/p?a=1&b=2").distinct ==
      Seq("https://site.com/p?a=1&b=2", "http://site.com/p?a=1&b=2"))
  }

  test("canonicalUrl: non-default ports survive; empty path becomes " +
      "/; queries that empty out drop the ?") {
    assert(canon("https://site.com:8443/p") ==
      Seq("https://site.com:8443/p"))
    assert(canon("http://site.com:443/p") == // :443 is NOT http's default
      Seq("http://site.com:443/p"))
    assert(canon("https://site.com") == Seq("https://site.com/"))
    assert(canon("https://site.com/?utm_source=x&utm_medium=y") ==
      Seq("https://site.com/"))
  }

  test("canonicalHost on non-URL strings yields empty host (upstream " +
      "filter boundary)") {
    import spark.implicits._
    val hosts = Seq("not a url", "ftp-ish.thing/path", "")
      .toDF("url").select(Urls.canonicalHost(col("url"))).collect()
      .map(_.getString(0)).toSeq
    assert(hosts == Seq("", "", ""))
  }
}
