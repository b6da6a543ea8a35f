package graft.operators

import graft.SparkSpec

class UrlNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(UrlNormalize.canonical($"url")).as[String]
      .collect().toSeq

  test("case, www, default port, trailing slash, fragment all normalize") {
    assert(canon(
      "HTTPS://WWW.Example.COM:443/Posts/A1/",
      "https://example.com/Posts/A1",
      "http://www.example.com:80/x#frag",
      "https://example.com/") == Seq(
      "https://example.com/Posts/A1", // path case PRESERVED, slash stripped
      "https://example.com/Posts/A1",
      "http://example.com/x",
      "https://example.com"))        // root path ≡ empty path
  }

  test("non-default ports and foreign schemes keep their authority") {
    assert(canon(
      "https://example.com:8443/x", // 8443 is a DIFFERENT resource
      "http://example.com:443/x",   // 443 is non-default FOR http
      "ftp://Example.com:80/x"      // unknown scheme: no port stripping
    ) == Seq(
      "https://example.com:8443/x",
      "http://example.com:443/x",
      "ftp://example.com:80/x"))
  }

  test("tracking params drop, survivors sort, name-prefix is not a match") {
    assert(canon(
      "https://e.com/x?utm_source=a&b=2&a=1&fbclid=z",
      "https://e.com/x?a=1&b=2",
      // 'refresh' must NOT be dropped by the 'ref' rule; bare flag kept
      "https://e.com/x?refresh=1&flag",
      // all params tracking → no '?' at all
      "https://e.com/x?utm_a=1&gclid=2"
    ) == Seq(
      "https://e.com/x?a=1&b=2",
      "https://e.com/x?a=1&b=2",
      "https://e.com/x?flag&refresh=1",
      "https://e.com/x"))
  }

  test("scheme difference is identity-preserving (http ≠ https)") {
    val Seq(a, b) = canon("http://e.com/x", "https://e.com/x")
    assert(a != b)
  }

  test("synthetic fixture clusters exactly as designed: 3 / 1 / 2") {
    val df = spark.range(0, 60).toDF("doc_id")
      .select($"doc_id",
        UrlNormalize.canonical(UrlNormalize.syntheticUrl($"doc_id"))
          .as("canon"))
    val sizes = df.groupBy($"canon").count()
      .groupBy($"count").count().as[(Long, Long)].collect().toMap
    // 10 article triples with variants (0,1,2) → clusters of 3;
    // 10 triples with (3,4,5) → an http singleton + an https pair each
    assert(sizes == Map(3L -> 10L, 1L -> 10L, 2L -> 10L))
  }
}
