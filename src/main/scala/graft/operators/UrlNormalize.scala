package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the identity key of a from-raw-web corpus. Every
  * crawl-derived pipeline (C4, CCNet, RefinedWeb) dedups on a NORMALIZED
  * URL before any content pass, because the same article is fetched under
  * scheme/case/port/tracking-param/fragment variants that are textually
  * distinct but name one resource (RFC 3986 §6 syntax-based normalization
  * plus the tracking-param strip every crawler adds on top).
  *
  * Rules, all integer/string-exact and mirrored verbatim in the DuckDB
  * oracle twin:
  *   1. drop the fragment (`#...` — client-side only, RFC 3986 §3.5);
  *   2. lowercase scheme and host (§6.2.2.1 case normalization);
  *   3. strip a leading `www.` label (crawler convention, not RFC);
  *   4. strip an explicit default port (`:80` http, `:443` https, §6.2.3);
  *   5. strip one trailing `/` from a non-root path (§6.2.3 empty-path /
  *      root-path equivalence, extended to directory-form paths the way
  *      C4's dedup key does);
  *   6. drop tracking query params (`utm_*`, `fbclid`, `gclid`, `ref`,
  *      `mc_eid`, `igshid`), then SORT the survivors byte-wise (param
  *      order never changes the resource) and re-join.
  *
  * Pure map-side column algebra — codegen'd, no UDF, no shuffle: at 100 TB
  * the canonical key is computed inside the scan projection, and the dedup
  * it feeds is an ordinary hash-partitioned groupBy on a high-cardinality
  * uniform key (no skew: hosts hash apart, and the key includes the path).
  */
object UrlNormalize {

  /** Tracking params dropped before the sort: exact names. `utm_*` is a
    * prefix class and handled separately. */
  val TrackingParams: Seq[String] = Seq("fbclid", "gclid", "ref", "mc_eid",
    "igshid")

  private def fragmentless(url: Column): Column =
    regexp_replace(url, "#.*$", "")

  /** scheme (lowercased) of a `scheme://...` URL. */
  def scheme(url: Column): Column =
    lower(regexp_extract(fragmentless(url), "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Canonical host: lowercased, `www.` stripped, default port stripped
    * (any other explicit port is kept — it names a different authority). */
  def host(url: Column): Column = {
    val auth = lower(regexp_extract(fragmentless(url), "^[^:]+://([^/?]+)", 1))
    val noWww = regexp_replace(auth, "^www\\.", "")
    when(scheme(url) === "http", regexp_replace(noWww, ":80$", ""))
      .when(scheme(url) === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
  }

  /** Canonical path: `/…`, one trailing slash stripped unless the path IS
    * the root; empty path → empty string (scheme://host alone). */
  def path(url: Column): Column = {
    val p = regexp_extract(fragmentless(url), "^[^:]+://[^/?]+(/[^?]*)", 1)
    when(p === "/", "").otherwise(regexp_replace(p, "/$", ""))
  }

  /** Canonical query: tracking params dropped, survivors byte-sorted and
    * re-joined with `&`; no survivors → empty string (no `?`). */
  def query(url: Column): Column = {
    val q = regexp_extract(fragmentless(url), "\\?(.*)$", 1)
    val params = filter(split(q, "&"), p =>
      p =!= "" &&
        !p.startsWith("utm_") &&
        !array_contains(array(TrackingParams.map(lit): _*),
          split(p, "=").getItem(0)))
    val sorted = array_join(array_sort(params), "&")
    when(sorted === "", "").otherwise(concat(lit("?"), sorted))
  }

  /** The full canonical form: `scheme://host path query`. */
  def canonical(url: Column): Column =
    concat(scheme(url), lit("://"), host(url), path(url), query(url))

  /** Deterministic raw-URL synthesis for the query fixtures (the corpus has
    * no URL column — same move as [[HtmlExtract.syntheticPage]]): docs are
    * grouped 3-per-article (`article = doc_id div 3`, host from the article
    * so the whole group shares an authority), and `doc_id % 6` picks the
    * variant. Variants 0-2 are one resource under case/www/port/slash/
    * tracking noise (canonical cluster of 3); variant 3 is http — a
    * DIFFERENT scheme, and must NOT collapse into the https cluster;
    * variants 4 and 5 are one resource under param-order + fbclid noise
    * (cluster of 2). Built with `||`-style concat mirrored in the oracle. */
  def syntheticUrl(docId: Column): Column = {
    // integer div (doc_ids are non-negative; floor-of-double is exact ≤ 2^53)
    val article = floor(docId / lit(3)).cast("long")
    val hostN = (article % 7).cast("string")
    val a = article.cast("string")
    val id = docId.cast("string")
    val variant = docId % 6
    when(variant === 0, concat(
        lit("https://site"), hostN, lit(".example.com/posts/a"), a))
      .when(variant === 1, concat(
        lit("HTTPS://WWW.Site"), hostN, lit(".Example.COM:443/posts/a"), a,
        lit("/")))
      .when(variant === 2, concat(
        lit("https://site"), hostN, lit(".example.com/posts/a"), a,
        lit("?utm_source=feed&utm_campaign=c"), id))
      .when(variant === 3, concat(
        lit("http://site"), hostN, lit(".example.com:80/posts/a"), a,
        lit("#frag-"), id))
      .when(variant === 4, concat(
        lit("https://site"), hostN, lit(".example.com/posts/a"), a,
        lit("?b=2&a=1")))
      .otherwise(concat(
        lit("https://www.site"), hostN, lit(".example.com/posts/a"), a,
        lit("?a=1&fbclid=x"), id, lit("&b=2")))
  }
}
