package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL hygiene for crawl curation — the step every CommonCrawl-derived
  * pipeline runs on [[Warc]]'s `target_uri` before URL-level dedup and
  * domain-level governance (C4 and RefinedWeb both gate on URL and
  * registered domain before touching page text).
  *
  * Everything is higher-order column algebra (regexp parse + array
  * sort/filter + reassembly) — codegen'd, no UDF, no kernel: URL
  * normalization is string work Catalyst's built-ins already express,
  * so unlike the HTML/WARC parsers there is nothing a custom
  * expression would fuse.
  *
  * Normalization contract (RFC 3986 §6 normalizations that preserve
  * semantics, plus the curation-standard tracking-param strip):
  *   - scheme and host lowercase;
  *   - default ports stripped (http:80, https:443);
  *   - fragment removed;
  *   - query parameters SORTED (byte order), tracking params dropped
  *     (utm_*, fbclid, gclid, msclkid, ref);
  *   - empty path becomes "/";
  *   - an empty post-strip query drops its "?".
  */
object UrlOps {

  private val TrackingParams = Seq("fbclid", "gclid", "msclkid", "ref")

  /** (scheme, host, port, path, query, fragment) of an absolute URL —
    * nulls for absent parts; every field null for a URL the parser
    * rejects (no `scheme://host`). One pass of the
    * [[graft.functions.UrlExpressions.UrlPartsExpr]] kernel (the regex
    * form re-ran its six-group pattern once per extracted group — ~18
    * regex executions per row across normalize + domain + blocklist).
    * Userinfo (`user:pass@`) is parsed past and DISCARDED: it is
    * deprecated in http URLs, and treating it as the host would both
    * mis-derive the registered domain and let
    * `https://junk@blocked.example/` evade a domain blocklist. */
  def urlParts(url: Column): Seq[(String, Column)] = {
    val p = graft.functions.UrlExpressions.urlParts(url)
    // identical kernel subtrees collapse via per-row subexpression
    // elimination (top-level projection fields, not lambda bodies)
    Seq("scheme", "host", "port", "path", "query", "fragment")
      .map(f => f -> p.getField(f))
  }

  /** The canonical form per the contract above; null for a URL the
    * parser rejects (no scheme://host). */
  def normalizeUrl(url: Column): Column = {
    val parts = urlParts(url).toMap
    val scheme = parts("scheme")
    val host = parts("host")
    val port = parts("port")
    val keepPort = port.isNotNull &&
      !((scheme === "http" && port === "80") || (scheme === "https" && port === "443"))
    val path = when(parts("path") === "", "/").otherwise(parts("path"))
    // sort query params byte-wise, drop tracking params (utm_* and the
    // named set); param identity is the full "k=v" token, matching the
    // curation convention (a bare "k" token sorts and survives as-is)
    val params = filter(
      array_sort(split(coalesce(parts("query"), lit("")), "&")),
      p => {
        // key compares case-insensitively ('UTM_Source', 'Fbclid' are
        // the same trackers) while the token itself survives verbatim
        val k = lower(split(p, "=").getItem(0))
        p =!= "" && !k.startsWith("utm_") &&
          !TrackingParams.map(t => k === lit(t)).reduce(_ || _)
      })
    val query = array_join(params, "&")
    when(scheme.isNull || host.isNull, lit(null).cast("string")).otherwise(concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(""),
      path,
      when(length(query) > 0, concat(lit("?"), query)).otherwise("")))
  }

  /** Two-level public suffixes common enough to matter without the full
    * PSL (offline posture; swap in the real list as index metadata in
    * deployment — the seam is this array literal). */
  private val TwoLevelTlds = Seq(
    "co.uk", "ac.uk", "gov.uk", "org.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "co.za", "com.tr", "com.ar", "com.sg")

  /** Registered domain of a host: label + public suffix ("example.co.uk"
    * for "a.b.example.co.uk", "example.org" for "www.example.org").
    * Bare/single-label and IP-literal hosts pass through unchanged. */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val isTwoLevel = TwoLevelTlds.map(t => last2 === lit(t)).reduce(_ || _)
    val isIp = host.rlike("^[0-9.]+$")
    when(isIp || n <= 2, host)
      .when(isTwoLevel, concat_ws(".",
        element_at(labels, -3), element_at(labels, -2), element_at(labels, -1)))
      .otherwise(last2)
  }

  /** Registered domain straight from a URL (null when unparseable). */
  def urlDomain(url: Column): Column = {
    val host = urlParts(url).toMap.apply("host")
    when(host.isNull, lit(null).cast("string")).otherwise(registeredDomain(host))
  }

  /** Blocklist gate: TRUE when the URL's registered domain is in
    * `blockedDomains` (ships as an array literal — a curation blocklist
    * is list-sized; at PSL scale store it as a broadcast-joined table
    * instead). */
  def domainBlocked(url: Column, blockedDomains: Seq[String]): Column =
    array_contains(
      array(blockedDomains.map(d => lit(d.toLowerCase)): _*), urlDomain(url))
}
