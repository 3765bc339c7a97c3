package graft.pipeline

import graft.{Q, Tables => T}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-corpus curation operators: URL normalization and per-domain corpus
  * profiling — the canonicalization step every crawl-derived training set
  * runs before URL-level dedup (the same URL crawled twice with different
  * tracking parameters / fragments / case must collapse to one key).
  *
  * Scale design: per-row string expressions only (codegen'd regexps, no
  * UDFs, zero shuffle for the normalize pass); the domain profile is one
  * narrow (domain) hash aggregation. At 100 TB the normalized URL becomes
  * the dedup/grouping key, so it must be deterministic across engines —
  * the whole chain is expressible in both Spark and DuckDB and is
  * oracle-checked bit-for-bit.
  *
  * (The synthetic `documents` table carries no URL column; the queries
  * synthesize deterministic messy URLs from (source, doc_id) — the operator
  * under oracle test is the normalizer itself.)
  */
object Web {

  /** Canonicalize a URL:
    *  1. lowercase the scheme and authority (host) — case-insensitive per
    *     RFC 3986; path/query stay case-sensitive
    *  2. drop the fragment (`#...` never reaches the server)
    *  3. drop tracking parameters (`utm_*`, `fbclid`, `gclid`, `ref`)
    *  4. strip default ports (`:80`/`:443`)
    *  5. clean dangling `?`/`&` left by (3)
    */
  def normalizeUrl(url: Column): Column = {
    // 1. scheme://authority prefix, lowercased, re-attached to the rest
    val prefix = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", 0)
    val lowered =
      concat(lower(prefix), url.substr(length(prefix) + 1, length(url)))
    step(lowered)
  }

  private def step(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val noTrack = regexp_replace(noFrag,
      "(?:utm_[A-Za-z0-9_]+|fbclid|gclid|ref)=[^&#]*&?", "")
    val noPort = regexp_replace(noTrack, ":(?:80|443)(/|$)", "$1")
    regexp_replace(noPort, "[?&]+$", "")
  }

  /** Registrable-domain heuristic: strip a leading `www.` from the host.
    * (Public-suffix-list parsing is a lookup table, not an algorithm —
    * out of scope; `www.` covers the dominant alias in practice.)
    */
  def domainOf(url: Column): Column =
    regexp_replace(
      regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]*)", 1),
      "^www\\.", "")

  /** Deterministic messy URL per (source, doc_id): mixed-case scheme/host,
    * default port, and per-residue tracking params / fragments.
    */
  private def syntheticUrl(source: Column, docId: Column): Column = {
    val id = docId.cast("string")
    val base = concat(lit("HTTPS://WWW."), source,
      lit(".Example.COM:443/Articles/"), id)
    val suffix = when(docId % 4 === 0,
        concat(lit("?utm_source=feed&id="), id))
      .when(docId % 4 === 1,
        concat(lit("?id="), id, lit("&utm_campaign=x&ref=tw#top")))
      .when(docId % 4 === 2, lit("#section-2"))
      .otherwise(concat(lit("?id="), id))
    concat(base, suffix)
  }

  val queries: Map[String, Q] = Map(
    // W1: URL canonicalization — the oracle reproduces every step, so the
    // normalized key is proven engine-portable (it IS the dedup key at
    // scale). Zero-shuffle per-row pass.
    "q_web_urlnorm" -> ((s, dir) => {
      T.documents(s, dir).select(
        col("doc_id"),
        syntheticUrl(col("source"), col("doc_id")).as("url"))
        .withColumn("url_norm", normalizeUrl(col("url")))
        .withColumn("domain", domainOf(col("url_norm")))
    }),

    // W2: per-domain corpus profile — doc count, distinct normalized URLs
    // (URL-level dedup cardinality), and total characters per domain. One
    // narrow hash aggregation on the domain key.
    "q_web_domains" -> ((s, dir) => {
      T.documents(s, dir)
        .withColumn("u", normalizeUrl(syntheticUrl(col("source"), col("doc_id"))))
        .groupBy(domainOf(col("u")).as("domain"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("u")).as("n_urls"),
          sum(col("n_chars")).as("total_chars"))
    })
  )

  // Single-line fragments: these interpolate into stripMargin oracle
  // templates, where a continuation line starting with "||" would lose a
  // pipe to the outer stripMargin.
  private val synthSql =
    """'HTTPS://WWW.' || source || '.Example.COM:443/Articles/' || doc_id ||
      |  CASE CAST(doc_id % 4 AS INTEGER)
      |    WHEN 0 THEN '?utm_source=feed&id=' || doc_id
      |    WHEN 1 THEN '?id=' || doc_id || '&utm_campaign=x&ref=tw#top'
      |    WHEN 2 THEN '#section-2'
      |    ELSE '?id=' || doc_id END""".stripMargin.replaceAll("\\s+", " ")

  // DuckDB regexp_replace needs the explicit 'g' flag (Spark is global by
  // default); patterns and step order mirror normalizeUrl exactly.
  private val normSql =
    """regexp_replace(
      |  regexp_replace(
      |    regexp_replace(
      |      regexp_replace(
      |        lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*'))
      |          || substring(url, length(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*')) + 1),
      |        '#.*$', '', 'g'),
      |      '(?:utm_[A-Za-z0-9_]+|fbclid|gclid|ref)=[^&#]*&?', '', 'g'),
      |    ':(?:80|443)(/|$)', '\1', 'g'),
      |  '[?&]+$', '', 'g')""".stripMargin.replaceAll("\\s+", " ")

  private val domainSql =
    """regexp_replace(regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]*)', 1), '^www\.', '', 'g')"""

  val oracles: Map[String, String] = Map(
    "q_web_urlnorm" ->
      s"""WITH t AS (SELECT doc_id, $synthSql AS url FROM documents),
         |n AS (SELECT doc_id, url, $normSql AS u FROM t)
         |SELECT doc_id, url, u AS url_norm, $domainSql AS domain
         |FROM n ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_web_domains" ->
      s"""WITH t AS (SELECT doc_id, n_chars, $synthSql AS url FROM documents),
         |n AS (SELECT doc_id, n_chars, $normSql AS u FROM t)
         |SELECT $domainSql AS domain,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT u) AS BIGINT) AS n_urls,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM n GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin
  )
}
