package graft.operators

import org.apache.spark.sql.functions._
import graft.ext.Web
import QueryDsl._

/** Crawl-curation operators as catalog queries. The test tables carry no
  * real URLs, so each query derives a deterministic URL/host fixture from
  * `documents` columns — IDENTICALLY in the Spark code and the DuckDB
  * oracle — and then runs the [[graft.ext.Web]] operator under test on it.
  */
object WebQueries {

  // Fixture: a messy-but-deterministic URL per doc — mixed case, www,
  // default and non-default ports, trailing slash, tracking params in
  // unsorted order, fragment; every 19th doc is scheme-less (canonical →
  // NULL). The CASE arms are mirrored verbatim in the oracle SQL.
  private def fixtureUrl = {
    val tail = concat(
      lit("/Docs/"), col("doc_id").cast("string"),
      when(col("doc_id") % 2 === 0, lit("/")).otherwise(lit("")),
      lit("?utm_source=Feed&b=2&a=1"),
      when(col("doc_id") % 5 === 0, lit("&fbclid=XYZ&z=9")).otherwise(lit("")),
      lit("#Frag"))
    when(col("doc_id") % 19 === 0,
      concat(lit("schemeless.example.com"), tail))
      .otherwise(concat(
        lit("HTTPS://WWW.Src"), (col("doc_id") % 20).cast("string"),
        when(col("doc_id") % 13 === 0, lit(".GitHub.IO")) // PSL private suffix
          .when(col("doc_id") % 7 === 0, lit(".CO.UK"))
          .otherwise(lit(".Example.COM")),
        when(col("doc_id") % 3 === 0, lit(":443"))
          .when(col("doc_id") % 3 === 1, lit(":8443"))
          .otherwise(lit("")),
        tail))
  }

  private val fixtureUrlSql: String = """
      CASE WHEN doc_id % 19 = 0 THEN 'schemeless.example.com' ELSE
        'HTTPS://WWW.Src' || CAST(doc_id % 20 AS VARCHAR)
        || CASE WHEN doc_id % 13 = 0 THEN '.GitHub.IO'
                WHEN doc_id % 7 = 0 THEN '.CO.UK' ELSE '.Example.COM' END
        || CASE WHEN doc_id % 3 = 0 THEN ':443'
                WHEN doc_id % 3 = 1 THEN ':8443' ELSE '' END
      END
      || '/Docs/' || CAST(doc_id AS VARCHAR)
      || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
      || '?utm_source=Feed&b=2&a=1'
      || CASE WHEN doc_id % 5 = 0 THEN '&fbclid=XYZ&z=9' ELSE '' END
      || '#Frag'"""

  private val trackingSql: String =
    Web.TrackingParams.map(p => s"'$p'").mkString("(", ", ", ")")
  private val multiTldSql: String =
    Web.MultiPartTlds.map(t => s"'$t'").mkString("(", ", ", ")")

  val all: Seq[CatalogQuery] = Seq(

    // URL canonicalization + registered domain — the URL-level-dedup key
    // and the domain-mixing key of a crawl pipeline, as one codegen'd
    // zero-shuffle projection.
    CatalogQuery(
      "d37_url_canonicalize",
      (s, dir) => {
        // widen: ~15 regex/HOF passes per row are the heavy stage — a
        // single-file local read must not serialize them onto one core
        val withUrl = graft.ext.Parallelism.widen(t(s, dir, "documents"))
          .withColumn("url", fixtureUrl)
        val h = Web.host(col("url"))
        withUrl.select(
          col("doc_id"),
          Web.canonicalizeUrl(col("url")).as("url_canon"),
          h.as("host"),
          Web.registeredDomain(h).as("domain"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH u AS (
          SELECT doc_id, $fixtureUrlSql AS url FROM documents),
        parts AS (
          SELECT doc_id, url,
            lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch,
            regexp_replace(
              lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
              '^[^@]*@', '') AS hp,
            regexp_replace(
              regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1),
              '/+$$', '') AS path,
            regexp_extract(url, '^[^#?]*\\?([^#]*)', 1) AS rawq
          FROM u),
        canon AS (
          SELECT doc_id,
            sch,
            regexp_replace(regexp_replace(hp, ':[0-9]+$$', ''), '^www\\.', '') AS host,
            regexp_replace(
              CASE WHEN sch = 'http'  THEN regexp_replace(hp, ':80$$', '')
                   WHEN sch = 'https' THEN regexp_replace(hp, ':443$$', '')
                   ELSE hp END,
              '^www\\.', '') AS hcanon,
            path,
            array_to_string(list_sort(list_filter(string_split(rawq, '&'),
              p -> length(p) > 0
                AND NOT starts_with(lower(split_part(p, '=', 1)), 'utm_')
                AND lower(split_part(p, '=', 1)) NOT IN $trackingSql)), '&') AS q
          FROM parts),
        dom AS (
          SELECT doc_id, sch, host, hcanon, path, q,
            string_split(host, '.') AS labels
          FROM canon)
        SELECT doc_id,
          CASE WHEN length(sch) = 0 OR length(hcanon) = 0 THEN NULL
               ELSE sch || '://' || hcanon || path
                 || CASE WHEN length(q) > 0 THEN '?' || q ELSE '' END
          END AS url_canon,
          host,
          -- mirrors the PSL result on the fixture's domain universe:
          -- github.io is a PSL (private-section) public suffix, so the
          -- registered domain keeps the user label; the remaining arms
          -- reproduce the com/co.uk outcomes the generic list shares
          CASE WHEN host LIKE '%.github.io' THEN host
               WHEN len(labels) >= 3
                 AND (labels[-2] || '.' || labels[-1]) IN $multiTldSql
                 THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
               WHEN len(labels) >= 2 THEN labels[-2] || '.' || labels[-1]
               ELSE host END AS domain
        FROM dom ORDER BY doc_id""")),

    // Per-domain cap: at most 20 docs per domain, deterministic portable-
    // hash ranking; the fixture plants one zipf-head domain (every 3rd doc)
    // among 37 small ones, so both the windowed over-cap path and the
    // anti-join pass-through path execute.
    CatalogQuery(
      "d38_domain_cap",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"),
          when(col("doc_id") % 3 === 0, lit("heavy.example.com"))
            .otherwise(concat(lit("d"), (col("doc_id") % 37).cast("string"),
              lit(".example.com"))).as("domain"))
        Web.domainCap(d, "domain", "doc_id", cap = 20)
          .select(col("doc_id"), col("domain"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (
          SELECT doc_id,
            CASE WHEN doc_id % 3 = 0 THEN 'heavy.example.com'
                 ELSE 'd' || CAST(doc_id % 37 AS VARCHAR) || '.example.com'
            END AS domain
          FROM documents),
        r AS (
          SELECT doc_id, domain,
            row_number() OVER (PARTITION BY domain ORDER BY
              CAST(('0x' || substr(md5('cap:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
              doc_id) AS rk
          FROM d)
        SELECT doc_id, domain FROM r WHERE rk <= 20 ORDER BY doc_id""")),

    // Blocklist filtering: drop hosts equal to or under a blocked domain.
    // Literal blocklist → a pure zero-shuffle scan+filter (arrays_overlap
    // on the bounded suffix set); the fixture plants exact matches, deep
    // subdomains, and a same-string-suffix NON-match ('nottracker.net').
    CatalogQuery(
      "d39_blocklist_filter",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"),
          when(col("doc_id") % 11 === 0, lit("ads.tracker.net"))
            .when(col("doc_id") % 13 === 0, lit("spam.example"))
            .when(col("doc_id") % 5 === 0, lit("deep.sub.ads.tracker.net"))
            .when(col("doc_id") % 7 === 0, lit("nottracker.net"))
            .otherwise(concat(lit("ok"), (col("doc_id") % 17).cast("string"),
              lit(".good.org"))).as("host"))
        Web.blocklistFilter(d, "host", Seq("tracker.net", "spam.example"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (
          SELECT doc_id,
            CASE WHEN doc_id % 11 = 0 THEN 'ads.tracker.net'
                 WHEN doc_id % 13 = 0 THEN 'spam.example'
                 WHEN doc_id % 5 = 0 THEN 'deep.sub.ads.tracker.net'
                 WHEN doc_id % 7 = 0 THEN 'nottracker.net'
                 ELSE 'ok' || CAST(doc_id % 17 AS VARCHAR) || '.good.org'
            END AS host
          FROM documents)
        SELECT doc_id, host FROM d
        WHERE NOT (host = 'tracker.net' OR host LIKE '%.tracker.net'
                OR host = 'spam.example' OR host LIKE '%.spam.example')
        ORDER BY doc_id""")),

    // Persisted URL-level exact dedup: two-batch SeenKeyIndex ingest on
    // the canonical-URL hash == one-shot first-doc-per-canonical-URL
    // (batches arrive in ascending doc-id order — the index sequencing
    // contract, same oracle pattern as d26/d31/e12). The fixture URL
    // varies only in case, www, tracking params, and fragment within a
    // canonical group, so the equivalence also re-proves canonicalization
    // as the dedup key.
    CatalogQuery(
      "d40_url_dedup_index",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"),
          concat(lit("HTTPS://WWW.S"), (col("doc_id") % 300).cast("string"),
            lit(".Example.COM/page?utm_c="), col("doc_id").cast("string"),
            lit("#top")).as("url"))
          .withColumn("url_canon", Web.canonicalizeUrl(col("url")))
        val tmp = java.nio.file.Files.createTempDirectory("graft-d40-").toString
        // throwaway index: no file stats (nothing ever data-skips it)
        implicit val st: graft.conf.GraftSettings =
          graft.conf.GraftSettings.default.copy(collectFileStats = false)
        val idx = new graft.ext.SeenKeyIndex(s, s"file://$tmp")
        def key = when(col("url_canon").isNotNull, xxhash64(col("url_canon")))
        val out1 = idx.filterNovel(docs.filter(col("doc_id") < 250), "doc_id", key)
        val out2 = idx.filterNovel(docs.filter(col("doc_id") >= 250), "doc_id", key)
        val out = out1.unionByName(out2)
          .select(col("doc_id"), col("url_canon"))
          .orderBy(col("doc_id"))
          .transform(graft.ext.Parallelism.checkpointTracked) // materialize, then drop the scratch index
        graft.lake.FsUtils.deletePath(s, s"file://$tmp")
        out
      },
      Some("""WITH u AS (
          SELECT doc_id,
            'https://s' || CAST(doc_id % 300 AS VARCHAR) || '.example.com/page'
              AS url_canon
          FROM documents),
        w AS (
          SELECT doc_id, url_canon,
            row_number() OVER (PARTITION BY url_canon ORDER BY doc_id) AS rk
          FROM u)
        SELECT doc_id, url_canon FROM w WHERE rk = 1 ORDER BY doc_id""")),

    // Owner-tracked URL dedup with deletion: batch 1 claims keys, the
    // winners divisible by 10 are erased (recrawl / right-to-erasure),
    // and batch 2 re-admits exactly the released keys with new winners —
    // still-owned keys keep rejecting. The oracle replays the same policy
    // with window logic: batch-1 winners, minus released, gate batch 2.
    CatalogQuery(
      "d41_url_dedup_release",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), (col("doc_id") % 100).as("k"))
        val tmp = java.nio.file.Files.createTempDirectory("graft-d41-").toString
        // throwaway index: no file stats (nothing ever data-skips it)
        implicit val st: graft.conf.GraftSettings =
          graft.conf.GraftSettings.default.copy(collectFileStats = false)
        val idx = new graft.ext.SeenKeyIndex(s, s"file://$tmp", trackOwners = true)
        val out1 = idx.filterNovel(docs.filter(col("doc_id") < 250), "doc_id", col("k"))
          .transform(graft.ext.Parallelism.checkpointTracked)
        idx.remove(out1.filter(col("doc_id") % 10 === 0).select("doc_id"), "doc_id")
        val out2 = idx.filterNovel(docs.filter(col("doc_id") >= 250), "doc_id", col("k"))
        val out = out1.unionByName(out2)
          .select(col("doc_id"), col("k"))
          .orderBy(col("doc_id"))
          .transform(graft.ext.Parallelism.checkpointTracked) // materialize, then drop the scratch index
        graft.lake.FsUtils.deletePath(s, s"file://$tmp")
        out
      },
      Some("""WITH k1 AS (
          SELECT doc_id, doc_id % 100 AS k FROM documents WHERE doc_id < 250),
        w1 AS (SELECT k, min(doc_id) AS doc_id FROM k1 GROUP BY k),
        k2 AS (
          SELECT doc_id, doc_id % 100 AS k FROM documents WHERE doc_id >= 250),
        w2 AS (SELECT k, min(doc_id) AS doc_id FROM k2 GROUP BY k),
        out2 AS (
          SELECT doc_id, k FROM w2
          WHERE k NOT IN (SELECT k FROM w1 WHERE doc_id % 10 <> 0))
        SELECT doc_id, k FROM w1
        UNION ALL SELECT doc_id, k FROM out2
        ORDER BY doc_id"""))
  )
}
