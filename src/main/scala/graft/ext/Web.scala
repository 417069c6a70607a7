package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl/web curation operators: URL canonicalization, registered-domain
  * extraction, per-domain document capping, and domain-blocklist filtering.
  *
  * The reference curates CDC streams (`jibaro/datalake/cdc.py`), not crawls,
  * but a 100 TB training corpus starts at a crawl, and these are the standard
  * pre-dedup stages (URL-level exact dedup keys, domain mixing caps,
  * spam/ads blocklists — the CCNet / RefinedWeb / Dolma pipeline front end).
  * They compose with [[Warc]] (d32/d36 ingestion) and [[Dedup]] downstream.
  *
  * Scale discipline: everything here is codegen'd built-ins
  * (`regexp_extract`, array HOFs) — no UDFs, no driver-side data motion, and
  * the only shuffles are the per-domain aggregations that define the
  * operators' semantics. All outputs are engine-portable (any engine with
  * md5 + regex reproduces them bit-for-bit — the d15/d19 discipline), which
  * is what lets DuckDB oracle them.
  */
object Web {

  /** Tracking query parameters dropped during canonicalization: the
    * campaign/click identifiers that make otherwise-identical URLs distinct
    * (and would defeat URL-level exact dedup). `utm_*` is matched by
    * prefix; the rest exactly.
    */
  val TrackingParamPrefix: String = "utm_"
  val TrackingParams: Seq[String] =
    Seq("fbclid", "gclid", "msclkid", "mc_cid", "mc_eid", "igshid", "ref")

  /** Second-level public suffixes recognized by the HEURISTIC fallback of
    * [[registeredDomain]] (two labels, or three when the last two are a
    * known second-level suffix) — used only when the vendored Public
    * Suffix List resource is absent from the classpath. The heuristic is
    * exact on the suffixes listed here and wrong on anything it doesn't
    * know (`github.io`, wildcard and exception rules).
    */
  val MultiPartTlds: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "co.kr", "co.in",
    "co.nz", "co.za", "com.au", "com.br", "com.cn", "com.mx", "com.tr",
    "com.ar", "com.sg")

  /** Parsed Mozilla Public Suffix List (https://publicsuffix.org — MPL-2.0,
    * vendored verbatim under resources). Three rule classes:
    * `normal` plain suffix rules (`com`, `co.uk`, `github.io`),
    * `wildcardBases` the base of each `*.base` rule (any single extra
    * label under the base is a public suffix), and `exceptions` the target
    * of each `!rule` (the exception itself IS a registrable domain,
    * overriding the wildcard that would otherwise swallow it). */
  final case class PslRules(
      normal: Seq[String], wildcardBases: Seq[String], exceptions: Seq[String])

  /** The vendored PSL snapshot, or None when the resource is missing
    * (then [[registeredDomain]] degrades to the [[MultiPartTlds]]
    * heuristic). Loaded once per JVM — the rule sets become broadcast
    * `InSet` literals inside the column expressions, so lookup is a
    * per-row hash probe, not a scan, and no UDF is involved. */
  lazy val pslRules: Option[PslRules] = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    if (in == null) None
    else try {
      val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//")).toVector
      val (exc, rest) = lines.partition(_.startsWith("!"))
      val (wild, normal) = rest.partition(_.startsWith("*."))
      // The PSL publishes IDN rules in UNICODE (`公司.cn`), but hosts on the
      // wire are PUNYCODE (`xn--55qx5d.cn`) — without the ASCII form a
      // punycode host under a multi-label IDN suffix silently gets the
      // wrong registered domain (`xn--55qx5d.cn` instead of
      // `foo.xn--55qx5d.cn`). Index BOTH forms of every rule; rules the
      // JDK encoder rejects keep their unicode form only.
      def withAscii(rules: Seq[String]): Seq[String] = rules.flatMap { r =>
        val a = try java.net.IDN.toASCII(r) catch { case _: Exception => r }
        if (a == r) Seq(r) else Seq(r, a)
      }
      Some(PslRules(withAscii(normal), withAscii(wild.map(_.stripPrefix("*."))),
        withAscii(exc.map(_.stripPrefix("!")))))
    } finally in.close()
  }

  private def hostPort(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))

  /** Lowercased scheme, or '' for scheme-less input. */
  def scheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Bare lowercased host: userinfo, port, and a leading `www.` stripped.
    * '' when the input has no `scheme://host` shape.
    */
  def host(url: Column): Column = {
    val noUser = regexp_replace(hostPort(url), "^[^@]*@", "")
    regexp_replace(regexp_replace(noUser, ":[0-9]+$", ""), "^www\\.", "")
  }

  /** Canonical form for URL-level exact dedup: lowercased scheme/host,
    * userinfo and `www.` dropped, default port dropped (`:80` for http,
    * `:443` for https; other ports are meaningful and kept), trailing
    * path slashes trimmed, fragment dropped, query params de-tracked
    * (see [[TrackingParams]]) and sorted. Path/query case is preserved —
    * it is significant on most servers. NULL for inputs without a
    * `scheme://host` shape.
    */
  def canonicalizeUrl(url: Column): Column = {
    val sch = scheme(url)
    val hp = regexp_replace(hostPort(url), "^[^@]*@", "")
    val hpNoDefault = when(sch === "http", regexp_replace(hp, ":80$", ""))
      .when(sch === "https", regexp_replace(hp, ":443$", ""))
      .otherwise(hp)
    val h = regexp_replace(hpNoDefault, "^www\\.", "")
    val path = regexp_replace(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1),
      "/+$", "")
    // anchor before '#': a '?' first appearing inside the fragment is NOT a
    // query ('https://a.io/p#f?x=1' has no query string). The prefix class
    // excludes '?' too, anchoring at the FIRST '?' — a greedy [^#]* would
    // backtrack to the LAST one and silently truncate queries containing a
    // literal '?' (legal per RFC 3986), colliding distinct URLs in dedup
    val rawQ = regexp_extract(url, "^[^#?]*\\?([^#]*)", 1)
    val kept = filter(split(rawQ, "&"), p => {
      val name = lower(element_at(split(p, "="), 1))
      length(p) > lit(0) &&
        !name.startsWith(TrackingParamPrefix) &&
        !name.isin(TrackingParams: _*)
    })
    val q = array_join(array_sort(kept), "&")
    when(length(sch) === 0 || length(h) === 0, lit(null).cast("string"))
      .otherwise(concat(sch, lit("://"), h, path,
        when(length(q) > 0, concat(lit("?"), q)).otherwise(lit(""))))
  }

  /** Registered (pay-level) domain of a bare lowercase host, by the full
    * Public Suffix List algorithm when the vendored snapshot is on the
    * classpath ([[pslRules]]), falling back to the [[MultiPartTlds]]
    * heuristic otherwise. Hosts that ARE a public suffix (or have no
    * matching rule and a single label) pass through unchanged — the
    * pre-PSL behavior, which keeps domain-cap/blocklist grouping stable.
    *
    * Scale shape: pure codegen'd column expression — the rule sets are
    * `isin` literals that the optimizer turns into `InSet` hash probes
    * (O(1) per suffix, ≤ label-count suffixes per row), zero shuffle,
    * no UDF. The same shape any engine with array HOFs can mirror, which
    * is how the d37 oracle stays expressible.
    */
  def registeredDomain(hostCol: Column): Column = pslRules match {
    case None => registeredDomainHeuristic(hostCol)
    case Some(rules) =>
      val suffixes = hostSuffixes(hostCol) // most-specific first
      val n = size(suffixes)
      // exception rules first: `!www.ck` means www.ck is itself the
      // registrable domain (it cancels `*.ck` for itself and everything
      // under it) — the longest matching exception wins outright
      val excHit = filter(suffixes, s => s.isin(rules.exceptions: _*))
      // a suffix is a public suffix when it matches a plain rule, or its
      // parent is a wildcard base (the dot guard keeps a single-label
      // suffix from matching itself after the no-op regexp_replace)
      val matched = filter(suffixes, s =>
        s.isin(rules.normal: _*) ||
          (instr(s, ".") > 0 &&
            regexp_replace(s, "^[^.]*\\.", "").isin(rules.wildcardBases: _*)))
      // prevailing public suffix: longest matching rule, else the default
      // '*' rule (the host's last label). try_element_at: an empty matched
      // array must yield NULL for the coalesce, not an ANSI index error.
      val ps = coalesce(try_element_at(matched, lit(1)), element_at(suffixes, -1))
      val psLabels = size(split(ps, "\\."))
      // registered domain = public suffix + one label = the suffix whose
      // index in the most-specific-first array is n - psLabels
      when(hostCol.isNull, lit(null).cast("string"))
        .when(size(excHit) > 0, element_at(excHit, 1))
        .when(n > psLabels, element_at(suffixes, n - psLabels))
        .otherwise(hostCol)
  }

  /** The pre-PSL fallback: last two labels, or last three when the last
    * two are in [[MultiPartTlds]]. Exact only on that 16-entry set. */
  private[ext] def registeredDomainHeuristic(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".",
      element_at(labels, -3), element_at(labels, -2), element_at(labels, -1))
    when(n >= 3 && last2.isin(MultiPartTlds: _*), last3)
      .when(n >= 2, last2)
      .otherwise(hostCol)
  }

  /** All dot-suffixes of a host, most-specific first:
    * `a.b.c` → `[a.b.c, b.c, c]`. Bounded by the host's label count, so an
    * explode over it is O(labels) per row, never quadratic.
    */
  def hostSuffixes(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    transform(sequence(lit(1), n), i => array_join(slice(labels, i, n - i + 1), "."))
  }

  /** Keep at most `cap` rows per domain, deterministically: rows are ranked
    * within their domain by an engine-portable md5 hash of the id (so the
    * kept subset is reproducible on any engine and any partitioning — no
    * RNG state), ties broken by id.
    *
    * Skew shape for 100 TB: the per-domain rank window only ever runs over
    * rows of OVER-cap domains. The over-cap domain list is an aggregate on
    * the domain key (bounded by rows/cap by pigeonhole, in practice tiny —
    * crawl domain histograms are zipfian) and is broadcast; under-cap rows
    * — the vast majority — pass through a broadcast anti-join without a
    * rank, so one mega-domain cannot serialize the corpus behind one
    * window partition... the window it does pay is exactly over the rows
    * being discarded anyway.
    */
  def domainCap(df: DataFrame, domainCol: String, idCol: String, cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    // NULL domains form ONE capped group like any other: the join keys
    // below never match NULL (anti keeps, semi drops), so without the
    // sentinel an unattributable mass of any size sailed past the cap
    val withDom = df.withColumn("__dom",
      coalesce(col(domainCol).cast("string"), lit("__graft_null_domain__")))
    val over = withDom.groupBy(col("__dom")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > cap).select(col("__dom"))
    val under = withDom.join(broadcast(over), Seq("__dom"), "left_anti")
    val h = TextAnalysis.portableHash60(
      concat_ws(":", lit("cap"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("__dom")).orderBy(h.asc, col(idCol).asc)
    val capped = withDom.join(broadcast(over), Seq("__dom"), "left_semi")
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap).drop("__rk")
    under.unionByName(capped.select(under.columns.map(col).toSeq: _*)).drop("__dom")
  }

  /** Drop rows whose host equals, or is a subdomain of, any blocked domain
    * (`ads.x.com` is blocked by `x.com`; `notx.com` is not). A curated
    * blocklist is small, so it compiles to a literal array and the whole
    * filter is a zero-shuffle codegen'd scan — `arrays_overlap` against the
    * row's bounded suffix set.
    */
  def blocklistFilter(df: DataFrame, hostCol: String, blocked: Seq[String]): DataFrame = {
    require(blocked.nonEmpty, "empty blocklist")
    val lit_ = array(blocked.map(b => lit(b.toLowerCase)): _*)
    // coalesce: a NULL host (no parseable URL) has nothing to match a domain
    // blocklist — it passes through rather than being silently dropped by
    // the three-valued !NULL. Host is lowercased so callers that didn't go
    // through [[host]] still match the lowercased blocklist.
    df.filter(!coalesce(
      arrays_overlap(hostSuffixes(lower(col(hostCol))), lit_), lit(false)))
  }

  /** Blocklist filtering against a blocklist TABLE (too big or too dynamic
    * for literals): explode each host's bounded suffix set, equi-join the
    * blocklist to collect blocked ids, anti-join them back out. The
    * blocklist side is broadcast; the blocked-id anti-join is left to AQE
    * (broadcast when small, shuffled otherwise) — either way the corpus
    * text crosses no wire, only (id, suffix) pairs do.
    */
  def blocklistFilterDf(df: DataFrame, hostCol: String, idCol: String,
      blocklist: DataFrame, blockedCol: String): DataFrame = {
    val blockedIds = df
      .select(col(idCol), explode(hostSuffixes(lower(col(hostCol)))).as("__s"))
      .join(broadcast(blocklist.select(lower(col(blockedCol)).as("__s"))), "__s")
      .select(col(idCol)).distinct()
    df.join(blockedIds, Seq(idCol), "left_anti")
  }
}
