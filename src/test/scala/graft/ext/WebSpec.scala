package graft.ext

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class WebSpec extends SparkSpecBase {
  import spark.implicits._

  private def canon(url: String): Option[String] =
    Seq(url).toDF("u").select(Web.canonicalizeUrl(col("u"))).as[Option[String]].head()

  test("canonicalizeUrl: case, www, userinfo, default port, slash, fragment, tracking") {
    assert(canon("HTTP://User:Pw@WWW.Example.COM:80/A/B/?utm_source=x&b=2&a=1#frag")
      === Some("http://example.com/A/B?a=1&b=2"))
    // https default port stripped, non-default kept
    assert(canon("https://example.com:443/x") === Some("https://example.com/x"))
    assert(canon("https://example.com:8443/x") === Some("https://example.com:8443/x"))
    // http:443 is NOT a default port for http
    assert(canon("http://example.com:443/x") === Some("http://example.com:443/x"))
    // all params tracking -> no query at all
    assert(canon("https://a.io/p?utm_a=1&UTM_b=2&fbclid=z&REF=top")
      === Some("https://a.io/p"))
    // path case preserved; query value case preserved; empty path ok
    assert(canon("https://A.io?b=UP") === Some("https://a.io?b=UP"))
    // scheme-less input has no canonical form
    assert(canon("example.com/x") === None)
    // a '?' first appearing inside the fragment is NOT a query — fragment
    // content must not resurrect as a query string
    assert(canon("https://a.io/p#f?x=1") === Some("https://a.io/p"))
    assert(canon("https://a.io/p?a=1#f?x=2") === Some("https://a.io/p?a=1"))
  }

  test("registeredDomain: plain and second-level public suffixes") {
    val got = Seq("deep.sub.example.com", "bbc.co.uk", "news.bbc.co.uk",
      "example.com", "localhost")
      .toDF("h").select(Web.registeredDomain(col("h"))).as[String].collect().toSeq
    assert(got === Seq("example.com", "bbc.co.uk", "bbc.co.uk",
      "example.com", "localhost"))
  }

  test("registeredDomain: full PSL — private suffixes, multi-part, wildcard, exception rules") {
    assert(Web.pslRules.nonEmpty, "vendored PSL resource must be on the classpath")
    def reg(hosts: String*): Seq[String] =
      hosts.toDF("h").select(Web.registeredDomain(col("h"))).as[String].collect().toSeq
    // private-section suffix the heuristic can't know: github.io pages
    // are distinct sites, so the pay-level domain keeps the user label
    assert(reg("user.github.io", "deep.user.github.io") ===
      Seq("user.github.io", "user.github.io"))
    // multi-part ICANN suffixes incl. ones outside the heuristic's 16
    assert(reg("shop.com.au", "a.shop.com.au", "x.co.id", "gov.uk", "agency.gov.uk") ===
      Seq("shop.com.au", "shop.com.au", "x.co.id", "gov.uk", "agency.gov.uk"))
    // wildcard rule *.bd: any single label under bd is itself a public
    // suffix (no registrable domain), one more label is registrable
    assert(reg("example.bd", "foo.example.bd", "deep.foo.example.bd") ===
      Seq("example.bd", "foo.example.bd", "foo.example.bd"))
    // exception rules: !www.ck (under *.ck) and !city.kawasaki.jp (under
    // *.kawasaki.jp) are registrable themselves
    assert(reg("www.ck", "sub.www.ck", "other.ck", "a.other.ck") ===
      Seq("www.ck", "www.ck", "other.ck", "a.other.ck"))
    assert(reg("city.kawasaki.jp", "foo.city.kawasaki.jp", "bar.kawasaki.jp", "a.bar.kawasaki.jp") ===
      Seq("city.kawasaki.jp", "city.kawasaki.jp", "bar.kawasaki.jp", "a.bar.kawasaki.jp"))
    // no-rule hosts and bare suffixes pass through (pre-PSL behavior)
    assert(reg("localhost", "com", "co.uk", "bd") ===
      Seq("localhost", "com", "co.uk", "bd"))
    // IDN rules published in unicode must match PUNYCODE hosts: 公司.cn is
    // a multi-label public suffix, so foo.xn--55qx5d.cn keeps its label
    // (without the ASCII-form rules it would collapse to xn--55qx5d.cn);
    // unicode-form hosts match too
    assert(reg("foo.xn--55qx5d.cn", "a.foo.xn--55qx5d.cn", "foo.公司.cn") ===
      Seq("foo.xn--55qx5d.cn", "foo.xn--55qx5d.cn", "foo.公司.cn"))
    // NULL host stays NULL
    val n = Seq[Option[String]](None).toDF("h")
      .select(Web.registeredDomain(col("h"))).as[Option[String]].head()
    assert(n.isEmpty)
  }

  test("hostSuffixes: most-specific first, bounded by label count") {
    val got = Seq("a.b.c").toDF("h")
      .select(Web.hostSuffixes(col("h"))).as[Seq[String]].head()
    assert(got === Seq("a.b.c", "b.c", "c"))
  }

  test("domainCap keeps exactly cap rows in over-cap domains, all rows elsewhere, deterministically") {
    val df = (1 to 300).map { i =>
      (i.toLong, if (i % 2 == 0) "big.com" else s"small${i % 20}.com")
    }.toDF("id", "domain")
    val capped = Web.domainCap(df, "domain", "id", cap = 30)
    val counts = capped.groupBy("domain").count().as[(String, Long)].collect().toMap
    assert(counts("big.com") === 30)            // 150 rows capped to 30
    assert(counts.collect { case (d, n) if d != "big.com" => n }.forall(_ === 15)) // untouched
    // deterministic: same kept set on re-run (portable hash, no RNG state)
    val a = capped.select("id").as[Long].collect().sorted.toSeq
    val b = Web.domainCap(df, "domain", "id", cap = 30)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a === b)
    // under-cap rows are the original rows, not re-sampled
    val smallIds = capped.filter($"domain" =!= "big.com").select("id")
      .as[Long].collect().toSet
    assert(smallIds === (1 to 300 by 2).map(_.toLong).toSet)
  }

  test("blocklistFilter: subdomain semantics, literal and table variants agree") {
    val hosts = Seq(
      (1L, "ads.tracker.net"), (2L, "tracker.net"), (3L, "nottracker.net"),
      (4L, "deep.sub.ads.tracker.net"), (5L, "good.org"),
      (6L, "spam.example"), (7L, "spam.example.org"))
      .toDF("id", "host")
    val blocked = Seq("tracker.net", "spam.example")
    val lit = Web.blocklistFilter(hosts, "host", blocked)
      .select("id").as[Long].collect().sorted.toSeq
    // 7 survives: spam.example.org is NOT under spam.example (suffix is
    // label-aligned, not string-aligned)
    assert(lit === Seq(3L, 5L, 7L))
    val tbl = Web.blocklistFilterDf(hosts, "host", "id",
      blocked.toDF("domain"), "domain")
      .select("id").as[Long].collect().sorted.toSeq
    assert(tbl === lit)
  }

  test("blocklistFilter: NULL hosts pass through; mixed-case hosts still block") {
    val hosts = Seq(
      (1L, null.asInstanceOf[String]), (2L, "Ads.Tracker.NET"), (3L, "good.org"))
      .toDF("id", "host")
    val blocked = Seq("tracker.net")
    // NULL host = no parseable URL: the doc passes through rather than being
    // silently dropped by three-valued !NULL; case-insensitive matching for
    // callers that didn't lowercase via Web.host
    val lit = Web.blocklistFilter(hosts, "host", blocked)
      .select("id").as[Long].collect().sorted.toSeq
    assert(lit === Seq(1L, 3L))
    val tbl = Web.blocklistFilterDf(hosts, "host", "id",
      blocked.toDF("domain"), "domain")
      .select("id").as[Long].collect().sorted.toSeq
    assert(tbl === Seq(1L, 3L))
  }

  test("blocklistFilter literal path plans zero exchanges (pure scan+filter)") {
    val hosts = Seq((1L, "a.b.c")).toDF("id", "host")
    val p = Web.blocklistFilter(hosts, "host", Seq("x.com"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"expected shuffle-free filter plan:\n$p")
  }
}
