package graft.lakehouse.ext

import org.apache.spark.sql.functions._
import graft.lakehouse.SparkSuite

class WebSpec extends SparkSuite {
  import spark.implicits._

  private def norm(u: String): String = {
    val r = Seq(Tuple1(u)).toDF("u")
      .select(Web.canonicalizeUrl(col("u")).as("n")).head()
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("canonicalizeUrl: each documented rule, one at a time") {
    // scheme + host lowering, default port strip, fragment drop
    assert(norm("HTTPS://WWW.Example.COM:443/Path/X?a=1#frag") ==
      "https://www.example.com/Path/X?a=1")
    // http keeps :443 (not its default), strips :80
    assert(norm("http://example.com:443/a") == "http://example.com:443/a")
    assert(norm("HTTP://example.com:80/a") == "http://example.com/a")
    // userinfo dropped
    assert(norm("https://user:pw@host.com/x") == "https://host.com/x")
    // empty path -> '/'
    assert(norm("https://host.com") == "https://host.com/")
    assert(norm("https://host.com?q=1") == "https://host.com/?q=1")
    // path case preserved
    assert(norm("https://host.com/CaseSensitive") ==
      "https://host.com/CaseSensitive")
    // tracking params removed, order of the rest preserved, no re-sort
    assert(norm("https://h.com/p?utm_source=x&b=2&a=1&gclid=z&fbclid=q" +
      "&msclkid=m&utm_medium=y") == "https://h.com/p?b=2&a=1")
    // a query emptied by filtering loses its '?'
    assert(norm("https://h.com/p?utm_source=only") == "https://h.com/p")
    // utm must be a NAME prefix, not a substring match
    assert(norm("https://h.com/p?xutm_source=1&id=utm_x") ==
      "https://h.com/p?xutm_source=1&id=utm_x")
    // non-URLs and null -> null
    assert(norm("not a url at all") == null)
    assert(norm(null) == null)
    // non-http(s) scheme: port kept, host still lowered
    assert(norm("FTP://Host.Com:21/f") == "ftp://host.com:21/f")
  }

  test("urlCensus keeps malformed rows with null fields; hostScorecard " +
    "collapses canonical dupes and counts tracking") {
    val df = Seq(
      (1L, "https://A.com/x?utm_source=f&id=1"),
      (2L, "HTTPS://a.COM:443/x?id=1&utm_medium=m"),
      (3L, "http://b.com/y"),
      (4L, "garbage"),
      (5L, "http://B.Com/y?gclid=z")).toDF("doc_id", "url")
    val cens = Web.urlCensus(df, "doc_id", "url").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(cens(1L).getString(1) == "https://a.com/x?id=1" &&
      cens(1L).getInt(3) == 1 && cens(1L).getBoolean(4))
    assert(cens(2L).getString(1) == "https://a.com/x?id=1")
    assert(cens(3L).getString(1) == "http://b.com/y" &&
      cens(3L).getInt(3) == 0 && !cens(3L).getBoolean(4))
    assert(cens(4L).isNullAt(1) && cens(4L).isNullAt(2) &&
      cens(4L).isNullAt(3) && cens(4L).isNullAt(4))
    val score = Web.hostScorecard(df, "doc_id", "url").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    // 1 and 2 canonicalize IDENTICALLY -> one canonical URL on a.com
    assert(score("a.com") == ((2L, 1L, 2L)), score.toString)
    // 3 and 5 share b.com but differ canonically ('/y' vs '/y' after
    // gclid strip -> SAME canonical!) -> 2 rows, 1 canonical, 1 tracked
    assert(score("b.com") == ((2L, 1L, 1L)), score.toString)
    assert(!score.contains(null))
  }

  test("parseRobots: comments, case-insensitive fields, consecutive-UA " +
    "groups, empty Disallow = allow-all, crawl delay, sitemaps") {
    val txt = """# header comment
      |USER-AGENT: *
      |Disallow: /private # inline comment
      |Allow:
      |DISALLOW:
      |crawl-delay: 7
      |User-agent: botA
      |User-agent: botB
      |Disallow: /shared
      |Sitemap: https://h/sm1.xml
      |Sitemap: https://h/sm2.xml
      |notafield line
      |""".stripMargin
    val (rules, delays, sitemaps) = Web.parseRobots(txt)
    // empty-valued Allow/Disallow produce no rule
    assert(rules == Seq(Web.RobotsRule("*", allow = false, "/private"),
      Web.RobotsRule("bota", allow = false, "/shared"),
      Web.RobotsRule("botb", allow = false, "/shared")), rules.toString)
    assert(delays == Map("*" -> 7L) && sitemaps == 2)
    assert(Web.parseRobots(null) == ((Seq.empty, Map.empty, 0)))
  }

  test("robotsGate: longest prefix wins, Allow wins ties, agent group " +
    "shadows star, no robots/no match -> allowed") {
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /d\nAllow: /d/ok\n" +
        "User-agent: graftbot\nDisallow: /g"),
      ("b.com", "User-agent: *\nDisallow: /x")).toDF("domain", "txt")
    val urls = Seq(
      (1L, "https://a.com/d/page"),    // * would block, but graftbot
      (2L, "https://a.com/g/page"),    //   group SHADOWS * entirely
      (3L, "https://a.com/free"),      // no rule in graftbot group
      (4L, "https://b.com/x/sub"),     // star group blocks
      (5L, "https://b.com/y"),         // no match -> allowed
      (6L, "https://nowhere.com/p"))   // no robots -> allowed
      .toDF("doc_id", "url")
    val got = Web.robotsGate(urls, "doc_id", "url", robots, "domain",
        "txt", agent = "GraftBot")
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(3),
        r.getInt(4)))).toMap
    assert(got(1L) == ((true, 0)), got.toString)  // graftbot grp: no /d rule
    assert(got(2L) == ((false, 2)), got.toString) // /g disallow
    assert(got(3L) == ((true, 0)), got.toString)
    assert(got(4L) == ((false, 2)), got.toString)
    assert(got(5L) == ((true, 0)), got.toString)
    assert(got(6L) == ((true, 0)), got.toString)
    // Allow wins the longest-prefix tie at equal length
    val tie = Seq(("t.com", "User-agent: *\nDisallow: /p1\nAllow: /p1"))
      .toDF("domain", "txt")
    val t = Web.robotsGate(Seq((1L, "http://t.com/p1/x"))
        .toDF("doc_id", "url"), "doc_id", "url", tie, "domain", "txt",
        agent = "anybot")
      .collect().map(r => (r.getBoolean(3), r.getInt(4))).head
    assert(t == ((true, 3)), t.toString)
  }
}
