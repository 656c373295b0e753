package graft.lakehouse.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** URL canonicalization + host census — the crawl-curation front door.
  * Before any dedup or quality gate runs on a web corpus, URLs must
  * collapse to a canonical form (`HTTP://Example.com:80/a?utm_x=1#f`
  * and `http://example.com/a` are the same page); done wrong, exact
  * dedup silently under-merges and per-host caps leak.
  *
  * Everything here is BUILT-IN column expressions (regexp + higher-
  * order filter), no UDF: the kernel inlines into whole-stage codegen
  * and — deliberately — reads as the same regexp/list pipeline the
  * DuckDB oracle replays, so the canonicalization CONTRACT, not an
  * implementation accident, is what hash-verifies.
  *
  * Canonical form (each step a documented, engine-portable rule):
  *   1. fragment dropped (`#...`);
  *   2. scheme lowercased; a string without `://` is NOT a URL → null;
  *   3. userinfo (`user:pass@`) dropped, host lowercased;
  *   4. default ports stripped (`:80` for http, `:443` for https —
  *      other ports kept);
  *   5. empty path → `/` (path case is preserved — RFC 3986 paths are
  *      case-sensitive);
  *   6. tracking parameters removed (`utm_*`, `fbclid`, `gclid`,
  *      `msclkid`), remaining params kept IN ORDER (no re-sort: order
  *      preservation keeps the rule local and portable);
  *   7. a query emptied by step 6 loses its `?`.
  */
object Web {

  private val TrackingParam = "^(utm_[^=]*|fbclid|gclid|msclkid)(=.*)?$"

  /** The canonical URL string per the 7 rules above; null for non-URLs
    * (no scheme) and null inputs. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(trim(url), "#.*$", "")
    val hasScheme = noFrag.rlike("^[A-Za-z][A-Za-z0-9+.\\-]*://")
    val scheme = lower(regexp_extract(noFrag,
      "^([A-Za-z][A-Za-z0-9+.\\-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.\\-]*://", "")
    val auth = regexp_extract(rest, "^([^/?]*)", 1)
    val tail = regexp_replace(rest, "^[^/?]*", "")
    val hostPort = lower(regexp_replace(auth, "^.*@", ""))
    val host = when(scheme === "http",
        regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val path0 = regexp_extract(tail, "^([^?]*)", 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val query = regexp_extract(tail, "\\?(.*)$", 1)
    val kept = array_join(filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingParam)), "&")
    when(url.isNull || !hasScheme, lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, path,
        when(kept === "", lit("")).otherwise(concat(lit("?"), kept))))
  }

  /** The lowercased host (default port stripped) of a URL; null for
    * non-URLs. */
  def urlHost(url: Column): Column =
    regexp_extract(canonicalizeUrl(url), "^[a-z][a-z0-9+.\\-]*://([^/?]*)", 1)

  /** Per-document canonicalization frame: `(id, url_norm, host,
    * n_params_kept, had_tracking)`. Rows whose URL fails to parse
    * (no scheme) carry null url_norm/host — kept, not dropped: a
    * curation pipeline wants to SEE its malformed-URL volume. Pure
    * map-side column work, zero shuffle before the caller's sink. */
  def urlCensus(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val u = col(urlCol)
    val norm = canonicalizeUrl(u)
    val query = regexp_extract(regexp_replace(trim(u), "#.*$", ""),
      "\\?(.*)$", 1)
    val params = filter(split(query, "&"), p => p =!= "")
    df.filter(col(idCol).isNotNull)
      .select(col(idCol), norm.as("url_norm"),
        when(norm.isNull, lit(null).cast("string"))
          .otherwise(regexp_extract(norm,
            "^[a-z][a-z0-9+.\\-]*://([^/?]*)", 1)).as("host"),
        when(norm.isNull, lit(null).cast("int"))
          .otherwise(size(filter(params,
            p => !p.rlike(TrackingParam))).cast("int"))
          .as("n_params_kept"),
        when(norm.isNull, lit(null).cast("boolean"))
          .otherwise(exists(params, p => p.rlike(TrackingParam)))
          .as("had_tracking"))
  }

  /** Host scorecard over canonicalized URLs: per host, total rows,
    * distinct canonical URLs (the dup-collapse the canonicalization
    * exists for), and tracking-parameter prevalence — the per-host cap
    * / crawl-politeness triage frame. One aggregation shuffle, keyed
    * by host; top-k by volume belongs to the caller (TakeOrdered). */
  def hostScorecard(df: DataFrame, idCol: String,
      urlCol: String): DataFrame =
    urlCensus(df, idCol, urlCol)
      .filter(col("host").isNotNull)
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("url_norm")).as("n_canonical"),
        sum(when(col("had_tracking"), 1L).otherwise(0L))
          .as("n_with_tracking"))

  // ---- robots.txt (RFC 9309) ---------------------------------------------

  /** One parsed robots.txt rule: the user-agent token of its group
    * (lowercased), whether it is an Allow, and the literal path
    * prefix. */
  private[ext] case class RobotsRule(ua: String, allow: Boolean,
    path: String)

  /** Parse robots.txt lines into rules + per-agent crawl delays +
    * sitemap count. Contract (the RFC 9309 subset every major parser
    * agrees on): `#` comments stripped; field names case-insensitive;
    * consecutive `User-agent` lines share one group; `Allow`/
    * `Disallow` attach to the current group; an EMPTY Disallow value
    * is "allow all" and produces no rule; rules are LITERAL path
    * prefixes (the fixture contract — wildcard rules would parse but
    * match literally, which this library documents rather than
    * half-implements). */
  private[ext] def parseRobots(txt: String):
      (Seq[RobotsRule], Map[String, Long], Int) = {
    if (txt == null) return (Seq.empty, Map.empty, 0)
    val rules = Seq.newBuilder[RobotsRule]
    var delays = Map.empty[String, Long]
    var sitemaps = 0
    var uas: Seq[String] = Seq.empty
    var lastWasUa = false
    txt.split("\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val name = line.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        name match {
          case "user-agent" =>
            val ua = value.toLowerCase(java.util.Locale.ROOT)
            uas = if (lastWasUa) uas :+ ua else Seq(ua)
            lastWasUa = true
          case "allow" | "disallow" =>
            lastWasUa = false
            if (value.nonEmpty)
              uas.foreach(ua =>
                rules += RobotsRule(ua, name == "allow", value))
          case "crawl-delay" =>
            lastWasUa = false
            if (value.forall(c => c >= '0' && c <= '9') && value.nonEmpty
              && value.length <= 9)
              uas.foreach(ua => delays += ua -> value.toLong)
          case "sitemap" => lastWasUa = false; sitemaps += 1
          case _ => lastWasUa = false
        }
      }
    }
    (rules.result(), delays, sitemaps)
  }

  /** Per-domain robots.txt census: group/rule counts, the `*` group's
    * crawl delay, sitemap count — the politeness-config triage frame.
    * One kernel call per robots blob, zero shuffle. */
  def robotsCensus(df: DataFrame, domainCol: String,
      robotsCol: String): DataFrame = {
    val kernel = udf((txt: String) => {
      val (rules, delays, sitemaps) = parseRobots(txt)
      (rules.map(_.ua).distinct.size, rules.count(_.allow),
        rules.count(!_.allow), delays.getOrElse("*", -1L), sitemaps)
    })
    df.filter(col(domainCol).isNotNull)
      .withColumn("__r", kernel(col(robotsCol)))
      .select(col(domainCol),
        col("__r._1").as("n_agent_groups"),
        col("__r._2").as("n_allow"),
        col("__r._3").as("n_disallow"),
        col("__r._4").as("star_crawl_delay"),
        col("__r._5").as("n_sitemaps"))
  }

  /** Politeness crawl schedule: canonical URLs grouped by host, each
    * host's queue ordered by id, the i-th fetch scheduled at
    * `i · crawlDelay(host)` seconds (0-indexed; hosts without a
    * declared delay use `defaultDelaySec`). The output is the frame a
    * fetch executor partitions by host — per-host sequential,
    * cross-host parallel, exactly the crawl-politeness contract.
    *
    * Scale shape: ONE window partitioned by host (the per-host queue
    * position — bounded per partition key, never a global sort) and
    * one broadcast-able join against the O(domains) delay frame. */
  def crawlSchedule(urls: DataFrame, idCol: String, urlCol: String,
      robots: DataFrame, domainCol: String, robotsCol: String,
      defaultDelaySec: Long = 1L): DataFrame = {
    require(defaultDelaySec >= 0, "crawlSchedule needs defaultDelaySec >= 0")
    val delays = robotsCensus(robots, domainCol, robotsCol)
      .select(col(domainCol).as("__dom"),
        when(col("star_crawl_delay") >= 0, col("star_crawl_delay"))
          .otherwise(lit(defaultDelaySec)).as("__delay"))
    val cens = urlCensus(urls, idCol, urlCol)
      .filter(col("host").isNotNull)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("host")).orderBy(col(idCol))
    cens.join(delays, cens("host") === delays("__dom"), "left")
      .withColumn("queue_pos",
        (org.apache.spark.sql.functions.row_number().over(w) - 1)
          .cast("long"))
      .select(col(idCol), col("host"), col("url_norm"), col("queue_pos"),
        (col("queue_pos") * coalesce(col("__delay"),
          lit(defaultDelaySec))).as("fetch_at_s"))
  }

  /** Robots gate (RFC 9309 evaluation): for each URL row, is `path`
    * allowed for `agent`? Group selection: the agent's own group when
    * one exists (longest user-agent token that is a prefix of the
    * agent name), else the `*` group. Rule selection: the LONGEST
    * literal path prefix that matches; tie → Allow wins; no matching
    * rule → allowed. Output per url row: `(id, host, path, allowed,
    * matched_rule_len)` with matched_rule_len 0 when no rule matched.
    *
    * Scale shape: robots parse once per domain (O(domains) rows), the
    * rule list rides a broadcast-able domain frame; ONE equi-join of
    * the URL stream against it on the host key, and the verdict is an
    * in-row kernel over the domain's (bounded) rule list — no
    * per-rule explode of the URL stream, no window. */
  def robotsGate(urls: DataFrame, idCol: String, urlCol: String,
      robots: DataFrame, domainCol: String, robotsCol: String,
      agent: String): DataFrame = {
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    // (ua, allow, path) triples per domain, pre-parsed once
    val parsed = udf((txt: String) => parseRobots(txt)._1
      .map(r => (r.ua, r.allow, r.path)))
    val rulesByDomain = robots.filter(col(domainCol).isNotNull)
      .select(col(domainCol).as("__dom"),
        parsed(col(robotsCol)).as("__rules"))
    val verdict = udf((rules: Seq[Row], path: String) => {
      if (path == null) (true, 0)
      else {
        val rs = rules.map(r => RobotsRule(r.getString(0),
          r.getBoolean(1), r.getString(2)))
        // group pick: longest agent-token prefix of OUR agent, else *
        val own = rs.filter(r => r.ua != "*" && agentLc.startsWith(r.ua))
        val grp =
          if (own.nonEmpty) {
            val best = own.map(_.ua.length).max
            own.filter(_.ua.length == best)
          } else rs.filter(_.ua == "*")
        val hits = grp.filter(r => path.startsWith(r.path))
        if (hits.isEmpty) (true, 0)
        else {
          val best = hits.map(_.path.length).max
          val top = hits.filter(_.path.length == best)
          (top.exists(_.allow), best)
        }
      }
    })
    val cens = urlCensus(urls, idCol, urlCol)
      .filter(col("host").isNotNull)
      .withColumn("__path",
        regexp_extract(col("url_norm"), "^[a-z][a-z0-9+.\\-]*://[^/?]*(/[^?]*)", 1))
    cens.join(rulesByDomain, cens("host") === rulesByDomain("__dom"), "left")
      .withColumn("__v", verdict(coalesce(col("__rules"),
        array().cast("array<struct<_1:string,_2:boolean,_3:string>>")),
        col("__path")))
      .select(col(idCol), col("host"), col("__path").as("path"),
        col("__v._1").as("allowed"),
        col("__v._2").cast("int").as("matched_rule_len"))
  }
}
