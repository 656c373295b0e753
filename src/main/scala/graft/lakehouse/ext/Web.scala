package graft.lakehouse.ext

import org.apache.spark.sql.{Column, DataFrame}
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
}
