"""URL canonicalization + domain-level curation for web corpora.

A crawl-derived training corpus (CommonCrawl, C4, RefinedWeb) is
keyed by URL, and the first three curation moves are all URL-shaped:

- ``canonical_url``: normalize scheme/host case, strip fragments,
  default ports and tracking parameters, sort the surviving query
  parameters, collapse trailing slashes -- so the "same page under
  ten spellings" family collapses to ONE key for exact dedup. This
  is the URL analogue of text normalization before ``sha2`` dedup.
- ``registered_domain``: the eTLD+1 a per-site cap/blocklist keys on
  (``news.site7.co.uk`` -> ``site7.co.uk``). Heuristic public-suffix
  handling: a small literal set of two-label suffixes; the real PSL
  is a data file, not an algorithm change -- swap `_TWO_LEVEL_TLDS`
  for the list at deploy time.
- ``domain_curation_stats``: per-domain audit the cap/blocklist
  decisions read from -- URL count, canonical-distinct count, host
  count, blocked flag, and the md5-rank per-domain cap (deterministic
  "keep N pages per site", the standard anti-SEO-farm gate).

Everything is engine-portable string/array expressions -- the DuckDB
twins produce byte-identical canonical strings, so the oracle is an
exact twin, not a guarantee contract. No UDFs anywhere: at 100 TB the
canonicalization runs inside whole-stage codegen on the scan, and the
per-domain stats are one groupBy on the (bounded) domain key space.

No reference counterpart (the reference ingests one Kaggle CSV,
ETL.py:25-46); mandated by the BASELINE.json LLM-pipeline extension
surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Query-parameter prefixes that never identify content (click/campaign
# trackers). Matched by exact prefix -- substr, not LIKE, so the SQL
# twin needs no escape gymnastics for the underscore.
TRACKING_PREFIXES: tuple[str, ...] = ("utm_", "fbclid=", "gclid=", "ref=")

# Two-label public suffixes the registered-domain heuristic knows.
_TWO_LEVEL_TLDS: tuple[str, ...] = (
    "co.uk", "org.uk", "gov.uk", "ac.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn",
)


def _not_tracking_pred(var: str) -> str:
    """SQL predicate (shared dialect): param ``var`` is a real param."""
    checks = " OR ".join(
        f"substr({var}, 1, {len(p)}) = '{p}'" for p in TRACKING_PREFIXES
    )
    return f"{var} <> '' AND NOT ({checks})"


def canonical_url(url: Column | str) -> Column:
    """Canonical form of an absolute http(s) URL (codegen-only).

    Steps (each engine-portable): drop fragment; lowercase scheme and
    host; drop a scheme-default port (``:80`` http / ``:443`` https)
    but keep explicit non-default ports; path defaults to ``/`` and
    loses trailing slashes; tracking parameters
    (:data:`TRACKING_PREFIXES`) are removed and the survivors sorted
    bytewise and re-joined. Everything after the first ``#`` never
    reaches the key.
    """
    u = F.col(url) if isinstance(url, str) else url
    nf = F.regexp_replace(u, "#.*", "")
    sch = F.lower(F.regexp_extract(nf, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    # strip a userinfo prefix (user:pass@host) so the host -- not the
    # user -- becomes the dedup key (r6 advice); IPv6 literal hosts
    # ([::1]:8080) are out of scope for this canonicalizer
    auth = F.regexp_replace(
        F.regexp_extract(nf, r"^[^:]+://([^/?]+)", 1), "^[^@]*@", ""
    )
    pathq = F.regexp_replace(nf, r"^[^:]+://[^/?]*", "")
    hst = F.lower(F.substring_index(auth, ":", 1))
    prt = F.regexp_extract(auth, ":([0-9]+)$", 1)
    portpart = (
        F.when(prt == "", F.lit(""))
        .when((sch == F.lit("https")) & (prt == "443"), F.lit(""))
        .when((sch == F.lit("http")) & (prt == "80"), F.lit(""))
        .otherwise(F.concat(F.lit(":"), prt))
    )
    rawpath = F.substring_index(pathq, "?", 1)
    stripped = F.regexp_replace(rawpath, "/+$", "")
    path = F.when(stripped == "", F.lit("/")).otherwise(stripped)
    qry = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.array_sort(F.filter(F.split(qry, "&"), _param_keep))
    qstr = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return F.concat(sch, F.lit("://"), hst, portpart, path, qstr)


def _param_keep(p: Column) -> Column:
    keep = p != ""
    for pref in TRACKING_PREFIXES:
        keep = keep & (F.substring(p, 1, len(pref)) != pref)
    return keep


def canonical_url_sql(col_sql: str) -> str:
    """DuckDB twin of :func:`canonical_url` (byte-identical output).

    Pure expression (no subquery) so it composes anywhere a column
    does; the repeated sub-expressions are cheap string ops and the
    stats twin evaluates it once per row inside a CTE anyway.
    """
    nf = f"regexp_replace({col_sql}, '#.*', '')"
    sch = f"lower(regexp_extract({nf}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    auth = (f"regexp_replace(regexp_extract({nf},"
            f" '^[^:]+://([^/?]+)', 1), '^[^@]*@', '')")
    pathq = f"regexp_replace({nf}, '^[^:]+://[^/?]*', '')"
    prt = f"regexp_extract({auth}, ':([0-9]+)$', 1)"
    stripped = f"regexp_replace(split_part({pathq}, '?', 1), '/+$', '')"
    params = (
        f"list_sort(list_filter("
        f"string_split(regexp_extract({pathq}, '\\?(.*)$', 1), '&'), "
        f"p -> {_not_tracking_pred('p')}))"
    )
    return (
        f"({sch} || '://' || lower(split_part({auth}, ':', 1))"
        f" || CASE WHEN {prt} = '' THEN ''"
        f"         WHEN {sch} = 'https' AND {prt} = '443' THEN ''"
        f"         WHEN {sch} = 'http' AND {prt} = '80' THEN ''"
        f"         ELSE ':' || {prt} END"
        f" || CASE WHEN {stripped} = '' THEN '/' ELSE {stripped} END"
        f" || CASE WHEN len({params}) > 0"
        f"         THEN '?' || array_to_string({params}, '&')"
        f"         ELSE '' END)"
    )


def url_host(url: Column | str) -> Column:
    """Lowercased host (no port, no userinfo) of an absolute URL.

    IPv6 literal hosts ([::1]:8080) are out of scope (the port strip
    would truncate at the first colon).
    """
    u = F.col(url) if isinstance(url, str) else url
    auth = F.regexp_replace(
        F.regexp_extract(u, r"^[^:]+://([^/?#]+)", 1), "^[^@]*@", ""
    )
    return F.lower(F.substring_index(auth, ":", 1))


def url_host_sql(col_sql: str) -> str:
    return (
        "lower(split_part(regexp_replace(regexp_extract("
        f"{col_sql}, '^[^:]+://([^/?#]+)', 1), '^[^@]*@', ''), ':', 1))"
    )


def registered_domain(host: Column | str) -> Column:
    """eTLD+1 of a lowercased host (heuristic public-suffix set)."""
    h = F.col(host) if isinstance(host, str) else host
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    last3 = F.array_join(F.slice(labels, -3, 3), ".")
    two_level = last2.isin(*_TWO_LEVEL_TLDS)
    return (
        F.when((n >= 3) & two_level, last3)
        .when(n >= 2, last2)
        .otherwise(h)
    )


def registered_domain_sql(host_sql: str) -> str:
    """DuckDB twin of :func:`registered_domain` (pure expression)."""
    tlds = ", ".join(f"'{t}'" for t in _TWO_LEVEL_TLDS)
    ls = f"string_split({host_sql}, '.')"
    return (
        f"(CASE WHEN len({ls}) >= 3"
        f"       AND array_to_string({ls}[-2:], '.') IN ({tlds})"
        f"  THEN array_to_string({ls}[-3:], '.')"
        f"  WHEN len({ls}) >= 2 THEN array_to_string({ls}[-2:], '.')"
        f"  ELSE {host_sql} END)"
    )


def domain_curation_stats(
    df: DataFrame,
    url_col: str = "url",
    blocklist: tuple[str, ...] = (),
    cap: int = 8,
) -> DataFrame:
    """Per-registered-domain curation audit.

    Output (one row per domain, bounded by the site key space):
    ``domain, n_urls, n_canonical, n_hosts, blocked,
    n_kept_after_cap, kept_max_md5`` -- the last two attest the
    deterministic per-domain cap selection itself (keep the ``cap``
    md5-smallest canonical URLs; ``kept_max_md5`` is the selection
    boundary, so two engines keeping different pages cannot hash
    equal).

    Scale shape: ONE scan (the host is functionally determined by the
    canonical URL, so every stat derives from the (domain, host,
    canonical) count relation): canonicalization is map-side codegen,
    one map-combinable groupBy over that key, one per-domain window
    over the (much smaller) distinct-canonical relation, and the
    final per-domain aggregate reuses the window's partitioning --
    no second pass over the data. The blocklist is a literal IN -- a
    real deployment joins a broadcast blocklist table the same way.
    """
    from pyspark.sql.window import Window

    canon = df.select(
        canonical_url(url_col).alias("canonical"),
        url_host(url_col).alias("host"),
    ).withColumn("domain", registered_domain(F.col("host")))
    per_canon = canon.groupBy("domain", "host", "canonical").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy("domain").orderBy(F.md5("canonical"), "canonical")
    ranked = per_canon.withColumn(
        "keep", (F.row_number().over(w) <= cap).cast("int")
    )
    blocked = (
        F.col("domain").isin(*blocklist) if blocklist else F.lit(False)
    ).cast("int").alias("blocked")
    return ranked.groupBy("domain").agg(
        F.sum("n").cast("long").alias("n_urls"),
        F.count(F.lit(1)).cast("long").alias("n_canonical"),
        F.countDistinct("host").cast("long").alias("n_hosts"),
        F.sum("keep").cast("long").alias("n_kept_after_cap"),
        F.max(F.when(F.col("keep") == 1, F.md5("canonical")))
        .alias("kept_max_md5"),
    ).select(
        "domain", "n_urls", "n_canonical", "n_hosts",
        blocked, "n_kept_after_cap", "kept_max_md5",
    )


def domain_curation_stats_sql(
    table: str,
    url_sql: str = "url",
    blocklist: tuple[str, ...] = (),
    cap: int = 8,
) -> str:
    """DuckDB twin of :func:`domain_curation_stats`."""
    blocked = (
        "CASE WHEN domain IN ("
        + ", ".join(f"'{b}'" for b in blocklist)
        + ") THEN 1 ELSE 0 END"
        if blocklist else "0"
    )
    return f"""
        WITH canon AS (
            SELECT {canonical_url_sql(url_sql)} AS canonical,
                   {url_host_sql(url_sql)} AS host
            FROM {table}
        ), dom AS (
            SELECT canonical, host,
                   {registered_domain_sql('host')} AS domain
            FROM canon
        ), per_canon AS (
            SELECT domain, host, canonical,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM dom GROUP BY domain, host, canonical
        ), ranked AS (
            SELECT domain, host, canonical, n,
                   CASE WHEN ROW_NUMBER() OVER (
                       PARTITION BY domain
                       ORDER BY md5(canonical), canonical) <= {cap}
                   THEN 1 ELSE 0 END AS keep
            FROM per_canon
        )
        SELECT domain,
               CAST(SUM(n) AS BIGINT) AS n_urls,
               CAST(COUNT(*) AS BIGINT) AS n_canonical,
               CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts,
               {blocked} AS blocked,
               CAST(SUM(keep) AS BIGINT) AS n_kept_after_cap,
               MAX(CASE WHEN keep = 1 THEN md5(canonical) END)
                   AS kept_max_md5
        FROM ranked GROUP BY domain
    """
