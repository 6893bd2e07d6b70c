"""URL analysis for web-corpus curation: host/domain extraction and
domain-blocklist filtering — the source-level filter applied before any
content-level quality scoring (spam/adult/SEO domains are dropped by
list, not by model). JVM-side `parse_url` plus array arithmetic; the
blocklist is a broadcast anti-join (lists are KBs against a 100 TB
corpus).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def url_host(url: Column) -> Column:
    """Hostname of a URL (JVM parse_url; NULL for unparseable inputs)."""
    return F.parse_url(url, F.lit("HOST"))


# Second-level ccTLD composites from the ICANN section of the public
# suffix list (publicsuffix.org) — the high-traffic registries. A host
# whose last TWO labels are here gets a three-label registered domain
# (bbc.co.uk), every other host the plain last-two rule. Without this a
# blocklist join keyed on the last-two heuristic maps bbc.co.uk ->
# co.uk and one composite blocklist entry over-blocks a whole registry
# (r4 VERDICT item 4).
PUBLIC_SUFFIX_2LABEL: tuple[str, ...] = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "me.uk", "ltd.uk", "plc.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
    "co.za", "org.za", "gov.za", "ac.za", "web.za",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.mx", "org.mx", "gob.mx", "edu.mx", "net.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "co.in", "net.in", "org.in", "firm.in", "ind.in", "ac.in", "edu.in", "gov.in",
    "co.kr", "or.kr", "go.kr", "ac.kr", "ne.kr", "re.kr",
    "com.tw", "org.tw", "gov.tw", "edu.tw", "net.tw",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk",
    "co.id", "or.id", "ac.id", "go.id", "web.id",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr",
    "com.my", "net.my", "org.my", "gov.my", "edu.my",
    "co.th", "or.th", "go.th", "ac.th", "in.th",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    "com.ph", "net.ph", "org.ph", "gov.ph",
    "com.eg", "com.sa", "com.pk", "com.bd", "com.np", "com.lk",
    "co.il", "org.il", "ac.il", "gov.il", "net.il",
    "com.ua", "net.ua", "org.ua", "gov.ua", "edu.ua",
    "com.co", "net.co", "org.co",
    "com.pe", "com.ve", "co.ve", "com.ec", "com.uy", "com.py", "com.bo",
    "co.cr", "com.do", "com.gt", "com.ni", "com.pa", "com.sv", "com.hn",
    "com.ng", "co.ke", "or.ke", "co.tz", "co.ug", "com.gh", "com.et",
)


def registered_domain(url: Column) -> Column:
    """eTLD+1: the label left of the public suffix. ccTLD composites use
    the embedded :data:`PUBLIC_SUFFIX_2LABEL` subset (news.bbc.co.uk ->
    bbc.co.uk); everything else the last-two-label rule (a.b.example.com
    -> example.com); single-label hosts pass through. The host is
    lowercased first — DNS names are case-insensitive, and a mixed-case
    host must not dodge the suffix rule or a blocklist join.
    Deterministic and list-pinned — exactly what a blocklist join needs."""
    host = F.lower(url_host(url))
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(".", F.element_at(parts, -3), last2)
    return (
        F.when((n >= 3) & last2.isin(*PUBLIC_SUFFIX_2LABEL), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


def registered_domain_sql(host_expr: str) -> str:
    """DuckDB twin of :func:`registered_domain` over a host SQL expression
    (same suffix set, same lowercasing, same label arithmetic — negative
    list indexing is 1-based from the tail in both engines)."""
    host_expr = f"lower({host_expr})"
    suffixes = ", ".join(f"'{s}'" for s in PUBLIC_SUFFIX_2LABEL)
    p = f"string_split({host_expr}, '.')"
    last2 = f"({p}[-2] || '.' || {p}[-1])"
    last3 = f"({p}[-3] || '.' || {p}[-2] || '.' || {p}[-1])"
    return (
        f"(CASE WHEN len({p}) >= 3 AND {last2} IN ({suffixes}) THEN {last3} "
        f"WHEN len({p}) >= 2 THEN {last2} ELSE {host_expr} END)"
    )


def filter_blocklisted_domains(
    pages: DataFrame, blocklist: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop pages whose registered domain is on the blocklist.
    ``blocklist``: a DataFrame with a single ``domain`` column. Broadcast
    LEFT ANTI equi-join on the derived domain — linear, no shuffle of the
    pages side beyond the scan."""
    with_domain = pages.withColumn("__domain", registered_domain(F.col(url_col)))
    kept = with_domain.join(
        F.broadcast(blocklist.select(F.col("domain").alias("__domain")).distinct()),
        "__domain",
        "left_anti",
    )
    return kept.drop("__domain")


def domain_counts(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """-> (domain, n_pages): corpus composition by registered domain —
    the first report run on any crawl (head-domain skew drives both
    dedup priorities and blocklist curation). Plain hash agg with
    map-side combine."""
    return (
        pages.select(registered_domain(F.col(url_col)).alias("domain"))
        .groupBy("domain")
        .agg(F.count("*").alias("n_pages"))
    )
