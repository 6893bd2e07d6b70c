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


def registered_domain(url: Column) -> Column:
    """Last-two-label registered-domain heuristic (example.co from
    a.b.example.co). A public-suffix list would refine ccTLD composites
    (example.co.uk); the heuristic is deterministic and list-free, which
    is what a blocklist join needs."""
    parts = F.split(url_host(url), r"\.")
    n = F.size(parts)
    return F.when(
        n >= 2,
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1)),
    ).otherwise(url_host(url))


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
