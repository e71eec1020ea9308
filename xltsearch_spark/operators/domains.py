"""URL/domain-level curation: host extraction, blocklist filtering, and
per-domain document caps.

Public methodology: RefinedWeb (Penedo et al. 2023) and FineWeb both
apply URL-level rules before any content-level stage — a curated
blocklist drop plus per-site caps so no single domain dominates the
training mix (C4 likewise deduplicates and caps by URL). These are the
cheapest rules in the pipeline, so they run first, map-only where
possible.

Scale shape:
- host extraction / normalization: pure JVM regexp projection fused into
  the scan; zero shuffles.
- blocklist: an `isin` against the (small, curated) literal list —
  compiled into the scan predicate; a million-entry production blocklist
  becomes a broadcast left-anti join, same plan shape.
- per-domain cap: ONE hash shuffle on domain. In ``mode="filter"``
  (drop over-cap rows) the plan is row_number <= cap, which Spark
  rewrites to WindowGroupLimit — per-partition PARTIAL top-cap heaps run
  map-side before the shuffle, so a 10^6-page domain ships only ``cap``
  rows per input partition. ``mode="label"`` must rank every row to name
  the over-cap ones (report semantics), so partial limits can't prune;
  at fleet scale run filter mode and derive the report by subtraction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# scheme://[user@]host[:port]/... -> host; applied to the LOWERCASED url
# (schemes and hosts are case-insensitive per RFC 3986 §3.2.2)
_HOST_RE = r"^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)"

KEPT = "kept"
DOMAIN_RULES = ("blocked_domain", "over_domain_cap")


def url_host(url: Column) -> Column:
    """Normalized host of a URL (lowercase, userinfo/port/path stripped);
    empty string when the value does not parse as an absolute URL."""
    return F.regexp_extract(F.lower(url), _HOST_RE, 1)


def registered_domain(host: Column) -> Column:
    """Last-two-labels approximation of the registrable domain
    (``a.b.example.com`` -> ``example.com``). A production pipeline
    substitutes the Public Suffix List here (``co.uk``-style eTLDs need
    the real table); the column contract is identical."""
    return F.when(host.contains("."),
                  F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
                  ).otherwise(host)


def domain_curate(df: DataFrame, url_col: str = "url",
                  id_col: str = "doc_id", blocklist: tuple[str, ...] = (),
                  max_per_domain: int | None = None,
                  mode: str = "label") -> DataFrame:
    """Per-document URL verdict: (doc_id, domain, keep, reason).

    Rules in precedence order (first hit names ``reason``):

    1. ``blocked_domain``  — host is on the blocklist (exact, lowercase).
    2. ``over_domain_cap`` — more than ``max_per_domain`` surviving docs
       share the host; the ``max_per_domain`` LOWEST doc ids keep their
       slots (deterministic; blocked docs never consume a slot).
    3. ``kept``.

    ``mode="label"`` returns every input row with its verdict;
    ``mode="filter"`` returns only kept rows (the WindowGroupLimit fast
    path — see module docstring). ``max_per_domain=None`` disables the
    cap rule entirely (no window is planned at all).
    """
    if mode not in ("label", "filter"):
        raise ValueError(f"unknown mode: {mode!r}")
    if max_per_domain is not None and max_per_domain < 1:
        raise ValueError("max_per_domain must be >= 1")
    base = df.select(F.col(id_col).alias("doc_id"),
                     url_host(F.col(url_col)).alias("domain"))
    if blocklist:
        blocked = F.col("domain").isin(*[b.lower() for b in blocklist])
    else:
        blocked = F.lit(False)
    surviving = base.filter(~blocked)

    if max_per_domain is None:
        kept = surviving.select("doc_id", "domain",
                                F.lit(1).alias("keep"),
                                F.lit(KEPT).alias("reason"))
    else:
        w = Window.partitionBy("domain").orderBy(F.asc("doc_id"))
        ranked = surviving.withColumn("_rk", F.row_number().over(w))
        if mode == "filter":
            kept = (ranked.filter(F.col("_rk") <= max_per_domain)
                    .select("doc_id", "domain", F.lit(1).alias("keep"),
                            F.lit(KEPT).alias("reason")))
        else:
            kept = ranked.select(
                "doc_id", "domain",
                (F.col("_rk") <= max_per_domain).cast("int").alias("keep"),
                F.when(F.col("_rk") <= max_per_domain, KEPT)
                .otherwise("over_domain_cap").alias("reason"))
    if mode == "filter":
        return kept
    dropped = (base.filter(blocked)
               .select("doc_id", "domain", F.lit(0).alias("keep"),
                       F.lit("blocked_domain").alias("reason")))
    return kept.unionByName(dropped)


def domain_report(verdicts: DataFrame, top_n: int = 50) -> DataFrame:
    """Per-domain funnel: (domain, n_docs, n_kept) for the ``top_n``
    largest domains (ties domain-asc) — the concentration report crawl
    curation runs publish. One partial-agg groupBy + TakeOrdered."""
    return (verdicts.groupBy("domain")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("keep").alias("n_kept"))
            .orderBy(F.desc("n_docs"), F.asc("domain")).limit(top_n))
