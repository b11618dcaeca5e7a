"""URL normalization and canonical-URL deduplication.

Web-corpus curation ops for the Common-Crawl-shaped input: the same page is
crawled under many byte-distinct URLs (case-varying hosts, default ports,
tracking parameters, param order, fragments, trailing slashes), so URL
canonicalization runs before any content-level dedup — it is an O(1)-per-row
projection that removes the bulk of trivial duplicates without a shuffle.

Reference anchor: the pipeline's remap/parse family (parse_url host/path
extraction, operators/remap.py) — this module is the normalizing sibling.
Everything is built-in Column expressions (regexp + higher-order array
functions), fully inside whole-stage codegen: no UDFs, no shuffle.  The only
shuffle in `canonical_url_dedup` is its one hash-aggregate on url_norm.

At 10^12 rows: normalize is map-only; the dedup aggregate's key space is the
page-id space (smaller than the row space by the dup factor), map-side
partial aggregation collapses repeats before the exchange, and AQE handles
hot canonical keys (link-farm URLs) via skew-split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tracking parameters dropped during normalization: the utm_* family plus
# the common click-id params.  Kept deliberately small and explicit — this
# list is part of the normalization contract (oracle mirrors it).
TRACKING_PREFIX = "utm_"
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "ref")

# The optional non-capturing userinfo segment ("user:pass@") is consumed
# but never captured: a host must not be spoofable as "junk@real-host" —
# without this, `http://x@tracker.example/` would parse its host as
# "x@tracker.example", whose dot-suffix chain never contains the
# blocklisted "tracker.example" (a trivial blocklist bypass; UT1-style
# URL filters strip userinfo for the same reason).
_URL_PARTS_RE = (
    r"^([A-Za-z][A-Za-z0-9+.-]*)://(?:[^/?#@]*@)?([^/:?#@]+)(:\d+)?"
    r"([^?#]*)(\?[^#]*)?(#.*)?$"
)


def normalize_url(
    url: Column | str,
    keep_trailing_slash: bool = False,
) -> Column:
    """Canonical form of an absolute http(s) URL, as a codegen expression:

      * scheme and host lowercased
      * default ports stripped (http:80, https:443); other ports kept
      * fragment removed
      * empty path → "/"; trailing slash stripped on non-root paths
        (unless ``keep_trailing_slash``)
      * query: tracking params removed (utm_* prefix + TRACKING_PARAMS),
        remaining params sorted bytewise; empty result drops the "?"

    Non-URL strings (no scheme://host) pass through unchanged — the caller
    decides whether to filter them, mirroring VRL's recoverable-parse style.
    """
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, _URL_PARTS_RE, 1))
    host = F.lower(F.regexp_extract(u, _URL_PARTS_RE, 2))
    port = F.regexp_extract(u, _URL_PARTS_RE, 3)
    path = F.regexp_extract(u, _URL_PARTS_RE, 4)
    query = F.regexp_extract(u, _URL_PARTS_RE, 5)

    port = F.when(
        ((scheme == "http") & (port == ":80"))
        | ((scheme == "https") & (port == ":443")),
        F.lit(""),
    ).otherwise(port)

    path = F.when(path == "", F.lit("/")).otherwise(path)
    if not keep_trailing_slash:
        path = F.when(
            (F.length(path) > 1) & path.endswith("/"),
            F.substring(path, 1, F.length(path) - 1),
        ).otherwise(path)

    params = F.split(F.regexp_replace(query, r"^\?", ""), "&")
    kept = F.filter(
        params,
        lambda p: (p != "")
        & ~F.split(p, "=").getItem(0).startswith(TRACKING_PREFIX)
        & ~F.split(p, "=").getItem(0).isin(*TRACKING_PARAMS),
    )
    qnorm = F.array_join(F.array_sort(kept), "&")
    qpart = F.when(qnorm == "", F.lit("")).otherwise(F.concat(F.lit("?"), qnorm))

    normalized = F.concat(scheme, F.lit("://"), host, port, path, qpart)
    return F.when(host == "", u).otherwise(normalized)


def canonical_url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    out_col: str = "url_norm",
) -> DataFrame:
    """One row per canonical URL: the keeper is the minimum id (the stable
    first-crawl rule), plus the duplicate count.  Exactly one shuffle —
    the hash-aggregate on the normalized key with map-side combine."""
    normed = df.withColumn(out_col, normalize_url(url_col))
    return normed.groupBy(out_col).agg(
        F.min(id_col).alias(id_col),
        F.count(F.lit(1)).alias("n_dups"),
    )


def url_host(url: Column | str) -> Column:
    """Lowercased hostname of a URL (port stripped); '' when the URL does
    not parse.  Pure regexp — codegen, no UDF."""
    u = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(u, _URL_PARTS_RE, 2))


def domain_suffixes(host: Column | str) -> Column:
    """All dot-suffix chains of a hostname, most-specific first:
    'a.b.example.com' → ['a.b.example.com', 'b.example.com', 'example.com',
    'com'].  Built with transform-over-sequence (codegen-free HOF but pure
    JVM, no Python); '' hosts give []."""
    h = F.col(host) if isinstance(host, str) else host
    parts = F.split(h, r"\.")
    # right-fold building each suffix from the previous one: the lambda
    # references only its own accumulator/element variables, so ``parts``
    # (often a regex-derived expression like url_host) is evaluated ONCE per
    # row as the HOF input — a lambda that closed over it (the old
    # transform-over-sequence form) re-ran the regex+split per ELEMENT
    folded = F.aggregate(
        F.reverse(parts),
        F.array().cast("array<string>"),
        lambda acc, x: F.array_append(
            acc,
            F.when(
                F.size(acc) > 0, F.concat(x, F.lit("."), F.element_at(acc, -1))
            ).otherwise(x),
        ),
    )
    return F.when(h == "", F.array().cast("array<string>")).otherwise(
        F.reverse(folded)
    )


def blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame | list[str],
    url_col: str = "url",
    id_col: str = "doc_id",
    mode: str = "remove",
) -> DataFrame:
    """Drop (or flag) documents whose URL host falls under any blocklisted
    domain, matching by REGISTRABLE SUFFIX — blocking 'tracker.example'
    blocks 'cdn.eu.tracker.example' too (the UT1/RefinedWeb URL-filtering
    convention; exact-host lists work unchanged since a host is its own
    first suffix).

    Execution shape: hosts explode to their suffix chains (≤ label-count
    rows per doc, map-side), LEFT SEMI join against the BROADCAST
    blocklist finds blocked ids, one LEFT ANTI join removes them — the
    blocklist (even UT1-sized, a few M domains ≈ tens of MB) broadcasts,
    so the only shuffle is the anti join on the id, and AQE broadcasts
    THAT side too when few docs are blocked.  ``mode="flag"`` returns all
    rows with a `blocked` boolean instead of filtering."""
    if mode not in ("remove", "flag"):
        raise ValueError(f"mode must be remove|flag, got {mode!r}")
    if isinstance(blocklist, list):
        if not blocklist:
            return df.withColumn("blocked", F.lit(False)) if mode == "flag" else df
        bl = df.sparkSession.createDataFrame(
            [(d,) for d in blocklist], "domain string"
        )
    else:
        bl = blocklist.select(F.col("domain"))
    bl = bl.select(F.lower(F.trim("domain")).alias("_bdom")).distinct()

    sufs = df.select(
        id_col, F.explode(domain_suffixes(url_host(url_col))).alias("_dom")
    )
    blocked = sufs.join(
        F.broadcast(bl), sufs["_dom"] == bl["_bdom"], "left_semi"
    ).select(id_col).distinct()
    if mode == "remove":
        return df.join(blocked, id_col, "left_anti")
    return df.join(
        blocked.withColumn("blocked", F.lit(True)), id_col, "left"
    ).withColumn("blocked", F.coalesce("blocked", F.lit(False)))
