"""URL canonicalization for web-crawl dedup keys (training-data pipeline).

Raw crawl URLs hide duplicates behind superficial differences: tracking
params, param order, case in scheme/host, default ports, fragments. The
canonical form below is the standard pre-dedup normalization, expressed
entirely in built-in column functions (codegen'd, no UDF):

1. scheme and host lowercased; userinfo kept (rare, meaningful);
2. default ports stripped (:80 for http, :443 for https);
3. fragment dropped;
4. tracking params dropped (utm_*, gclid, fbclid, msclkid, ref);
5. remaining query params sorted byte-wise (order-insensitive identity);
6. empty query/trailing '?' dropped.

All steps are deterministic string algebra — the DuckDB oracle reproduces
them value-for-value (gate: url_canon).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_PREFIXES = ("utm_",)
TRACKING_EXACT = ("gclid", "fbclid", "msclkid", "ref")


def url_parts(url) -> dict[str, Column]:
    """Split into (scheme, authority, path, query, fragment) via anchored
    regexp_extract — one pass each, empty string when absent."""
    return {
        "scheme": F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1),
        "authority": F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1),
        "path": F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1),
        "query": F.regexp_extract(url, r"\?([^#]*)", 1),
        "fragment": F.regexp_extract(url, r"#(.*)$", 1),
    }


def _clean_query(query_col) -> Column:
    """Drop tracking params, sort the rest, re-join."""
    params = F.split(query_col, "&")
    kept = F.filter(
        params,
        lambda p: (
            (p != "")
            & ~F.exists(
                F.array(*[F.lit(t) for t in TRACKING_EXACT]),
                lambda t: F.substring_index(p, "=", 1) == t,
            )
            & ~F.exists(
                F.array(*[F.lit(t) for t in TRACKING_PREFIXES]),
                lambda t: F.substring_index(p, "=", 1).startswith(t),
            )
        ),
    )
    return F.array_join(F.array_sort(kept), "&")


def canonicalize_url(url) -> Column:
    """The canonical URL (see module docstring)."""
    p = url_parts(url)
    scheme = F.lower(p["scheme"])
    auth = F.lower(p["authority"])
    # strip default port for the scheme
    auth = F.when(
        (scheme == "http") & auth.endswith(":80"), F.substring(auth, 1, F.length(auth) - 3)
    ).otherwise(
        F.when((scheme == "https") & auth.endswith(":443"), F.substring(auth, 1, F.length(auth) - 4)).otherwise(
            auth
        )
    )
    q = _clean_query(p["query"])
    return F.concat(
        scheme,
        F.lit("://"),
        auth,
        p["path"],
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )
