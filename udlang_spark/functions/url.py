"""URL canonicalization for web-corpus deduplication (engine extension —
the reference has no URL functions; this is the CCNet/C4-style "same page,
different link" collapse a crawl-scale pipeline runs before content dedup).

Everything is pure Column work — regexp extracts plus array HOFs — so the
canonical key is computed row-local inside whole-stage codegen with ZERO
shuffle; the only shuffle a dedup built on it pays is the final groupBy on
the (md5-uniform) canonical key. The exact same normalization is expressible
in DuckDB SQL (see queries/llm.ORACLE_URL_DEDUP), so the operator is
oracle-checkable bit-for-bit.

Canonicalization rules (each one a pure string rewrite):
  1. drop the fragment (``#...``),
  2. drop the scheme (http/https, any case),
  3. lowercase the authority and strip a leading ``www.``,
  4. strip trailing ``/`` repeats from the path,
  5. drop tracking query params (``utm_*``, ``ref``, ``fbclid``,
     ``gclid``) and sort the survivors, so param order never splits a key.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tracking params dropped by rule 5; a query param survives iff it is
# non-empty and starts with none of these prefixes
TRACKING_PREFIXES = ("utm_", "ref=", "fbclid=", "gclid=")


def _keep_param(x: Column) -> Column:
    cond = x != ""
    for p in TRACKING_PREFIXES:
        cond = cond & ~x.startswith(p)
    return cond


def canonical_url(col: Column | str) -> Column:
    """The canonical dedup key for a URL string (rules 1-5 above)."""
    url = F.col(col) if isinstance(col, str) else col
    no_frag = F.regexp_replace(url, "#.*", "")
    no_scheme = F.regexp_replace(no_frag, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    hostpath = F.regexp_extract(no_scheme, "^([^?]*)", 1)
    qs = F.regexp_extract(no_scheme, r"\?(.*)$", 1)
    host = F.regexp_replace(
        F.lower(F.regexp_extract(hostpath, "^([^/]*)", 1)), r"^www\.", ""
    )
    path = F.regexp_replace(
        F.regexp_extract(hostpath, "^[^/]*(/.*)?$", 1), "/+$", ""
    )
    params = F.array_join(
        F.array_sort(F.filter(F.split(qs, "&"), _keep_param)), "&"
    )
    return F.concat(
        host, path, F.when(params != "", F.concat(F.lit("?"), params)).otherwise("")
    )
