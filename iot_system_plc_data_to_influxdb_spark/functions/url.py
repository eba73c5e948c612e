"""URL canonicalization as shared Column expressions (north-star B19).

The SAME expression tree serves the batch dedup query
(plans/northstar.b19_url_dedup) and the streaming ingest filter
(streaming/curation.url_dedup_stream), so batch and stream can never
drift — the gopher_stats pattern. Rules (the standard crawl-pipeline
canonical form):

- scheme and host lowercased; leading ``www.`` stripped
- the scheme's OWN default port stripped (``:80`` only when the scheme
  is http, ``:443`` only when https; other schemes keep their port —
  ``ftp://host:443/x`` is NOT the same page as ``ftp://host/x``)
- inputs that don't match ``scheme://host`` at all canonicalize to
  NULL (they can't be a fetchable page key; merging them under a
  garbage ``://``-prefixed key would conflate distinct junk)
- trailing ``/index.html`` and trailing slash stripped from the path
- tracking params dropped (``utm_*``, ``ref``, ``fbclid``), survivors
  sorted for order-independence
- fragment dropped

Pure Catalyst string/array algebra — map-only, whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def canonical_url(url: Column) -> Column:
    """Canonical form of a messy crawl URL (see module docstring)."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z]+)://", 1))
    hostport = F.lower(F.regexp_extract(url, r"^[A-Za-z]+://([^/?#]+)", 1))
    path = F.regexp_extract(url, r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    host = F.regexp_replace(
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport),
        r"^www\.",
        "",
    )
    cpath = F.regexp_replace(
        F.regexp_replace(path, r"/index\.html$", ""), r"/$", ""
    )
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda x: ~(
                    x.startswith("utm_")
                    | x.startswith("ref=")
                    | x.startswith("fbclid=")
                ),
            )
        ),
        "&",
    )
    return F.when(
        url.rlike(r"^[A-Za-z]+://[^/?#]"),
        F.concat(
            scheme,
            F.lit("://"),
            host,
            cpath,
            F.when(kept == "", F.lit("")).otherwise(
                F.concat(F.lit("?"), kept)
            ),
        ),
    )
