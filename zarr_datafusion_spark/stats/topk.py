"""Top-K pushdown for Zarr tables — the reference's own UNCHECKED
roadmap item (``/root/reference/README.md:298``: "Top-K optimization
(`ORDER BY x LIMIT k` without full sort)").

Spark already avoids the full sort (``TakeOrderedAndProject`` keeps a
k-row heap per partition), but the SCAN still reads the whole store.
When the leading ORDER BY key is the store's sorted outer coordinate,
the chunk-statistics sidecar bounds which outer indices can possibly
reach the top k: walk the per-chunk-row coordinate bounds from the
relevant end accumulating row counts until ≥ k, and scan only from
that threshold on.  ``ORDER BY time DESC LIMIT 10`` over a 10k-slab
archive then reads one tail slab instead of 10k — the time-series
"latest rows" query at its honest cost.

Guards (full plan answers otherwise): the table must be registered
with chunk statistics, the outer coordinate strictly increasing
(duplicates would make the value threshold ambiguous across slabs),
the leading ORDER BY key must BE that coordinate, and the projection
must be plain columns.  Secondary ORDER BY keys are free: they only
break ties inside the pruned superset, which always holds ≥ k rows
(or everything), so Spark's sort+limit over it equals the full plan's.

Granularity is SLAB-level, the parquet row-group analog: the sidecar
bounds coordinates per chunk row, so the threshold lands on the edge
of the last slab that can contribute — the scan may read up to one
chunk of extra rows beyond the row-exact optimum, never more.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TOPK_RE = re.compile(
    r"^\s*select\s+(?P<cols>\*|[A-Za-z0-9_,\s]+?)\s+from\s+"
    r"(?P<table>[A-Za-z_][A-Za-z0-9_]*)\s+"
    r"order\s+by\s+(?P<order>[A-Za-z0-9_,\s]+?)\s+"
    r"limit\s+(?P<k>\d+)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_ORDER_KEY_RE = re.compile(
    r"^\s*(?P<col>[A-Za-z_][A-Za-z0-9_]*)\s*(?P<dir>asc|desc)?\s*$",
    re.IGNORECASE,
)


def try_topk_pushdown(
    spark: SparkSession, query: str, providers: dict[str, str], stats_of
) -> DataFrame | None:
    """Answer a coordinate-leading top-k ``query`` with a
    threshold-pruned scan, or return ``None`` (full plan)."""
    m = _TOPK_RE.match(query)
    if m is None:
        return None
    store = providers.get(m.group("table"))
    if store is None:
        return None
    try:
        stats = stats_of(store)
    except Exception:
        return None
    coord = stats.get("coord0")
    n_rows = len(stats.get("coord0_min", []))
    if (
        coord is None
        or n_rows == 0
        or not stats.get("coord0_sorted")
        or not stats.get("inner_rows")
    ):
        return None

    # ---- ORDER BY list: leading key must be the outer coordinate ----
    keys = []
    for part in m.group("order").split(","):
        om = _ORDER_KEY_RE.match(part)
        if om is None:
            return None
        keys.append((om.group("col"), (om.group("dir") or "asc").lower()))
    if not keys or keys[0][0] != coord:
        return None

    try:
        schema = [f.name for f in spark.table(m.group("table")).schema.fields]
    except Exception:
        return None
    cols_text = m.group("cols").strip()
    if cols_text == "*":
        cols = schema
    else:
        cols = [c.strip() for c in cols_text.split(",")]
        if any(c not in schema for c in cols):
            return None
    if any(c not in schema for c, _ in keys):
        return None

    # ---- threshold: smallest slab suffix/prefix holding >= k rows ----
    k = int(m.group("k"))
    C, shape0, inner = stats["outer_chunk"], stats["shape0"], stats["inner_rows"]
    desc = keys[0][1] == "desc"
    acc = 0
    threshold = None
    order_rs = range(n_rows - 1, -1, -1) if desc else range(n_rows)
    for r in order_rs:
        acc += (min((r + 1) * C, shape0) - r * C) * inner
        if acc >= k:
            threshold = stats["coord0_min" if desc else "coord0_max"][r]
            break
    if threshold is None:
        # k >= total rows: nothing prunable, let the full plan run
        return None

    from zarr_datafusion_spark.zarr import read_zarr

    df = read_zarr(spark, store, eager_pushdown=True)
    c = F.col(coord)
    df = df.filter(c >= F.lit(threshold) if desc else c <= F.lit(threshold))
    order_cols = [
        F.col(name).desc() if d == "desc" else F.col(name).asc()
        for name, d in keys
    ]
    out = df.select(*cols).orderBy(*order_cols).limit(k)
    out._zds_shortcut_kind = "pruned"  # it reads its threshold slabs
    return out
