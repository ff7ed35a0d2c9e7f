"""Chunk-level aggregate pushdown for Zarr tables.

The reference's own UNCHECKED roadmap item (``/root/reference/
README.md:297`` — "push SUM/AVG/COUNT to chunk level"): ``SELECT
SUM(v), AVG(v), COUNT(*) ... FROM t [WHERE coord <op> lit ...]`` is
answered from the per-chunk-row statistics sidecar
(:mod:`zarr_datafusion_spark.stats.chunk_stats`) instead of a full
scan:

* chunk rows FULLY INSIDE the coordinate window ("interior") fold
  driver-side from their exact per-row sums/bounds — metadata-sized
  work, no store reads;
* chunk rows the filter cuts mid-chunk ("boundary" — at most two when
  the outer coordinate is sorted) are scanned through the normal
  pruned reader, restricted to exactly those slabs;
* the two halves combine in a one-row JVM plan (literals + a tiny
  boundary aggregate) — no driver-side data collects.

Policy (same discipline as the NaN MIN/MAX withhold in
``data_var_bounds``):

* INTEGER variables answer exactly — int sums are associative, so the
  sidecar fold equals any scan order bit-for-bit;
* FLOAT variables never take the SUM/AVG shortcut — float sums are
  order-dependent and neither Spark nor the sidecar defines a shared
  order, so the full plan answers (min/max over floats likewise falls
  through: the NaN-is-largest rules live in the scan pruner, not
  here);
* a per-row sum withheld for potential int64 overflow bails to the
  full plan, which raises Spark's own ANSI overflow error — the
  shortcut must never answer where the scan would error;
* an UNSORTED outer coordinate disables the filtered form entirely: a
  value-range boundary scan could overlap interior rows and double
  count (the unfiltered form stays available — it needs no row
  classification).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# SELECT <items> FROM <bare-table> [WHERE <conds>] — nothing else.
_QUERY_RE = re.compile(
    r"^\s*select\s+(?P<items>.+?)\s+from\s+"
    r"(?P<table>[A-Za-z_][A-Za-z0-9_]*)"
    r"(?:\s+where\s+(?P<where>.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_AGG_RE = re.compile(
    r"^\s*(?P<fn>count|min|max|sum|avg)\s*\(\s*"
    r"(?P<arg>\*|1|[A-Za-z_][A-Za-z0-9_]*)\s*\)"
    r"\s*(?:as\s+(?P<alias>[A-Za-z_][A-Za-z0-9_]*))?\s*$",
    re.IGNORECASE,
)

_NUM = r"[-+]?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?"
_CMP_RE = re.compile(
    rf"^\s*(?P<col>[A-Za-z_][A-Za-z0-9_]*)\s*"
    rf"(?P<op><=|>=|<|>|=)\s*(?P<lit>{_NUM})\s*$"
)

def _num(text: str):
    return float(text) if re.search(r"[.eE]", text) else int(text)


def _parse_where(where: str | None, coord: str | None):
    """Parse an AND-chain of comparisons on the single column ``coord``
    into an interval ``(lo, lo_strict, hi, hi_strict)`` (``None`` bound
    = unbounded).  Returns ``None`` if any conjunct doesn't fit, or
    references another column."""
    if where is None:
        return (None, False, None, False)
    lo = hi = None
    lo_s = hi_s = False
    # split on AND outside parens (no parens supported — bail on any)
    if "(" in where or ")" in where:
        return None
    # rewrite BETWEEN a AND b into two conjuncts FIRST — its inner AND
    # must not feed the conjunct split below
    where = re.sub(
        rf"([A-Za-z_][A-Za-z0-9_]*)\s+between\s+({_NUM})\s+and\s+({_NUM})",
        r"\1 >= \2 AND \1 <= \3",
        where,
        flags=re.IGNORECASE,
    )
    for part in re.split(r"\s+and\s+", where, flags=re.IGNORECASE):
        m = _CMP_RE.match(part)
        if m is None:
            return None
        col = m.group("col")
        op_bounds = [(m.group("op"), _num(m.group("lit")))]
        if coord is None or col != coord:
            return None
        for op, val in op_bounds:
            if op in (">", ">="):
                if lo is None or val > lo or (val == lo and op == ">"):
                    lo, lo_s = val, op == ">"
            elif op in ("<", "<="):
                if hi is None or val < hi or (val == hi and op == "<"):
                    hi, hi_s = val, op == "<"
            else:  # '='
                if lo is None or val > lo:
                    lo, lo_s = val, False
                if hi is None or val < hi:
                    hi, hi_s = val, False
    return (lo, lo_s, hi, hi_s)


def _classify(rmin, rmax, interval):
    """'in' (whole chunk row satisfies), 'out' (none of it does), or
    'boundary'."""
    lo, lo_s, hi, hi_s = interval
    # fully outside?
    if lo is not None and (rmax < lo or (rmax == lo and lo_s)):
        return "out"
    if hi is not None and (rmin > hi or (rmin == hi and hi_s)):
        return "out"
    # fully inside?
    lo_ok = lo is None or rmin > lo or (rmin == lo and not lo_s)
    hi_ok = hi is None or rmax < hi or (rmax == hi and not hi_s)
    return "in" if (lo_ok and hi_ok) else "boundary"


def try_chunk_agg_pushdown(
    spark: SparkSession, query: str, providers: dict[str, str], stats_of
) -> DataFrame | None:
    """Answer ``query`` from chunk-row statistics + boundary-slab scans,
    or return ``None`` (caller falls through to the full plan).

    ``providers`` maps table name -> zarr store path (tables registered
    with ``data_filter_pushdown=True``); ``stats_of(store_path)`` loads
    the sidecar stats (``compute_zarr_chunk_stats`` — cached)."""
    m = _QUERY_RE.match(query)
    if m is None:
        return None
    table = m.group("table")
    store = providers.get(table)
    if store is None:
        return None
    try:
        stats = stats_of(store)
    except Exception:
        return None
    n_rows_list = len(stats.get("coord0_min", []))
    if not stats.get("vars") or n_rows_list == 0 or not stats.get("inner_rows"):
        return None

    try:
        schema = {f.name: f.dataType for f in spark.table(table).schema.fields}
    except Exception:
        return None

    coord = stats.get("coord0")
    where = m.group("where")
    interval = _parse_where(where, coord)
    if interval is None:
        return None
    if where is not None and not stats.get("coord0_sorted"):
        return None  # unsorted outer coord: boundary scan could double-count

    # ---- parse the agg list -------------------------------------------
    items = []
    for raw in m.group("items").split(","):
        am = _AGG_RE.match(raw)
        if am is None:
            return None
        fn = am.group("fn").lower()
        arg = am.group("arg")
        alias = am.group("alias")
        if fn == "count":
            if arg in ("*", "1"):
                items.append(("count", None, alias or "count(1)"))
                continue
            # zarr columns are dense (null_count 0): COUNT(col) = rows —
            # but only for columns this table actually has
            if arg != coord and arg not in stats["vars"]:
                return None
            items.append(("count", arg, alias or f"count({arg})"))
            continue
        v = stats["vars"].get(arg)
        if v is None or v.get("kind") not in ("i", "u"):
            return None  # floats/unknown: full plan answers (see policy)
        if fn in ("sum", "avg") and any(s is None for s in v["sum"]):
            return None  # withheld sums (overflow guard)
        items.append((fn, arg, alias or f"{fn}({arg})"))

    # ---- classify chunk rows ------------------------------------------
    C, shape0, inner = stats["outer_chunk"], stats["shape0"], stats["inner_rows"]
    interior, boundary = [], []
    for r in range(n_rows_list):
        rmin, rmax = stats["coord0_min"][r], stats["coord0_max"][r]
        if rmin is None:
            return None  # non-numeric outer coord
        cls = _classify(rmin, rmax, interval)
        if cls == "in":
            interior.append(r)
        elif cls == "boundary":
            boundary.append(r)
    if len(boundary) > 4:
        # sorted coords yield at most 2; anything more says the stats
        # don't fit the model — full plan
        return None

    def row_cells(r: int) -> int:
        return (min((r + 1) * C, shape0) - r * C) * inner

    i_count = sum(row_cells(r) for r in interior)
    vars_needed = sorted({arg for fn, arg, _ in items if arg and arg != coord})
    i_sum = {
        v: sum(stats["vars"][v]["sum"][r] for r in interior) for v in vars_needed
    }
    i_min = {
        v: min((stats["vars"][v]["min"][r] for r in interior), default=None)
        for v in vars_needed
    }
    i_max = {
        v: max((stats["vars"][v]["max"][r] for r in interior), default=None)
        for v in vars_needed
    }
    for v in vars_needed:
        if abs(i_sum.get(v, 0)) >= (1 << 63):
            return None  # the full plan raises ANSI overflow; we must too

    # ---- boundary slab scans (only those slabs) -----------------------
    def _pred(col):
        lo, lo_s, hi, hi_s = interval
        p = F.lit(True)
        if lo is not None:
            p = p & (col > F.lit(lo) if lo_s else col >= F.lit(lo))
        if hi is not None:
            p = p & (col < F.lit(hi) if hi_s else col <= F.lit(hi))
        return p

    aggs = [F.count(F.lit(1)).alias("_bn")]
    for v in vars_needed:
        aggs += [
            F.sum(v).alias(f"_bsum_{v}"),
            F.min(v).alias(f"_bmin_{v}"),
            F.max(v).alias(f"_bmax_{v}"),
        ]
    if boundary:
        from zarr_datafusion_spark.zarr import read_zarr

        scans = []
        for r in boundary:
            rmin, rmax = stats["coord0_min"][r], stats["coord0_max"][r]
            df = read_zarr(spark, store, eager_pushdown=True)
            c = F.col(coord)
            scans.append(
                df.filter(c.between(F.lit(rmin), F.lit(rmax)) & _pred(c))
            )
        b = scans[0]
        for s in scans[1:]:
            b = b.unionByName(s)
        b = b.agg(*aggs)
    else:
        b = spark.range(1).select(
            F.lit(0).cast("bigint").alias("_bn"),
            *[
                e
                for v in vars_needed
                for e in (
                    F.lit(None).cast("bigint").alias(f"_bsum_{v}"),
                    F.lit(None).cast("bigint").alias(f"_bmin_{v}"),
                    F.lit(None).cast("bigint").alias(f"_bmax_{v}"),
                )
            ],
        )

    # ---- combine: one-row JVM projection ------------------------------
    total = F.lit(i_count).cast("bigint") + F.col("_bn")
    out = []
    for fn, arg, name in items:
        if fn == "count":
            out.append(total.alias(name))
            continue
        bsum = F.coalesce(F.col(f"_bsum_{arg}"), F.lit(0)).cast("bigint")
        s = (F.lit(i_sum[arg]).cast("bigint") + bsum).cast("bigint")
        if fn == "sum":
            out.append(F.when(total > 0, s).alias(name))
        elif fn == "avg":
            out.append(
                F.when(total > 0, s.cast("double") / total.cast("double")).alias(
                    name
                )
            )
        elif fn == "min":
            cols = [F.col(f"_bmin_{arg}").cast(schema[arg])]
            if i_min[arg] is not None:
                cols.append(F.lit(i_min[arg]).cast(schema[arg]))
            out.append(
                (F.least(*cols) if len(cols) > 1 else cols[0]).alias(name)
            )
        else:  # max
            cols = [F.col(f"_bmax_{arg}").cast(schema[arg])]
            if i_max[arg] is not None:
                cols.append(F.lit(i_max[arg]).cast(schema[arg]))
            out.append(
                (F.greatest(*cols) if len(cols) > 1 else cols[0]).alias(name)
            )
    return b.select(*out)
