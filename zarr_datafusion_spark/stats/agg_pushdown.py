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

# SELECT <items> FROM <bare-table> [WHERE <conds>] [GROUP BY <col>] —
# nothing else.
_QUERY_RE = re.compile(
    r"^\s*select\s+(?P<items>.+?)\s+from\s+"
    r"(?P<table>[A-Za-z_][A-Za-z0-9_]*)"
    r"(?:\s+where\s+(?P<where>.+?))?"
    r"(?:\s+group\s+by\s+(?P<group>[A-Za-z_][A-Za-z0-9_]*))?\s*;?\s*$",
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
    group = m.group("group")
    interval = _parse_where(where, coord)
    if interval is None:
        return None
    if group is not None:
        # GROUP BY rollup path (hypertable-rollup shape): needs
        # chunk-row == outer-index granularity; handles its own guards
        return _grouped_rollup(
            spark, stats, schema, m.group("items"), group, coord, interval
        )
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
    # per-row sums exist only where the sidecar kept them (None =
    # overflow-withheld) — a MIN/MAX-only query over such a var must
    # never fold them (ADVICE r10: sum([None, ...]) raised TypeError),
    # and its boundary scan must not compute a SUM the full plan
    # wouldn't (that sum could ANSI-overflow where MIN/MAX succeeds)
    sum_vars = sorted(
        {arg for fn, arg, _ in items if fn in ("sum", "avg") and arg}
    )
    i_sum = {
        v: sum(stats["vars"][v]["sum"][r] for r in interior) for v in sum_vars
    }
    i_min = {
        v: min((stats["vars"][v]["min"][r] for r in interior), default=None)
        for v in vars_needed
    }
    i_max = {
        v: max((stats["vars"][v]["max"][r] for r in interior), default=None)
        for v in vars_needed
    }
    for v in sum_vars:
        if abs(i_sum[v]) >= (1 << 63):
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
        if v in sum_vars:
            aggs.append(F.sum(v).alias(f"_bsum_{v}"))
        aggs += [
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
                    [F.lit(None).cast("bigint").alias(f"_bsum_{v}")]
                    if v in sum_vars
                    else []
                )
                + [
                    F.lit(None).cast("bigint").alias(f"_bmin_{v}"),
                    F.lit(None).cast("bigint").alias(f"_bmax_{v}"),
                ]
            ],
        )

    # ---- combine: one-row JVM projection ------------------------------
    total = F.lit(i_count).cast("bigint") + F.col("_bn")
    out = []
    for fn, arg, name in items:
        if fn == "count":
            out.append(total.alias(name))
            continue
        if fn in ("sum", "avg"):
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
    res = b.select(*out)
    if boundary:
        res._zds_shortcut_kind = "pruned"  # boundary slabs are read
    return res


#: a grouped rollup larger than this answers from the full plan — the
#: sidecar fold is driver-side (the result IS this size either way,
#: but a distributed fold should own truly huge rollups)
_ROLLUP_MAX_GROUPS = 100_000


def _grouped_rollup(
    spark, stats: dict, schema: dict, items_text: str, group: str,
    coord: str | None, interval,
):
    """``SELECT coord0, AGGs FROM t [WHERE coord0 ...] GROUP BY coord0``
    answered entirely from the sidecar — the hypertable-rollup shape
    (per-time-bucket SUM/AVG over an append-axis store).  Requires
    chunk-row granularity == one outer index (``outer_chunk == 1``), so
    every group's exact per-row sum/min/max/count is already in the
    sidecar and NO store read happens at all; a window cuts nothing
    mid-group (each row's coord bounds collapse to one value, so
    classification is exact in/out — sortedness is NOT required here,
    there is no boundary scan to double-count).  The fold runs
    driver-side over metadata-sized lists; rollups beyond
    ``_ROLLUP_MAX_GROUPS`` groups bail to the distributed plan."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    if group != coord or stats.get("outer_chunk") != 1:
        return None
    n_rows_list = len(stats.get("coord0_min", []))
    if n_rows_list != stats.get("shape0") or n_rows_list > _ROLLUP_MAX_GROUPS:
        return None

    # ---- items: the bare group column plus the supported aggs --------
    items = []  # (kind, arg, out_name)
    for raw in items_text.split(","):
        raw_s = raw.strip()
        if re.fullmatch(rf"{group}", raw_s):
            items.append(("group", None, group))
            continue
        am = _AGG_RE.match(raw_s)
        if am is None:
            return None
        fn = am.group("fn").lower()
        arg = am.group("arg")
        alias = am.group("alias")
        if fn == "count":
            if arg in ("*", "1"):
                items.append(("count", None, alias or "count(1)"))
                continue
            if arg != coord and arg not in stats["vars"]:
                return None
            items.append(("count", arg, alias or f"count({arg})"))
            continue
        v = stats["vars"].get(arg)
        if v is None or v.get("kind") not in ("i", "u"):
            return None  # float policy: full plan answers
        if fn in ("sum", "avg") and any(s is None for s in v["sum"]):
            return None
        items.append((fn, arg, alias or f"{fn}({arg})"))
    if not items:
        return None

    # accumulate per GROUP VALUE (duplicate coordinate values — legal
    # in an unsorted axis — must merge into one group, as SQL does)
    inner = stats["inner_rows"]
    # vars whose per-row stats the fold must carry (count(coord) needs
    # none; sum-None entries only reach here for min/max-only items)
    vars_needed = sorted(
        {arg for fn, arg, _ in items if arg and arg in stats["vars"]}
    )
    acc: dict = {}  # cv -> {"cells": n, var: [sum, min, max]}
    order: list = []
    for r in range(n_rows_list):
        cv = stats["coord0_min"][r]
        if cv is None or cv != stats["coord0_max"][r]:
            return None  # non-numeric or inconsistent row bounds
        if _classify(cv, cv, interval) != "in":
            continue
        a = acc.get(cv)
        if a is None:
            a = acc[cv] = {"cells": 0}
            order.append(cv)
        a["cells"] += inner
        for vname in vars_needed:
            v = stats["vars"][vname]
            cur = a.get(vname)
            s = v["sum"][r]
            if cur is None:
                a[vname] = [s, v["min"][r], v["max"][r]]
            else:
                cur[0] = None if (cur[0] is None or s is None) else cur[0] + s
                cur[1] = min(cur[1], v["min"][r])
                cur[2] = max(cur[2], v["max"][r])

    rows = []
    for cv in order:
        a = acc[cv]
        out = []
        for fn, arg, _ in items:
            if fn == "group":
                out.append(cv)
            elif fn == "count":
                out.append(a["cells"])
            elif fn == "sum":
                s = a[arg][0]
                if abs(s) >= (1 << 63):
                    return None  # full plan raises ANSI overflow
                out.append(s)
            elif fn == "avg":
                s = a[arg][0]
                if abs(s) >= (1 << 63):
                    # duplicate-coord merges can push the exact Python
                    # sum past int64 even when every per-row sum was
                    # kept (ADVICE r10 low).  Spark's AVG(bigint) sums
                    # in DOUBLE (verified: no ANSI overflow, unlike
                    # SUM), so at this magnitude the full plan's
                    # order-dependent double accumulation is the
                    # answer of record — the exact integer fold defers
                    # rather than risk a divergent rounding
                    return None
                out.append(float(s) / a["cells"])
            elif fn == "min":
                out.append(a[arg][1])
            else:
                out.append(a[arg][2])
        rows.append(tuple(out))

    fields = []
    for fn, arg, name in items:
        if fn == "group":
            fields.append(StructField(name, schema[group], nullable=False))
        elif fn == "count":
            fields.append(StructField(name, LongType(), nullable=False))
        elif fn == "sum":
            fields.append(StructField(name, LongType(), nullable=True))
        elif fn == "avg":
            fields.append(StructField(name, DoubleType(), nullable=True))
        else:
            fields.append(StructField(name, schema[arg], nullable=True))
    return spark.createDataFrame(rows, StructType(fields))
