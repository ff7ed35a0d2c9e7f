"""Per-chunk min/max statistics for DATA variables of a Zarr store —
the parquet-row-group data-skipping story for Zarr (VERDICT r8 item 3).

The reference prunes only on COORDINATE filters
(``/root/reference/src/reader/filter.rs:70-302``) and its table
statistics stop at coordinates (``src/datasource/zarr.rs:191-254``).
This module is the natural completion of that design at 100 TB: a
one-time DISTRIBUTED pass computes min/max per outer chunk-row for
every numeric data variable, cached in a staleness-keyed sidecar, and
the scan planner (``ZarrDataSourceReader.partitions``) then skips whole
chunk rows that provably cannot satisfy a pushed ``var <cmp> literal``
conjunct.  The Inexact contract is untouched — Spark re-applies every
filter, pruning only ever removes chunk rows with zero matching cells.

Granularity: one (min, max) per OUTER chunk-row per variable — the
aggregation of all chunks sharing an outer index range.  That matches
the scan's partition unit (outer slabs), keeps the sidecar
axis-bounded (``shape[0]/chunks[0]`` entries, metadata-sized at any
data scale — an ERA5 archive with 10^5 time chunks stores 10^5 pairs
per variable), and is exactly the parquet row-group analogy: stats per
horizontal stripe, not per cell block.

NaN discipline (floats): Spark AND DuckDB order NaN LARGER than every
number (``NaN > 0.5`` is TRUE, ``NaN < 0.5`` is FALSE — verified on
both engines), so per-row stats carry ``nanmin``/``nanmax`` PLUS a
per-row ``nan`` flag: upper-bound conjuncts (``v < hi``) can always
skip on the NaN-ignoring min (NaN fails them too), but lower-bound
conjuncts (``v > lo``) are satisfied by ANY NaN cell, so a row may be
skipped on its max only when its ``nan`` flag is clear.  An ALL-NaN
row stores ``None`` bounds: skippable under any upper bound, kept
under lower-bound-only predicates (its NaNs match).
"""

from __future__ import annotations

import json
import os

import numpy as np

#: bumped when the sidecar layout changes (forces recompute)
#: 3: per-ROW nan flags (Spark/DuckDB order NaN largest)
#: 4: per-row exact integer sums + outer-coordinate row bounds
#:    (chunk-level aggregate pushdown, reference README.md:297)
_LAYOUT = "cstats4"


def _store_marker(store_path: str) -> str | None:
    """The store's metadata completion marker file (local stores) —
    its (size, mtime_ns) keys the sidecar's staleness."""
    for name in (".zmetadata", "zarr.json", ".zgroup"):
        p = os.path.join(store_path, name)
        if os.path.isfile(p):
            return p
    return None


def _sidecar_base(store_path: str) -> str:
    """Per-store sidecar basename prefix: last path component plus a
    short digest of the FULL store path, so two stores sharing a
    basename (e.g. ``a/weather.zarr`` and ``b/weather.zarr``) never
    prune each other's sidecars into a recompute ping-pong (ADVICE
    r9)."""
    import hashlib

    base = os.path.basename(store_path.rstrip("/")) or "store"
    digest = hashlib.md5(store_path.encode()).hexdigest()[:8]
    return f"{base}-{digest}"


def chunk_stats_sidecar_path(store_path: str) -> str | None:
    """Staleness-keyed LOCAL sidecar path for a store (the sidecar is
    a cache, so it lives under the repo's data/ dir even for remote
    stores), or ``None`` when no metadata marker is found.

    Key discipline (regenerated stores can never be served stale
    pruning decisions):

    * local stores: md5(path, marker size, mtime_ns, layout) — the
      persisted-index pattern, no reads;
    * remote stores (s3/gs/http — THE 100 TB case): md5(url, marker
      CONTENT, layout) — object stores expose no reliable mtime
      cheaply, but the consolidated-metadata marker is small, changes
      on every append/update (shape fields), and is read once at
      registration anyway."""
    import hashlib

    from zarr_datafusion_spark.zarr.metadata import normalize_store_path
    from zarr_datafusion_spark.zarr.storage import StorageLocation, store_fs

    store_path = normalize_store_path(store_path)
    if StorageLocation.parse(store_path).is_remote:
        fs, root = store_fs(store_path)
        content = None
        for name in (".zmetadata", "zarr.json", ".zgroup"):
            p = f"{root.rstrip('/')}/{name}"
            if fs.exists(p):
                content = fs.read_bytes(p)
                break
        if content is None:
            return None
        key = hashlib.md5(
            f"{store_path}:{_LAYOUT}:".encode() + content
        ).hexdigest()[:12]
        repo_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        base = _sidecar_base(store_path)
        return os.path.join(
            repo_root, "data", "zarr_chunk_stats", f"{base}-{key}.json"
        )
    marker = _store_marker(store_path)
    if marker is None:
        return None
    st = os.stat(marker)
    key = hashlib.md5(
        f"{os.path.abspath(store_path)}:{st.st_size}:{st.st_mtime_ns}:"
        f"{_LAYOUT}".encode()
    ).hexdigest()[:12]
    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    base = _sidecar_base(os.path.abspath(store_path))
    # basename prefix so superseded keys for the same store can be
    # pruned when a new key is written (ADVICE r8 pattern)
    return os.path.join(
        repo_root, "data", "zarr_chunk_stats", f"{base}-{key}.json"
    )


#: in-process cache: sidecar path (or store path for remote) -> stats
_CACHE: dict[str, dict] = {}


def compute_zarr_chunk_stats(spark, store_path: str) -> dict:
    """Compute (or load) the per-outer-chunk-row min/max stats.

    The compute pass is DISTRIBUTED: one Spark task per outer
    chunk-row reads that row's chunks for every numeric data variable
    (through ``chunkio.read_window`` — same decode path as the scan)
    and reduces to ``(min, max)`` pairs; only those metadata-sized
    pairs return to the driver.  Cost = exactly one full scan of the
    data variables, paid ONCE per store version — every subsequent
    filtered scan can skip non-matching chunk rows for free.

    Returns ``{"outer_chunk": C, "shape0": n, "inner_rows": m,
    "coord0": name, "coord0_min": [...], "coord0_max": [...],
    "coord0_sorted": bool, "vars": {name: {"kind": k, "min": [...],
    "max": [...], "nan": [...], "sum": [...]}}}`` with ``None`` min/max
    entries for all-NaN rows.  Lists are indexed by outer chunk-row
    ``r`` covering rows ``[r*C, (r+1)*C)`` of the outer dimension.

    ``sum`` (layout 4, chunk-level aggregate pushdown — the
    reference's own unchecked roadmap item, ``README.md:297``) is the
    EXACT per-chunk-row sum for integer variables, and ``None`` for
    float variables and for rows whose magnitude bound could overflow
    int64 — float sums are order-dependent (no cross-engine or
    shortcut-vs-scan contract exists), so they are withheld wholesale,
    the same discipline as the NaN MIN/MAX withhold in
    :func:`data_var_bounds`.  ``coord0_min``/``coord0_max`` bound the
    OUTER coordinate's values per chunk row so a coordinate-range
    filter maps to interior / boundary / outside chunk rows without
    touching the store; ``coord0_sorted`` (strictly increasing) gates
    the filtered pushdown — with unsorted coords a value-range
    boundary scan could overlap interior rows and double-count.
    """
    from zarr_datafusion_spark.zarr.metadata import (
        discover_arrays,
        normalize_store_path,
    )

    store_path = normalize_store_path(store_path)
    sidecar = chunk_stats_sidecar_path(store_path)
    cache_key = sidecar or store_path
    if cache_key in _CACHE:
        return _CACHE[cache_key]
    if sidecar and os.path.exists(sidecar):
        with open(sidecar) as f:
            stats = json.load(f)
        _CACHE[cache_key] = stats
        return stats

    meta = discover_arrays(store_path)
    # numeric data vars only (comparison pruning is meaningless for
    # strings; datetimes are coordinate material in this model)
    num_vars = [
        v
        for v in meta.data_vars
        if np.dtype(v.dtype).kind in "iufb"
    ]
    if not meta.coords or not num_vars:
        stats = {
            "outer_chunk": 1,
            "shape0": 0,
            "inner_rows": 0,
            "coord0": None,
            "coord0_min": [],
            "coord0_max": [],
            "coord0_sorted": False,
            "vars": {},
        }
        _CACHE[cache_key] = stats
        return stats

    shape0 = num_vars[0].shape[0]
    outer_chunk = max(1, min(v.chunks[0] for v in num_vars))
    n_rows = (shape0 + outer_chunk - 1) // outer_chunk
    var_metas = list(num_vars)
    sp = store_path

    def _row_stats(r: int):
        from zarr_datafusion_spark.zarr.chunkio import read_window

        out = []
        lo, hi = r * outer_chunk, min((r + 1) * outer_chunk, shape0)
        for v in var_metas:
            window = ((lo, hi),) + tuple((0, s) for s in v.shape[1:])
            arr = read_window(sp, v, window)
            if arr.dtype.kind == "f":
                has_nan = bool(np.isnan(arr).any())
                with np.errstate(all="ignore"):
                    mn, mx = np.nanmin(arr), np.nanmax(arr)
                if np.isnan(mn):  # all-NaN row: skippable everywhere
                    out.append((None, None, has_nan, None))
                    continue
                # float sums withheld: order-dependent, no contract
                out.append((float(mn), float(mx), has_nan, None))
            else:
                mn, mx = int(arr.min()), int(arr.max())
                # exact int sum, withheld when an int64 accumulator
                # could overflow (|bound| * cells >= 2^62 — the full
                # plan then raises Spark's own ANSI overflow instead)
                if max(abs(mn), abs(mx)) * arr.size < (1 << 62):
                    s = int(arr.sum(dtype=np.int64))
                else:
                    s = None
                out.append((mn, mx, False, s))
        return (r, out)

    sc = spark.sparkContext
    n_tasks = min(n_rows, sc.defaultParallelism)
    rows = dict(
        sc.parallelize(range(n_rows), max(1, n_tasks)).map(_row_stats).collect()
    )

    # outer-coordinate per-chunk-row bounds: one 1-D metadata-sized
    # array, read once on the driver (discovery already reads every
    # coordinate for its min/max stats)
    from zarr_datafusion_spark.zarr.chunkio import read_window as _rw

    coord0 = meta.coords[0]
    c0 = _rw(store_path, coord0, ((0, coord0.shape[0]),))
    c0_min, c0_max, sorted_ok = [], [], True
    if c0.dtype.kind in "iub":
        conv = int
    elif c0.dtype.kind == "f":
        conv = float
    else:  # datetime/string coords: no numeric filter mapping
        conv = None
    for r in range(n_rows):
        lo, hi = r * outer_chunk, min((r + 1) * outer_chunk, shape0)
        seg = c0[lo:hi]
        if conv is None:
            c0_min.append(None)
            c0_max.append(None)
        else:
            c0_min.append(conv(seg.min()))
            c0_max.append(conv(seg.max()))
    if conv is None or not bool(np.all(c0[:-1] < c0[1:])):
        sorted_ok = False

    # rows per outer index in the FLATTENED table = product of the
    # data grid's inner dimensions (all vars share the coord grid)
    inner_rows = 1
    for s in num_vars[0].shape[1:]:
        inner_rows *= int(s)

    stats = {
        "outer_chunk": outer_chunk,
        "shape0": shape0,
        "inner_rows": inner_rows,
        "coord0": coord0.name,
        "coord0_min": c0_min,
        "coord0_max": c0_max,
        "coord0_sorted": sorted_ok,
        "vars": {
            v.name: {
                "kind": np.dtype(v.dtype).kind,
                "min": [rows[r][i][0] for r in range(n_rows)],
                "max": [rows[r][i][1] for r in range(n_rows)],
                # exact per-row integer sums (None = withheld: float
                # var or potential int64 overflow) — chunk-level
                # aggregate pushdown raw material
                "sum": [rows[r][i][3] for r in range(n_rows)],
                # per-row flags drive the lower-bound skip rule
                # (NaN sorts above every number in Spark/DuckDB, so
                # `v > lo` matches NaN cells — a row with any NaN can
                # never be skipped by its max)
                "nan": [rows[r][i][2] for r in range(n_rows)],
                # any NaN anywhere additionally forbids the A8 MAX
                # shortcut for this var (MAX(col) with a NaN present
                # IS NaN; the NaN-ignoring chunk max would be wrong)
                "has_nan": any(rows[r][i][2] for r in range(n_rows)),
            }
            for i, v in enumerate(var_metas)
        },
    }
    if sidecar:
        os.makedirs(os.path.dirname(sidecar), exist_ok=True)
        # prune superseded keys for the same store (ADVICE r8 pattern);
        # the prefix is the sidecar's own "<base>-<pathdigest>" stem so
        # it always agrees with chunk_stats_sidecar_path, and ".tmp"
        # names are skipped to protect a concurrent writer's in-flight
        # file (ADVICE r9)
        keep = os.path.basename(sidecar)
        prefix = keep.rsplit("-", 1)[0]
        for name in os.listdir(os.path.dirname(sidecar)):
            if (
                name.startswith(f"{prefix}-")
                and name != keep
                and ".tmp" not in name
            ):
                try:
                    os.remove(os.path.join(os.path.dirname(sidecar), name))
                except OSError:
                    pass
        # pid-suffixed tmp: two same-key builders each write privately
        # and the replace is last-writer-wins over identical content
        tmp = f"{sidecar}.tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(stats, f)
        os.replace(tmp, sidecar)
    _CACHE[cache_key] = stats
    return stats


def data_var_bounds(stats: dict) -> dict[str, tuple]:
    """Global exact (min, max) per data variable — the fold over the
    per-chunk-row stats that extends the A7/A8 scan-free MIN/MAX
    rewrite beyond coordinates (the reference's stats stop at coords,
    ``zarr.rs:191-254``).  A float variable containing ANY NaN is
    withheld entirely: Spark sorts NaN above every number, so its
    MAX(col) would be NaN while the NaN-ignoring chunk stats are not
    (MIN would still be safe unless all-NaN, but one conservative rule
    beats two subtle ones — the full plan answers instead)."""
    out: dict[str, tuple] = {}
    for var, s in stats.get("vars", {}).items():
        if s.get("has_nan"):
            continue
        mins = [v for v in s["min"] if v is not None]
        maxs = [v for v in s["max"] if v is not None]
        if mins:
            out[var] = (min(mins), max(maxs))
    return out
