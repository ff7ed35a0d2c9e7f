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
_LAYOUT = "cstats3"  # 3: per-ROW nan flags (Spark/DuckDB order NaN largest)


def _store_marker(store_path: str) -> str | None:
    """The store's metadata completion marker file (local stores) —
    its (size, mtime_ns) keys the sidecar's staleness."""
    for name in (".zmetadata", "zarr.json", ".zgroup"):
        p = os.path.join(store_path, name)
        if os.path.isfile(p):
            return p
    return None


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
        base = os.path.basename(store_path.rstrip("/")) or "store"
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
    base = os.path.basename(store_path.rstrip("/")) or "store"
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

    Returns ``{"outer_chunk": C, "shape0": n, "vars":
    {name: {"min": [...], "max": [...]}}}`` with ``None`` entries for
    all-NaN rows.  Lists are indexed by outer chunk-row
    ``r`` covering rows ``[r*C, (r+1)*C)`` of the outer dimension.
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
        stats = {"outer_chunk": 1, "shape0": 0, "vars": {}}
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
                    out.append((None, None, has_nan))
                    continue
                out.append((float(mn), float(mx), has_nan))
            else:
                out.append((int(arr.min()), int(arr.max()), False))
        return (r, out)

    sc = spark.sparkContext
    n_tasks = min(n_rows, sc.defaultParallelism)
    rows = dict(
        sc.parallelize(range(n_rows), max(1, n_tasks)).map(_row_stats).collect()
    )
    stats = {
        "outer_chunk": outer_chunk,
        "shape0": shape0,
        "vars": {
            v.name: {
                "min": [rows[r][i][0] for r in range(n_rows)],
                "max": [rows[r][i][1] for r in range(n_rows)],
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
        # prune superseded keys for the same store (ADVICE r8 pattern)
        base = os.path.basename(store_path.rstrip("/")) or "store"
        keep = os.path.basename(sidecar)
        for name in os.listdir(os.path.dirname(sidecar)):
            if name.startswith(f"{base}-") and name != keep:
                try:
                    os.remove(os.path.join(os.path.dirname(sidecar), name))
                except OSError:
                    pass
        tmp = sidecar + ".tmp"
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
