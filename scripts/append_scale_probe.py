"""Transactional-append scale probe (VERDICT r12 item 5).

``append_snapshot`` claims O(new slabs + coordinate axis + metadata)
cost at ANY store size — the sparse-staging design.  This script
proves it with numbers: append ONE outer slab to local repos holding
10 / 100 / 1000 data-chunk objects and record (a) how many NEW chunk
objects the commit added to the repo (must be FLAT: the slab's data
chunks + the grown outer-coordinate chunk) and (b) wall time (must be
near-flat; the only size-dependent term is re-serializing the
manifest, which is O(#chunks) json — bytes, not chunk I/O).

Results are recorded in BASELINE.md (r13 section).  The same shape
runs over the live-socket s3 fixture in
``tests/test_icechunk.py::test_remote_append_stages_only_new_objects``.

Usage: python scripts/append_scale_probe.py [n_slabs ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

NLAT, NLON = 10, 14  # distinct sizes: dimension-order inference needs them


def probe_base_arrays(n_slabs: int) -> dict:
    """The probe's base-store arrays — shared with the pinning tests in
    tests/test_icechunk.py (they import THIS module), so the measured
    table and the `== 3 new objects` assertion can never drift apart
    (r13 review)."""
    rng = np.random.RandomState(7)
    return {
        "time": (np.arange(n_slabs, dtype=np.int64), (n_slabs,)),
        "lat": (np.arange(NLAT, dtype=np.int64), (NLAT,)),
        "lon": (np.arange(NLON, dtype=np.int64), (NLON,)),
        "temperature": (
            rng.randn(n_slabs, NLAT, NLON).astype(np.float64),
            (1, NLAT, NLON),
        ),
        "humidity": (
            rng.rand(n_slabs, NLAT, NLON).astype(np.float64),
            (1, NLAT, NLON),
        ),
    }


def build_repo(parent: str, n_slabs: int) -> str:
    from zarr_datafusion_spark.zarr.icechunk import commit_store
    from zarr_datafusion_spark.zarr.writer import write_store

    store = os.path.join(parent, f"base_{n_slabs}.zarr")
    write_store(store, probe_base_arrays(n_slabs), zarr_format=2)
    repo = os.path.join(parent, f"repo_{n_slabs}.ic")
    commit_store(store, repo, message=f"base {n_slabs} slabs")
    return repo


def one_slab_df(spark, t: int):
    lat, lon = np.meshgrid(
        np.arange(NLAT, dtype=np.int64),
        np.arange(NLON, dtype=np.int64),
        indexing="ij",
    )
    rng = np.random.RandomState(1000 + t)
    pdf = pd.DataFrame(
        {
            "time": np.full(NLAT * NLON, t, dtype=np.int64),
            "lat": lat.ravel(),
            "lon": lon.ravel(),
            "temperature": rng.randn(NLAT * NLON),
            "humidity": rng.rand(NLAT * NLON),
        }
    )
    return spark.createDataFrame(pdf)


def chunk_objects(repo: str) -> set[str]:
    out = set()
    for dirpath, _dirs, files in os.walk(os.path.join(repo, "chunks")):
        out.update(f for f in files if ".tmp" not in f)
    return out


def main() -> None:
    from zarr_datafusion_spark.session import get_spark
    from zarr_datafusion_spark.zarr.icechunk import append_snapshot

    sizes = [int(a) for a in sys.argv[1:]] or [5, 50, 500]
    spark = get_spark("zds-append-probe")
    parent = tempfile.mkdtemp(prefix="zds_append_probe_")
    rows = []
    try:
        # warmup: first Spark job + python-worker spawn must not be
        # billed to the smallest store's append (it made 13 objects
        # read 5.2 s vs 1003 objects 0.9 s on the first run)
        wrepo = build_repo(parent, 2)
        append_snapshot(one_slab_df(spark, 2), wrepo, message="warmup")
        for n in sizes:
            repo = build_repo(parent, n)
            before = chunk_objects(repo)
            df = one_slab_df(spark, n)
            t0 = time.perf_counter()
            append_snapshot(df, repo, message="probe +1 slab")
            dt = time.perf_counter() - t0
            after = chunk_objects(repo)
            rows.append(
                {
                    "base_chunk_objects": len(before),
                    "new_chunk_objects": len(after - before),
                    "append_wall_s": round(dt, 3),
                }
            )
            print(json.dumps(rows[-1]))
    finally:
        shutil.rmtree(parent, ignore_errors=True)
    print(json.dumps({"probe": "append_scale", "rows": rows}))


if __name__ == "__main__":
    main()
