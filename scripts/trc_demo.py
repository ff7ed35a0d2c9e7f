"""One-Trillion-Row-Challenge demo (reference roadmap README.md:337).

Builds a 1BRC/1TRC-shaped Zarr store — stations x observations of
integer-tenths temperatures, one station per outer chunk row — then
answers the challenge query (per-station MIN/MEAN/MAX) two ways:

1. the honest full scan through the distributed zarr source;
2. the chunk-statistics rollup (``stats/agg_pushdown.py``): a one-time
   distributed stats pass over the chunks, after which the GROUP BY
   answers from the sidecar with NO zarr scan in the plan.

At challenge scale the second path is the story: the sidecar is one
row per station (metadata-sized at any measurement count), the build
pass is embarrassingly parallel over chunk rows, and every subsequent
query costs O(stations), not O(rows).  Run:

    python scripts/trc_demo.py [--rows 1e8] [--stations 10000]

Prints one JSON line with build/scan/rollup timings and the
extrapolation arithmetic to 10^12 rows.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=float, default=1e8)
    ap.add_argument("--stations", type=int, default=8_000)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    import numpy as np

    from zarr_datafusion_spark.engine import Engine
    from zarr_datafusion_spark.session import get_spark
    from zarr_datafusion_spark.zarr import read_zarr
    from zarr_datafusion_spark.zarr.writer import write_store

    ns = args.stations
    no = max(1, int(args.rows) // ns)
    if no == ns:
        no += 1  # equal dim sizes make dimension-order inference
        # ambiguous (documented limitation); keep them distinct
    rows = ns * no

    base_dir = tempfile.mkdtemp(prefix="trc_demo_")
    # cleanup must survive any exit path (an exception, or a harness
    # SIGTERM landing between the final print and the old tail-of-main
    # rmtree — two leaked stores observed in r13): register at
    # creation time, and route SIGTERM through sys.exit because
    # Python's default SIGTERM disposition terminates WITHOUT running
    # atexit handlers (r13 review)
    import atexit
    import signal

    if not args.keep:
        atexit.register(shutil.rmtree, base_dir, ignore_errors=True)
        signal.signal(
            signal.SIGTERM, lambda *_: sys.exit(128 + signal.SIGTERM)
        )
    store = os.path.join(base_dir, "trc.zarr")
    print(f"[build] {ns} stations x {no} obs = {rows:,} rows", file=sys.stderr)

    t0 = time.monotonic()
    rng = np.random.RandomState(1)
    station = np.arange(ns, dtype=np.int64)
    obs = np.arange(no, dtype=np.int64)
    base = rng.randint(-300, 351, ns)[:, None]
    temp = (base + rng.randint(-150, 151, (ns, no))).astype(np.int64)
    write_store(
        store,
        {
            "station": (station, (ns,)),
            "obs": (obs, (no,)),
            "temp_x10": (temp, (1, no)),
        },
    )
    del temp
    t_write = time.monotonic() - t0

    spark = get_spark("trc-demo")
    # one throwaway job through the datasource: JVM/datasource/python-
    # worker first-use constants (~10 s on this box) must not bill the
    # measured phases
    read_zarr(spark, store, limit=1).collect()
    sql = (
        "SELECT station, MIN(temp_x10) AS min_t, AVG(temp_x10) AS mean_t, "
        "MAX(temp_x10) AS max_t, COUNT(*) AS n FROM {t} GROUP BY station"
    )

    # 1) honest full scan (no sidecar)
    t0 = time.monotonic()
    read_zarr(spark, store).createOrReplaceTempView("trc_scan")
    scan_rows = spark.sql(sql.format(t="trc_scan")).collect()
    t_scan = time.monotonic() - t0

    # 2) stats build (distributed, one-time) + scan-free rollup
    eng = Engine(spark)
    t0 = time.monotonic()
    eng.register_zarr("trc_idx", store, data_filter_pushdown=True)
    t_stats = time.monotonic() - t0
    t0 = time.monotonic()
    rollup_rows = eng.sql(sql.format(t="trc_idx")).collect()
    t_rollup = time.monotonic() - t0
    assert sorted(map(tuple, scan_rows)) == sorted(map(tuple, rollup_rows))
    assert eng.last_shortcut_kind == "scan_free", eng.last_shortcut_kind

    # a second query on the warm sidecar (steady state)
    t0 = time.monotonic()
    eng.sql(sql.format(t="trc_idx")).collect()
    t_rollup2 = time.monotonic() - t0

    out = {
        "metric": "trc_demo",
        "rows": rows,
        "stations": ns,
        "write_sec": round(t_write, 3),
        "full_scan_sec": round(t_scan, 3),
        "stats_build_sec": round(t_stats, 3),
        "rollup_sec": round(t_rollup, 3),
        "rollup_warm_sec": round(t_rollup2, 3),
        # the rollup reads ZERO measurement bytes: its cost scales with
        # stations (sidecar rows), so the 1e12-row projection keeps the
        # measured rollup time and scales only the one-time passes.
        "extrapolation_1e12": {
            "scale_factor": round(1e12 / rows, 1),
            "full_scan_sec_scaled": round(t_scan * 1e12 / rows, 1),
            "stats_build_sec_scaled": round(t_stats * 1e12 / rows, 1),
            "rollup_sec_unchanged": round(t_rollup2, 3),
        },
    }
    print(json.dumps(out))
    spark.stop()
    if not args.keep:
        shutil.rmtree(base_dir, ignore_errors=True)  # atexit no-ops after


if __name__ == "__main__":
    main()
